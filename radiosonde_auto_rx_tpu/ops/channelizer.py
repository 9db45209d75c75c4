"""Polyphase filter-bank channelizer: one wideband capture -> N channels.

Replaces the reference's one-SDR-per-task model and the KA9Q multi-channel
server (reference auto_rx/autorx/ka9q.py: `tune` creates one 48 kHz channel
per sonde, SSRC-addressed): a single 2.4 MHz+ IQ capture is split into N
critically-sampled channels in one pass, and every downstream stage
(detector, demodulators) consumes the ``[N, 2, T/N]`` batch directly.

TPU mapping: the polyphase branches are a grouped 1-D convolution (MXU);
the cross-branch DFT is a pair of real [N, N] matmuls (MXU) — no backend
FFT, no complex dtype.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from radiosonde_auto_rx_tpu.ops.fir import design_lowpass


def pfb_prototype(n_chan: int, taps_per_branch: int = 12,
                  cutoff_scale: float = 0.5) -> np.ndarray:
    """Prototype lowpass for the bank: cutoff at half the channel spacing
    (critically sampled), length n_chan*taps_per_branch."""
    ntaps = n_chan * taps_per_branch
    h = design_lowpass(cutoff_scale / n_chan, ntaps)
    if len(h) > ntaps:
        h = h[:ntaps]
    elif len(h) < ntaps:
        h = np.concatenate([h, np.zeros(ntaps - len(h), np.float32)])
    return (h * n_chan).astype(np.float32)


def _dft_mats(n):
    k = np.arange(n)
    ang = 2 * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@partial(jax.jit, static_argnames=("n_chan",))
def _channelize(x, h, n_chan):
    """x: [2, T] wideband planes; h: [P*N] prototype.

    Returns [N, 2, T//N] channel planes; channel k is centered at
    +k*fs/N (k > N/2 ⇒ negative frequencies).
    """
    P = h.shape[0] // n_chan
    T = x.shape[-1] // n_chan * n_chan
    x = x[:, :T]
    # polyphase branches: branch r takes samples x[m*N + r]
    xb = x.reshape(2, T // n_chan, n_chan)                  # [2, M, N]
    # prototype branch taps: h[p*N + r] -> [N, P]
    hb = h.reshape(P, n_chan).T                              # [N, P]
    # convolve each branch along M with its taps (causal)
    xp = jnp.pad(xb, ((0, 0), (P - 1, 0), (0, 0)))
    lhs = xp.transpose(2, 0, 1).reshape(2 * n_chan, 1, -1)   # treat N*2 rows
    # grouped conv: each branch row with its own taps
    # build rhs [2N, 1, P] by repeating branch taps for re/im
    rhs = jnp.repeat(hb[:, None, :], 2, axis=0).reshape(2 * n_chan, 1, P)
    y = jax.lax.conv_general_dilated(
        lhs[None, :, 0, :], rhs[:, :, ::-1], window_strides=(1,),
        padding=[(0, 0)], dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=2 * n_chan)[0]                   # [2N, M]
    yb = y.reshape(n_chan, 2, -1)                            # [N, 2, M]
    # cross-branch DFT: z_k[m] = sum_r y_r[m] * e^{+2πi rk/N}
    cosm, sinm = _dft_mats(n_chan)
    cosm = jnp.asarray(cosm)
    sinm = jnp.asarray(sinm)
    yr, yi = yb[:, 0], yb[:, 1]                              # [N, M]
    # z_k = sum_r y_r e^{-2πi rk/N}: conjugate DFT downconverts +k·fs/N
    zr = jnp.einsum("rm,rk->km", yr, cosm) + \
        jnp.einsum("rm,rk->km", yi, sinm)
    zi = jnp.einsum("rm,rk->km", yi, cosm) - \
        jnp.einsum("rm,rk->km", yr, sinm)
    return jnp.stack([zr, zi], axis=1)                       # [N, 2, M]


def channelize(x, n_chan: int, h: np.ndarray | None = None):
    """Wideband IQ (complex [T] or planes [2, T]) -> [N, 2, T//N] channels.

    Channel k is centered at f_k = k*fs/N for k <= N/2, f_k - fs for
    k > N/2; each channel's output rate is fs/N.
    """
    if np.iscomplexobj(x) and not isinstance(x, jnp.ndarray):
        # split host complex on the host: complex buffers never cross
        # the TPU transfer boundary
        x = np.asarray(x)
        x = jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))
    elif jnp.iscomplexobj(x):
        x = jnp.stack([x.real, x.imag]).astype(jnp.float32)
    if h is None:
        h = pfb_prototype(n_chan)
    return _channelize(x, jnp.asarray(h), n_chan)


def channel_freqs(n_chan: int, fs: float) -> np.ndarray:
    """Center frequency (Hz, relative to capture center) per channel."""
    k = np.arange(n_chan)
    f = k * fs / n_chan
    f[k > n_chan // 2] -= fs
    return f
