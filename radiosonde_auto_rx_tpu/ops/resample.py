"""Polyphase rational resampler — the ``tsrc`` equivalent.

The reference shells out to libsamplerate for non-integer rate ratios
(reference utils/tsrc.c:60-77, used for the M10 96k->48.08k chain,
auto_rx/test/README.md:13-22).  Here the same windowed-sinc polyphase
structure is expressed as static gathers + one batched contraction so it
jits: for a rational ratio L/M every output sample n is

    y[n] = sum_j x[base_n - j] * h[j*L + p_n],   n*M = base_n*L + p_n

i.e. a ``taps``-tap dot against the phase-``p_n`` row of the polyphase
bank.  Output count, bases and phases depend only on (T, L, M) so the
index tensors are host-precomputed constants and shapes stay static.
"""

from fractions import Fraction
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def rational_ratio(fs_in: float, fs_out: float, max_den: int = 5000):
    """(L, M) with fs_out/fs_in ~= L/M, denominator bounded."""
    fr = Fraction(fs_out / fs_in).limit_denominator(max_den)
    return fr.numerator, fr.denominator


@lru_cache(maxsize=None)
def _poly_bank(l_up: int, m_down: int, taps_per_phase: int):
    """Polyphase bank [L, taps] of the windowed-sinc prototype (gain L)."""
    n = taps_per_phase * l_up
    cutoff = 0.47 / max(l_up, m_down)        # of the upsampled rate
    t = np.arange(n) - (n - 1) / 2.0
    h = 2 * cutoff * np.sinc(2 * cutoff * t)
    h *= np.blackman(n)
    # decompose: bank[p, j] = h[j*L + p]
    bank = np.zeros((l_up, taps_per_phase), np.float32)
    for p in range(l_up):
        row = h[p::l_up]
        bank[p, :len(row)] = row
    # unity DC gain per phase row -> flat gain across fractional delays
    bank /= bank.sum(axis=1, keepdims=True).clip(1e-9)
    return bank


@lru_cache(maxsize=None)
def _plan(t_in: int, l_up: int, m_down: int, taps_per_phase: int):
    """Static gather plan: (idx [N_out, taps], phase [N_out])."""
    half = taps_per_phase // 2
    # valid output range: window x[base-taps+1 .. base] shifted by +half
    # to cancel the prototype group delay
    n_out = (t_in - taps_per_phase) * l_up // m_down
    n = np.arange(n_out, dtype=np.int64)
    t_up = n * m_down
    base = t_up // l_up + half
    phase = (t_up % l_up).astype(np.int32)
    j = np.arange(taps_per_phase, dtype=np.int64)
    idx = base[:, None] - j[None, :]
    idx = np.clip(idx, 0, t_in - 1)
    return idx, phase


@partial(jax.jit, static_argnames=("l_up", "m_down", "taps_per_phase"))
def _resample(x, l_up, m_down, taps_per_phase):
    idx, phase = _plan(x.shape[-1], l_up, m_down, taps_per_phase)
    bank = jnp.asarray(_poly_bank(l_up, m_down, taps_per_phase))
    w = x[..., idx]                                  # [..., N_out, taps]
    rows = bank[phase]                               # [N_out, taps]
    return jnp.sum(w * rows, axis=-1)


def resample(x, fs_in: float, fs_out: float, taps_per_phase: int = 16,
             max_den: int = 5000):
    """Resample along the last axis; works on [..., T] float or complex
    planes [..., 2, T].  Returns [..., floor((T-taps)*L/M)] samples at
    fs_out.  Identity ratios pass through untouched."""
    l_up, m_down = rational_ratio(fs_in, fs_out, max_den)
    if l_up == m_down:
        return jnp.asarray(x)
    return _resample(jnp.asarray(x, jnp.float32) if not
                     jnp.iscomplexobj(x) else x, l_up, m_down,
                     taps_per_phase)


def resample_planes(x, fs_in: float, fs_out: float, **kw):
    """[C, 2, T] or [2, T] float32 planes -> resampled planes."""
    return resample(jnp.asarray(x, jnp.float32), fs_in, fs_out, **kw)
