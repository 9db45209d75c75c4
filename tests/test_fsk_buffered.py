"""Buffered (gather-free) demod scan variant: equivalence + drift."""

import numpy as np
import jax.numpy as jnp

from radiosonde_auto_rx_tpu.demod.fsk import (FSKConfig, fsk_init_state,
                                              fsk_num_blocks,
                                              fsk_num_blocks_buffered,
                                              _fsk_demod_scan,
                                              _fsk_demod_scan_buffered)
from radiosonde_auto_rx_tpu.demod.modulate import add_awgn, gfsk_mod


def _cfg(nsym=50):
    return FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=nsym,
                     est_min=-5000, est_max=5000, tone_spacing=5000,
                     freq_est_type=1)


def _sig(rng, c, t, ppm=0.0):
    fs_eff = 48000 * (1 + ppm * 1e-6)
    out = []
    tx = []
    for ci in range(c):
        bits = rng.integers(0, 2, int(t / 10) + 2)
        iq = add_awgn(gfsk_mod(bits, 48000, 4800, 2, 0.0, 5000),
                      14.0, 48000, 4800, rng=rng)
        out.append(np.stack([iq.real, iq.imag])[:, :t])
        tx.append(bits)
    return np.stack(out).astype(np.float32), tx


def test_buffered_matches_plain(rng):
    """While drift stays inside the slack, the buffered scan is
    bit-identical to the plain scan on the slack//2-shifted stream."""
    cfg = _cfg()
    slack_ts = 8
    half = cfg.ts // 2
    shift = (slack_ts * cfg.ts // half // 2) * half   # grid-snapped off0
    C, T = 4, 48000
    x, _ = _sig(rng, C, T + shift)
    xb = jnp.asarray(x)
    xp = jnp.asarray(x[:, :, shift:])
    nb = min(fsk_num_blocks(cfg, T),
             fsk_num_blocks_buffered(cfg, T + shift, slack_ts))
    s0 = fsk_init_state(cfg, C)
    _, outs_p = _fsk_demod_scan(cfg, xp, s0, nb)
    _, outs_b = _fsk_demod_scan_buffered(cfg, xb, s0, nb,
                                         slack_ts=slack_ts)
    np.testing.assert_array_equal(np.asarray(outs_b["bits"]),
                                  np.asarray(outs_p["bits"]))
    np.testing.assert_allclose(np.asarray(outs_b["soft"]),
                               np.asarray(outs_p["soft"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs_b["f_est"]),
                               np.asarray(outs_p["f_est"]))


def test_buffered_decodes_clean_ber(rng):
    cfg = _cfg()
    C, T = 2, 96000
    x, tx = _sig(rng, C, T)
    nb = fsk_num_blocks_buffered(cfg, T)
    s0 = fsk_init_state(cfg, C)
    _, outs = _fsk_demod_scan_buffered(cfg, jnp.asarray(x), s0, nb)
    bits = np.asarray(outs["bits"]).transpose(1, 0, 2).reshape(C, -1)
    for ci in range(C):
        best = 1.0
        for off in range(120):
            n = min(bits.shape[1], len(tx[ci]) - off)
            if n > 1000:
                best = min(best, float(
                    np.mean(bits[ci, :n] != tx[ci][off:off + n])))
        assert best < 0.01, f"ch{ci} BER {best}"
