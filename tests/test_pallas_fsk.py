"""Fused Pallas freq-est spectral pass vs the einsum reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiosonde_auto_rx_tpu.demod import fsk
from radiosonde_auto_rx_tpu.demod.fsk import FSKConfig, fsk_init_state


@pytest.fixture
def cfg():
    return FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=50,
                     est_min=-5000, est_max=5000,
                     tone_spacing=5000, freq_est_type=1)


def _window(rng, cfg, c):
    return rng.standard_normal((c, 2, cfg.nmem)).astype(np.float32)


def test_sf_parity(rng, cfg):
    """Pallas (interpret) and einsum paths agree on sf and f_est."""
    c = 5
    xw = jnp.asarray(_window(rng, cfg, c))
    sf0 = jnp.asarray(rng.random((c, cfg.ndft)).astype(np.float32))
    try:
        fsk.set_pallas_freq_est(False)
        f_ref, sf_ref = fsk._freq_est(cfg, xw, sf0)
        fsk.set_pallas_freq_est(True)
        f_pal, sf_pal = fsk._freq_est(cfg, xw, sf0)
    finally:
        fsk.set_pallas_freq_est(None)
    np.testing.assert_allclose(np.asarray(sf_pal), np.asarray(sf_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref))


def test_full_demod_parity_with_pallas(rng, cfg):
    """End-to-end demod bits identical with the fused kernel engaged."""
    from radiosonde_auto_rx_tpu.demod import fsk_demod_stream
    from radiosonde_auto_rx_tpu.demod.modulate import gfsk_mod, add_awgn
    tx = rng.integers(0, 2, 3000).astype(np.uint8)
    iq = add_awgn(gfsk_mod(tx, 48000, 4800, 2, 0.0, 5000), 12.0, 48000, 4800)
    x = jnp.asarray(iq)
    try:
        fsk.set_pallas_freq_est(False)
        _, bits_ref, _, _ = fsk_demod_stream(cfg, x)
        fsk.set_pallas_freq_est(True)
        _, bits_pal, _, _ = fsk_demod_stream(cfg, x)
    finally:
        fsk.set_pallas_freq_est(None)
    np.testing.assert_array_equal(np.asarray(bits_pal), np.asarray(bits_ref))
