"""Pallas FFT kernel vs numpy FFT (interpret mode on CPU)."""

import numpy as np
import pytest

from radiosonde_auto_rx_tpu.ops import pallas_fft


def _planes(z):
    return np.stack([z.real, z.imag], axis=-2).astype(np.float32)


@pytest.mark.parametrize("n", [64, 128, 256, 512, 1024, 4096])
def test_fft_matches_numpy(rng, n):
    b = 5  # deliberately not a tile multiple
    z = (rng.standard_normal((b, n)) +
         1j * rng.standard_normal((b, n))).astype(np.complex64)
    got = np.asarray(pallas_fft.fft(_planes(z), interpret=True))
    want = np.fft.fft(z)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[:, 0], want.real, atol=2e-3 * scale)
    np.testing.assert_allclose(got[:, 1], want.imag, atol=2e-3 * scale)


@pytest.mark.parametrize("n", [128, 1024])
def test_fft_abs2_shifted(rng, n):
    b = 3
    z = (rng.standard_normal((b, n)) +
         1j * rng.standard_normal((b, n))).astype(np.complex64)
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))).astype(
        np.float32)
    got = np.asarray(pallas_fft.fft_abs2(_planes(z), win=win, interpret=True))
    want = np.fft.fftshift(np.abs(np.fft.fft(z * win[None, :]))**2, axes=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2 * want.max())


def test_fft_tone_bin(rng):
    """A pure tone lands its whole energy in the right shifted bin."""
    n, fs = 1024, 48000.0
    k_true = 100
    t = np.arange(n)
    z = np.exp(2j * np.pi * k_true * t / n).astype(np.complex64)[None]
    p = np.asarray(pallas_fft.fft_abs2(_planes(z), shift=True,
                                       interpret=True))[0]
    assert np.argmax(p) == n // 2 + k_true
    p2 = np.asarray(pallas_fft.fft_abs2(_planes(z), shift=False,
                                        interpret=True))[0]
    assert np.argmax(p2) == k_true


def test_fft_complex_input_accepted(rng):
    z = (rng.standard_normal((2, 256)) +
         1j * rng.standard_normal((2, 256))).astype(np.complex64)
    import jax.numpy as jnp
    got = np.asarray(pallas_fft.fft(jnp.asarray(z), interpret=True))
    want = np.fft.fft(z)
    np.testing.assert_allclose(got[:, 0], want.real,
                               atol=2e-3 * np.abs(want).max())


def test_welch_psd_pallas_parity(rng):
    """Forced-Pallas Welch PSD matches the einsum path."""
    import jax.numpy as jnp
    from radiosonde_auto_rx_tpu.detect import psd
    x = rng.standard_normal((3, 2, 8192)).astype(np.float32)
    try:
        psd.set_pallas_psd(False)
        want = np.asarray(psd._welch(jnp.asarray(x), 1024))
        psd.set_pallas_psd(True)
        got = np.asarray(psd._welch(jnp.asarray(x), 1024))
    finally:
        psd.set_pallas_psd(None)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6 * want.max())


def test_four_step_matches_numpy(rng):
    """Explicit Bailey four-step path (method='four-step') at N=4096."""
    n, b = 4096, 3
    z = (rng.standard_normal((b, n)) +
         1j * rng.standard_normal((b, n))).astype(np.complex64)
    got = np.asarray(pallas_fft.fft(_planes(z), interpret=True,
                                    method="four-step"))
    want = np.fft.fft(z)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[:, 0], want.real, atol=3e-3 * scale)
    np.testing.assert_allclose(got[:, 1], want.imag, atol=3e-3 * scale)
