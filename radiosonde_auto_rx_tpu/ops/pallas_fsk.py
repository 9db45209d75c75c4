"""Fused Pallas kernel for the FSK frequency estimator's spectral pass.

The demod block's dominant HBM traffic is the frequency estimator
(reference utils/fsk.c fsk_demod_freq_est :438-590): per block it gathers
``numffts`` half-overlapped hops, DFTs each, takes magnitudes, and folds
them into the EMA-smoothed spectrum ``Sf``.  Expressed in plain XLA that
materializes [C, nf, ndft] hop segments, spectra and magnitudes in HBM —
several times the size of the input window.

This kernel keeps the whole pass in VMEM: per channel tile it loads the
[TC, nmem] window planes once, then for every hop does the windowed-DFT
matmuls (MXU, static lane slices), magnitude (VPU) and the weighted EMA
accumulation, writing only the updated ``sf`` [TC, ndft].  HBM traffic
drops from ~6 spectrum-sized passes to exactly input + sf in/out.

The hop loop is unrolled at trace time (static slice starts — Mosaic
cannot re-tile dynamic lane slices); numffts is bounded (~15-50) so the
unroll stays cheap.  Numerics match fsk._freq_est's einsum path: same
windowed-DFT matrices, same closed-form EMA weights.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _sf_kernel(xr_ref, xi_ref, sf_ref, wc_ref, ws_ref, out_ref, *,
               starts, ndft, weights, decay):
    wc, ws = wc_ref[:], ws_ref[:]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    acc = sf_ref[:] * decay
    for h, s in enumerate(starts):
        xr = xr_ref[:, s:s + ndft]
        xi = xi_ref[:, s:s + ndft]
        re = dot(xr, wc) + dot(xi, ws)
        im = dot(xi, wc) - dot(xr, ws)
        acc = acc + weights[h] * jnp.sqrt(re * re + im * im)
    out_ref[:] = acc


def freq_est_sf(xw: jnp.ndarray, sf: jnp.ndarray, wc: jnp.ndarray,
                ws: jnp.ndarray, starts: tuple, weights: tuple,
                decay: float, interpret: bool | None = None):
    """One fused EMA-spectrum update.

    xw: [C, 2, nmem] float32 window planes; sf: [C, ndft] EMA carry;
    wc/ws: [ndft, ndft] windowed-DFT matmul operands (fftshifted columns,
    from fsk._dft_mats); starts: static hop offsets into the window;
    weights/decay: closed-form per-hop EMA coefficients.
    Returns sf_new [C, ndft].
    """
    c, _, nmem = xw.shape
    ndft = sf.shape[-1]
    if interpret is None:
        interpret = _interpret_default()
    # channel tile: budget ~2 MB for the window planes; the sublane
    # (second-to-last block) dim must be a multiple of 8
    tc = max(8, min(256, ((1 << 19) // max(nmem, 128)) // 8 * 8))
    while tc > 8 and tc // 2 >= c:
        tc //= 2
    pad = (-c) % tc
    xr, xi = xw[:, 0], xw[:, 1]
    if pad:
        zw = jnp.zeros((pad, nmem), jnp.float32)
        xr = jnp.concatenate([xr, zw], axis=0)
        xi = jnp.concatenate([xi, zw], axis=0)
        sf = jnp.concatenate([sf, jnp.zeros((pad, ndft), jnp.float32)],
                             axis=0)
    cp = c + pad
    rows_w = pl.BlockSpec((tc, nmem), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    rows_s = pl.BlockSpec((tc, ndft), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    mat = pl.BlockSpec(memory_space=pltpu.VMEM)
    nf = len(starts)
    out = pl.pallas_call(
        partial(_sf_kernel, starts=tuple(int(s) for s in starts),
                ndft=ndft, weights=tuple(float(w) for w in weights),
                decay=float(decay)),
        grid=(cp // tc,),
        in_specs=[rows_w, rows_w, rows_s, mat, mat],
        out_specs=rows_s,
        out_shape=jax.ShapeDtypeStruct((cp, ndft), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * cp * nf * ndft * ndft,
            bytes_accessed=4 * cp * (2 * nmem + 2 * ndft) + 8 * ndft * ndft,
            transcendentals=cp * nf * ndft),
        interpret=interpret,
    )(xr, xi, sf, wc, ws)
    return out[:c]
