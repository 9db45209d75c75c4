"""Headline benchmark: IQ Msamples/s per chip through the FSK demodulator.

Primary metric per BASELINE.json: complex IQ samples/s through the full
RS41-config 2FSK demod (freq estimation + tone integration + timing + soft
bits).  Baseline: the reference decodes ~5 concurrent 48 kHz channels in
real time on a Pi4 (reference auto_rx/station.cfg.example:36-38) =
0.24 Msamples/s/device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from radiosonde_auto_rx_tpu.demod.fsk import (
    FSKConfig, fsk_init_state, fsk_num_blocks_buffered,
    _fsk_demod_scan_buffered)

BASELINE_MSPS = 0.24  # reference: ~5 real-time 48 kHz channels per device


def make_input(cfg, channels, t_samples, key):
    """Synthetic 2FSK on-device: random symbols + AWGN, as [C, 2, T] planes
    (the axon TPU backend has no complex64 — and neither does the MXU)."""
    k1, k2 = jax.random.split(key)
    nsym = t_samples // cfg.ts + 1
    bits = jax.random.bernoulli(k1, 0.5, (channels, nsym))
    f = jnp.where(jnp.repeat(bits, cfg.ts, axis=1)[:, :t_samples],
                  cfg.tone_spacing / 2.0, -cfg.tone_spacing / 2.0)
    ph = 2 * jnp.pi * jnp.cumsum(f, axis=1) / cfg.fs
    iq = jnp.stack([jnp.cos(ph), jnp.sin(ph)], axis=1)
    noise = jax.random.normal(k2, iq.shape, jnp.float32) * 0.07
    return (iq + noise).astype(jnp.float32)


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=300,
                    est_min=-5000, est_max=5000,
                    tone_spacing=5000, freq_est_type=1)
    channels = 512 if on_tpu else 16
    t_samples = 48000 * 4 if on_tpu else 48000
    reps = 5 if on_tpu else 2

    x = jax.jit(make_input, static_argnums=(0, 1, 2))(
        cfg, channels, t_samples, jax.random.key(0))
    x.block_until_ready()

    nb = fsk_num_blocks_buffered(cfg, t_samples)
    state0 = fsk_init_state(cfg, channels)

    def run(x, state):
        state, outs = _fsk_demod_scan_buffered(cfg, x, state, nb)
        # reduce on device so timing includes no D2H of the full output
        return (outs["soft"].sum(), outs["bits"].astype(jnp.int32).sum(),
                state)

    runj = jax.jit(run)
    ssum, bsum, state = runj(x, state0)   # compile + warm
    float(ssum), int(bsum)                # force completion (fetch)

    t0 = time.perf_counter()
    for _ in range(reps):
        ssum, bsum, state = runj(x, state0)
        float(ssum)                       # host fetch = hard sync point
    dt = time.perf_counter() - t0

    msps = channels * t_samples * reps / dt / 1e6
    print(json.dumps({
        "metric": "fsk_demod_iq_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))


if __name__ == "__main__":
    main()
