"""Worker for the real multi-process mesh test (run as a subprocess).

Usage: python multiproc_worker.py <coordinator> <nproc> <pid> <outdir>

Each process owns 4 virtual CPU devices; the global (ch, t) mesh spans
all processes.  Runs make_station_step over a globally-sharded IQ tensor
and writes this process's addressable output shards to <outdir>/out_<pid>
so the parent can compare against a single-process reference
(SURVEY §4.7: multi-host tests via jax multi-process simulation).
"""

import os
import sys


def main():
    coordinator, nproc, pid, outdir = sys.argv[1:5]
    nproc, pid = int(nproc), int(pid)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from radiosonde_auto_rx_tpu.demod.fsk import FSKConfig
    from radiosonde_auto_rx_tpu.ops.fir import design_lowpass
    from radiosonde_auto_rx_tpu.parallel.mesh import make_mesh
    from radiosonde_auto_rx_tpu.parallel.pipeline import make_station_step

    cfg = FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=50,
                    est_min=-5000, est_max=5000, tone_spacing=5000,
                    freq_est_type=1)
    n_dev = 4 * nproc
    mesh = make_mesh(n_ch=n_dev, n_t=1)          # global mesh, pure ch DP

    C, T = n_dev * 2, 24000
    rng = np.random.default_rng(0)               # same data on every proc
    bits = rng.integers(0, 2, (C, T // 10 + 2))
    sym = np.repeat(bits, 10, axis=1)[:, :T]
    f = np.where(sym == 0, -2500, 2500).astype(np.float64)
    ph = 2 * np.pi * np.cumsum(f, axis=1) / 48000
    iq = np.exp(1j * ph).astype(np.complex64)
    iq += (rng.standard_normal(iq.shape)
           + 1j * rng.standard_normal(iq.shape)).astype(np.complex64) * 0.05
    x_np = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)

    sharding = NamedSharding(mesh, P("ch", None, "t"))
    x = jax.make_array_from_callback(
        x_np.shape, sharding, lambda idx: x_np[idx])

    step = make_station_step(cfg, mesh,
                             if_taps=design_lowpass(0.2, 25))
    soft, bits_out = step(x)
    jax.block_until_ready(bits_out)

    # save this process's addressable shards, keyed by global channel
    shards = {}
    for s in bits_out.addressable_shards:
        ch0 = s.index[0].start or 0
        shards[int(ch0)] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"out_{pid}.npz"),
             **{str(k): v for k, v in shards.items()})
    print(f"worker {pid}: wrote {len(shards)} shards", flush=True)


if __name__ == "__main__":
    main()
