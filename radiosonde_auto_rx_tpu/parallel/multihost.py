"""Multi-host (pod / DCN) initialization helpers.

The reference is strictly single-host (SURVEY §5: no distributed comm
backend; KA9Q's RTP multicast is the closest analogue).  Here scale-out
is the standard JAX recipe: one process per host, ``jax.distributed``
over DCN, one global mesh whose ``ch`` axis spans hosts — channel batches
are data-parallel so cross-host traffic is only the collectives the
sharded program asks for (halo ppermutes ride ICI within a slice; the
``ch`` axis never communicates in steady state).

Typical use on each host::

    from radiosonde_auto_rx_tpu.parallel import multihost
    multihost.initialize()                  # env-driven (TPU pods: no args)
    mesh = multihost.global_mesh(n_t=2)     # (ch, t) over ALL devices
    step = make_station_step(cfg, mesh, ...)

Telemetry fan-in stays host-local: each host runs its own exporters for
the channels it feeds (the reference's exporter model, auto_rx.py:948+),
or forwards dicts to one aggregator over the network (ozimux/UDP or
sondehub both already handle multi-station input).
"""

import logging

import jax

from radiosonde_auto_rx_tpu.parallel.mesh import make_mesh

log = logging.getLogger("multihost")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize with TPU-pod env autodetection.

    On Cloud TPU pods all arguments come from the environment; on other
    fabrics pass coordinator/num_processes/process_id explicitly.  Safe
    to call when already initialized (no-op) or single-process (no-op
    when no coordinator can be inferred).

    NOTE: must run before ANY other jax call — even
    ``jax.process_count()`` initializes the local backend, after which
    ``jax.distributed.initialize`` unconditionally raises (round-4
    review: an earlier already-initialized guard built on process_count
    made this function a guaranteed silent no-op)."""
    if getattr(jax.distributed, "is_initialized", None) is not None:
        if jax.distributed.is_initialized():
            return
    else:  # older jax: inspect internal state (makes no jax call)
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        log.info("distributed: process %d/%d, %d local + %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None:
            raise
        log.warning("multihost: running single-process (%s)", e)


def global_mesh(n_t: int = 1):
    """(ch, t) mesh over every device of every process.

    The ``ch`` axis spans hosts (pure DP — no steady-state cross-host
    traffic); keep ``n_t`` within one host's devices so halo ppermutes
    stay on ICI."""
    return make_mesh(n_t=n_t, devices=jax.devices())


def local_channel_slice(n_channels: int):
    """Which global channels this process feeds: the contiguous block
    matching its position on the mesh's ch axis."""
    per = n_channels // jax.process_count()
    lo = jax.process_index() * per
    hi = lo + per if jax.process_index() < jax.process_count() - 1 \
        else n_channels
    return lo, hi
