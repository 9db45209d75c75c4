"""Production sharded station path: ``Station.process_captures`` on the
virtual 8-device mesh must produce the SAME telemetry as the per-block
single-device ``process_capture`` on a multi-sonde capture set
(round-3 verdict #1: the sharded program needs production callers, not
just a dryrun; reference runs all SDR tasks concurrently,
auto_rx/auto_rx.py:101-128)."""

import numpy as np
import jax
import pytest

from radiosonde_auto_rx_tpu.demod.modulate import gfsk_mod
from radiosonde_auto_rx_tpu.ops.channelizer import channel_freqs
from radiosonde_auto_rx_tpu.station.station import Station
from station_fixture import (dfm_bits as _dfm_bits,
                             m10_bits as _m10_bits,
                             m20_bits as _m20_bits,
                             rs41_bits as _rs41_bits, taper as _taper)

N_CHAN = 16
FS_WIDE = 768_000
T_WIDE = 3_072_000              # 4 s (DFM serial confirmation needs
                                # >= 3 full 1.12 s cycles)
CENTERS = (402.5e6, 403.3e6, 404.1e6)


class _Collect:
    def __init__(self):
        self.items = []

    def add(self, t):
        self.items.append(t)

    def close(self):
        pass


@pytest.fixture(scope="module")
def capture_set():
    """Three wideband blocks at three centers: RS41 | M20 + M10 | DFM."""
    rng = np.random.default_rng(11)
    freqs = channel_freqs(N_CHAN, FS_WIDE)
    wide = (rng.standard_normal((3, T_WIDE)) +
            1j * rng.standard_normal((3, T_WIDE))
            ).astype(np.complex64) * 0.002
    sigs = [(0, 5, gfsk_mod(_rs41_bits(rng), FS_WIDE, 4800, 2,
                            freqs[5], 4800, bt=0.5)),
            (1, 9, gfsk_mod(_m20_bits(rng), FS_WIDE, 9600, 2,
                            freqs[9], 9600, bt=1.0)),
            (1, 12, gfsk_mod(_m10_bits(rng), FS_WIDE, 9616, 2,
                             freqs[12], 10000, bt=1.0)),
            (2, 4, gfsk_mod(_dfm_bits(rng, n_cycles=3), FS_WIDE, 2500,
                            2, freqs[4], 5000, bt=0.5))]
    for b, _, sig in sigs:
        sig = _taper(sig[:T_WIDE])
        wide[b, :len(sig)] += sig
    return np.stack([wide.real, wide.imag], axis=1).astype(np.float32)


def _cfg():
    # huge time threshold: the fixture sondes encode fixed GPS epochs
    # (the M20/DFM builders), which the production time filter would
    # otherwise reject as stale — not the subject under test here
    return {"capture_rate": FS_WIDE, "num_channels": N_CHAN,
            "station_lat": 0.0, "station_lon": 0.0,
            "sonde_time_threshold": 1e9}


def _key(t):
    return (t["type"], t.get("id"), t.get("frame"),
            round(t["lat"], 4), round(t["lon"], 4),
            round(t.get("freq_float", 0.0), 4))


def test_process_captures_sharded_equals_single_device(capture_set):
    assert len(jax.devices()) >= 8, "needs the virtual 8-device mesh"

    # single-device reference: one block at a time, no mesh
    col1 = _Collect()
    st1 = Station({**_cfg(), "use_mesh": False}, exporters=[col1])
    assert st1.mesh is None
    ref = []
    for b in range(3):
        ref.extend(st1.process_capture(capture_set[b],
                                       center_freq_hz=CENTERS[b]))

    # production multi-chip path: one sharded program over the batch
    col8 = _Collect()
    st8 = Station(_cfg(), exporters=[col8])
    assert st8.mesh is not None and st8.mesh.shape["ch"] >= 2
    got = st8.process_captures(list(capture_set), list(CENTERS))

    assert ref, "single-device station produced no telemetry"
    types = {t["type"] for t in ref}
    assert {"RS41", "M20", "M10", "DFM"} <= types, types
    assert sorted(_key(t) for t in got) == sorted(_key(t) for t in ref)
    # exporters saw the same frames; task state converged identically
    assert sorted(_key(t) for t in col8.items) == \
        sorted(_key(t) for t in col1.items)
    assert set(st8.active) == set(st1.active)
    assert {st8.active[f]["type"] for f in st8.active} == \
        {st1.active[f]["type"] for f in st1.active}


def test_dispatch_collect_pipelined_equals_sync(capture_set):
    """Double-buffered driver semantics: dispatching batch N+1's device
    analysis BEFORE collecting batch N must not change telemetry or task
    state (round-3 verdict #7 — the production loop overlaps the device
    with host decode this way)."""
    st_a = Station(_cfg(), exporters=[])
    sync = []
    for b in range(3):
        sync.extend(st_a.process_captures([capture_set[b]],
                                          [CENTERS[b]]))

    st_b = Station(_cfg(), exporters=[])
    out = []
    pending = st_b.captures_dispatch([capture_set[0]], [CENTERS[0]])
    for b in (1, 2):
        nxt = st_b.captures_dispatch([capture_set[b]], [CENTERS[b]])
        out.extend(st_b.captures_collect(pending))
        pending = nxt
    out.extend(st_b.captures_collect(pending))

    assert sorted(map(_key, out)) == sorted(map(_key, sync))
    assert set(st_b.active) == set(st_a.active)


def test_process_captures_single_device_mesh(capture_set):
    """A 1-device mesh is the production single-chip program: same
    telemetry as the legacy per-block path."""
    from radiosonde_auto_rx_tpu.parallel.mesh import make_mesh
    col = _Collect()
    st = Station(_cfg(), exporters=[col],
                 mesh=make_mesh(n_ch=1, n_t=1,
                                devices=jax.devices()[:1]))
    got = st.process_captures(list(capture_set), list(CENTERS))
    st_ref = Station({**_cfg(), "use_mesh": False}, exporters=[])
    ref = []
    for b in range(3):
        ref.extend(st_ref.process_capture(capture_set[b],
                                          center_freq_hz=CENTERS[b]))
    assert sorted(map(_key, got)) == sorted(map(_key, ref))


def test_process_captures_no_mesh_fallback(capture_set):
    """Without a mesh, process_captures == sequential process_capture."""
    col = _Collect()
    st = Station({**_cfg(), "use_mesh": False}, exporters=[col])
    got = st.process_captures([capture_set[0]], [CENTERS[0]])
    assert any(t["type"] == "RS41" for t in got)
