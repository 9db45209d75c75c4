"""Live-SDR-path integration tests with stub SDR binaries on PATH.

The reference regression-tests its *production* rtl_fm chain without
hardware by building a hacked stdin-reading rtl_fm (reference
auto_rx/test/README.md:13-22, test_demod.py:426-441).  The TPU analogue:
stub ``rtl_fm`` / ``rtl_sdr`` executables that synthesize an RS41 burst
at the commanded capture rate, so the real subprocess capture path —
command build (sources/sdr_wrappers.py) → Popen → pumped pipe → cs16
wire conversion → prefetch queue → band-plan retune restart
(station/main.py BlockSource) — is exercised end-to-end down to decoded
telemetry, with zero hardware.
"""

import datetime
import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from radiosonde_auto_rx_tpu.station import Station
from radiosonde_auto_rx_tpu.station.main import BlockSource

FS_WIDE = 480_000
N_CHAN = 10
CENTER1 = 402.5e6
CENTER2 = 403.0e6


class _Args:
    replay = None
    replay_format = "cs16"
    center = CENTER1 / 1e6
    block_seconds = 2.0


class _Collect:
    def __init__(self):
        self.items = []

    def add(self, t):
        self.items.append(t)

    def close(self):
        pass


def _station():
    cfg = {"capture_rate": FS_WIDE, "num_channels": N_CHAN,
           "station_lat": 0.0, "station_lon": 0.0}
    col = _Collect()
    return Station(cfg, exporters=[col], center_freq_hz=CENTER1), col


def _rs41_burst(offset_hz):
    """~1.8 s RS41 GFSK burst at ``offset_hz`` from capture center,
    complex64 at FS_WIDE (same fixture recipe as test_station_full_cycle)."""
    from radiosonde_auto_rx_tpu.demod.modulate import gfsk_mod
    from radiosonde_auto_rx_tpu.models.rs41 import (
        encode_frame, frame_to_bits, make_calibytes)

    rng = np.random.default_rng(11)
    now = datetime.datetime.now(datetime.timezone.utc)
    week = (now - datetime.datetime(1980, 1, 6,
                                    tzinfo=datetime.timezone.utc)).days // 7
    dow = (now.weekday() + 1) % 7
    tow_ms = ((dow * 24 + now.hour) * 3600 + now.minute * 60 +
              now.second) * 1000
    cal = make_calibytes()
    tx_bits = np.concatenate(
        [rng.integers(0, 2, 400)] +
        [frame_to_bits(encode_frame(
            frame_nb=700 + i, sonde_id="L2468013", week=week,
            tow_ms=tow_ms + i * 1000, lat=-35.1, lon=139.2, alt=8000.0,
            calibytes=cal, calfr=i)) for i in range(3)] +
        [rng.integers(0, 2, 400)])
    return gfsk_mod(tx_bits, FS_WIDE, 4800, 2, offset_hz, 4800,
                    bt=0.5).astype(np.complex64)


def _install_stubs(tmp_path, burst_path, monkeypatch):
    """Write fake rtl_fm / rtl_sdr executables into tmp_path and prepend
    it to PATH.  The fake rtl_fm logs its commanded (-f, -s) to
    RSX_FAKE_LOG, then emits one capture block of cs16: background noise
    plus the prepared burst."""
    stub = textwrap.dedent(f"""\
        #!{sys.executable}
        import os, sys
        import numpy as np
        args = sys.argv[1:]
        center = fs = 0
        dev = "0"
        for i, a in enumerate(args):
            if a == "-f":
                center = int(args[i + 1])
            if a == "-s":
                fs = int(args[i + 1])
            if a == "-d":
                dev = args[i + 1]
        if not center or not fs:
            # fail fast if get_sdr_iq_cmd's flag spelling drifts from the
            # '-f <int> -s <int>' form this stub parses
            sys.stderr.write(f"stub rtl_fm: could not parse -f/-s "
                             f"from {{args!r}}\\n")
            raise SystemExit(2)
        with open(os.environ["RSX_FAKE_LOG"], "a") as f:
            f.write(f"{{center}} {{fs}} {{dev}}\\n")
        base = os.environ["RSX_FAKE_BURST"]
        # per-center burst override (multi-source tests): burst.npy.<center>
        per = f"{{base}}.{{center}}.npy"
        x = np.load(per if os.path.exists(per) else base)
        rng = np.random.default_rng(0)
        T = int(fs * 2.2)
        buf = (rng.standard_normal(T) +
               1j * rng.standard_normal(T)).astype(np.complex64) * 0.002
        buf[4096:4096 + len(x)] += x
        i16 = np.empty(2 * T, np.int16)
        i16[0::2] = np.clip(buf.real * 16384, -32767, 32767).astype(np.int16)
        i16[1::2] = np.clip(buf.imag * 16384, -32767, 32767).astype(np.int16)
        sys.stdout.buffer.write(i16.tobytes())
        sys.stdout.buffer.flush()
        """)
    fm = tmp_path / "rtl_fm"
    fm.write_text(stub)
    fm.chmod(fm.stat().st_mode | stat.S_IEXEC)

    sdr_ok = tmp_path / "rtl_sdr"
    sdr_ok.write_text(f"#!{sys.executable}\nraise SystemExit(0)\n")
    sdr_ok.chmod(sdr_ok.stat().st_mode | stat.S_IEXEC)

    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}"
                       f"{os.environ.get('PATH', '')}")
    monkeypatch.setenv("RSX_FAKE_LOG", str(tmp_path / "tune.log"))
    monkeypatch.setenv("RSX_FAKE_BURST", str(burst_path))
    return tmp_path / "tune.log"


def test_sdr_health_check_with_stub(tmp_path, monkeypatch):
    from radiosonde_auto_rx_tpu.sources.sdr_wrappers import test_sdr
    burst = tmp_path / "burst.npy"
    np.save(burst, np.zeros(8, np.complex64))
    _install_stubs(tmp_path, burst, monkeypatch)
    assert test_sdr("RTLSDR", rtl_device_idx="0") is True
    # a failing SDR (nonzero exit) must be reported unusable
    bad = tmp_path / "rtl_sdr"
    bad.write_text(f"#!{sys.executable}\nraise SystemExit(1)\n")
    assert test_sdr("RTLSDR", rtl_device_idx="0") is False


def test_subprocess_capture_to_telemetry(tmp_path, monkeypatch):
    """Full production capture path: stub rtl_fm subprocess → pumped
    cs16 pipe → BlockSource prefetch → Station decode → telemetry."""
    st, col = _station()
    burst = tmp_path / "burst.npy"
    np.save(burst, _rs41_burst(float(st.freqs[7])))
    tune_log = _install_stubs(tmp_path, burst, monkeypatch)

    cfg = {"capture_rate": FS_WIDE, "sdr_type": "RTLSDR",
           "sdr_hostname": "", "sdr_port": 5555}
    src = BlockSource(cfg, _Args(), center_hz=CENTER1)
    try:
        center, block = src.read_block()
        assert center == CENTER1
        assert block is not None and block.shape[0] == 2
        assert block.shape[1] == int(FS_WIDE * _Args.block_seconds)
        # native-width wire planes: cs16 ships as int16; the 1/32768
        # scale happens on-device in Station._wide_planes
        assert block.dtype == np.int16

        telems = st.process_capture(block)
        assert telems, "no telemetry decoded via the subprocess path"
        t = telems[-1]
        assert t["id"] == "L2468013"
        assert abs(t["lat"] + 35.1) < 1e-4
        assert abs(t["freq_float"] -
                   (CENTER1 + float(st.freqs[7])) / 1e6) < 1e-6
        assert col.items
    finally:
        src.close()
    # the capture command was built for the requested center/rate
    lines = tune_log.read_text().split()
    assert lines[0] == str(int(CENTER1)) and lines[1] == str(FS_WIDE)


def _rs41_burst_id(offset_hz, sonde_id, seed):
    from radiosonde_auto_rx_tpu.demod.modulate import gfsk_mod
    from radiosonde_auto_rx_tpu.models.rs41 import (
        encode_frame, frame_to_bits, make_calibytes)
    rng = np.random.default_rng(seed)
    now = datetime.datetime.now(datetime.timezone.utc)
    week = (now - datetime.datetime(1980, 1, 6,
                                    tzinfo=datetime.timezone.utc)).days // 7
    dow = (now.weekday() + 1) % 7
    tow_ms = ((dow * 24 + now.hour) * 3600 + now.minute * 60 +
              now.second) * 1000
    cal = make_calibytes()
    tx_bits = np.concatenate(
        [rng.integers(0, 2, 400)] +
        [frame_to_bits(encode_frame(
            frame_nb=700 + i, sonde_id=sonde_id, week=week,
            tow_ms=tow_ms + i * 1000, lat=-35.1, lon=139.2, alt=8000.0,
            calibytes=cal, calfr=i)) for i in range(3)] +
        [rng.integers(0, 2, 400)])
    return gfsk_mod(tx_bits, FS_WIDE, 4800, 2, offset_hz, 4800,
                    bt=0.5).astype(np.complex64)


def test_two_sources_concurrent_no_hop_loss(tmp_path, monkeypatch):
    """Two [sdr_N] sources pinned to two band-plan segments decode two
    sondes simultaneously (reference runs N SDRs at once,
    auto_rx.py:101-128); with sources == segments the scheduler never
    hops, so neither sonde loses a single block to the other's band."""
    from radiosonde_auto_rx_tpu.station.bandplan import (
        BandPlan, BandScheduler, partition_segments)

    cfg = {"capture_rate": FS_WIDE, "num_channels": N_CHAN,
           "station_lat": 0.0, "station_lon": 0.0,
           "min_freq": 402.3, "max_freq": 403.1, "sdr_quantity": 2,
           "sdr_type": "RTLSDR", "sdr_hostname": "", "sdr_port": 5555}
    plan = BandPlan(cfg)
    assert len(plan.segments) == 2
    parts = partition_segments(plan, 2)
    assert [len(p) for p in parts] == [1, 1]
    # sources == segments: no scheduler needed, nothing ever time-slices
    scheds = [BandScheduler(plan, segments=p) if len(p) > 1 else None
              for p in parts]
    assert scheds == [None, None]

    col = _Collect()
    st = Station(cfg, exporters=[col],
                 center_freq_hz=parts[0][0].center_hz)
    c_a, c_b = parts[0][0].center_hz, parts[1][0].center_hz
    burst = tmp_path / "burst.npy"
    np.save(burst, np.zeros(8, np.complex64))      # base (unused)
    np.save(tmp_path / f"burst.npy.{int(c_a)}.npy",
            _rs41_burst_id(float(st.freqs[7]), "C1234567", 21))
    np.save(tmp_path / f"burst.npy.{int(c_b)}.npy",
            _rs41_burst_id(float(st.freqs[3]), "D2345678", 22))
    tune_log = _install_stubs(tmp_path, burst, monkeypatch)

    srcs = [BlockSource(cfg, _Args(), center_hz=c,
                        sdr_settings={"rtl_device_idx": str(i)},
                        name=f"sdr_{i + 1}")
            for i, c in enumerate((c_a, c_b))]
    try:
        ids = set()
        for i, src in enumerate(srcs):
            center, block = src.read_block()
            assert center == (c_a, c_b)[i]
            assert block is not None
            telems = st.process_capture(block, center_freq_hz=center)
            assert telems, f"source {i + 1} decoded nothing"
            ids.update(t["id"] for t in telems)
        assert ids == {"C1234567", "D2345678"}
        # each sonde's reported frequency sits in its own segment
        freqs = sorted(t["freq_float"] for t in col.items)
        assert abs(freqs[0] * 1e6 - (c_a + float(st.freqs[7]))) < 1e3 or \
            abs(freqs[0] * 1e6 - (c_b + float(st.freqs[3]))) < 1e3
        # every capture command tuned its own pinned center — no hops
        runs = [line.split() for line in
                tune_log.read_text().strip().splitlines()]
        centers = sorted(int(r[0]) for r in runs)
        assert centers == sorted([int(c_a), int(c_b)])
        # per-source [sdr_N] device indices reached the capture commands
        assert {r[2] for r in runs} == {"0", "1"}
    finally:
        for s in srcs:
            s.close()


def test_partition_segments_lband_isolated():
    """More segments than sources: time-slicing only within a source's
    subset; an L-band range gets its own dedicated source."""
    from radiosonde_auto_rx_tpu.station.bandplan import (
        BandPlan, partition_segments)
    cfg = {"capture_rate": FS_WIDE, "min_freq": 400.1, "max_freq": 403.0,
           "min_freq2": 1676.0, "max_freq2": 1684.0}
    plan = BandPlan(cfg)
    n_uhf = sum(1 for s in plan.segments if not s.lband)
    n_l = sum(1 for s in plan.segments if s.lband)
    assert n_uhf >= 2 and n_l >= 1
    parts = partition_segments(plan, 2)
    # L-band isolated on the last source; UHF segments (time-sliced
    # beyond the source count) all on the first
    assert all(s.lband for s in parts[1])
    assert all(not s.lband for s in parts[0])
    assert len(parts[0]) == n_uhf


def test_retune_restarts_capture_process(tmp_path, monkeypatch):
    """Band-plan hop: retune() must kill the old capture process, start a
    new one on the new center, and never attribute old-center blocks to
    the new center."""
    st, _ = _station()
    burst = tmp_path / "burst.npy"
    np.save(burst, _rs41_burst(float(st.freqs[7])))
    tune_log = _install_stubs(tmp_path, burst, monkeypatch)

    cfg = {"capture_rate": FS_WIDE, "sdr_type": "RTLSDR",
           "sdr_hostname": "", "sdr_port": 5555}
    src = BlockSource(cfg, _Args(), center_hz=CENTER1)
    try:
        c1, b1 = src.read_block()
        assert c1 == CENTER1 and b1 is not None
        src.retune(CENTER2)
        c2, b2 = src.read_block()
        assert c2 == CENTER2 and b2 is not None

        # both commanded centers hit the (stub) hardware, in order
        runs = [line.split() for line in
                tune_log.read_text().strip().splitlines()]
        centers = [int(r[0]) for r in runs]
        assert int(CENTER1) in centers and int(CENTER2) in centers
        assert centers.index(int(CENTER1)) < centers.index(int(CENTER2))

        # decode still works on the post-hop capture, reported at the
        # new center (the stub transmits at the same channel offset)
        telems = st.process_capture(b2, center_freq_hz=CENTER2)
        assert telems
        assert abs(telems[-1]["freq_float"] -
                   (CENTER2 + float(st.freqs[7])) / 1e6) < 1e-6
    finally:
        src.close()


def _install_paced_stub(tmp_path, monkeypatch, block_s, n_blocks,
                        pace=1.25):
    """A pacing rtl_fm stub: emits ``n_blocks`` counter-marked cs16
    blocks at ``pace``x real time, then exits.  Block b's first three
    I samples carry (magic, counter, device-index) so the consumer can
    prove zero sample loss through pipe -> wire conversion -> prefetch
    queue under sustained concurrent load."""
    stub = textwrap.dedent(f"""\
        #!{sys.executable}
        import os, sys, time
        import numpy as np
        args = sys.argv[1:]
        fs = 0
        dev = "0"
        for i, a in enumerate(args):
            if a == "-s":
                fs = int(args[i + 1])
            if a == "-d":
                dev = args[i + 1]
        block_s = float(os.environ["RSX_PACE_BLOCK_S"])
        n_blocks = int(os.environ["RSX_PACE_NBLOCKS"])
        T = int(fs * block_s)
        rng = np.random.default_rng(int(dev))
        out = sys.stdout.buffer
        for c in range(n_blocks):
            i16 = (rng.standard_normal(2 * T) * 64).astype(np.int16)
            i16[0] = 12345            # I[0]: magic
            i16[2] = c                # I[1]: block counter
            i16[4] = int(dev)         # I[2]: source identity
            try:
                out.write(i16.tobytes())
                out.flush()
            except BrokenPipeError:
                raise SystemExit(0)
            time.sleep(block_s / {pace})
        """)
    fm = tmp_path / "rtl_fm"
    fm.write_text(stub)
    fm.chmod(fm.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}"
                       f"{os.environ.get('PATH', '')}")
    monkeypatch.setenv("RSX_PACE_BLOCK_S", str(block_s))
    monkeypatch.setenv("RSX_PACE_NBLOCKS", str(n_blocks))


def test_sustained_multi_source_no_sample_loss(tmp_path, monkeypatch):
    """Round-3 verdict #6: three concurrent paced sources for >= 20
    block periods.  The round-robin drain (run_station's read pattern)
    must see every block counter consecutively — zero prefetch-queue
    drops or sample gaps — while keeping up with the paced real-time
    rate, and the measured headroom is reported."""
    import time

    block_s = 0.2
    n_blocks = 22
    n_src = 3
    _install_paced_stub(tmp_path, monkeypatch, block_s, n_blocks)

    class _PArgs(_Args):
        block_seconds = block_s

    cfg = {"capture_rate": FS_WIDE, "num_channels": N_CHAN,
           "sdr_type": "RTLSDR", "sdr_hostname": "", "sdr_port": 5555}
    srcs = [BlockSource(cfg, _PArgs(), center_hz=CENTER1,
                        sdr_settings={"rtl_device_idx": str(i)},
                        name=f"sdr_{i + 1}")
            for i in range(n_src)]
    seen = [[] for _ in range(n_src)]
    t0 = time.perf_counter()
    try:
        done = [False] * n_src
        while not all(done):
            for i, src in enumerate(srcs):
                if done[i]:
                    continue
                _, block = src.read_block()
                if block is None:
                    done[i] = True
                    continue
                # blocks ship as raw int16 wire planes now
                hdr = np.asarray(block[0, :3], np.float64)
                assert round(float(hdr[0])) == 12345, \
                    f"src {i}: block not marker-aligned ({hdr})"
                assert round(float(hdr[2])) == i
                seen[i].append(round(float(hdr[1])))
                # a light host budget per block (~15% of the period x 3
                # sources = 45% duty) — the drain must still keep up
                time.sleep(block_s * 0.15)
    finally:
        wall = time.perf_counter() - t0
        for s in srcs:
            s.close()
    # zero gaps: every counter, in order, from every source
    for i in range(n_src):
        assert seen[i] == list(range(n_blocks)), \
            f"src {i} lost blocks: {seen[i]}"
    # sustained real time: sources paced at 1.25x RT finish n_blocks in
    # n_blocks * block_s / 1.25 ~= 3.5 s.  The budget allows 2x for CI
    # load (parallel suites share these cores) — it gates structural
    # stalls (a blocked queue, serialized captures), not scheduler noise
    budget = 2 * n_blocks * block_s / 1.25 + 1.5
    assert wall < budget, f"drain fell behind real time: {wall:.2f}s " \
                          f"for a {budget:.2f}s budget"
    headroom = (n_src * n_blocks * block_s) / wall
    print(f"sustained drain headroom: {headroom:.2f}x real time "
          f"({n_src} sources, {n_blocks} blocks, wall {wall:.2f}s)")
    assert headroom > 1.0


def test_ka9q_source_tunes_channel_before_streaming(tmp_path, monkeypatch):
    """KA9Q capture must CREATE its radiod channel (`tune`) before
    pcmrecord subscribes to the SSRC, and re-tune on every retune
    (round-4 review: the setup call had no production caller, so
    pcmrecord streamed a nonexistent channel).  Stub `tune` logs its
    argv; stub `pcmrecord` emits the cs16 burst."""
    st, col = _station()
    burst = tmp_path / "burst.npy"
    np.save(burst, _rs41_burst(float(st.freqs[7])))
    tune_log = _install_stubs(tmp_path, burst, monkeypatch)

    tune = tmp_path / "tune"
    tune.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import os, sys
        with open(os.environ["RSX_FAKE_LOG"] + ".tune", "a") as f:
            f.write(" ".join(sys.argv[1:]) + "\\n")
        """))
    tune.chmod(tune.stat().st_mode | stat.S_IEXEC)
    pcm = tmp_path / "pcmrecord"
    pcm.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import os, sys
        import numpy as np
        x = np.load(os.environ["RSX_FAKE_BURST"])
        fs = {FS_WIDE}
        rng = np.random.default_rng(0)
        T = int(fs * 2.2)
        buf = (rng.standard_normal(T) +
               1j * rng.standard_normal(T)).astype(np.complex64) * 0.002
        buf[4096:4096 + len(x)] += x
        i16 = np.empty(2 * T, np.int16)
        i16[0::2] = np.clip(buf.real * 16384, -32767, 32767).astype(np.int16)
        i16[1::2] = np.clip(buf.imag * 16384, -32767, 32767).astype(np.int16)
        sys.stdout.buffer.write(i16.tobytes())
        sys.stdout.buffer.flush()
        """))
    pcm.chmod(pcm.stat().st_mode | stat.S_IEXEC)

    cfg = {"capture_rate": FS_WIDE, "sdr_type": "KA9Q",
           "sdr_hostname": "radiod.test.local"}
    src = BlockSource(cfg, _Args(), center_hz=CENTER1)
    try:
        center, block = src.read_block()
        assert block is not None and center == CENTER1
        # the channel-create happened, with the right freq + ssrc + host
        tlog = (tune_log.parent / (tune_log.name + ".tune")).read_text()
        lines = tlog.strip().splitlines()
        assert len(lines) == 1
        assert f"--frequency {int(CENTER1)}" in lines[0]
        assert "--radio radiod.test.local" in lines[0]
        assert "--mode iq" in lines[0]
        # retune RELEASES the old channel (radiod would otherwise keep
        # streaming the old SSRC forever) then creates the new one
        src.retune(CENTER2)
        center2, block2 = src.read_block()
        lines = (tune_log.parent / (tune_log.name + ".tune")
                 ).read_text().strip().splitlines()
        assert len(lines) == 3
        assert "--frequency 0" in lines[1]          # close old SSRC
        assert f"--frequency {int(CENTER2)}" in lines[2]
        # and the stream decodes through the station like any source
        telems = st.process_capture(block)
        assert any(t.get("id") == "L2468013" for t in telems)
    finally:
        src.close()
