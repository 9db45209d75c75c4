"""PER-vs-Eb/N0 harness: cliff position sanity + CSV CLI."""

import io

import pytest

from radiosonde_auto_rx_tpu.tools import per_harness


def test_rs41_per_cliff():
    """RS41 chain: clean at 12 dB, dead at 2 dB (the reference's chains
    fall over in the 10-16 dB generation range, test/README.md:35 —
    ours must hold the high side and fail the deep-noise side)."""
    hi = per_harness.run_point("RS41", 12.0, n_frames=5)
    lo = per_harness.run_point("RS41", 2.0, n_frames=5)
    assert hi["frames_rx"] >= 4, hi
    assert lo["frames_rx"] == 0, lo


def test_m10_per_cliff():
    hi = per_harness.run_point("M10", 16.0, n_frames=5)
    lo = per_harness.run_point("M10", 2.0, n_frames=5)
    assert hi["frames_rx"] >= 3, hi
    assert lo["frames_rx"] == 0, lo


def test_sweep_csv_cli(tmp_path):
    out = tmp_path / "per.csv"
    rc = per_harness.main(["--type", "RS41", "--ebno", "2:12:10",
                           "--frames", "3", "-o", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("type,ebno_db")
    assert len(lines) == 3          # header + 2 points
    assert lines[1].startswith("RS41,2.0,3,")


def test_lms6_per_cliff():
    """Viterbi+RS chain: decodes at 16 dB, dead in deep noise."""
    hi = per_harness.run_point("LMS6", 16.0, n_frames=4)
    lo = per_harness.run_point("LMS6", 0.0, n_frames=4)
    assert hi["frames_rx"] >= 3, hi
    assert lo["frames_rx"] == 0, lo
