"""PER-vs-Eb/N0 regression harness.

The reference's ground truth is *decoded packet counts versus calibrated
Eb/N0*, not unit assertions (reference auto_rx/test/generate_lowsnr.py:
AWGN calibrated per baud rate, 5-20 dB in 0.5 dB steps; test_demod.py:
chain -> packet count CSV).  This module is that harness without the
recorded-capture dependency: frames come from the model encoders, the
modulator is the same GFSK synth the e2e tests use, and the chain under
test is the production demod + decoder pair.

CLI::

    python -m radiosonde_auto_rx_tpu.tools.per_harness \
        --type RS41 --ebno 6:14:1 --frames 10 -o results.csv

Output CSV: ``type,ebno_db,frames_tx,frames_rx,per,runtime_s`` — the
same quantities the reference logs per file (test_demod.py:751-828).
"""

import argparse
import sys
import time

import numpy as np

from radiosonde_auto_rx_tpu.demod import FSKConfig, fsk_demod_stream
from radiosonde_auto_rx_tpu.demod.modulate import add_awgn, gfsk_mod


def _rs41_case(n_frames, rng):
    import datetime
    from radiosonde_auto_rx_tpu.models.rs41 import (RS41Decoder,
                                                    encode_frame,
                                                    frame_to_bits,
                                                    make_calibytes)
    now = datetime.datetime.now(datetime.timezone.utc)
    week = (now - datetime.datetime(1980, 1, 6,
                                    tzinfo=datetime.timezone.utc)).days // 7
    dow = (now.weekday() + 1) % 7
    tow = ((dow * 24 + now.hour) * 3600 + now.minute * 60 +
           now.second) * 1000
    cal = make_calibytes()
    bits = np.concatenate([frame_to_bits(encode_frame(
        frame_nb=100 + i, sonde_id="P1234567", week=week,
        tow_ms=tow + i * 1000, lat=47.5, lon=15.2, alt=12000.0,
        calibytes=cal, calfr=i % 51)) for i in range(n_frames)])
    cfg = FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=300,
                    est_min=-5000, est_max=5000, tone_spacing=5000,
                    freq_est_type=1)
    dec = RS41Decoder()
    return bits, 48000, 4800, 4800, cfg, \
        lambda b, s: dec.decode_bits(b), 0.5


def _dfm_case(n_frames, rng):
    from radiosonde_auto_rx_tpu.models.dfm import DFMDecoder, \
        encode_flight_bits
    bits = encode_flight_bits(sn=21098765, lat=48.1, lon=11.5,
                              n_cycles=n_frames)
    cfg = FSKConfig(fs=50000, rs=2500, m=2, p=10, nsym=125,
                    est_min=-5000, est_max=5000)
    dec = DFMDecoder()
    return bits, 50000, 2500, 5000, cfg, \
        lambda b, s: dec.decode_bits(b, None if s is None else -s), 0.5


def _m10_case(n_frames, rng):
    import datetime
    from radiosonde_auto_rx_tpu.models.m10 import (M10Decoder,
                                                   encode_frame_m10,
                                                   frame_to_raw_bits)
    now = datetime.datetime.now(datetime.timezone.utc)
    week = (now - datetime.datetime(1980, 1, 6,
                                    tzinfo=datetime.timezone.utc)).days // 7
    dow = (now.weekday() + 1) % 7
    tow = ((dow * 24 + now.hour) * 3600 + now.minute * 60 +
           now.second) * 1000
    bits = np.concatenate([frame_to_raw_bits(encode_frame_m10(
        week=week, tow_ms=tow + i * 1000, lat=48.2, lon=16.4,
        alt=11000.0)) for i in range(n_frames)])
    cfg = FSKConfig(fs=48080, rs=9616, m=2, p=5, nsym=240,
                    est_min=-10000, est_max=10000)
    dec = M10Decoder()
    return bits, 48080, 9616, 10000, cfg, \
        lambda b, s: dec.decode_bits(b, None if s is None else -s), 1.0


def _lms6_case(n_frames, rng):
    from radiosonde_auto_rx_tpu.models.lms6 import (LMS6Decoder,
                                                    blocks_to_raw_bits,
                                                    encode_block,
                                                    encode_frame)
    frames = [encode_frame(frnr=100 + i, tow_ms=210600500 + i * 1000,
                           fill_seed=i) for i in range(n_frames)]
    bits = blocks_to_raw_bits([encode_block(f) for f in frames])
    cfg = FSKConfig(fs=48000, rs=4800, m=2, p=5, nsym=300,
                    est_min=-10000, est_max=10000)
    dec = LMS6Decoder()
    return bits, 48000, 4800, 4800, cfg, \
        lambda b, s: dec.decode_bits(b, None if s is None else -s), 1.0


def _meisei_case(n_frames, rng):
    from radiosonde_auto_rx_tpu.models.meisei import (
        MeiseiDecoder, encode_subframes_ims100, frames_to_raw_bits)
    frames = [encode_subframes_ims100(16 + i, sn=2304123.0, lat=36.1,
                                      lon=140.08, alt=9000.0)
              for i in range(n_frames)]
    bits = frames_to_raw_bits(frames)
    cfg = FSKConfig(fs=48000, rs=2400, m=2, p=5, nsym=300,
                    est_min=-10000, est_max=10000)
    dec = MeiseiDecoder(ref_year=2023)
    return bits, 48000, 2400, 3600, cfg, \
        lambda b, s: dec.decode_bits(b), 1.0


CASES = {"RS41": _rs41_case, "DFM": _dfm_case, "M10": _m10_case,
         "LMS6": _lms6_case, "MEISEI": _meisei_case}


def run_point(sonde_type: str, ebno_db: float, n_frames: int = 10,
              seed: int = 0):
    """One PER measurement.  Returns dict(type, ebno_db, frames_tx,
    frames_rx, per, runtime_s)."""
    rng = np.random.default_rng(seed)
    tx_bits, fs, rs, spacing, cfg, decode, bt = CASES[sonde_type](
        n_frames, rng)
    idle = np.tile(np.array([1, 0], np.uint8), 300)
    # generous tail so the demod's clipped nmem+block tail never cuts
    # the last frame
    tail = np.tile(np.array([1, 0], np.uint8), 700)
    tx = np.concatenate([idle, tx_bits, tail])
    iq = add_awgn(gfsk_mod(tx, fs, rs, 2, 0.0, spacing, bt=bt),
                  ebno_db, fs, rs, rng=rng)
    t0 = time.perf_counter()
    import jax.numpy as jnp
    soft, bits, stats, _ = fsk_demod_stream(cfg, jnp.asarray(iq))
    telems = decode(np.asarray(bits), np.asarray(soft))
    dt = time.perf_counter() - t0
    # count unique decoded frames (duplicate suppression differs by type)
    seen = {(t.get("frame"), t.get("id")) for t in telems}
    n_rx = min(len(seen), n_frames)
    return dict(type=sonde_type, ebno_db=ebno_db, frames_tx=n_frames,
                frames_rx=n_rx, per=1.0 - n_rx / n_frames,
                runtime_s=round(dt, 3))


def sweep(sonde_type: str, ebnos, n_frames: int = 10, seed: int = 0,
          out=None):
    rows = []
    for e in ebnos:
        r = run_point(sonde_type, float(e), n_frames, seed)
        rows.append(r)
        line = "%(type)s,%(ebno_db).1f,%(frames_tx)d,%(frames_rx)d," \
               "%(per).3f,%(runtime_s).3f" % r
        print(line, file=out or sys.stdout, flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default="RS41", choices=sorted(CASES))
    ap.add_argument("--ebno", default="5:20:0.5",
                    help="start:stop:step dB (reference range 5-20/0.5)")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)
    a, b, s = (float(v) for v in args.ebno.split(":"))
    ebnos = np.arange(a, b + s / 2, s)
    out = open(args.output, "w") if args.output else None
    print("type,ebno_db,frames_tx,frames_rx,per,runtime_s",
          file=out or sys.stdout)
    sweep(args.type, ebnos, args.frames, args.seed, out)
    if out:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
