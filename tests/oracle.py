"""Reference-decoder oracle: builds the C binaries from /root/reference into
/tmp/refbuild for bit-exactness tests.  The reference tree is read-only and
is never copied into this repo — only compiled out-of-tree as a test oracle.
Tests that use it skip when the reference or a compiler is unavailable.
"""

import json
import os
import shutil
import subprocess

REF = "/root/reference"
BUILD = "/tmp/refbuild"

_OCTAVE_STUB = """#ifndef OCTAVE_H
#define OCTAVE_H
#include <stdio.h>
static inline void octave_save_complex(FILE*f,char*n,void*c,int r,int co,int cc){}
static inline void octave_save_float(FILE*f,char*n,float*c,int r,int co,int cc){}
static inline void octave_save_int(FILE*f,char*n,int*c,int r,int co){}
#endif
"""


def available() -> bool:
    return os.path.isdir(REF) and shutil.which("gcc") is not None


def binary(name: str) -> str | None:
    """Path to an oracle binary, building on first use. None if unavailable."""
    if not available():
        return None
    path = os.path.join(BUILD, name)
    if os.path.exists(path):
        return path
    os.makedirs(BUILD, exist_ok=True)
    try:
        _build(name)
    except subprocess.CalledProcessError:
        return None
    return path if os.path.exists(path) else None


def _sh(cmd):
    subprocess.run(cmd, shell=True, cwd=BUILD, check=True,
                   capture_output=True)


def _build(name: str):
    _sh(f"cp {REF}/demod/mod/*.c {REF}/demod/mod/*.h {REF}/utils/*.h "
        f"{REF}/utils/fsk.c {REF}/utils/kiss_fft.c {REF}/utils/kiss_fftr.c "
        f"{REF}/utils/modem_stats.c {REF}/utils/modem_probe.c "
        f"{REF}/utils/fsk_demod.c . 2>/dev/null || true")
    with open(os.path.join(BUILD, "octave.h"), "w") as f:
        f.write(_OCTAVE_STUB)
    if not os.path.exists(os.path.join(BUILD, "demod_mod.o")):
        _sh("gcc -O2 -c demod_mod.c bch_ecc_mod.c")
    if name == "fsk_demod":
        _sh("gcc -O2 -c fsk.c kiss_fft.c kiss_fftr.c modem_stats.c "
            "modem_probe.c")
        _sh("gcc -O2 fsk_demod.c fsk.o kiss_fft.o kiss_fftr.o modem_stats.o "
            "modem_probe.o -lm -o fsk_demod")
    elif name == "dft_detect":
        _sh(f"gcc -O2 {REF}/scan/dft_detect.c -lm -o dft_detect")
    elif name == "imet4iq":
        _sh(f"gcc -O2 {REF}/imet/imet4iq.c -lm -o imet4iq")
    elif name == "weathex301d":
        _sh(f"gcc -O2 {REF}/weathex/weathex301d.c -lm -o weathex301d")
    elif name == "rd94rd41drop":
        _sh(f"gcc -O2 {REF}/dropsonde/rd94rd41drop.c -lm -o rd94rd41drop")
    elif name == "mk2a1680mod":
        _sh(f"gcc -O2 {REF}/mk2a/mk2a1680mod.c -lm -o mk2a1680mod")
    else:  # the demod/mod decoders
        _sh(f"gcc -O2 {name}.c demod_mod.o bch_ecc_mod.o -lm -o {name}")


def run_json(cmd: str, input_bytes: bytes = b"") -> list[dict]:
    """Run a shell pipeline, return parsed JSON lines from stdout."""
    r = subprocess.run(cmd, shell=True, input=input_bytes,
                       capture_output=True, cwd=BUILD)
    out = []
    for line in r.stdout.decode(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def iq_to_cs16(iq, scale=16384.0) -> bytes:
    import numpy as np
    cs16 = np.empty(2 * len(iq), np.int16)
    cs16[0::2] = np.clip(iq.real * scale, -32767, 32767).astype(np.int16)
    cs16[1::2] = np.clip(iq.imag * scale, -32767, 32767).astype(np.int16)
    return cs16.tobytes()
