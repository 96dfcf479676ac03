#!/usr/bin/env python3
"""PGO training run for libmp3parse (invoked by tools/build_native.sh).

Drives the instrumented build over the real fixtures through every hot
entry point (packed8/packed/int16 parse + the exact DSP) so the
-fprofile-use rebuild sees the production branch profile. Exits non-zero
if fixtures or the instrumented library are unavailable (the build script
then falls back to the plain build).
"""

import ctypes
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_mp3_tpu.consts import (  # noqa: E402
    HEAD_WIDTH,
    META_WIDTH,
    SIDE8_WIDTH,
    SIDE_WIDTH,
    SP8_TAIL_WIDTH,
)

FIXTURES = [
    "/root/reference/example/classic_lame.mp3",
    "/root/reference/example/mpeg2.mp3",
]


def main() -> int:
    import numpy as np

    so = sys.argv[1]
    paths = [p for p in FIXTURES if Path(p).exists()]
    if not paths:
        return 1
    lib = ctypes.CDLL(so)
    lib.gmp_create.restype = ctypes.c_void_p
    lib.gmp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.gmp_destroy.argtypes = [ctypes.c_void_p]
    for fn, args in (
        ("gmp_parse_packed8", [ctypes.c_int8, ctypes.c_int16, ctypes.c_uint8]),
        ("gmp_parse_packed", [ctypes.c_int16, ctypes.c_int16]),
        ("gmp_parse", [ctypes.c_int16, ctypes.c_int32, ctypes.c_int32,
                       ctypes.c_int32]),
    ):
        f = getattr(lib, fn)
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p, ctypes.c_int] + [
            ctypes.POINTER(t) for t in args
        ]
    lib.gmp_dsp_create.restype = ctypes.c_void_p
    lib.gmp_dsp_destroy.argtypes = [ctypes.c_void_p]
    lib.gmp_dsp_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int16),
    ]

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    cap = 4096
    t8 = np.zeros((cap, SP8_TAIL_WIDTH), np.int8)
    h16 = np.zeros((cap, HEAD_WIDTH), np.int16)
    s8 = np.zeros((cap, SIDE8_WIDTH), np.uint8)
    sp16 = np.zeros((cap, 1152), np.int16)
    sd16 = np.zeros((cap, SIDE_WIDTH), np.int16)
    sp = np.zeros((cap, 2, 576), np.int16)
    sfl = np.zeros((cap, 2, 22), np.int32)
    sfs = np.zeros((cap, 2, 39), np.int32)
    meta = np.zeros((cap, META_WIDTH), np.int32)
    pcm = np.zeros((cap * 576, 2), np.int16)

    for path in paths:
        data = open(path, "rb").read()
        p = lib.gmp_create(data, len(data))
        while lib.gmp_parse_packed8(
            p, cap, ptr(t8, ctypes.c_int8), ptr(h16, ctypes.c_int16),
            ptr(s8, ctypes.c_uint8),
        ) > 0:
            pass
        lib.gmp_destroy(p)
        p = lib.gmp_create(data, len(data))
        while lib.gmp_parse_packed(
            p, cap, ptr(sp16, ctypes.c_int16), ptr(sd16, ctypes.c_int16)
        ) > 0:
            pass
        lib.gmp_destroy(p)
        p = lib.gmp_create(data, len(data))
        dsp = lib.gmp_dsp_create()
        while True:
            n = lib.gmp_parse(
                p, cap, ptr(sp, ctypes.c_int16), ptr(sfl, ctypes.c_int32),
                ptr(sfs, ctypes.c_int32), ptr(meta, ctypes.c_int32),
            )
            if n <= 0:
                break
            lib.gmp_dsp_decode(
                dsp, n, ptr(sp, ctypes.c_int16), ptr(sfl, ctypes.c_int32),
                ptr(sfs, ctypes.c_int32), ptr(meta, ctypes.c_int32),
                ptr(pcm, ctypes.c_int16),
            )
        lib.gmp_dsp_destroy(dsp)
        lib.gmp_destroy(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
