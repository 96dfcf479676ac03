#!/usr/bin/env python3
"""ISO/IEC 11172-4 compliance harness.

Port of the reference's keystone correctness test
(compliance_test.go:80-414): decode a file with this framework, decode the
same file with an ORACLE (an external decoder command such as mpg123 if one
is available, else another of this framework's backends), cross-correlate
to find the best sample alignment (two-phase coarse/fine RMS search over
±3000 stereo samples — encoder-delay handling, compliance_test.go:156-185),
then report RMS / max-diff against the ISO thresholds
(compliance_test.go:30-45) and the diff histogram (:331-414).

Usage:
  python tools/compliance.py FILE [--backend device] [--oracle-backend exact]
  python tools/compliance.py FILE --oracle-cmd "mpg123 -e s16 --stereo -s -q"
  python tools/compliance.py FILE --json

Exit status: 0 full compliance, 1 limited compliance, 2 fail.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shlex
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# ISO/IEC 11172-4 thresholds in 16-bit LSBs (compliance_test.go:30-45)
FULL_RMS = 0.289  # 2^-15 / sqrt(12) * 32768
LIMITED_RMS = 4.62  # 2^-11 / sqrt(12) * 32768
FULL_MAXDIFF = 2  # 2^-14 * 32768
LIMITED_MAXDIFF = 32  # 2^-10 * 32768

MAX_OFFSET = 3000  # stereo samples searched (compliance_test.go:274)


def decode_with_backend(data: bytes, backend: str) -> bytes:
    from go_mp3_tpu import Decoder

    return Decoder(data, backend=backend).read_all()


def decode_with_command(path: str, cmd: str) -> bytes:
    """Run an external decoder command; it must write s16le stereo PCM to
    stdout (the file path is appended, mpg123-style)."""
    proc = subprocess.run(
        shlex.split(cmd) + [path], capture_output=True, check=True
    )
    return proc.stdout


def _stereo(pcm: bytes) -> np.ndarray:
    """PCM bytes -> int32 array [n_stereo_frames, 2]."""
    a = np.frombuffer(pcm, "<i2")
    return a[: len(a) // 2 * 2].reshape(-1, 2).astype(np.int32)


def _rms_at_offset(ref: np.ndarray, test: np.ndarray, offset: int,
                   sample_step: int) -> float:
    """compliance_test.go:116-152, vectorized."""
    if offset >= 0:
        r, t = ref, test[offset:]
    else:
        r, t = ref[-offset:], test
    n = min(len(r), len(t))
    if n <= 0:
        return float("inf")
    d = (t[:n:sample_step] - r[:n:sample_step]).astype(np.float64)
    return float(np.sqrt(np.mean(d * d)))


def find_best_alignment(ref: np.ndarray, test: np.ndarray,
                        max_offset: int = MAX_OFFSET) -> int:
    """Two-phase coarse/fine RMS search (compliance_test.go:156-185)."""
    best_rms, best_offset = float("inf"), 0
    for offset in range(-max_offset, max_offset + 1, 50):
        rms = _rms_at_offset(ref, test, offset, 100)
        if rms < best_rms:
            best_rms, best_offset = rms, offset
    lo = max(-max_offset, best_offset - 50)
    hi = min(max_offset, best_offset + 50)
    for offset in range(lo, hi + 1):
        rms = _rms_at_offset(ref, test, offset, 10)
        if rms < best_rms:
            best_rms, best_offset = rms, offset
    return best_offset


def compare(ref: np.ndarray, test: np.ndarray, offset: int) -> dict:
    """Full-resolution comparison + verdict (compliance_test.go:189-264)."""
    if offset >= 0:
        r, t = ref, test[offset:]
    else:
        r, t = ref[-offset:], test
    n = min(len(r), len(t))
    if n <= 0:
        return {"total_samples": 0, "full": False, "limited": False}
    d = (t[:n] - r[:n]).reshape(-1)  # interleaved L,R diffs
    absd = np.abs(d)
    max_at = int(absd.argmax())
    rms = float(np.sqrt(np.mean(d.astype(np.float64) ** 2)))
    max_diff = int(absd[max_at])
    vals, counts = np.unique(d, return_counts=True)
    order = np.argsort(-counts)[:10]
    hist = [
        {"diff": int(vals[i]), "count": int(counts[i]),
         "pct": round(100.0 * counts[i] / d.size, 2)}
        for i in order
    ]
    return {
        "total_samples": int(d.size),
        "offset": offset,
        "rms": rms,
        "max_diff": max_diff,
        "max_diff_at": max_at,
        "mean_diff": float(d.mean()),
        "full": rms < FULL_RMS and max_diff <= FULL_MAXDIFF,
        "limited": rms < LIMITED_RMS and max_diff <= LIMITED_MAXDIFF,
        "histogram_top10": hist,
    }


def run(path: str, backend: str, oracle_backend: str | None,
        oracle_cmd: str | None) -> dict:
    data = open(path, "rb").read()
    test = _stereo(decode_with_backend(data, backend))
    if oracle_cmd:
        oracle_name = oracle_cmd
        ref = _stereo(decode_with_command(path, oracle_cmd))
    else:
        oracle_name = f"backend:{oracle_backend}"
        ref = _stereo(decode_with_backend(data, oracle_backend))
    offset = find_best_alignment(ref, test)
    result = compare(ref, test, offset)
    result["file"] = path
    result["decoder"] = f"backend:{backend}"
    result["oracle"] = oracle_name
    result["verdict"] = (
        "FULL COMPLIANCE" if result["full"]
        else "LIMITED COMPLIANCE" if result["limited"]
        else "FAIL"
    )
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file")
    ap.add_argument("--backend", default="device",
                    help="backend under test (device/exact/golden)")
    ap.add_argument("--oracle-backend", default="golden",
                    help="oracle backend when no --oracle-cmd is given")
    ap.add_argument("--oracle-cmd", default=None,
                    help="external decoder command writing s16le stereo PCM "
                         "to stdout (file path appended), e.g. "
                         "'mpg123 -e s16 --stereo -s -q'")
    ap.add_argument("--json", action="store_true", help="machine output")
    args = ap.parse_args()

    result = run(args.file, args.backend, args.oracle_backend, args.oracle_cmd)
    if args.json:
        print(json.dumps(result))
    else:
        print(f"file:        {result['file']}")
        print(f"decoder:     {result['decoder']}")
        print(f"oracle:      {result['oracle']}")
        print(f"alignment:   {result.get('offset', 0)} stereo samples")
        print(f"samples:     {result['total_samples']}")
        print(f"RMS:         {result['rms']:.6f} LSB "
              f"(full < {FULL_RMS}, limited < {LIMITED_RMS})")
        print(f"max diff:    {result['max_diff']} at sample "
              f"{result['max_diff_at']} "
              f"(full <= {FULL_MAXDIFF}, limited <= {LIMITED_MAXDIFF})")
        print(f"mean diff:   {result['mean_diff']:.6f}")
        print("diff histogram (top 10):")
        for h in result["histogram_top10"]:
            print(f"  diff={h['diff']:>4}: {h['count']} samples ({h['pct']}%)")
        print(f"verdict:     {result['verdict']}")
    return 0 if result["full"] else 1 if result["limited"] else 2


if __name__ == "__main__":
    sys.exit(main())
