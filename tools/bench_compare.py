#!/usr/bin/env python3
"""Compare a fresh bench run against a saved baseline (benchstat-style:
value, delta, percentage), mirroring the reference's bench-compare workflow
(its Makefile:45-63)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path


def main() -> None:
    baseline_path = Path(sys.argv[1] if len(sys.argv) > 1 else "benchmarks/baseline.json")
    if not baseline_path.exists():
        print(f"no baseline at {baseline_path}; run `make bench-save` first")
        sys.exit(1)
    baseline = json.loads(baseline_path.read_text())
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, check=True
    )
    current = json.loads(out.stdout.strip().splitlines()[-1])

    b, c = baseline["value"], current["value"]
    delta = c - b
    pct = (delta / b * 100.0) if b else float("inf")
    print(f"metric:   {current['metric']} ({current['unit']})")
    print(f"baseline: {b:.2f}")
    print(f"current:  {c:.2f}")
    print(f"delta:    {delta:+.2f} ({pct:+.1f}%)")
    for k, v in current.get("detail", {}).items():
        bv = baseline.get("detail", {}).get(k)
        print(f"  {k}: {bv} -> {v}")


if __name__ == "__main__":
    main()
