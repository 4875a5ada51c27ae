#!/usr/bin/env python
"""Summarize a sweep artifact: per-kernel win counts, speedup stats,
roofline fractions — the numbers STATUS.md quotes, derived (not asserted).

Usage: python tools/grid_summary.py bench_artifacts/canonical_sweep.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--exact-only", action="store_true",
                   help="winner counts among exact (non-approximate, "
                        "x_absmax>=512) kernels only")
    args = p.parse_args(argv)

    with open(args.artifact) as f:
        records = json.load(f)

    approx = {"DenseMXU_bf16", "PallasDense_bf16", "PallasTiledBitplane_bf16"}
    restricted = {"DenseMXU_x8", "PallasTiledDense_x8",
                  "PallasTiledBitplane_x8"}

    wins = {}
    wins_exact = {}
    base_speedups = []
    base_rows = 0
    missing_base = []
    per_kernel_roofline = {}
    for rec in records:
        res = rec.get("results", {})
        timed = {k: v for k, v in res.items()
                 if isinstance(v, dict) and v.get("seconds")}
        if not timed:
            continue
        best = min(timed, key=lambda k: timed[k]["seconds"])
        wins[best] = wins.get(best, 0) + 1
        exact = {k: v for k, v in timed.items()
                 if k not in approx and k not in restricted}
        if exact:
            be = min(exact, key=lambda k: exact[k]["seconds"])
            wins_exact[be] = wins_exact.get(be, 0) + 1
        b = res.get("BaseTCSC")
        if isinstance(b, dict) and b.get("seconds"):
            base_rows += 1
            flag = res.get("PallasTiledBitplane_i8")
            if isinstance(flag, dict) and flag.get("seconds"):
                base_speedups.append(b["seconds"] / flag["seconds"])
        else:
            missing_base.append(rec.get("test_case"))
        for k, v in timed.items():
            fr = v.get("own_roofline_fraction", v.get("roofline_fraction"))
            if fr is not None:
                per_kernel_roofline.setdefault(k, []).append(fr)

    out = {
        "records": len(records),
        "basetcsc_rows_with_seconds": base_rows,
        "basetcsc_missing": missing_base[:8],
        "overall_winner_counts": dict(
            sorted(wins.items(), key=lambda kv: -kv[1])),
        "exact_winner_counts": dict(
            sorted(wins_exact.items(), key=lambda kv: -kv[1])),
        "flagship_speedup_vs_basetcsc": {
            "n": len(base_speedups),
            "median": statistics.median(base_speedups) if base_speedups else None,
            "max": max(base_speedups) if base_speedups else None,
            "min": min(base_speedups) if base_speedups else None,
        },
        "median_roofline_fraction_per_kernel": {
            k: round(statistics.median(v), 4)
            for k, v in sorted(per_kernel_roofline.items())},
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
