#!/usr/bin/env python
"""Roofline plot — ``plots/plot_roofline.py`` analogue, TPU-parameterized.

Log-log roofline: performance [GFLOP/s of useful adds] vs operational
intensity [flops/byte]. The reference hard-codes beta = 24 B/cycle and
pi = 4 F/cycle (``plot_roofline.py:597-598``); here the defaults are the
current chip's advertised HBM bandwidth and an adds-only VPU ceiling, both
overridable (use the measured bandwidth from
``ternary_spgemm_tpu.bench.measure_hbm_bandwidth`` for an honest beta).
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("json_path")
    p.add_argument("--output", default="roofline.png")
    p.add_argument("--beta", type=float, default=None,
                   help="memory bandwidth [GB/s]; default: advertised for chip")
    p.add_argument("--pi", type=float, default=None,
                   help="compute ceiling [GFLOP/s adds]; default: v5e VPU-ish")
    p.add_argument("--title", default="Ternary SpMM roofline (TPU)")
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    beta = args.beta
    if beta is None:
        try:
            from ternary_spgemm_tpu.bench import advertised_hbm_bandwidth
            beta = advertised_hbm_bandwidth() / 1e9
        except Exception:
            beta = 819.0
    # adds-only ceiling: VPU 8x128 lanes x ~0.94 GHz x 4 (v5e) ~= 3.8 TOP/s;
    # the MXU path is far higher but flops here are the reference's
    # useful-adds convention, so the VPU line is the honest pi.
    pi = args.pi if args.pi is not None else 3800.0

    series = defaultdict(list)
    for rec in json.load(open(args.json_path)):
        for name, r in rec.get("results", {}).items():
            if "error" in r:
                continue
            series[name].append((r["operational_intensity"], r["performance"]))

    fig, ax = plt.subplots(figsize=(9, 6))
    oi = np.logspace(-3, 2, 200)
    ax.plot(oi, np.minimum(oi * beta, pi), "k-", lw=2, label="roofline")
    ridge = pi / beta
    ax.axvline(ridge, color="k", ls=":", alpha=0.5)
    ax.annotate(f"ridge {ridge:.2f} F/B", (ridge, pi), fontsize=8,
                xytext=(ridge * 1.2, pi * 0.5))
    for name in sorted(series):
        pts = series[name]
        ax.scatter([o for o, _ in pts], [v for _, v in pts], s=14, label=name)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("operational intensity [flops/byte]")
    ax.set_ylabel("performance [GFLOP/s useful adds]")
    ax.set_title(f"{args.title}  (beta={beta:.0f} GB/s, pi={pi:.0f} GFLOP/s)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
