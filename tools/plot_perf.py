#!/usr/bin/env python
"""Performance plot — ``plots/plot_perf.py`` analogue.

GFLOP/s (useful adds) vs total input size (log x), one line per kernel,
consuming the sweep JSON schema (tools/sweep.py).
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("json_path")
    p.add_argument("--output", default="performance.png")
    p.add_argument("--title", default="Ternary SpMM performance (TPU)")
    p.add_argument("--metric", default="performance",
                   choices=["performance", "effective_gflops", "nnz_per_s",
                            "roofline_fraction"])
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = defaultdict(list)   # kernel -> [(bytes, value)]
    for rec in load(args.json_path):
        for name, r in rec.get("results", {}).items():
            if "error" in r:
                continue
            series[name].append((r["total_input_size"], r[args.metric]))

    fig, ax = plt.subplots(figsize=(9, 5.5))
    for name in sorted(series):
        pts = sorted(series[name])
        ax.plot([b for b, _ in pts], [v for _, v in pts],
                marker="o", markersize=3, label=name)
    ax.set_xscale("log")
    ax.set_xlabel("total input size [bytes]")
    labels = {"performance": "useful-adds GFLOP/s",
              "effective_gflops": "dense-equivalent GFLOP/s",
              "nnz_per_s": "nnz/s", "roofline_fraction": "fraction of HBM roofline"}
    ax.set_ylabel(labels[args.metric])
    ax.set_title(args.title)
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
