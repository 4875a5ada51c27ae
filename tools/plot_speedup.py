#!/usr/bin/env python
"""Speedup / %-of-peak report — ``plots/plot_speedup.py`` +
``plots/percent_peak_perf.py`` analogues.

Speedup curves vs the BaseTCSC-equivalent baseline kernel per config (the
reference's speedup-vs-BaseTCSC convention, ``main.cpp:257-263``), plus a
printed max-%-of-roofline table per kernel.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("json_path")
    p.add_argument("--output", default="speedup.png")
    p.add_argument("--baseline", default="BaseTCSC")
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = defaultdict(list)
    peak = defaultdict(float)
    for rec in json.load(open(args.json_path)):
        res = rec.get("results", {})
        base = res.get(args.baseline)
        for name, r in res.items():
            if "error" in r:
                continue
            peak[name] = max(peak[name], r.get("roofline_fraction", 0.0))
            if base and "seconds" in base and name != args.baseline:
                series[name].append(
                    (r["total_input_size"], base["seconds"] / r["seconds"]))

    print(f"{'kernel':28s} max % of HBM roofline")
    for name in sorted(peak, key=peak.get, reverse=True):
        print(f"{name:28s} {peak[name]:6.1%}")

    if series:
        fig, ax = plt.subplots(figsize=(9, 5.5))
        for name in sorted(series):
            pts = sorted(series[name])
            ax.plot([b for b, _ in pts], [v for _, v in pts],
                    marker="o", markersize=3, label=name)
        ax.axhline(1.0, color="k", ls=":", alpha=0.5)
        ax.set_xscale("log")
        ax.set_xlabel("total input size [bytes]")
        ax.set_ylabel(f"speedup vs {args.baseline}")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(args.output, dpi=150)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
