#!/usr/bin/env python
"""Container-layout figure generators — the ``data_example_image`` analogue.

The reference ships hand-drawn matplotlib diagrams of its formats
(``plots/data_example_image/base_structure.py:25-28`` hardcodes the CSP/CSN/
RIP/RIN arrays of a 4x4 example). Here the diagrams are generated *from the
format classes themselves*: a tiny ternary matrix is packed by the real
``from_dense`` and the resulting arrays are rendered, so the figures cannot
rot out of sync with the layouts.

Usage:
    python tools/format_diagram.py [--outdir docs/figures]

Generates:
    tcsc_structure.png      — split-sign TCSC streams (TCSC.h:41-48 analogue)
    bitplane_structure.png  — TiledBitplane bit deposit (the round-2 flagship)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POS, NEG, ZERO = "#f4a6a6", "#a9c6ea", "#f2f2f2"
CELL = 1.0


def _grid(ax, data, x0, y0, color_fn, fmt=str, cell=CELL, fs=9):
    from matplotlib.patches import Rectangle
    data = np.atleast_2d(np.asarray(data))
    for r in range(data.shape[0]):
        for c in range(data.shape[1]):
            v = data[r, c]
            ax.add_patch(Rectangle((x0 + c * cell, y0 - (r + 1) * cell),
                                   cell, cell, facecolor=color_fn(v),
                                   edgecolor="black", linewidth=0.8))
            ax.text(x0 + (c + 0.5) * cell, y0 - (r + 0.5) * cell, fmt(v),
                    ha="center", va="center", fontsize=fs)
    return data.shape


def _tern_color(v):
    return POS if v > 0 else NEG if v < 0 else ZERO


def draw_tcsc(outdir: str) -> str:
    """Split-sign TCSC streams of a real 6x6 example (TCSC.h:41-48)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ternary_spgemm_tpu.formats import TCSC, generate_ternary

    W = generate_ternary(6, 6, 2, seed=7)
    f = TCSC.from_dense(W)
    fig, ax = plt.subplots(figsize=(11, 7))
    _grid(ax, W, 0, 0, _tern_color)
    ax.text(3, 0.6, "W (ternary, K x N)", ha="center", fontsize=11)
    rows = [("col_start_pos (CSP)", f.col_start_pos, POS),
            ("row_index_pos (RIP)", f.row_index_pos, POS),
            ("col_start_neg (CSN)", f.col_start_neg, NEG),
            ("row_index_neg (RIN)", f.row_index_neg, NEG)]
    y = -7.5
    for label, arr, color in rows:
        _grid(ax, arr, 0, y, lambda v, c=color: c)
        ax.text(len(arr) * CELL + 0.4, y - 0.5, label, va="center", fontsize=10)
        y -= 1.6
    ax.set_xlim(-0.5, 14); ax.set_ylim(y - 0.5, 1.2)
    ax.set_aspect("equal"); ax.axis("off")
    path = os.path.join(outdir, "tcsc_structure.png")
    fig.savefig(path, dpi=120, bbox_inches="tight"); plt.close(fig)
    return path


def draw_bitplane(outdir: str) -> str:
    """TiledBitplane: dense rows -> pos/neg bit planes (formats/bitplane.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ternary_spgemm_tpu.formats import TiledBitplane, generate_ternary

    W = generate_ternary(8, 8, 2, seed=3)          # one block: tkb=1, B=8 rows
    f = TiledBitplane.from_dense(W, tkb=1, tile_n=128)
    pos, neg = f.plane[0, 0, 0, :8], f.plane[0, 0, 1, :8]
    fig, ax = plt.subplots(figsize=(11, 6))
    _grid(ax, W, 0, 0, _tern_color)
    ax.text(4, 0.6, "W (one 8-row block, 8 cols shown)", ha="center",
            fontsize=11)
    _grid(ax, pos, 0, -9.2, lambda v: POS, fmt=lambda v: f"{v:08b}")
    ax.text(8.4, -9.7, "pos plane byte-row (bit j = row-j flag)",
            va="center", fontsize=10)
    _grid(ax, neg, 0, -10.8, lambda v: NEG, fmt=lambda v: f"{v:08b}")
    ax.text(8.4, -11.3, "neg plane byte-row", va="center", fontsize=10)
    _grid(ax, f.wsum[0, 0, 0, :8], 0, -12.4, lambda v: ZERO)
    ax.text(8.4, -12.9, "wsum (per-tile column sums, int32)",
            va="center", fontsize=10)
    ax.text(0, -14.0,
            "kernel decode: widen byte-row to int32, deposit bits to bytes\n"
            "((x & 0xF) * 0x00204081) & 0x01010101, bitcast int32->4x int8 "
            "rows,\nmerge signs: pos | (neg * 0xFF); one MXU dot consumes "
            "the plane", fontsize=9, va="top", family="monospace")
    ax.set_xlim(-0.5, 14); ax.set_ylim(-16.5, 1.2)
    ax.set_aspect("equal"); ax.axis("off")
    path = os.path.join(outdir, "bitplane_structure.png")
    fig.savefig(path, dpi=120, bbox_inches="tight"); plt.close(fig)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="docs/figures")
    args = p.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    for fn in (draw_tcsc, draw_bitplane):
        print(fn(args.outdir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
