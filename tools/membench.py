#!/usr/bin/env python
"""HBM streaming microbenchmark — the cache-testsuite analogue.

The reference isolates kernel memory behavior with a DynamoRIO drcachesim
pipeline (``cache-testsuite-linux-aarch64/scripts/compile-measure.sh:52-76``,
``sub_cache_res.py`` subtracts a no-compute base binary). On TPU the
equivalent question is "what HBM read bandwidth does a tile-streaming DMA
pattern actually achieve, as a function of array size, tile shape, and
layout?" — this tool measures exactly that with a Pallas kernel that DMAs
every tile of an array but touches only an (8, 128) corner per tile (the
DMA is issued for the full block regardless, so the measured rate is pure
pipeline DMA; the per-tile VPU cost is ~1% of the DMA time).

Emits one JSON line per config:
    {"mb": ..., "tile": [tk, tn], "layout": "tiled4d|rowmajor",
     "seconds": ..., "gbps": ...}

Usage (on the TPU):
    python tools/membench.py [--out bench_artifacts/membench.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_spgemm_tpu.bench.timing import time_device_loop


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _consume(tile, acc, tk):
    # Every byte must flow into the result: Mosaic narrows a block's DMA to
    # the accessed subwindow, so a corner-read "streamer" measures partially
    # ELIDED transfers (observed: impossible >1.2 TB/s on 819 GB/s HBM).
    # Reinterpret int8 rows as int32 words (register-level, free; Mosaic
    # vectors support only i16/i32 arithmetic) and wraparound-add: one
    # lane-op per 4 bytes keeps the VPU ~4x under the DMA rate.
    if _interpret():
        w = jax.lax.bitcast_convert_type(
            tile.reshape(tk // 4, 4, -1).swapaxes(1, 2), jnp.int32)
    else:
        w = pltpu.bitcast(tile, jnp.int32)          # (tk/4, tn)
    for r in range(tk // 32):
        acc = acc + w[8 * r:8 * (r + 1), :]
    return acc


def _stream_kernel_4d(x_ref, t_ref, o_ref, acc_ref, *, tk):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] = _consume(t_ref[0, 0], acc_ref[:], tk)
    @pl.when((pl.program_id(0) == pl.num_programs(0) - 1) &
             (pl.program_id(1) == pl.num_programs(1) - 1))
    def _():
        o_ref[:] = acc_ref[:8, :128] + x_ref[:]


def _stream_kernel_2d(x_ref, t_ref, o_ref, acc_ref, *, tk):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] = _consume(t_ref[:], acc_ref[:], tk)
    @pl.when((pl.program_id(0) == pl.num_programs(0) - 1) &
             (pl.program_id(1) == pl.num_programs(1) - 1))
    def _():
        o_ref[:] = acc_ref[:8, :128] + x_ref[:]


def stream_rate(arr_bytes: int, tk: int, tn: int, layout: str):
    """Time a full streaming pass over an int8 array of ~arr_bytes.

    Two design rules learned the hard way (docs/perf.md §10): the array
    under test rides in the timer's ``aux`` channel — carrying it as the
    perturbed loop input adds a read+write pass per iteration (round 1's
    phantom cliff) — and the kernel must *consume every byte* or Mosaic
    narrows the DMA and the numbers exceed physical HBM bandwidth.
    """
    ntiles = max(1, arr_bytes // (tk * tn))
    gk = max(1, int(np.sqrt(ntiles)))
    gn = max(1, ntiles // gk)
    nbytes = gk * gn * tk * tn
    if layout == "tiled4d":
        arr = jnp.zeros((gk, gn, tk, tn), jnp.int8)
        spec = pl.BlockSpec((1, 1, tk, tn), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        kern = _stream_kernel_4d
    else:
        arr = jnp.zeros((gk * tk, gn * tn), jnp.int8)
        spec = pl.BlockSpec((tk, tn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
        kern = _stream_kernel_2d

    def run(x, a):
        return pl.pallas_call(
            functools.partial(kern, tk=tk),
            grid=(gk, gn),
            in_specs=[pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM), spec],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, tn), jnp.int32)],
            interpret=_interpret(),
        )(x, a)

    t = time_device_loop(run, jnp.zeros((8, 128), jnp.int32), aux=(arr,))
    del arr
    return {"mb": nbytes / 2**20, "tile": [tk, tn], "layout": layout,
            "grid": [gk, gn], "seconds": t.seconds,
            "gbps": nbytes / t.seconds / 1e9}


DEFAULT_SIZES_MB = [16, 32, 64, 121, 160, 256, 384, 512]
DEFAULT_TILES = [(256, 4096), (512, 4096), (256, 8192), (1024, 4096)]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes-mb", default=",".join(map(str, DEFAULT_SIZES_MB)))
    p.add_argument("--tiles", default=";".join(f"{a},{b}" for a, b in DEFAULT_TILES))
    p.add_argument("--layouts", default="tiled4d,rowmajor")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    _ = np.array(jax.device_put(np.zeros(8, np.float32)))  # readback warmup
    sizes = [int(float(s) * 2**20) for s in args.sizes_mb.split(",")]
    tiles = [tuple(map(int, t.split(","))) for t in args.tiles.split(";")]
    layouts = args.layouts.split(",")

    records = []
    for layout in layouts:
        for (tk, tn) in tiles:
            for sz in sizes:
                try:
                    rec = stream_rate(sz, tk, tn, layout)
                except Exception as e:  # record, keep sweeping (harness norm)
                    rec = {"mb": sz / 2**20, "tile": [tk, tn],
                           "layout": layout, "error": repr(e)}
                print(json.dumps(rec), flush=True)
                records.append(rec)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
