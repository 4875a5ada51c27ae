#!/usr/bin/env python
"""The truly-ragged-CSC question, measured (SURVEY §7 hard-part #1).

The last untested storage corner after round 2's §8 refutation of cap-padded
ELL: a *per-column ragged* CSC stream (8/s bits/weight at 1 byte/nonzero —
the only layout that undercuts the 2-bit bitplane's storage for s > 32,
``TCSC.h:5-50`` + ``readme.md:97-101``). The structural problem on TPU: a
flat (row, col) entry stream needs a per-entry LANE scatter to deposit bits
(the entry's column picks the lane), and the VPU has no lane-scatter — the
reference's scalar gather loop (``comp.h:44-61``) has no vectorizable
analogue. This tool measures the two quantities that settle it:

1. **Scalar-deposit rate**: a Pallas kernel consuming an entry stream one
   element at a time (dynamic single-element read-modify-write into a VMEM
   word tile) — the honest upper bound for any truly-ragged consumer. If
   Mosaic refuses to compile the lane-scatter, that is recorded as the
   result.
2. **High-sparsity kernel times** (s in {16, 32, 64}, K=N in {4096, 11008}):
   the 2-bit bitplane flagship vs the cap-padded ELL deposit kernel — the
   two feasible designs that bracket the ragged stream from either side
   (fixed 2 bits/weight positional storage vs 8+ bits/nonzero padded index
   storage).

Together with the measured VPU decode floor (the bitplane kernel's time is
positional, independent of s), the ragged stream's floor is
``nnz / scalar_rate`` — writes ``bench_artifacts/ragged_probe.json``.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys


def scalar_deposit_rate(entries: int = 4096):
    """Entries/second for one-at-a-time deposits into a VMEM word tile."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ternary_spgemm_tpu.bench.timing import time_device_loop

    rows, lanes = 8, 128

    def kernel(ents_ref, o_ref):
        o_ref[:] = jnp.zeros((rows, lanes), jnp.int32)

        def body(i, _):
            r = ents_ref[i, 0]
            c = ents_ref[i, 1]
            b = ents_ref[i, 2]
            o_ref[r, c] = o_ref[r, c] | (1 << b)
            return 0

        jax.lax.fori_loop(0, entries, body, 0)

    rng = np.random.default_rng(0)
    ents = jnp.asarray(np.stack([
        rng.integers(0, rows, entries), rng.integers(0, lanes, entries),
        rng.integers(0, 31, entries)], axis=1).astype(np.int32))
    fn = lambda e: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
    )(e)
    t = time_device_loop(fn, ents, min_seconds=0.2)
    return {"entries": entries, "seconds": t.seconds,
            "entries_per_s": entries / t.seconds}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_artifacts/ragged_probe.json")
    p.add_argument("--kn", type=int, nargs="*", default=[4096, 11008])
    p.add_argument("--s-values", type=int, nargs="*", default=[16, 32, 64])
    p.add_argument("--M", type=int, default=32)
    args = p.parse_args(argv)

    import numpy as np
    import jax

    np.array(jax.device_put(np.zeros(8, np.float32)))   # tunnel warmup

    result = {"purpose": __doc__.splitlines()[0]}
    try:
        result["scalar_deposit"] = scalar_deposit_rate()
    except Exception as e:
        result["scalar_deposit"] = {
            "compile_error": f"{type(e).__name__}: {str(e)[:400]}",
            "conclusion": "Mosaic cannot express the per-entry lane scatter "
                          "a truly-ragged stream consumer needs",
        }

    from ternary_spgemm_tpu.bench import BenchConfig, run_config

    rows = []
    for kn in args.kn:
        for s in args.s_values:
            cfg = BenchConfig(M=args.M, K=kn, N=kn, s=s, correctness=False,
                              min_seconds=0.15,
                              kernels=["PallasTiledBitplane_i8",
                                       "PallasEllDeposit_i8"])
            for r in run_config(cfg, verbose=True):
                rows.append({"K": kn, "N": kn, "s": s, "kernel": r.name,
                             "seconds": r.seconds, "error": r.error,
                             "container_bytes": None if r.error else
                             int(r.total_input_bytes
                                 - 4 * (args.M * kn + args.M * kn + kn))})
    result["high_sparsity"] = rows
    sd = result.get("scalar_deposit", {})
    if "entries_per_s" in sd:
        result["ragged_floor_analysis"] = {
            "note": "ragged stream floor = nnz / scalar_rate (deposit only, "
                    "before decode+dot); compare with the measured kernels",
            "floors_seconds": {
                f"KN={kn},s={s}": (2 * kn * kn // s) / sd["entries_per_s"]
                for kn in args.kn for s in args.s_values},
        }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result.get("scalar_deposit"), indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
