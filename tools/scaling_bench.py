#!/usr/bin/env python
"""Weak-scaling benchmark for the sharded SpMM (BASELINE.json config 5).

The multi-host target: column/block-partitioned ternary SpMM at N=65536
with the activation all-gather overlapped against compute, >=80% weak-scaling
efficiency. Protocol: per device count d (powers of 2 up to the mesh size),
run the sharded op at N = n_per_device * d so per-device work is constant;
efficiency(d) = t(1) / t(d).

On a single-chip environment this measures d=1 and exits (the tool is the
complete harness; point it at a pod slice for the full curve). With
``--platform cpu`` it runs the whole curve on the virtual CPU mesh — timing
there is not TPU-meaningful but validates the scaling harness end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-per-device", type=int, default=8192)
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--K", type=int, default=1024)
    p.add_argument("--s", type=int, default=4)
    p.add_argument("--scheme", choices=["column", "overlapped"], default="overlapped")
    p.add_argument("--format", dest="fmt", default="BlockPackedTernary")
    p.add_argument("--kernel", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--output", default="scaling_results.json")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import all_formats, generate_bias
    from ternary_spgemm_tpu.parallel import (
        column_sharded_spgemm, make_mesh, overlapped_gather_spgemm)

    fmt_cls = all_formats()[args.fmt]
    ndev = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    results = []
    for d in counts:
        N = args.n_per_device * d
        mesh = make_mesh({"model": d})
        W = native.gen_ternary(args.K, N, args.s, seed=0)
        fmt = fmt_cls.from_dense(W)
        b = generate_bias(N)
        M = max(args.M, d) if args.scheme == "overlapped" else args.M
        X = jnp.asarray(native.gen_x(M, args.K, seed=1))
        if args.scheme == "overlapped":
            fn = lambda x: overlapped_gather_spgemm(
                x, fmt, b, mesh=mesh, axis="model", kernel=args.kernel)
        else:
            fn = lambda x: column_sharded_spgemm(
                x, fmt, b, mesh=mesh, axis="model", kernel=args.kernel)
        t = time_device_loop(fn, X, min_seconds=0.1)
        eff = (results[0]["seconds"] / t.seconds) if results else 1.0
        rec = {"devices": d, "N": N, "seconds": t.seconds,
               "weak_scaling_efficiency": eff}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(args.output, "w") as f:
        json.dump({"config": vars(args), "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
