#!/usr/bin/env python
"""Inspect the compiled HLO of ``overlapped_gather_spgemm`` for comm/compute
overlap — evidence that the ring ppermute is scheduled concurrently with the
per-step SpMM rather than serialized (the collective-matmul recipe).

Method: jit the sharded op over the 8-device CPU mesh, compile, and walk the
optimized HLO in instruction order. XLA expresses an overlappable collective
as an async pair ``collective-permute-start`` / ``collective-permute-done``;
the permute is *scheduled for overlap* iff compute ops (dot/fusion/convolution)
sit between a start and its matching done. The tool counts the pairs, the
compute ops inside each window, and writes a JSON artifact plus the HLO
excerpt so the claim is checkable.

Caveat recorded in the artifact: the CPU backend proves the *program shape*
(async pairs with compute inside the window). Cycle-level concurrency on ICI
additionally needs the TPU latency-hiding scheduler, which can only be
observed on a real multi-chip slice (this environment exposes one chip).

Usage: python tools/overlap_evidence.py [--out bench_artifacts/overlap_evidence.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_artifacts/overlap_evidence.json")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--K", type=int, default=256)
    p.add_argument("--n-per-device", type=int, default=512)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)

    import numpy as np

    from ternary_spgemm_tpu.formats import (
        BlockPackedTernary, generate_bias, generate_ternary)
    from ternary_spgemm_tpu.parallel import make_mesh, overlapped_gather_spgemm

    d = args.devices
    N = args.n_per_device * d
    mesh = make_mesh({"model": d})
    W = generate_ternary(args.K, N, 4, seed=0)
    fmt = BlockPackedTernary.from_dense(W)
    b = generate_bias(N)
    X = np.zeros((max(args.M, d), args.K), np.float32)

    fn = jax.jit(lambda x, f, bb: overlapped_gather_spgemm(
        x, f, bb, mesh=mesh, axis="model"))
    hlo = fn.lower(X, fmt, b).compile().as_text()

    lines = hlo.splitlines()
    compute_re = re.compile(r"= (\w+\[[^\]]*\])? ?(dot|fusion|convolution)\(")
    pairs = []
    open_starts = {}  # var name -> (line_no, computes-so-far list)
    for i, ln in enumerate(lines):
        m = re.search(r"(%?\S+) = \S* collective-permute-start\(", ln)
        if m:
            open_starts[m.group(1).rstrip(" ")] = (i, [])
            continue
        md = re.search(r"collective-permute-done\((\S+?)\)", ln)
        if md:
            key = md.group(1).rstrip(",)")
            for k in list(open_starts):
                if key in (k, k.rstrip(",")):
                    start_i, comps = open_starts.pop(k)
                    pairs.append({"start_line": start_i, "done_line": i,
                                  "compute_ops_in_window": len(comps),
                                  "ops": comps[:4]})
                    break
            continue
        if open_starts and compute_re.search(ln):
            op = ln.strip().split(" = ")[0][:60]
            for k in open_starts:
                open_starts[k][1].append(op)

    sync_permutes = len(re.findall(r" collective-permute\(", hlo))
    result = {
        "devices": d, "N": N, "K": args.K,
        "async_pairs": len(pairs),
        "pairs_with_compute_inside": sum(
            1 for q in pairs if q["compute_ops_in_window"] > 0),
        "sync_collective_permutes": sync_permutes,
        "pairs": pairs,
        "verdict": None,
        "caveat": "CPU-backend HLO proves program shape; ICI-cycle overlap "
                  "needs a multi-chip slice (unavailable here).",
    }
    if pairs and result["pairs_with_compute_inside"] > 0:
        result["verdict"] = ("OVERLAPPED: async collective-permute windows "
                             "contain compute ops")
    elif pairs:
        result["verdict"] = ("ASYNC BUT ADJACENT: start/done pairs exist with "
                             "no compute inside the window on this backend")
    else:
        result["verdict"] = ("SYNC ON THIS BACKEND: collectives lowered "
                             "synchronously; overlap decided by the TPU "
                             "scheduler at run time")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    excerpt = "\n".join(
        ln for ln in lines
        if "collective-permute" in ln or compute_re.search(ln))[:8000]
    with open(args.out.replace(".json", "_hlo_excerpt.txt"), "w") as f:
        f.write(excerpt + "\n")
    print(json.dumps({k: v for k, v in result.items() if k != "pairs"},
                     indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
