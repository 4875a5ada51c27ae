#!/usr/bin/env python
"""Benchmark sweep runner — the ``run_benchmark.py`` analogue.

Drives the canonical grid of the reference
(``run_benchmark.py:13-24``): M in {1,16,64,256,1000,4000,16000,64000} x
(K,N) in {(512,2048),(1024,4096),(2048,8192),(4096,16384),(2048,512),
(4096,1024),(8192,2048),(16384,4096)} x s in {2,4,8,16}; or single-dimension
sweeps with the other dims fixed at 1024 (``plots/run_benchmark.py:8-18``,
``--varyonly M|K|N``) and a sparsity-only sweep (``--sparsityonly``).

Unlike the reference (which subprocess-spawns the benchmark binary per config
and regex-parses ANSI stdout), the sweep calls the harness in-process and
writes the same JSON schema: a list of
``{"test_case": {M,K,N,s}, "results": {name: {...}}}`` records.

Weight matrices are cached per (K, N, s) across the M sweep (host-side
generation is the slow part on the bench host).
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

CANONICAL_M = [1, 16, 64, 256, 1000, 4000, 16000, 64000]
CANONICAL_KN = [(512, 2048), (1024, 4096), (2048, 8192), (4096, 16384),
                (2048, 512), (4096, 1024), (8192, 2048), (16384, 4096)]
CANONICAL_S = [2, 4, 8, 16]
VARY_DIM_VALUES = [256, 512, 1024, 2048, 4096, 8192]   # plots/run_benchmark.py:8-18
FIXED = 1024


#: BASELINE.json config 4: "BitNet-style layer sweep: M in {1,32,512},
#: K=N in {4096,11008}, s in {2,4,8,16} roofline study".
BITNET_M = [1, 32, 512]
BITNET_KN = [(4096, 4096), (11008, 11008)]


def build_grid(args):
    if args.preset == "bitnet":
        for (k, n) in BITNET_KN:
            for s in (args.s_values or CANONICAL_S):
                for m in (args.m_values or BITNET_M):
                    yield m, k, n, s
        return
    if args.varyonly:
        d = args.varyonly
        for v in VARY_DIM_VALUES:
            cfg = {"M": FIXED, "K": FIXED, "N": FIXED}
            cfg[d] = v
            for s in (args.s_values or CANONICAL_S):
                yield cfg["M"], cfg["K"], cfg["N"], s
        return
    if args.sparsityonly:
        for s in (args.s_values or CANONICAL_S):
            yield FIXED, FIXED, FIXED, s
        return
    ms = args.m_values or CANONICAL_M
    kns = args.kn or CANONICAL_KN
    ss = args.s_values or CANONICAL_S
    # s innermost (vs the reference's M-innermost, run_benchmark.py:26-29):
    # same config set, but X(M, K) stays cached across the 4 sparsities and
    # W/containers per (K, N, s) stay cached across the M axis (harness
    # caches) — the order is purely a host-side-cost optimization.
    for (k, n), m, s in itertools.product(kns, ms, ss):
        yield m, k, n, s


#: Device-memory feasibility guards, checked BEFORE dispatch so an infeasible
#: config is a *documented skip* in the artifact instead of a tunnel-killing
#: device OOM. The XLA segment-sum formulations materialize the gathered
#: (M, nnz) stream (nnz ~ 2*K*N/s), so their footprint grows with every
#: dimension at once; the Pallas tiled kernels stream O(M*K + K*N/4 + M*N).
#: BaseTCSC is NOT in this list since round 3: it scans over M-chunks above
#: the budget (ops/xla_kernels.py::_tcsc_chunked), so the speedup denominator
#: exists at every canonical config (VERDICT.md round-2 missing #4).
_GATHER_KERNELS = ("BaseTCSR", "BlockedTCSC", "InterleavedTCSC",
                   "InterleavedBlockedTCSC", "EllTCSC", "PackedCSC")
_GATHER_BUDGET_FLOATS = 6e8   # ~2.4 GB for the dominant (M, nnz) intermediate


def skip_reason(kernel: str, m: int, k: int, n: int, s: int):
    """Return a human-readable skip reason, or None if feasible."""
    if kernel in _GATHER_KERNELS and m * (2 * k * n // s) > _GATHER_BUDGET_FLOATS:
        return (f"skipped: gather formulation materializes the (M, nnz) "
                f"stream = {m * (2 * k * n // s) * 4 / 1e9:.1f} GB "
                f"(> {_GATHER_BUDGET_FLOATS * 4 / 1e9:.1f} GB device budget)")
    return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="sweep_results.json")
    p.add_argument("--preset", choices=["bitnet"], default=None)
    p.add_argument("--varyonly", choices=["M", "K", "N"], default=None)
    p.add_argument("--prelu", action="store_true")
    p.add_argument("--sparsityonly", action="store_true")
    p.add_argument("--m-values", type=int, nargs="*", default=None)
    p.add_argument("--kn", type=lambda s: tuple(map(int, s.split("x"))),
                   nargs="*", default=None, metavar="KxN")
    p.add_argument("--s-values", type=int, nargs="*", default=None)
    p.add_argument("--kernels", default=None,
                   help="comma-separated kernel names (default: bench.py set)")
    p.add_argument("--correctness", action="store_true")
    p.add_argument("--correctness-limit", type=int, default=1 << 24,
                   help="gate correctness only when M*N <= this (the dense "
                        "reference + comparison needs an (M, N) device->host "
                        "readback; the tunnel makes GB-scale readbacks "
                        "impractical)")
    p.add_argument("--min-seconds", type=float, default=0.05)
    p.add_argument("--repeats", type=int, default=1,
                   help="independent calibrated slope estimates per kernel "
                        "per config (rows carry seconds_spread/n_estimates; "
                        "round-4 VERDICT weak #3 — single-estimate us-scale "
                        "rows wobble up to 20%%)")
    p.add_argument("--platform", default=None)
    p.add_argument("--limit", type=int, default=None,
                   help="stop after this many configs (smoke runs)")
    p.add_argument("--resume", action="store_true",
                   help="load --output if it exists and skip configs already "
                        "recorded (the per-config checkpointing makes long "
                        "grids restartable after a timeout/preemption)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from bench import DEFAULT_KERNELS
    from ternary_spgemm_tpu.bench import BenchConfig, run_config, to_reference_json

    kernels = args.kernels.split(",") if args.kernels else DEFAULT_KERNELS
    records = []
    done = set()
    if args.resume:
        import os
        if os.path.exists(args.output):
            with open(args.output) as f:
                records = json.load(f)
            done = {tuple(r["test_case"][d] for d in ("M", "K", "N", "s"))
                    for r in records}
            print(f"resume: {len(done)} configs already in {args.output}",
                  flush=True)
    grid = list(build_grid(args))
    if args.limit:
        grid = grid[:args.limit]
    grid = [c for c in grid if c not in done]
    t_start = time.time()
    for i, (m, k, n, s) in enumerate(grid):
        skips = {kn: skip_reason(kn, m, k, n, s) for kn in kernels}
        run_kernels = [kn for kn in kernels if skips[kn] is None]
        cfg = BenchConfig(M=m, K=k, N=n, s=s, kernels=run_kernels,
                          correctness=(args.correctness
                                       and m * n <= args.correctness_limit),
                          prelu=args.prelu, min_seconds=args.min_seconds,
                          repeats=max(1, args.repeats))
        print(f"[{i+1}/{len(grid)}] M={m} K={k} N={n} s={s} "
              f"(elapsed {time.time()-t_start:.0f}s)", flush=True)
        try:
            results = run_config(cfg, verbose=True)
        except Exception as e:  # record per-config failure, keep sweeping
            records.append({"test_case": {"M": m, "K": k, "N": n, "s": s},
                            "error": f"{type(e).__name__}: {e}"})
        else:
            rec = to_reference_json(cfg, results)
            for kn, why in skips.items():
                if why is not None:
                    rec["results"][kn] = {"error": why}
            records.append(rec)
        # Checkpoint after every config — atomically (tmp + rename), so a
        # concurrent --resume reader (or a kill mid-dump) never sees a torn
        # file. A raced read of the non-atomic write is how the overnight
        # canonical run silently lost 7 completed configs.
        import os
        tmp = args.output + ".tmp"
        with open(tmp, "w") as f:
            json.dump(records, f, indent=1)
        os.replace(tmp, args.output)
    print(f"wrote {len(records)} records -> {args.output}")
    return 0


if __name__ == "__main__":
    import os
    # location-independent: the repo root hosts bench.py and the package
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
