#!/usr/bin/env python
"""Re-measure selected kernels inside an existing sweep artifact, in place.

Repair companion to ``tools/sweep.py --resume`` (which re-runs whole missing
configs): this tool re-TIMES only the named kernels in records that already
exist, preserving each record's gated ``correct``/``max_abs_err`` fields and
recomputing ``speedup`` against the record's stored ``BaseTCSC`` seconds
(the reference's baseline convention, ``main.cpp:257-263``).

Why it exists: round-2 found the device-loop timer let XLA elide the (M, N)
output write for XLA-formulation kernels (only a scalar of y was consumed —
see ``bench/timing.py``), so every ``DenseMXU_*``/``BaseTCSC``-family number
measured before the ``optimization_barrier`` fix is biased fast by up to the
4*M*N output bytes. Pallas kernels are opaque custom calls and were never
affected; only the XLA-path entries need repair:

    python tools/sweep_remeasure.py bench_artifacts/canonical_sweep.json \
        --kernels DenseMXU_bf16 --min-seconds 0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _exact_corner(rec, name: str):
    """Replace an 'extrapolated_from_M' entry with a REAL measurement.

    The M-chunked BaseTCSC processes independent M-row chunks, so the full-M
    time is the sum of per-section executions — every section genuinely runs
    on-device (sized to keep each execution under the tunneled worker's
    ~60 s crash threshold); nothing is scaled. Each section is timed as the
    MIN of two wall samples ending in a scalar readback fence (the ADVICE
    round-3 stall defense: a tunnel stall only inflates a sample, and a
    faster baseline is conservative for every reported speedup). Section
    runtime is value-independent (no data-dependent control flow), so all
    sections share one cached activation block.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ternary_spgemm_tpu.bench.harness import _cached_w, _cached_x
    from ternary_spgemm_tpu.bench.instrument import (
        advertised_hbm_bandwidth, instrument, own_roofline_fraction,
        roofline_fraction)
    from ternary_spgemm_tpu.formats import generate_bias
    from ternary_spgemm_tpu.ops import all_kernels

    tc = rec["test_case"]
    M, K, N, s = tc["M"], tc["K"], tc["N"], tc["s"]
    spec = all_kernels()[name]
    W = _cached_w(K, N, s, 0)
    nnz_est = 2 * K * N // s
    M_sec = min(M, max(1000, int(2.5e11 // nnz_est) // 8 * 8))
    n_full, rem = divmod(M, M_sec)
    fmt = spec.format_cls.from_dense(W)
    b = generate_bias(N)

    def run_rows(rows, n_times):
        Xs = _cached_x(rows, K, 1)
        fmt_p = fmt.prepare(rows)
        fmt_dev = jax.tree_util.tree_map(jnp.asarray, fmt_p)
        f = jax.jit(lambda x, fm: spec.fn(x, fm, b, None))
        float(np.asarray(jnp.ravel(f(Xs, fmt_dev))[0]))   # compile+warm

        def once():
            t0 = time.perf_counter()
            y = f(Xs, fmt_dev)
            float(np.asarray(jnp.ravel(y)[0]))            # readback fence
            return time.perf_counter() - t0

        a = [once() for _ in range(n_times)]
        bb = [once() for _ in range(n_times)]
        return [min(x, y) for x, y in zip(a, bb)]

    per = run_rows(M_sec, n_full)
    if rem:
        per += run_rows(rem, 1)
    total = sum(per)
    inst = instrument(M, fmt, prelu=False, x_bytes=spec.x_bytes)
    beta = advertised_hbm_bandwidth()
    entry = rec["results"].setdefault(name, {})
    entry.update({
        "performance": inst.flops / total / 1e9,
        "total_input_size": inst.total_input_bytes,
        "operational_intensity": inst.operational_intensity,
        "effective_gflops": inst.dense_equiv_flops / total / 1e9,
        "nnz_per_s": inst.nnz * M / total,
        "roofline_fraction": roofline_fraction(inst, total, beta),
        "own_roofline_fraction": own_roofline_fraction(inst, total, beta),
        "seconds": total,
        "host_sectioned": {"rows": M_sec, "sections": len(per),
                           "per_section_s": [round(x, 3) for x in per]},
    })
    entry.pop("extrapolated_from_M", None)
    entry.pop("error", None)
    print(f"  {name}: {total:.1f}s over {len(per)} sections "
          f"(rows={M_sec})", flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--kernels", required=True,
                   help="comma-separated kernel names to re-measure")
    p.add_argument("--min-seconds", type=float, default=0.1)
    p.add_argument("--platform", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--fill", action="store_true",
                   help="target kernels whose record entry is MISSING or an "
                        "error/skip (instead of present ones) and write a "
                        "fresh full entry — used to fill the 144 BaseTCSC "
                        "gather-infeasibility skips once the kernel grew the "
                        "M-chunked path (VERDICT.md round-2 missing #4). "
                        "Speedups of every kernel in a touched record are "
                        "recomputed against the new BaseTCSC seconds.")
    p.add_argument("--regate", action="store_true",
                   help="re-run the correctness gate (when M*N is readback-"
                        "feasible) instead of preserving the stored verdict — "
                        "for re-measuring a kernel whose implementation "
                        "changed")
    p.add_argument("--correctness-limit", type=int, default=1 << 24)
    p.add_argument("--kn", default=None,
                   help="comma-separated KxN pairs; only records matching "
                        "one are touched (scoped regates after a kernel "
                        "rule change that affects few shapes)")
    p.add_argument("--m-values", type=int, nargs="*", default=None,
                   help="only records with M in this set are touched")
    p.add_argument("--exact-corners", action="store_true",
                   help="target records whose kernel entry carries an "
                        "'extrapolated_from_M' flag and replace it with a "
                        "REAL host-sectioned measurement: the M-chunked "
                        "BaseTCSC is independent per M-row-section, so the "
                        "full-M time is measured as the SUM of per-section "
                        "executions, each short enough (< ~60 s) not to "
                        "crash the tunneled TPU worker (VERDICT round-3 "
                        "missing #3). Every section really executes; no "
                        "scaling.")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from ternary_spgemm_tpu.bench import BenchConfig, run_config

    targets = args.kernels.split(",")
    with open(args.artifact) as f:
        records = json.load(f)

    kn_allow = None
    if args.kn:
        kn_allow = {tuple(map(int, p.split("x"))) for p in args.kn.split(",")}

    todo = []
    for rec in records:
        tc = rec["test_case"]
        if kn_allow is not None and (tc["K"], tc["N"]) not in kn_allow:
            continue
        if args.m_values is not None and tc["M"] not in args.m_values:
            continue
        res = rec.get("results", {})
        if args.exact_corners:
            present = [k for k in targets
                       if isinstance(res.get(k), dict)
                       and "extrapolated_from_M" in res[k]]
        elif args.fill:
            present = [k for k in targets
                       if not isinstance(res.get(k), dict)
                       or "error" in res[k]]
        else:
            present = [k for k in targets
                       if isinstance(res.get(k), dict) and "error" not in res[k]]
        if present:
            todo.append((rec, present))
    if args.limit:
        todo = todo[:args.limit]
    print(f"re-measuring {targets} in {len(todo)}/{len(records)} records",
          flush=True)

    t0 = time.time()
    for i, (rec, present) in enumerate(todo):
        tc = rec["test_case"]
        if args.exact_corners:
            print(f"[{i+1}/{len(todo)}] EXACT M={tc['M']} K={tc['K']} "
                  f"N={tc['N']} s={tc['s']} (elapsed {time.time()-t0:.0f}s)",
                  flush=True)
            for name in present:
                _exact_corner(rec, name)
            base_e = rec["results"].get("BaseTCSC", {})
            base_s = base_e.get("seconds") if isinstance(base_e, dict) else None
            if base_s:
                for entry in rec["results"].values():
                    if isinstance(entry, dict) and entry.get("seconds"):
                        entry["speedup"] = base_s / entry["seconds"]
            tmp = args.artifact + ".tmp"
            with open(tmp, "w") as f:
                json.dump(records, f, indent=1)
            os.replace(tmp, args.artifact)
            import gc

            from ternary_spgemm_tpu.bench import harness as _h
            _h._X_CACHE.clear()
            gc.collect()
            continue
        gate = args.regate and tc["M"] * tc["N"] <= args.correctness_limit
        # Grid-corner guard: a single gather-baseline execution above ~60 s
        # crashes the tunneled TPU worker. The M-chunked kernel is steps x
        # IDENTICAL independent chunks, so measure a reduced-M slice and
        # scale seconds by M/M_sub — the reference's own
        # calibrate-with-fewer-iterations-and-divide move (perf.cpp:45-68).
        # performance/nnz_per_s are scale-invariant; seconds/bytes rescale.
        M_run, m_scale = tc["M"], 1.0
        nnz_est = 2 * tc["K"] * tc["N"] // tc["s"]
        if (args.fill and set(present) == {"BaseTCSC"}
                and tc["M"] * nnz_est > 4e11):
            M_sub = max(2000, int(3e11 // nnz_est) // 8 * 8)
            if M_sub < tc["M"]:
                M_run, m_scale = M_sub, tc["M"] / M_sub
        cfg = BenchConfig(M=M_run, K=tc["K"], N=tc["N"], s=tc["s"],
                          kernels=present, correctness=gate and m_scale == 1.0,
                          min_seconds=args.min_seconds)
        print(f"[{i+1}/{len(todo)}] M={tc['M']} K={tc['K']} N={tc['N']} "
              f"s={tc['s']} (elapsed {time.time()-t0:.0f}s)", flush=True)
        base = rec["results"].get("BaseTCSC", {})
        base_s = base.get("seconds") if isinstance(base, dict) else None
        for r in run_config(cfg, verbose=True):
            if r.error:
                print(f"  ! {r.name} failed ({r.error}); keeping old entry",
                      flush=True)
                continue
            old = rec["results"].setdefault(r.name, {})
            sec = r.seconds * m_scale
            bytes_full = r.total_input_bytes + int(
                4 * (tc["M"] - M_run) * (tc["K"] + tc["N"]))
            old.update({
                "performance": r.gflops,           # scale-invariant
                "total_input_size": bytes_full,
                "operational_intensity": r.flops * m_scale / bytes_full,
                "effective_gflops": r.effective_gflops,
                "nnz_per_s": r.nnz_per_s,          # scale-invariant
                "roofline_fraction": r.roofline_fraction,
                "own_roofline_fraction": r.own_roofline_fraction,
                "seconds": sec,
                "speedup": (base_s / sec) if base_s else old.get("speedup"),
            })
            if m_scale != 1.0:
                old["extrapolated_from_M"] = M_run
            old.pop("error", None)
            if gate or args.fill:
                old["correct"] = r.correct
                old["max_abs_err"] = r.max_abs_err
            # else: "correct"/"max_abs_err" stay from the original gated run
            if r.name == "BaseTCSC":
                base_s = sec
        if base_s:
            # the baseline convention: every kernel's speedup is vs this
            # record's BaseTCSC seconds (main.cpp:257-263)
            for name, entry in rec["results"].items():
                if isinstance(entry, dict) and entry.get("seconds"):
                    entry["speedup"] = base_s / entry["seconds"]
        # checkpoint after every config — atomic, same contract as sweep.py
        tmp = args.artifact + ".tmp"
        with open(tmp, "w") as f:
            json.dump(records, f, indent=1)
        os.replace(tmp, args.artifact)
        if args.fill:
            # The grid corners leave multi-GB device buffers (cached X,
            # sweep outputs) whose accumulation has crashed the tunneled
            # TPU worker at the NEXT config's device_put (observed twice at
            # M=16 K=4096 N=16384 s=2 following the M=64000 K=2048 N=8192
            # group; the config runs clean in a fresh process). Drop every
            # cross-config device reference and collect before moving on.
            import gc

            from ternary_spgemm_tpu.bench import harness as _h
            _h._X_CACHE.clear()
            gc.collect()
    print(f"done: {len(todo)} records repaired in {args.artifact}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
