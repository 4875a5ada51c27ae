#!/usr/bin/env python
"""Layer-chain amortization study: the per-layer cost of the flagship kernel
inside a multi-layer program, measured as a MARGINAL slope over stack depth.

Why this study exists (docs/perf.md §14-16): the north-star single-kernel
record (4.94 us) pays a measured ~1.3 us per-dispatch floor that a bare XLA
add also pays — it is the measurement loop's serialized-dispatch turnaround,
not kernel time. The reference never had this problem: its calibrated cycle
timers (``cpp_impl/perf.cpp:45-68``) time a CPU loop whose per-iteration
overhead is a function call. On this tunneled TPU runtime the analogous
overhead is three orders of magnitude larger than the kernel body, so the
honest per-layer number for a *deployed stack* — where one dispatch carries
many layers — is the marginal cost of adding one more layer to a single
program. That marginal slope cancels every fixed cost exactly, the same way
the harness's t(n) - t(n/2) slope cancels dispatch overhead.

Two stack variants, both at the north-star layer config (M=32, K=1024,
N=4096, s=4; distinct weights per layer so nothing CSEs or stays cache-hot
beyond what serving would):

* ``independent`` — L layer calls on the same activations, outputs summed.
  TPU executes one program's custom calls serially, so the slope is the pure
  per-layer kernel cost including whatever DMA overlap XLA finds between
  neighboring calls — exactly what a deployed stack gets.
* ``chained`` — layer i+1 consumes ``clip(Y_i[:, :K], +-512)`` (integer
  values, so the i8 kernels stay exact): a sequential stack with the glue a
  real serving path would run between layers.

Output: ``bench_artifacts/chain_amortized.json`` with per-L medians, the
least-squares marginal slope, and the slope's fraction of the measured
roofline bounds (``decode_roofline.json``: bytes / serial DMA+decode+dot).

Run (TPU): setsid nohup python -u tools/chain_bench.py > /tmp/chain.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import TiledBitplane, generate_bias, generate_x
    from ternary_spgemm_tpu.ops import all_kernels

    M, K, N, s = 32, 1024, 4096, 4
    depths = [1, 2, 4, 8, 16]
    kernel = "PallasTiledBitplane_i8"
    spec = all_kernels()[kernel]

    # Warm the transfer path (CLAUDE.md: first readback is minutes).
    np.array(jax.device_put(np.zeros(8, np.float32)))

    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.formats import generate_ternary
    gen_w = native.gen_ternary if native.native_available() else generate_ternary
    fmts, biases = [], []
    for i in range(max(depths)):
        W = gen_w(K, N, s, seed=100 + i)
        fmts.append(jax.tree_util.tree_map(jnp.asarray,
                                           TiledBitplane.from_dense(W)))
        biases.append(jnp.asarray(generate_bias(N)))
    X = jnp.asarray(generate_x(M, K, seed=1))

    # Tile-rule axis (measured 2026-08-20, interleaved A/B at L=8): the
    # isolated-call rule (split N in two so Mosaic can pipeline the single
    # grid step, docs/perf.md §15) is PESSIMAL in a stack — neighboring
    # pallas calls already prefetch across the call boundary, so the
    # full-width single-step call wins in-chain (30.6 vs 31.4 us at L=8).
    rules = {"rule": {}, "fullwidth": {"tns": N}}

    def make_independent(L, kw):
        def fn(x, fmts_l, bs_l):
            acc = None
            for i in range(L):
                y = spec.fn(x, fmts_l[i], bs_l[i], **kw)
                acc = y if acc is None else acc + y
            return acc
        return fn

    def make_chained(L, kw):
        def fn(x, fmts_l, bs_l):
            cur = x
            y = None
            for i in range(L):
                y = spec.fn(cur, fmts_l[i], bs_l[i], **kw)
                # integer-valued clip keeps the i8 split exact; the slice +
                # clip is the glue a real stack pays between layers
                cur = jnp.clip(y[:, :K], -512.0, 512.0)
            return y
        return fn

    out = {"config": {"M": M, "K": K, "N": N, "s": s}, "kernel": kernel,
           "depths": depths, "variants": {}}
    makers = {}
    for rname, kw in rules.items():
        makers[f"independent_{rname}"] = (make_independent, kw)
        makers[f"chained_{rname}"] = (make_chained, kw)
    rows = {v: [] for v in makers}

    # Interleave variants inside each depth so a sustained tunnel-slow
    # window (the §-noise-model failure mode) biases every variant equally
    # instead of corrupting one variant's whole slope.
    for L in depths:
        for vname, (maker, kw) in makers.items():
            fn = maker(L, kw)
            t0 = time.time()
            r = time_device_loop(fn, X, aux=(fmts[:L], biases[:L]), repeats=3)
            rows[vname].append({"L": L, "seconds": r.seconds,
                                "seconds_spread": r.seconds_spread,
                                "runs": r.runs,
                                "wall_s": round(time.time() - t0, 1)})
            print(f"{vname} L={L}: {r.seconds*1e6:.3f} us "
                  f"(spread {r.seconds_spread:.1%})", flush=True)

    for vname, vrows in rows.items():
        # least-squares slope of t vs L = marginal per-layer seconds; the
        # intercept is every fixed cost (dispatch floor, loop turnaround)
        Ls = np.array([row["L"] for row in vrows], np.float64)
        ts = np.array([row["seconds"] for row in vrows], np.float64)
        A = np.stack([Ls, np.ones_like(Ls)], axis=1)
        (slope, intercept), *_ = np.linalg.lstsq(A, ts, rcond=None)
        pair_slopes = [(vrows[i + 1]["seconds"] - vrows[i]["seconds"])
                       / (vrows[i + 1]["L"] - vrows[i]["L"])
                       for i in range(len(vrows) - 1)]
        out["variants"][vname] = {
            "rows": vrows,
            "marginal_seconds_lsq": float(slope),
            "intercept_seconds": float(intercept),
            "pair_slopes": pair_slopes,
            # the deepest pair is the asymptotic stack regime (the pipeline
            # keeps warming with depth — measured 2026-08-20)
            "deep_marginal_seconds": pair_slopes[-1],
        }
        print(f"{vname}: marginal {slope*1e6:.3f} us/layer "
              f"(deep {pair_slopes[-1]*1e6:.3f}), "
              f"intercept {intercept*1e6:.3f} us", flush=True)

    # fractions of the measured resource bounds (decode_roofline.json)
    try:
        dr = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                         "bench_artifacts",
                                         "decode_roofline.json")))
        cfgrow = next(c for c in dr["configs"]
                      if c["config"] == f"{M}x{K}x{N}x{s}")
        for v in out["variants"].values():
            for key, m in [("", v["marginal_seconds_lsq"]),
                           ("deep_", v["deep_marginal_seconds"])]:
                v[key + "own_bytes_fraction"] = cfgrow["byte_ideal_s"] / m
                v[key + "serial_bound_fraction"] = (
                    max(cfgrow["byte_ideal_s"], cfgrow["decode_ideal_s"])
                    + cfgrow["dot_ideal_s"]) / m
                v[key + "full_overlap_fraction"] = max(
                    cfgrow["byte_ideal_s"], cfgrow["decode_ideal_s"],
                    cfgrow["dot_ideal_s"]) / m
        out["bounds_us"] = {
            "bytes": cfgrow["byte_ideal_s"] * 1e6,
            "decode": cfgrow["decode_ideal_s"] * 1e6,
            "dot": cfgrow["dot_ideal_s"] * 1e6,
        }
    except (FileNotFoundError, StopIteration):
        pass

    path = os.path.join(os.path.dirname(__file__), "..", "bench_artifacts",
                        "chain_amortized.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "variants"}))
    for vname, v in out["variants"].items():
        print(vname, {k: v[k] for k in v if k != "rows"})


if __name__ == "__main__":
    main()
