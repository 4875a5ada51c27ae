#!/usr/bin/env python
"""On-chip gate + benchmark for the fused FFN block kernels.

Gates ``fused_bitplane_ffn`` (PReLU FFN) and ``fused_bitplane_swiglu``
(the transformer's SwiGLU FFN) against their unfused registry-call
compositions ON THE REAL CHIP (interpret mode cannot catch Mosaic layout /
precision bugs — CLAUDE.md), then times fused vs unfused two ways:

* single dispatch — what one isolated block costs (includes the measured
  ~1.3 us dispatch-loop floor, docs/perf.md §14);
* stacked marginal — (t(L=8) - t(L=2)) / 6 with blocks chained the way a
  served model chains them (SwiGLU: y -> requantize -> next block), the
  honest per-block number for deployment (tools/chain_bench.py methodology).

Output: ``bench_artifacts/ffn_bench.json``.

Run (TPU): setsid nohup python -u tools/ffn_bench.py > /tmp/ffn.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import (
        TiledBitplane, generate_bias, generate_alpha, generate_x)
    from ternary_spgemm_tpu.ops.fused_ffn import (
        fused_bitplane_ffn, fused_bitplane_swiglu, requantize_rows,
        unfused_reference_ffn, unfused_reference_swiglu)
    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.formats import generate_ternary

    gen_w = native.gen_ternary if native.native_available() else generate_ternary
    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)

    np.array(jax.device_put(np.zeros(8, np.float32)))  # warm readback path
    out = {"blocks": []}
    M, s = 32, 4

    # ---- PReLU FFN (the reference-epilogue block): K -> N1 -> N2 ----------
    for (K, N1, N2) in [(1024, 4096, 1024), (2048, 4096, 2048)]:
        fmt1 = dev(TiledBitplane.from_dense(gen_w(K, N1, s, seed=11)))
        fmt2 = dev(TiledBitplane.from_dense(gen_w(N1, N2, s, seed=12)))
        b1, a1 = jnp.asarray(generate_bias(N1)), jnp.asarray(generate_alpha(N1))
        b2 = jnp.asarray(generate_bias(N2))
        X = jnp.asarray(generate_x(M, K, seed=13))
        args = dict(b1=b1, alpha1=a1, b2=b2)

        got = np.asarray(jax.jit(
            lambda x, f1, f2: fused_bitplane_ffn(x, f1, b1, a1, f2, b2)
        )(X, fmt1, fmt2))
        want = np.asarray(jax.jit(
            lambda x, f1, f2: unfused_reference_ffn(x, f1, b1, a1, f2, b2)
        )(X, fmt1, fmt2))
        err = float(np.max(np.abs(got - want)))
        rel = err / max(1.0, float(np.max(np.abs(want))))
        correct = bool(rel < 1e-5)
        print(f"prelu_ffn {K}->{N1}->{N2}: on-chip max_abs_err {err:.3g} "
              f"(rel {rel:.2e}) correct={correct}", flush=True)

        def fused_chain(L):
            def fn(x, f1, f2):
                cur = x
                for _ in range(L):
                    y = fused_bitplane_ffn(cur, f1, b1, a1, f2, b2)
                    cur = jnp.clip(jnp.round(y[:, :K]), -512.0, 512.0)
                return cur
            return fn

        def unfused_chain(L):
            def fn(x, f1, f2):
                cur = x
                for _ in range(L):
                    y = unfused_reference_ffn(cur, f1, b1, a1, f2, b2)
                    cur = jnp.clip(jnp.round(y[:, :K]), -512.0, 512.0)
                return cur
            return fn

        row = {"block": "prelu_ffn", "K": K, "N1": N1, "N2": N2,
               "max_abs_err": err, "rel_err": rel, "correct": correct}
        for name, mk in [("fused", fused_chain), ("unfused", unfused_chain)]:
            t1 = time_device_loop(mk(1), X, aux=(fmt1, fmt2), repeats=3)
            t2 = time_device_loop(mk(2), X, aux=(fmt1, fmt2), repeats=3)
            t8 = time_device_loop(mk(8), X, aux=(fmt1, fmt2), repeats=3)
            row[name] = {"single_us": t1.seconds * 1e6,
                         "single_spread": t1.seconds_spread,
                         "marginal_us": (t8.seconds - t2.seconds) / 6 * 1e6}
            print(f"  {name}: single {t1.seconds*1e6:.2f} us, "
                  f"stack marginal {row[name]['marginal_us']:.2f} us",
                  flush=True)
        out["blocks"].append(row)

    # ---- SwiGLU FFN (the transformer block): d -> ff (x2) -> d ------------
    # last two rows are the real BitNet-b1.58 3B/7B FFN shapes: the hidden
    # width spans gn1 = 3 storage tiles (the multi-tile accumulator path)
    for (d, ff) in [(1024, 4096), (2048, 4096), (3200, 8640), (4096, 11008)]:
        fg = dev(TiledBitplane.from_dense(gen_w(d, ff, s, seed=21)))
        fu = dev(TiledBitplane.from_dense(gen_w(d, ff, s, seed=22)))
        fd = dev(TiledBitplane.from_dense(gen_w(ff, d, s, seed=23)))
        gam = dict(gamma_gate=0.02, gamma_up=0.03, gamma_down=0.025)
        X = jnp.asarray(generate_x(M, d, seed=24)) / 256.0  # real-valued
        xq, sx = requantize_rows(X)

        got = np.asarray(jax.jit(
            lambda q, sc, a, b, c: fused_bitplane_swiglu(q, sc, a, b, c, **gam)
        )(xq, sx, fg, fu, fd))
        want = np.asarray(jax.jit(
            lambda q, sc, a, b, c: unfused_reference_swiglu(q, sc, a, b, c, **gam)
        )(xq, sx, fg, fu, fd))
        err = float(np.max(np.abs(got - want)))
        rel = err / max(1e-9, float(np.max(np.abs(want))))
        correct = bool(rel < 1e-5)
        print(f"swiglu {d}->{ff}->{d}: on-chip max_abs_err {err:.3g} "
              f"(rel {rel:.2e}) correct={correct}", flush=True)

        def fused_chain(L):
            def fn(x, a, b, c):
                cur = x
                for _ in range(L):
                    q, sc = requantize_rows(cur)
                    cur = fused_bitplane_swiglu(q, sc, a, b, c, **gam)
                return cur
            return fn

        def unfused_chain(L):
            def fn(x, a, b, c):
                cur = x
                for _ in range(L):
                    q, sc = requantize_rows(cur)
                    cur = unfused_reference_swiglu(q, sc, a, b, c, **gam)
                return cur
            return fn

        row = {"block": "swiglu", "d": d, "ff": ff,
               "max_abs_err": err, "rel_err": rel, "correct": correct}
        for name, mk in [("fused", fused_chain), ("unfused", unfused_chain)]:
            t1 = time_device_loop(mk(1), X, aux=(fg, fu, fd), repeats=3)
            t2 = time_device_loop(mk(2), X, aux=(fg, fu, fd), repeats=3)
            t8 = time_device_loop(mk(8), X, aux=(fg, fu, fd), repeats=3)
            row[name] = {"single_us": t1.seconds * 1e6,
                         "single_spread": t1.seconds_spread,
                         "marginal_us": (t8.seconds - t2.seconds) / 6 * 1e6}
            print(f"  {name}: single {t1.seconds*1e6:.2f} us, "
                  f"stack marginal {row[name]['marginal_us']:.2f} us",
                  flush=True)
        out["blocks"].append(row)

    path = os.path.join(os.path.dirname(__file__), "..", "bench_artifacts",
                        "ffn_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
