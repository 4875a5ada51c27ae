#!/usr/bin/env python
"""Decode-shaped transformer-block A/B: the serving fast paths, with error
bars.

Measures the BitNet-7B (or 3B) `ExportedTransformerBlock` at the decode
shape (B=1, KV-cached attention live) in three configurations — no fast
paths, fused SwiGLU FFN, fused FFN + merged QKV — with >=3 independent
calibrated slope estimates each and spread fields (the round-4 artifact's
9.1% end-to-end margin rode on a min-of-2; round-4 VERDICT weak #3 asked
every sub-25% margin to carry bars). Weights come straight from the native
ternary generator (same construction as tools/serving_bench.py).

Output: bench_artifacts/fused_block_decode.json
Run (TPU): setsid nohup python -u tools/fused_block_bench.py > /tmp/fb.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    "test": dict(d_model=64, n_heads=4, d_ff=128, T=16),
    "bitnet3b": dict(d_model=3200, n_heads=32, d_ff=8640, T=512),
    "bitnet7b": dict(d_model=4096, n_heads=32, d_ff=11008, T=512),
}


def build_block(cfg, *, s=2, seed=0, fused_ffn=False, fused_qkv=False):
    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.formats import TiledBitplane, generate_ternary
    from ternary_spgemm_tpu.models.exported import ExportedBitLinear
    from ternary_spgemm_tpu.models.transformer import ExportedTransformerBlock

    gen = native.gen_ternary if native.native_available() else \
        (lambda K, N, s, seed: generate_ternary(K, N, s, seed=seed))
    d, ff = cfg.d_model, cfg.d_ff
    gamma = 0.03

    def lin(W, n_out):
        return ExportedBitLinear.from_dense(
            W, TiledBitplane, gamma=gamma, bias=np.zeros(n_out, np.float32),
            with_transpose=False, a8=True)

    Wq, Wk, Wv = (gen(d, d, s, seed=seed + i) for i in (1, 2, 3))
    linears = {
        "wq": lin(Wq, d), "wk": lin(Wk, d), "wv": lin(Wv, d),
        "wo": lin(gen(d, d, s, seed=seed + 4), d),
        "w_gate": lin(gen(d, ff, s, seed=seed + 5), ff),
        "w_up": lin(gen(d, ff, s, seed=seed + 6), ff),
        "w_down": lin(gen(ff, d, s, seed=seed + 7), d),
    }
    qkv = None
    if fused_qkv:
        qkv = {"fmt": jax.tree_util.tree_map(
                   jnp.asarray,
                   TiledBitplane.from_dense(np.hstack([Wq, Wk, Wv]))),
               "scale": jnp.full((3 * d,), gamma, jnp.float32),
               "bias": jnp.zeros((3 * d,), jnp.float32)}
    return ExportedTransformerBlock(
        cfg, linears, np.ones(d, np.float32), np.ones(d, np.float32),
        fused_ffn=fused_ffn, qkv=qkv)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=sorted(PRESETS), default="bitnet7b")
    p.add_argument("--platform", default=None)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--s", type=int, default=2)
    p.add_argument("--output",
                   default=os.path.join(
                       os.path.dirname(__file__), "..", "bench_artifacts",
                       "fused_block_decode.json"))
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.models import BitTransformerConfig
    from ternary_spgemm_tpu.models.generate import (
        _block_decode, _fused_hooks, init_cache)
    from ternary_spgemm_tpu.ops import stack_mode

    shape = PRESETS[args.preset]
    cfg = BitTransformerConfig(vocab=64, d_model=shape["d_model"],
                               n_heads=shape["n_heads"], d_ff=shape["d_ff"],
                               n_layers=1)
    B, T = 1, shape["T"]
    np.array(jax.device_put(np.zeros(8, np.float32)))

    variants = {
        "fixed": dict(fused_ffn=False, fused_qkv=False),
        "fused_ffn": dict(fused_ffn=True, fused_qkv=False),
        "fused_qkv": dict(fused_ffn=False, fused_qkv=True),
        "fused_ffn_qkv": dict(fused_ffn=True, fused_qkv=True),
    }
    cache = jax.tree_util.tree_map(
        lambda c: c, init_cache(cfg, B, T + 8)[0])
    x1 = jnp.zeros((B, 1, cfg.d_model), jnp.float32)
    dummy = jnp.zeros((8,), jnp.float32)
    out = {"preset": args.preset, "shape": shape, "s": args.s, "B": B,
           "protocol": f"{args.repeats} independent calibrated slope "
                       "estimates per variant; spread = (max-min)/median",
           "variants": {}}
    for name, kw in variants.items():
        blk = build_block(cfg, s=args.s, **kw)

        def block_fn(dz, bk, xx, cc):
            xx = xx + jnp.minimum(dz[0], 0.0)
            with stack_mode():
                lin = (lambda n, z:
                       bk.linears[n](z.reshape(B, -1))[:, None, :])
                ffn, qkv = _fused_hooks(bk, B, lambda z: (B, 1))
                y, _ = _block_decode(cfg.head_tuple, lin, bk.norm_attn,
                                     bk.norm_ffn, xx, cc, jnp.int32(T),
                                     ffn=ffn, qkv=qkv)
            return y

        r = time_device_loop(block_fn, dummy, aux=(blk, x1, cache),
                             repeats=args.repeats)
        out["variants"][name] = {
            "us": r.seconds * 1e6, "seconds_spread": r.seconds_spread,
            "n_estimates": r.n_estimates}
        print(f"{name}: {r.seconds*1e6:.2f} us "
              f"(spread {r.seconds_spread:.1%}, n={r.n_estimates})",
              flush=True)
    # the MEASURED flag picker must land on (one of) the best variants —
    # the round-4 VERDICT #6 "auto >= every fixed combination" criterion
    from ternary_spgemm_tpu.models.generate import autotune_serving_flags
    picks = autotune_serving_flags(
        cfg, None, None, rows=B, cache_len=T + 8,
        builder=lambda ffn, qkv: build_block(cfg, s=args.s, fused_ffn=ffn,
                                             fused_qkv=qkv), verbose=True)
    out["auto_picks"] = picks
    auto_name = {(False, False): "fixed", (True, False): "fused_ffn",
                 (False, True): "fused_qkv",
                 (True, True): "fused_ffn_qkv"}[
        (picks["fused_ffn"], picks["fused_qkv"])]
    out["auto_equivalent_variant"] = auto_name
    if auto_name in out["variants"]:
        best_us = min(r["us"] for r in out["variants"].values())
        auto_us = out["variants"][auto_name]["us"]
        out["auto_within_spread_of_best"] = bool(
            auto_us <= best_us * (1 + 2 * max(
                r["seconds_spread"] for r in out["variants"].values())))
        print(f"auto picked {auto_name} ({auto_us:.2f} us; best variant "
              f"{best_us:.2f})", flush=True)

    v = out["variants"]
    if "fixed" in v and "fused_ffn_qkv" in v:
        out["end_to_end_win_pct"] = round(
            100 * (1 - v["fused_ffn_qkv"]["us"] / v["fixed"]["us"]), 2)
        out["win_resolvable"] = bool(
            (v["fixed"]["us"] - v["fused_ffn_qkv"]["us"])
            > (v["fixed"]["us"] * v["fixed"]["seconds_spread"]
               + v["fused_ffn_qkv"]["us"]
               * v["fused_ffn_qkv"]["seconds_spread"]))
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in out if k != "variants"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
