#!/usr/bin/env python
"""High-sparsity study: where does the sparse-storage deposit path's time
(and its byte advantage) actually go? (SURVEY §7 hard part #1, round-4
VERDICT missing #3.)

The premise to test: at s=16 the deposit container should stream 8/s = 0.5
bits/weight — 4x less than the 2-bit flagship — yet `PallasEllDeposit_i8`
loses all 256/256 canonical configs. Two candidate explanations, both
measured here:

1. **The bytes are not actually 4x smaller.** Deposit slots pad to the
   GLOBAL max cap over all (superblock, word, column) cells; per
   (31-row word x column) cell the nonzero count is Binomial(31, 1/(2s)) —
   at s=16 its mean is ~1 but its max over millions of cells is ~6-7, so
   the stored plane inflates far beyond the 8/s-bit ideal. Part A audits
   `size_bytes()` against both the ideal and the flagship across the
   canonical sparsities (host-only, exact).
2. **The kernel's time is not where the bytes are.** Part B (TPU) runs a
   kernel ladder at s=16 shapes: the full kernel, a variant with the
   deposit loop removed (DMA + decode + dot), one with decode also removed
   (DMA + dot), and a static-cap variant (unrolled deposit loops — tests
   whether the DYNAMIC fori_loop trip counts block Mosaic's scheduling).
   The flagship at the same shape anchors the comparison.

Output: bench_artifacts/deposit_study.json.
Run (TPU): setsid nohup python -u tools/deposit_study.py > /tmp/ds.log 2>&1 &
Host-only bytes audit: python tools/deposit_study.py --bytes-only
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bytes_audit(configs, s_values=(2, 4, 8, 16)):
    """Part A: stored bytes/weight of TiledEllDeposit vs the 8/s ideal and
    the 2-bit flagship, plus the cap statistics that explain the gap."""
    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.formats import (
        TiledBitplane, TiledEllDeposit, generate_ternary)

    gen = native.gen_ternary if native.native_available() else \
        (lambda K, N, s, seed: generate_ternary(K, N, s, seed=seed))
    rows = []
    for K, N in configs:
        for s in s_values:
            W = gen(K, N, s, seed=7)
            dep = TiledEllDeposit.from_dense(W)
            bp = TiledBitplane.from_dense(W)
            kn = K * N
            row = {
                "K": K, "N": N, "s": s,
                "ideal_bits_per_weight": 8.0 / s,
                "deposit_bits_per_weight": 8.0 * dep.size_bytes() / kn,
                "flagship_bits_per_weight": 8.0 * bp.size_bytes() / kn,
                "cap_p_max": int(dep.cap_p_max),
                "cap_p_mean": float(np.asarray(dep.cap_pos).mean()),
                "cap_n_max": int(np.asarray(dep.cap_neg).max()),
                "pad_inflation": 8.0 * dep.size_bytes() / kn / (8.0 / s),
            }
            rows.append(row)
            print(f"K={K} N={N} s={s}: deposit "
                  f"{row['deposit_bits_per_weight']:.2f} b/wt "
                  f"(ideal {row['ideal_bits_per_weight']:.2f}, "
                  f"x{row['pad_inflation']:.1f} padding) vs flagship "
                  f"{row['flagship_bits_per_weight']:.2f}", flush=True)
    return rows


def _make_variant_kernel(mode: str):
    """The deposit kernel body with parts removed for attribution.
    Mirrors ops/pallas_kernels._ell_deposit_kernel; divergences are the
    study's whole point."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ternary_spgemm_tpu.ops.pallas_kernels import (
        _decode_bitplanes_merged, _i8_epilogue, _words_to_byte_rows, _IPREC)

    def kernel(cp_ref, cn_ref, ar_ref, pln_ref, ws_ref, b_ref, al_ref,
               o_ref, acc_ref, wsum_ref, *, cap_p_max: int, cap_n_max: int,
               tn: int, tm: int, has_alpha: bool):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            wsum_ref[:] = jnp.zeros_like(wsum_ref)

        zero = jnp.zeros((8, tn), jnp.int32)
        if mode == "nodecode":
            # DMA + dot only: a data-dependent but decode-free weight tile
            w = jnp.broadcast_to(
                pln_ref[0, 0, 0:1, :].astype(jnp.int8), (256, tn))
        else:
            if mode == "nodeposit":
                # DMA + decode + dot: words come from one plane row instead
                # of the deposit loop (keeps the decode chain + dot live)
                wp = zero | pln_ref[0, 0, 0:8, :].astype(jnp.int32)
                wn = zero | pln_ref[0, 0, 8:16, :].astype(jnp.int32)
            else:
                def _dep(base):
                    def body(s, w):
                        slab = pln_ref[0, 0, pl.ds(base + 8 * s, 8),
                                       :].astype(jnp.int32)
                        return w | (jnp.full((8, tn), 1, jnp.int32) << slab)
                    return body

                if mode == "staticcap":
                    # STATIC trip counts: Mosaic sees unrollable loops (the
                    # extra sentinel slots deposit bit 31, masked anyway)
                    wp = jax.lax.fori_loop(0, cap_p_max, _dep(0), zero,
                                           unroll=True)
                    wn = jax.lax.fori_loop(0, cap_n_max,
                                           _dep(8 * cap_p_max), zero,
                                           unroll=True)
                else:  # full: dynamic caps, as registered
                    cap_p = cp_ref[pl.program_id(2), pl.program_id(1)]
                    cap_n = cn_ref[pl.program_id(2), pl.program_id(1)]
                    wp = jax.lax.fori_loop(0, cap_p, _dep(0), zero)
                    wn = jax.lax.fori_loop(0, cap_n, _dep(8 * cap_p_max),
                                           zero)
            w = _decode_bitplanes_merged(_words_to_byte_rows(wp),
                                         _words_to_byte_rows(wn))
        acc_ref[:] += jnp.dot(ar_ref[:], w, preferred_element_type=jnp.int32,
                              precision=_IPREC)
        wsum_ref[:] += ws_ref[0, 0]

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
            o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)

    return kernel


def deposit_variant(X, fmt, bias, *, mode: str, tm: int = 256):
    """pallas_call wrapper mirroring pallas_ell_deposit_i8_kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ternary_spgemm_tpu.ops.pallas_kernels import (
        _compiler_params, _deposit_restructure, _int8_split, _interpret,
        _row_vec, _stack_tiles)
    from ternary_spgemm_tpu.utils import round_up

    M = X.shape[0]
    TN = fmt.tile_n
    nsb, gn, R, _ = fmt.plane.shape
    cap = max(32, (3 * 1024 * 1024) // (TN * 12) // 32 * 32)
    TM = min(round_up(M, 32), tm, cap)
    Mp = round_up(M, TM)
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, Mp - M), (0, 0)))
    r8 = jnp.pad(r8, ((0, Mp - M), (0, 0)))
    ar = _stack_tiles(_deposit_restructure(a8, nsb),
                      _deposit_restructure(r8, nsb), TM)
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(np.zeros(fmt.N, np.float32), TN)[:, :gn * TN]
    cap_n_max = R // 8 - fmt.cap_p_max
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Mp // TM, gn, nsb),
        in_specs=[
            pl.BlockSpec((2 * TM, 256), lambda i, j, k, *_: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, TN), lambda i, j, k, *_: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda i, j, k, *_: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * TM, TN), jnp.int32),
                        pltpu.VMEM((1, TN), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_make_variant_kernel(mode), cap_p_max=fmt.cap_p_max,
                          cap_n_max=cap_n_max, tn=TN, tm=TM,
                          has_alpha=False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, gn * TN), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(jnp.asarray(fmt.cap_pos), jnp.asarray(fmt.cap_neg), ar,
      jnp.asarray(fmt.plane), jnp.asarray(fmt.wsum), bp, ap)
    return out[:M, :fmt.N]


def time_ladder(configs, repeats=3):
    """Part B: the kernel ladder + flagship anchor at each config."""
    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.bench.instrument import (
        advertised_hbm_bandwidth)
    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import (
        TiledBitplane, TiledEllDeposit, generate_bias, generate_ternary,
        generate_x)
    from ternary_spgemm_tpu.ops import all_kernels
    from ternary_spgemm_tpu import reference

    gen = native.gen_ternary if native.native_available() else \
        (lambda K, N, s, seed: generate_ternary(K, N, s, seed=seed))
    beta = advertised_hbm_bandwidth()
    flag = all_kernels()["PallasTiledBitplane_i8"]
    out = []
    for M, K, N, s in configs:
        W = gen(K, N, s, seed=7)
        dep = TiledEllDeposit.from_dense(W)
        bpf = TiledBitplane.from_dense(W)
        X = jnp.asarray(generate_x(M, K, seed=1))
        bias = jnp.asarray(generate_bias(N))
        dep_dev = jax.tree_util.tree_map(jnp.asarray, dep)
        bpf_dev = jax.tree_util.tree_map(jnp.asarray, bpf)

        # correctness gates: full and staticcap variants must be exact
        want = np.asarray(reference.dense_gemm(np.asarray(X), W,
                                               np.asarray(bias)))
        row = {"M": M, "K": K, "N": N, "s": s,
               "deposit_bytes": dep.size_bytes(),
               "flagship_bytes": bpf.size_bytes(),
               "deposit_dma_ideal_us": dep.size_bytes() / beta * 1e6,
               "flagship_dma_ideal_us": bpf.size_bytes() / beta * 1e6,
               "times_us": {}, "correct": {}}
        for mode in ("full", "staticcap", "nodeposit", "nodecode"):
            fn = lambda x, f, b, _m=mode: deposit_variant(x, f, b, mode=_m)
            if mode in ("full", "staticcap"):
                got = np.asarray(jax.jit(fn)(X, dep_dev, bias))
                row["correct"][mode] = bool(
                    reference.compare_results(got, want))
            r = time_device_loop(fn, X, aux=(dep_dev, bias),
                                 repeats=repeats)
            row["times_us"][mode] = {"us": r.seconds * 1e6,
                                     "spread": r.seconds_spread}
            print(f"{M}x{K}x{N} s={s} {mode}: {r.seconds*1e6:.2f} us "
                  f"(spread {r.seconds_spread:.1%})", flush=True)
        r = time_device_loop(lambda x, f, b: flag.fn(x, f, b), X,
                             aux=(bpf_dev, bias), repeats=repeats)
        row["times_us"]["flagship"] = {"us": r.seconds * 1e6,
                                      "spread": r.seconds_spread}
        print(f"{M}x{K}x{N} s={s} flagship: {r.seconds*1e6:.2f} us",
              flush=True)
        out.append(row)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bytes-only", action="store_true")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    result = {"bytes_audit": bytes_audit(
        [(1024, 4096), (4096, 16384), (16384, 4096)])}
    if not args.bytes_only:
        import jax
        np.array(jax.device_put(np.zeros(8, np.float32)))
        result["ladder"] = time_ladder(
            [(32, 16384, 4096, 16), (32, 4096, 16384, 16),
             (32, 1024, 4096, 4)], repeats=args.repeats)
    path = os.path.join(os.path.dirname(__file__), "..", "bench_artifacts",
                        "deposit_study.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("written", path)


if __name__ == "__main__":
    main()
