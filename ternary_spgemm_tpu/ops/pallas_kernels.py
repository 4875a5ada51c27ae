"""Pallas TPU kernels — the hot path.

TPU-first re-design of the reference's kernel layer (``cpp_impl/comp.h``,
``cpp_impl/comp_prelu.h``). The reference's design space (unroll factors,
sign-interleaving, cache blocking, NEON lanes) exists to feed a scalar/4-lane
CPU; on TPU the equivalent design space is (grid tiling, VMEM staging, MXU
vs VPU, HBM bytes per weight), and the honest analysis (SURVEY.md §7) says
the op is **weight-bandwidth bound**: at the benchmark shapes the MXU
multiplies are free, so the fastest kernel is the one that moves the fewest
bits per weight from HBM. Kernel family:

=================  ==========================================================
PallasDense        tiled fused matmul over int8 densified ternary weights,
                   f32 MXU accumulate + fused bias/PReLU epilogue (8 bits/wt)
PallasDense_bf16   same, bf16 MXU operands (production fast path; X cast to
                   bf16 is inexact for |X| > 256)
PallasPacked2Bit   stride-packed 2-bit codes decoded on the VPU in-kernel,
                   then MXU dot (2 bits/wt)
PallasPacked53     base-3 codes, 5 weights/byte (1.6 bits/wt) — the
                   reference's roadmap codec (``readme.md:108-111``) as the
                   *flagship* bandwidth-optimal kernel
PallasEllGather    the TRUE sparse path: BlockedEllTCSC local-offset planes,
                   per-128-lane-block ``take_along_axis`` register shuffles
                   with masked accumulate — the TPU-native rendering of the
                   reference's gather loop (``comp.h:44-61``) / NEON vertical
                   kernels (``comp.h:1068-1149``)
=================  ==========================================================

All kernels fuse the bias + optional per-column PReLU epilogue
(``comp_prelu.h:12-70``) into the output tile write, accumulate in float32
(exact for the integer test distributions), pad every operand to tile
multiples outside the kernel (zero-padding is algebraically neutral for all
five), and run in interpreter mode automatically when no TPU is present.
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_spgemm_tpu.formats import (
    BlockedEllTCSC,
    BlockPackedTernary,
    DenseTernary,
    PackedTernary2Bit,
    PackedTernary53,
    TiledBitplane,
    TiledBlockPacked,
    TiledNibblePair,
    TiledDenseTernary,
    TiledEllDeposit,
    TiledEllTCSC,
)
from ternary_spgemm_tpu.ops.api import register_kernel
from ternary_spgemm_tpu.utils import cdiv, round_up

#: Integer MXU dots must NOT inherit an ambient ``jax.default_matmul_
#: precision("highest"/"float32")`` context — Mosaic rejects fp32 contract
#: precision on i8 operands ("Bad lhs type"), and integer accumulation is
#: exact at any precision anyway. Pinned explicitly at every int-dot site.
_IPREC = jax.lax.Precision.DEFAULT


def _interpret() -> bool:
    """Pallas kernels compile via Mosaic on TPU, interpret elsewhere (tests
    run on a CPU mesh per tests/conftest.py)."""
    return jax.default_backend() not in ("tpu", "axon")


def _compiler_params():
    """Raise the scoped-VMEM cap for the tiled kernel family: the compiler
    default is 16 MiB, which the measured-best tiles exceed (v4 fused f32
    operands 16.2-18 MiB; TiledDense_i8 at the chipgate shape 16.61 MiB with
    the PReLU epilogue live). Physical v5e VMEM is far larger; 64 MiB keeps
    double-buffering headroom while unlocking the TM=512 / TNs=4096 tiles
    that halve decode passes (kernel_v4_study.json)."""
    return None if _interpret() else pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)


def _pad2(a, m0: int, m1: int):
    s0, s1 = a.shape
    p0, p1 = round_up(s0, m0) - s0, round_up(s1, m1) - s1
    if p0 or p1:
        a = jnp.pad(a, ((0, p0), (0, p1)))
    return a


def _epilogue(y, b_ref, a_ref, has_alpha: bool):
    y = y + b_ref[:]
    if has_alpha:
        y = jnp.where(y > 0, y, a_ref[:] * y)
    return y


def _row_vec(v, n_pad: int):
    """(N,) host/jnp vector -> (1, N_pad) f32 for a lane-aligned SMEM-free load."""
    v = jnp.asarray(v, jnp.float32).reshape(1, -1)
    return _pad2(v, 1, n_pad)


# ---------------------------------------------------------------------------
# Dense fused matmul (PallasDense / PallasDense_bf16)
# ---------------------------------------------------------------------------


def _dense_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, acc_ref, *,
                  has_alpha: bool, bf16: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if bf16:
        x = x_ref[:].astype(jnp.bfloat16)
        w = w_ref[:].astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        # HIGHEST: the TPU MXU computes f32 dots via multi-pass bf16 products;
        # DEFAULT precision keeps one pass and loses low bits of |X| > 256
        # (observed max_err ~37 at the north-star shapes). HIGHEST restores
        # exact f32 — the kernels are bandwidth-bound, so the extra MXU
        # passes are free.
        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.float32),
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, a_ref, has_alpha)


def _dense_fused(X, Wd, bias, alpha, *, bf16: bool,
                 tm: int = 256, tn: int = 1024, tk: int = 1024):
    M, K = X.shape
    N = Wd.shape[1]
    TM = min(round_up(M, 8), tm)
    TN = min(round_up(N, 128), tn)
    TK = min(round_up(K, 32), tk)
    Xp = _pad2(jnp.asarray(X, jnp.float32), TM, TK)
    Wp = _pad2(jnp.asarray(Wd), TK, TN)       # int8
    bp = _row_vec(bias, TN)
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)
    grid = (Xp.shape[0] // TM, Wp.shape[1] // TN, Xp.shape[1] // TK)
    out = pl.pallas_call(
        functools.partial(_dense_kernel, has_alpha=alpha is not None, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], Wp.shape[1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(Xp, Wp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasDense", DenseTernary,
    description="tiled fused int8-dense -> f32 MXU matmul + bias/PReLU epilogue",
    reference="strategy inversion of cpp_impl/comp.h; epilogue comp_prelu.h:12-70")
def pallas_dense_kernel(X, fmt: DenseTernary, bias, alpha=None, **tiles):
    return _dense_fused(X, fmt.dense, bias, alpha, bf16=False, **tiles)


@register_kernel(
    "PallasDense_bf16", DenseTernary,
    description="tiled fused bf16 MXU matmul (inexact for |X|>256)",
    approximate=True, x_bytes=2.0)
def pallas_dense_bf16_kernel(X, fmt: DenseTernary, bias, alpha=None, **tiles):
    return _dense_fused(X, fmt.dense, bias, alpha, bf16=True, **tiles)


# ---------------------------------------------------------------------------
# Packed decode-and-dot (PallasPacked2Bit / PallasPacked53)
# ---------------------------------------------------------------------------


def _packed_kernel(x_ref, p_ref, b_ref, a_ref, o_ref, acc_ref, *,
                   factor: int, base3: bool, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:].astype(jnp.int32)
    q = p
    for j in range(factor):
        if base3:
            # Strength-reduced base-3 digit extraction: (q*171)>>9 == q//3
            # exactly for 0 <= q < 512 (the VPU has no cheap integer divide).
            qn = (q * 171) >> 9
            d = q - 3 * qn
            q = qn
            w = (d - 3 * (d >> 1)).astype(jnp.float32)   # {0,1,2} -> {0,+1,-1}
        else:
            c = (p >> (2 * j)) & 3
            w = ((c & 1) - (c & 2)).astype(jnp.float32)  # {0,1,3} -> {0,+1,-1}
        acc_ref[:] += jnp.dot(x_ref[:, j, :], w,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)  # see _dense_kernel

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, a_ref, has_alpha)


def _packed_fused(X, packed, K: int, N: int, factor: int, bias, alpha, *,
                  base3: bool, tm: int = 128, tn: int = 1024, tkq: int = 512):
    """Stride-packed decode-and-dot: packed byte row k' holds dense rows
    {k' + j*Kq}, so X.reshape(M, factor, Kq)[:, j, :] lines up with decoded
    field j (formats/packed.py 'Stride packing')."""
    M = X.shape[0]
    Kq = packed.shape[0]
    TM = min(round_up(M, 8), tm)
    TN = min(round_up(N, 128), tn)
    TKq = min(round_up(Kq, 128), tkq)
    # Pad K up to factor*Kq, reshape to stride fields, then pad Kq to TKq.
    Xp = jnp.asarray(X, jnp.float32)
    Xp = jnp.pad(Xp, ((0, round_up(M, TM) - M), (0, factor * Kq - K)))
    Xp = Xp.reshape(Xp.shape[0], factor, Kq)
    Kq_pad = round_up(Kq, TKq)
    if Kq_pad != Kq:
        Xp = jnp.pad(Xp, ((0, 0), (0, 0), (0, Kq_pad - Kq)))
    Pp = _pad2(jnp.asarray(packed), TKq, TN)  # zero bytes decode to weight 0
    bp = _row_vec(bias, TN)
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)
    grid = (Xp.shape[0] // TM, Pp.shape[1] // TN, Kq_pad // TKq)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, factor=factor, base3=base3,
                          has_alpha=alpha is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, factor, TKq), lambda i, j, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TKq, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], Pp.shape[1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(Xp, Pp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasPacked2Bit", PackedTernary2Bit,
    description="2-bit codes (2 bits/weight): VPU decode -> MXU dot, fused epilogue",
    reference="readme.md:108-111 roadmap codec, power-of-two variant")
def pallas_packed2_kernel(X, fmt: PackedTernary2Bit, bias, alpha=None, **tiles):
    # K from X: under shard_map fmt.K is reconstructed from padded packed rows.
    return _packed_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                         alpha, base3=False, **tiles)


@register_kernel(
    "PallasPacked53", PackedTernary53,
    description="base-3 codes (1.6 bits/weight): VPU decode -> MXU dot — the "
                "flagship bandwidth-optimal kernel",
    reference="readme.md:108-111 ('8 bits for 5 values')")
def pallas_packed53_kernel(X, fmt: PackedTernary53, bias, alpha=None, **tiles):
    return _packed_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                         alpha, base3=True, **tiles)


# ---------------------------------------------------------------------------
# Integer-activation int8 MXU kernels (PallasDense_i8 / PallasPacked*_i8)
#
# The TPU's int8 MXU runs at 2x the bf16 rate and 6x the f32-HIGHEST rate,
# with exact int32 accumulation. Activations integer-valued in [-512, 512]
# (the reference's test distribution, perf.cpp:301, and the BitNet
# W1.58-A-int deployment regime) split exactly as x = 8a + r - 512 with
# a in [0,127], r in [0,15] — two int8 operands. Then
#     sum_k x[k] w[k] = 8 (a . w) + (r . w) - 512 sum_k w[k],
# where sum_k w[k] is a per-column weight sum accumulated on the VPU.
# Measured at the north-star config: 8.5us vs 13.7us for f32-HIGHEST —
# the fastest exact kernels in the registry. Non-integer X is rounded
# (the wrapper quantizes via floor on x + 512), so for float activations
# these kernels compute SpMM of round(x) — use the f32 kernels there.
# ---------------------------------------------------------------------------


def _int8_split(X):
    """x (f32, integer-valued, |x| <= 512) -> (a8, r8) with x = 8a + r - 512."""
    t = jnp.asarray(X, jnp.float32) + 512.0
    a = jnp.minimum(jnp.floor(t * 0.125), 127.0)
    r = t - 8.0 * a
    return a.astype(jnp.int8), r.astype(jnp.int8)


def _i8_epilogue(acc, wsum, b_ref, a_ref, has_alpha):
    y = (acc - 512 * wsum).astype(jnp.float32)
    return _epilogue(y, b_ref, a_ref, has_alpha)


def _dense_i8_kernel(a_ref, r_ref, w_ref, b_ref, al_ref, o_ref, acc_ref,
                     wsum_ref, *, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = w_ref[:]
    acc_ref[:] += 8 * jnp.dot(a_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref, has_alpha)


def _dense_i8s_kernel(ar_ref, w_ref, b_ref, al_ref, o_ref, acc_ref,
                      wsum_ref, *, tm: int, has_alpha: bool):
    """Stacked variant: (a; r) concatenated along M -> ONE int8 dot per
    K-step; the 8*hi + lo recombine happens once, in the epilogue."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = w_ref[:]
    acc_ref[:] += jnp.dot(ar_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _stack_tiles(a8, r8, TM):
    """Interleave (a, r) per M-tile: rows [2i*TM, (2i+1)*TM) = a-tile i,
    [(2i+1)*TM, (2i+2)*TM) = r-tile i — one contiguous (2TM, K) block per
    grid row."""
    gm = a8.shape[0] // TM
    K = a8.shape[1]
    return jnp.concatenate(
        [a8.reshape(gm, TM, K), r8.reshape(gm, TM, K)], axis=1
    ).reshape(gm * 2 * TM, K)


def _dense_i8_fused(X, Wd, bias, alpha, *, tm: int = 256, tn: int = 1024,
                    tk: int = 1024, stacked: bool = True):
    M, K = X.shape
    N = Wd.shape[1]
    TM = min(round_up(M, 32), tm)   # int8 sublane tile = 32
    TN = min(round_up(N, 128), tn)
    TK = min(round_up(K, 32), tk)
    a8, r8 = _int8_split(X)
    a8 = _pad2(a8, TM, TK)
    r8 = _pad2(r8, TM, TK)
    Wp = _pad2(jnp.asarray(Wd), TK, TN)
    bp = _row_vec(bias, TN)
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)
    grid = (a8.shape[0] // TM, Wp.shape[1] // TN, a8.shape[1] // TK)
    common = dict(
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a8.shape[0], Wp.shape[1]), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )
    w_spec = pl.BlockSpec((TK, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)
    if stacked:
        ar = _stack_tiles(a8, r8, TM)
        out = pl.pallas_call(
            functools.partial(_dense_i8s_kernel, tm=TM,
                              has_alpha=alpha is not None),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                w_spec, vec_spec, vec_spec,
            ],
            scratch_shapes=[pltpu.VMEM((2 * TM, TN), jnp.int32),
                            pltpu.VMEM((1, TN), jnp.int32)],
            **common,
        )(ar, Wp, bp, ap)
    else:
        out = pl.pallas_call(
            functools.partial(_dense_i8_kernel, has_alpha=alpha is not None),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                w_spec, vec_spec, vec_spec,
            ],
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32),
                            pltpu.VMEM((1, TN), jnp.int32)],
            **common,
        )(a8, r8, Wp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasDense_i8", DenseTernary,
    description="int8-split MXU path (x = 8a + r - 512): exact for "
                "integer activations |x|<=512 at 2x bf16 MXU rate",
    reference="strategy inversion of cpp_impl/comp.h; activation domain "
              "matches perf.cpp:301 (initX +-512)",
    x_absmax=512, x_bytes=2.0)
def pallas_dense_i8_kernel(X, fmt: DenseTernary, bias, alpha=None, **tiles):
    return _dense_i8_fused(X, fmt.dense, bias, alpha, **tiles)


def _packed_i8_kernel(a_ref, r_ref, p_ref, b_ref, al_ref, o_ref, acc_ref,
                      wsum_ref, *, factor: int, base3: bool, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    p = p_ref[:].astype(jnp.int32)
    q = p
    for j in range(factor):
        if base3:
            qn = (q * 171) >> 9          # == q // 3 for q < 512
            d = q - 3 * qn
            q = qn
            w = (d - 3 * (d >> 1)).astype(jnp.int8)
        else:
            c = (p >> (2 * j)) & 3
            w = ((c & 1) - (c & 2)).astype(jnp.int8)
        acc_ref[:] += 8 * jnp.dot(a_ref[:, j, :], w, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(r_ref[:, j, :], w, preferred_element_type=jnp.int32, precision=_IPREC)
        wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref, has_alpha)


def _packed_i8_fused(X, packed, K: int, N: int, factor: int, bias, alpha, *,
                     base3: bool, tm: int = 128, tn: int = 1024, tkq: int = 512):
    M = X.shape[0]
    Kq = packed.shape[0]
    TM = min(round_up(M, 32), tm)
    TN = min(round_up(N, 128), tn)
    TKq = min(round_up(Kq, 128), tkq)
    a8, r8 = _int8_split(X)

    def fieldize(Z):
        Z = jnp.pad(Z, ((0, round_up(M, TM) - M), (0, factor * Kq - K)))
        Z = Z.reshape(Z.shape[0], factor, Kq)
        if round_up(Kq, TKq) != Kq:
            Z = jnp.pad(Z, ((0, 0), (0, 0), (0, round_up(Kq, TKq) - Kq)))
        return Z

    a8, r8 = fieldize(a8), fieldize(r8)
    Pp = _pad2(jnp.asarray(packed), TKq, TN)
    bp = _row_vec(bias, TN)
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)
    grid = (a8.shape[0] // TM, Pp.shape[1] // TN, a8.shape[2] // TKq)
    out = pl.pallas_call(
        functools.partial(_packed_i8_kernel, factor=factor, base3=base3,
                          has_alpha=alpha is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, factor, TKq), lambda i, j, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, factor, TKq), lambda i, j, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TKq, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a8.shape[0], Pp.shape[1]), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32),
                        pltpu.VMEM((1, TN), jnp.int32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(a8, r8, Pp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasPacked2Bit_i8", PackedTernary2Bit,
    description="2-bit decode -> int8-split MXU dots (exact for integer "
                "activations |x|<=512); the flagship exact kernel",
    reference="readme.md:108-111 roadmap codec; activation domain perf.cpp:301",
    x_absmax=512, x_bytes=2.0)
def pallas_packed2_i8_kernel(X, fmt: PackedTernary2Bit, bias, alpha=None, **tiles):
    return _packed_i8_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                            alpha, base3=False, **tiles)


@register_kernel(
    "PallasPacked53_i8", PackedTernary53,
    description="base-3 decode (strength-reduced) -> int8-split MXU dots "
                "(exact for integer activations |x|<=512)",
    reference="readme.md:108-111 ('8 bits for 5 values')",
    x_absmax=512, x_bytes=2.0)
def pallas_packed53_i8_kernel(X, fmt: PackedTernary53, bias, alpha=None, **tiles):
    return _packed_i8_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                            alpha, base3=True, **tiles)


# ---------------------------------------------------------------------------
# Block-packed single-dot kernel (PallasBlockPacked_i8) — the flagship.
#
# The global stride layouts force `factor` separate MXU dots per K-step
# (one per decoded field); at small M the per-dot overhead erases the
# bandwidth win of packing. The BlockPackedTernary layout localizes the
# stride within blocks of factor*tile_kq dense rows, so the decoded fields
# concatenate (along sublanes) into ONE contiguous weight tile and the
# kernel does ONE int8 dot per (a, r) operand per K-block.
# ---------------------------------------------------------------------------


def _decode_block(p, factor: int):
    """Decode a packed int32 tile into the concatenated (factor*TKq, TN)
    int8 weight tile (contiguous dense rows under block-local striding).

    factor=4 (2-bit codes): per-field *arithmetic sign-extend* — shift the
    2-bit field to bits 30-31, then shift arithmetically back down: codes
    {0,1,3} land on {0,+1,-1} in 2 shifts + 1 narrowing per field (~3 VPU
    ops/weight vs ~6 for the round-1 mask-and-map chain; measured 122.8 us
    vs 231.9 us at M=32, K=N=11008).
    """
    ws = []
    q = p
    for j in range(factor):
        if factor == 5:
            qn = (q * 171) >> 9          # == q // 3 for q < 512
            d = q - 3 * qn
            q = qn
            ws.append((d - 3 * (d >> 1)).astype(jnp.int8))
        else:
            ws.append(((p << (30 - 2 * j)) >> 30).astype(jnp.int8))
    return jnp.concatenate(ws, axis=0)


def _blockpacked_i8_kernel(a_ref, r_ref, p_ref, b_ref, al_ref, o_ref,
                           acc_ref, wsum_ref, *, factor: int, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w_full = _decode_block(p_ref[:].astype(jnp.int32), factor)
    acc_ref[:] += 8 * jnp.dot(a_ref[:], w_full, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:], w_full, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w_full.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref, has_alpha)


def _blockpacked_i8s_kernel(ar_ref, p_ref, b_ref, al_ref, o_ref,
                            acc_ref, wsum_ref, *, factor: int, tm: int,
                            has_alpha: bool):
    """Stacked (a; r) variant: one int8 dot per K-block (see _dense_i8s)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w_full = _decode_block(p_ref[:].astype(jnp.int32), factor)
    acc_ref[:] += jnp.dot(ar_ref[:], w_full, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w_full.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


@register_kernel(
    "PallasBlockPacked_i8", BlockPackedTernary,
    description="block-local packed codes -> single int8 MXU dot per K-block "
                "(exact for integer activations |x|<=512); flagship kernel",
    reference="readme.md:108-111 roadmap codec + BlockedTCSC.h cache-coupled "
              "blocking, fused epilogue comp_prelu.h:12-70",
    x_absmax=512, x_bytes=2.0)
def pallas_blockpacked_i8_kernel(X, fmt: BlockPackedTernary, bias, alpha=None,
                                 *, tm: int = 256, tn: int = 1024,
                                 stacked: bool = False):
    # measured at the north-star config: unstacked 8.4us vs stacked 10.8us
    # at tile_kq=256 (the two-dot latency hides under the decode anyway)
    M = X.shape[0]
    N = fmt.N
    f, TKq = fmt.factor, fmt.tile_kq
    B = f * TKq
    nb = fmt.num_blocks
    TM = min(round_up(M, 32), tm)
    TN = min(round_up(N, 128), tn)
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, round_up(M, TM) - M), (0, nb * B - X.shape[1])))
    r8 = jnp.pad(r8, ((0, round_up(M, TM) - M), (0, nb * B - X.shape[1])))
    Pp = _pad2(jnp.asarray(fmt.packed), TKq, TN)
    bp = _row_vec(bias, TN)
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)
    grid = (a8.shape[0] // TM, Pp.shape[1] // TN, nb)
    p_spec = pl.BlockSpec((TKq, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)
    common = dict(
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a8.shape[0], Pp.shape[1]), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )
    if stacked:
        ar = _stack_tiles(a8, r8, TM)
        out = pl.pallas_call(
            functools.partial(_blockpacked_i8s_kernel, factor=f, tm=TM,
                              has_alpha=alpha is not None),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * TM, B), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                p_spec, vec_spec, vec_spec,
            ],
            scratch_shapes=[pltpu.VMEM((2 * TM, TN), jnp.int32),
                            pltpu.VMEM((1, TN), jnp.int32)],
            **common,
        )(ar, Pp, bp, ap)
    else:
        out = pl.pallas_call(
            functools.partial(_blockpacked_i8_kernel, factor=f,
                              has_alpha=alpha is not None),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, B), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, B), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                p_spec, vec_spec, vec_spec,
            ],
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32),
                            pltpu.VMEM((1, TN), jnp.int32)],
            **common,
        )(a8, r8, Pp, bp, ap)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Tile-contiguous int8 kernels (PallasTiledDense_i8 / PallasTiledBlockPacked_i8)
#
# The 2-D HBM layouts stream at only ~230 GB/s beyond ~100 MB (strided tile
# DMA); the 4-D tile-contiguous layouts (formats/tiled.py) reach 640-740
# GB/s — ~90% of HBM bandwidth. Kernels are the int8-split scheme with the
# grid ordered (n, k) so each W DMA is one contiguous (1, 1, TK, TN) tile.
# Measured at K=N=11008, M=32: 183 us vs 550 us for the row-major layout.
# ---------------------------------------------------------------------------


def _tiled_dense_i8_kernel(a_ref, r_ref, w_ref, b_ref, al_ref, o_ref,
                           acc_ref, wsum_ref, *, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = w_ref[0, 0]
    acc_ref[:] += 8 * jnp.dot(a_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref, has_alpha)


def _tiled_call(kernel, a8, r8, tiles, bp, ap, *, TM, TK_eff, TN,
                scratch_rows, split: int = 1, wsum_scratch: bool = True):
    """split > 1 sub-tiles the storage tile's N dim: compute tiles are
    (TM, TN/split), weight DMA slabs stay byte-row-contiguous."""
    gk, gn = tiles.shape[0], tiles.shape[1]
    TNs = TN // split
    grid = (a8.shape[0] // TM, gn * split, gk)
    x_specs = [pl.BlockSpec((TM, TK_eff), lambda i, j, k: (i, k),
                            memory_space=pltpu.VMEM)]
    if r8 is not None:
        x_specs.append(pl.BlockSpec((TM, TK_eff), lambda i, j, k: (i, k),
                                    memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((1, 1, tiles.shape[2], TNs),
                         lambda i, j, k: (k, j // split, 0, j % split),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TNs), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TNs), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TNs), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a8.shape[0], gn * TN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((scratch_rows, TNs), jnp.int32)] +
                       ([pltpu.VMEM((1, TNs), jnp.int32)]
                        if wsum_scratch else []),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )
    args = (a8, tiles, bp, ap) if r8 is None else (a8, r8, tiles, bp, ap)
    return out(*args)


def _tiled_tm(M: int, TN: int) -> int:
    """VMEM-aware M-tile: the i32 accumulator + f32 out tile cost TM*TN*8
    bytes; cap them at ~3MB so weight double-buffering fits in 16MB VMEM.
    Large M pays multiple weight passes — still >500GB/s per pass."""
    cap = max(32, (3 * 1024 * 1024) // (TN * 8) // 32 * 32)
    return min(round_up(M, 32), cap)


def _choose_tiles(M: int, K: int, N: int, tile_n: int, cell_bytes: int,
                  x_mult: int, w_bits: float,
                  budget: int = 6 * 1024 * 1024):
    """Pick (TM, TNs, split): the COMPUTE tile width TNs may be a power-of-2
    fraction of the STORAGE tile width (BlockSpec sub-tiling of the last
    plane dim — DMA slabs stay contiguous per byte-row), trading narrower
    output tiles for a taller TM under the VMEM budget.

    Every M-tile pass re-streams AND re-decodes the whole weight plane
    (grid order (m, n, k)), while every extra N-tile column re-streams the
    activations — so minimize the modeled HBM traffic
        gm * (2 * w_bytes)            # weight fetch + decode cost proxy
      + (N / TNs) * x_mult * Mp * K   # activation refetch per N-tile
    over TNs in {tile_n, tile_n/2, ..., 512}. This is what makes large M
    viable: at M<=TM_max the plane streams exactly once and every weight
    decodes ONCE (round-1 re-decoded per M-tile, VERDICT weak at M>=512).

    cell_bytes: accumulator+output VMEM bytes per (m, n) cell (12 stacked
    int8-split, 8 unstacked); x_mult: activation rows per logical row (2
    stacked, 1 int8-native).
    """
    want = round_up(M, 32)
    w_bytes = int(K * N * w_bits) // 8
    best = None
    TNs = tile_n
    while True:
        cap = max(32, (budget // (TNs * cell_bytes)) // 32 * 32)
        TM = min(want, cap)
        gm = -(-want // TM)
        traffic = gm * 2 * w_bytes + (N // TNs) * x_mult * want * K
        if best is None or traffic < best[0]:
            best = (traffic, TM, TNs, tile_n // TNs)
        if TNs <= 512 or (TNs // 2) % 128:
            break
        TNs //= 2
    return best[1], best[2], best[3]


@register_kernel(
    "PallasTiledDense_i8", TiledDenseTernary,
    description="tile-contiguous int8 plane -> int8-split MXU dots; streams "
                "~90% of HBM bandwidth at 100MB+ weights (exact for integer "
                "activations |x|<=512)",
    reference="strategy inversion of cpp_impl/comp.h; HBM-resident buffer "
              "layout per BASELINE.json north star",
    x_absmax=512, x_bytes=2.0)
def pallas_tiled_dense_i8_kernel(X, fmt: TiledDenseTernary, bias, alpha=None):
    M = X.shape[0]
    TK, TN = fmt.tile_k, fmt.tile_n
    gk = fmt.tiles.shape[0]
    TM, _, split = _choose_tiles(M, fmt.K, fmt.N, TN, cell_bytes=8,
                                 x_mult=2, w_bits=8)
    Mp = round_up(M, TM)
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, Mp - M), (0, gk * TK - X.shape[1])))
    r8 = jnp.pad(r8, ((0, Mp - M), (0, gk * TK - X.shape[1])))
    bp = _row_vec(bias, TN)[:, :fmt.tiles.shape[1] * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :fmt.tiles.shape[1] * TN]
    out = _tiled_call(
        functools.partial(_tiled_dense_i8_kernel, has_alpha=alpha is not None),
        a8, r8, jnp.asarray(fmt.tiles), bp, ap,
        TM=TM, TK_eff=TK, TN=TN, scratch_rows=TM, split=split)
    return out[:M, :fmt.N]


def _tiled_dense_x8_kernel(x_ref, w_ref, b_ref, al_ref, o_ref, acc_ref, *,
                           has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[0, 0],
                          preferred_element_type=jnp.int32, precision=_IPREC)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:].astype(jnp.float32), b_ref, al_ref,
                             has_alpha)


@register_kernel(
    "PallasTiledDense_x8", TiledDenseTernary,
    description="tile-contiguous int8 plane with int8-NATIVE activations: "
                "one unstacked int8 MXU dot per K-step — half the MXU work "
                "of the 8a+r split at large M (exact for integer "
                "activations |x|<=127, clamps outside)",
    reference="strategy inversion of cpp_impl/comp.h; BitNet W1.58-A8 "
              "regime (SURVEY.md §6)",
    x_absmax=127, x_bytes=1.0)
def pallas_tiled_dense_x8_kernel(X, fmt: TiledDenseTernary, bias, alpha=None):
    M = X.shape[0]
    TK, TN = fmt.tile_k, fmt.tile_n
    gk = fmt.tiles.shape[0]
    TM, _, split = _choose_tiles(M, fmt.K, fmt.N, TN, cell_bytes=8,
                                 x_mult=1, w_bits=8)
    Mp = round_up(M, TM)
    x8 = jnp.pad(_to_x8(X), ((0, Mp - M), (0, gk * TK - X.shape[1])))
    bp = _row_vec(bias, TN)[:, :fmt.tiles.shape[1] * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :fmt.tiles.shape[1] * TN]
    out = _tiled_call(
        functools.partial(_tiled_dense_x8_kernel, has_alpha=alpha is not None),
        x8, None, jnp.asarray(fmt.tiles), bp, ap,
        TM=TM, TK_eff=TK, TN=TN, scratch_rows=TM, split=split,
        wsum_scratch=False)
    return out[:M, :fmt.N]


def _tiled_blockpacked_i8_kernel(a_ref, r_ref, p_ref, b_ref, al_ref, o_ref,
                                 acc_ref, wsum_ref, *, factor: int,
                                 has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = _decode_block(p_ref[0, 0].astype(jnp.int32), factor)  # (factor*TKq, TN)
    acc_ref[:] += 8 * jnp.dot(a_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref, has_alpha)


def _tiled_blockpacked_i8s_kernel(ar_ref, p_ref, b_ref, al_ref, o_ref,
                                  acc_ref, wsum_ref, *, factor: int, tm: int,
                                  has_alpha: bool):
    """Stacked (a; r) variant: ONE int8 dot per K-step (measured 109.3 us vs
    122.8 us unstacked at M=32, K=N=11008 — the MXU weight-load is paid once
    instead of twice)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = _decode_block(p_ref[0, 0].astype(jnp.int32), factor)
    acc_ref[:] += jnp.dot(ar_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


@register_kernel(
    "PallasTiledBlockPacked_i8", TiledBlockPacked,
    description="tile-contiguous block-local packed codes (2 or 1.6 bits/"
                "weight) -> decode + stacked int8-split MXU dot (exact for "
                "integer activations |x|<=512)",
    reference="readme.md:108-111 roadmap codec + HBM-resident buffer layout",
    x_absmax=512, x_bytes=2.0)
def pallas_tiled_blockpacked_i8_kernel(X, fmt: TiledBlockPacked, bias,
                                       alpha=None, *, stacked: bool = True):
    M = X.shape[0]
    TKq, TN, f = fmt.tile_kq, fmt.tile_n, fmt.factor
    B = f * TKq
    nb = fmt.num_blocks
    gn = fmt.tiles.shape[1]
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
    if stacked:
        # stacked acc (2TM, TN) i32 + out (TM, TN) f32 = TM*TN*12 bytes
        TM = min(round_up(M, 32),
                 max(32, (3 * 1024 * 1024) // (TN * 12) // 32 * 32))
    else:
        TM = _tiled_tm(M, TN)
    Mp = round_up(M, TM)
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    r8 = jnp.pad(r8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    if not stacked:
        out = _tiled_call(
            functools.partial(_tiled_blockpacked_i8_kernel, factor=f,
                              has_alpha=alpha is not None),
            a8, r8, jnp.asarray(fmt.tiles), bp, ap,
            TM=TM, TK_eff=B, TN=TN, scratch_rows=TM)
        return out[:M, :fmt.N]
    ar = _stack_tiles(a8, r8, TM)
    tiles = jnp.asarray(fmt.tiles)
    out = pl.pallas_call(
        functools.partial(_tiled_blockpacked_i8s_kernel, factor=f, tm=TM,
                          has_alpha=alpha is not None),
        grid=(Mp // TM, gn, nb),
        in_specs=[
            pl.BlockSpec((2 * TM, B), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tiles.shape[2:], lambda i, j, k: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, gn * TN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * TM, TN), jnp.int32),
                        pltpu.VMEM((1, TN), jnp.int32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(ar, tiles, bp, ap)
    return out[:M, :fmt.N]


# ---------------------------------------------------------------------------
# Bitplane deposit-decode kernels (PallasTiledBitplane_{i8,x8,bf16}) — the
# flagship family. 2 bits/weight in HBM; decode = magic-multiply bit deposit
# + hardware bitcast with signs merged in-register (~1.75 VPU int32-lane ops
# per weight after the round-3 trims). The two deposited nibble groups feed
# TWO MXU dots against the matching column halves of the activation block —
# the concatenated (8*tkb, TN) weight tile of round 2 is never materialized.
#
# Round-3 measured design rules (TPU v5e, see docs/perf.md §13):
#   * tkb=128 K-blocks (B=1024 dense rows/step): the int8 MXU sustains
#     159 T MACs/s at K-chunks >= 1024 vs 147 at 256; 81.5 us at M=32,
#     K=N=11008 vs 100.9 us for the round-2 tkb=32 concat kernel.
#   * serving M (<= 128): ONE stacked (a; r) M-tile, full-width (4096) tiles
#     — 5.1-5.3 us north-star.
#   * larger M: UNstacked a/r dots. Skips the (a; r) stack copy — a pure
#     HBM pass worth ~86 us at M=4000 — and keeps the accumulator at
#     (256, 2048) i32 (the stacked variant's (2TM, TNs) overflows Mosaic's
#     budget at TM >= 512). 106 us at M=512 K=N=4096 vs 122.6 round 2.
#   * decode stays in registers: a VMEM-persistent decoded strip (decode-
#     once-per-(n,k), reused across M-tiles) measured STRICTLY WORSE
#     (141 us at M=512, 263 us at 11008² M=32) — the scratch round-trip
#     costs more than re-deposition.
# ---------------------------------------------------------------------------

_DEPOSIT_MUL = 0x00204081   # 1 + 2^7 + 2^14 + 2^21: bit j -> byte j, no carries
_BYTE_LO = 0x01010101


def _words_to_byte_rows(word):
    """int32 (T, N) -> int8 (4T, N): row 4t+b = byte b (LSB first) of word[t].

    On TPU this is a single register reinterpret (``pltpu.bitcast``; byte
    order probed on v5e). Interpret mode reproduces the identical mapping
    with ``lax.bitcast_convert_type`` (little-endian trailing byte dim).
    """
    T, N = word.shape
    if _interpret():
        b = jax.lax.bitcast_convert_type(word, jnp.int8)   # (T, N, 4)
        return b.transpose(0, 2, 1).reshape(4 * T, N)
    return pltpu.bitcast(word, jnp.int8)


def _deposit_nibbles(b32):
    """int32 byte values (T, N) -> two int32 word tiles whose bytes are bits
    0-3 / 4-7 of each byte, as 0/1 bytes (no carries: the shifted copies of
    the magic multiply never overlap within a 4-bit window)."""
    lo = ((b32 & 0xF) * _DEPOSIT_MUL) & _BYTE_LO
    hi = (((b32 >> 4) & 0xF) * _DEPOSIT_MUL) & _BYTE_LO
    return lo, hi


def _decode_bitplanes_merged(pp8, pn8):
    """pos/neg uint8 bitplane rows (T, N) -> ternary int8 rows (8T, N).

    Signs merge in-register: a neg bit deposits byte 0x01, scaled by 0xFF to
    0xFF (= int8 -1; no cross-byte carry since each byte is 0 or 1) and OR'd
    with the pos plane (pos/neg are disjoint by construction). One stacked
    MXU dot then consumes the merged plane — measured 97.7 us vs 111.5 us
    for the two-dot pos-minus-neg form at M=32, K=N=11008."""
    plo, phi = _deposit_nibbles(pp8.astype(jnp.int32))
    nlo, nhi = _deposit_nibbles(pn8.astype(jnp.int32))
    wlo = plo | (nlo * 0xFF)
    whi = phi | (nhi * 0xFF)
    return jnp.concatenate(
        [_words_to_byte_rows(wlo), _words_to_byte_rows(whi)], axis=0)


def _decode_halves_u8(pp8, pn8):
    """uint8 plane rows (T, N) -> (lo, hi) merged-sign int8 row groups.

    ``lo``/``hi`` are the decoded dense rows [0, 4T) / [4T, 8T) of the block
    (``bitplane_rowmap``), each (4T, N). Two round-3 trims vs
    :func:`_decode_bitplanes_merged`: the high-nibble ``& 0xF`` is dropped
    (plane rows are ZERO-extended uint8, so ``>> 4`` already is the nibble —
    unlike the ell-deposit path, whose byte rows are signed int8) and the
    (8T, N) concatenated tile is never built — callers dot each half against
    the matching activation column half (measured 86.3 vs 88.9 us at M=32,
    K=N=11008)."""
    p32 = pp8.astype(jnp.int32)
    n32 = pn8.astype(jnp.int32)
    plo = ((p32 & 0xF) * _DEPOSIT_MUL) & _BYTE_LO
    phi = ((p32 >> 4) * _DEPOSIT_MUL) & _BYTE_LO
    nlo = ((n32 & 0xF) * _DEPOSIT_MUL) & _BYTE_LO
    nhi = ((n32 >> 4) * _DEPOSIT_MUL) & _BYTE_LO
    return (_words_to_byte_rows(plo | (nlo * 0xFF)),
            _words_to_byte_rows(phi | (nhi * 0xFF)))


def _sub_tile_n(TN: int, cap: int = 2048) -> int:
    """Largest 128-multiple divisor of the storage tile width ``TN`` that is
    <= ``cap`` (falls back to ``TN`` itself when no divisor fits, e.g. a
    prime 128-multiple). The compute tile MUST divide the storage tile:
    ``min(2048, TN)`` with truncating ``TN // TNs`` left output columns
    >= split*TNs unvisited for TN in (2048, 4096) not a multiple of 2048
    (ADVICE round 3, high)."""
    q = TN // 128
    best = 0
    d = 1
    while d * d <= q:
        if q % d == 0:
            for c in (d, q // d):
                if c * 128 <= cap and c > best:
                    best = c
        d += 1
    return best * 128 if best else TN


#: When True, `_bitplane_tiles` keeps FULL-WIDTH compute tiles at serving M
#: even for single-grid-step calls: inside a multi-layer jitted program,
#: neighboring pallas calls already prefetch across the call boundary, so
#: the §15 isolated-call N-split rule INVERTS — full width measured 30.6 vs
#: 31.4 us at L=8 and 2.65 vs 3.26 us/layer deep-stack marginal
#: (docs/perf.md §16, chain_amortized.json). Set via :func:`stack_mode`
#: around model-serving traces; a TRACE-time flag (baked into the compiled
#: program), not a runtime switch. A ContextVar so concurrent traces in
#: different threads/tasks cannot race on the flag.
_STACK_MODE = contextvars.ContextVar("ternary_spgemm_stack_mode",
                                     default=False)


class stack_mode:
    """Context manager: trace bitplane kernels with the measured IN-STACK
    tile rule (full-width serving tiles — docs/perf.md §16). Used by the
    exported model stacks (``models/exported.py``, ``models/generate.py``)
    around their layer loops; the isolated-call default stays the §15
    2-step split, which wins for a lone dispatch.

    Thread/trace-local (ContextVar). NOTE it is a *trace-time* flag and not
    part of ``jax.jit``'s cache key: a function first traced outside
    ``stack_mode`` and called again inside it hits the jit cache and reuses
    the earlier tiling — retrace (new jit wrapper, or different static args)
    when the mode must change for the same python callable."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        self._token = _STACK_MODE.set(self.enabled)
        return self

    def __exit__(self, *exc):
        _STACK_MODE.reset(self._token)
        return False


def _bitplane_tiles(M: int, TN: int, steps: int = None):
    """v4 tile rule (measured, docs/perf.md §14-15) -> (TM, TNs, split, stacked).

    Serving M (<= 128 rows padded): one stacked (a; r) M-tile over full-width
    tiles — EXCEPT when the whole call would be a single grid step
    (``steps`` = nb*gn == 1, e.g. the north-star 32x1024x4096): one step
    gives Mosaic nothing to pipeline, so the plane DMA, VPU decode and MXU
    dot serialize. Splitting N into two compute tiles measured 4.88 us vs
    5.28 at the north star (kernel_v4_study.json nssplit/*; K-splits and
    4-way N-splits are slower — two steps is the sweet spot: one DMA window
    hidden, minimal per-step overhead). Inside :class:`stack_mode` the split
    is SKIPPED: neighboring calls in a multi-layer program already hide the
    DMA window the split existed to create (docs/perf.md §16).

    Larger M: unstacked dots with TM = 512 and full-width (up to 4096
    lane) compute tiles — the v3 TM=256/TNs=2048 caps existed only to fit the
    compiler's default 16 MiB scoped-VMEM limit; with the cap raised
    (``_bitplane_call``) the taller/wider tiles halve both the number of
    weight-decode passes (the binding resource at big K*N) and the X
    re-streaming: measured 105.5 -> 98.0 us at M=512 K=N=4096 and
    810.8 -> 783.6 us at M=512 K=N=11008 (kernel_v4_study.json). The compute
    width is always an exact divisor of the storage tile
    (see :func:`_sub_tile_n`)."""
    Mr = round_up(M, 32)
    if Mr <= 128:
        if steps == 1 and TN >= 2048 and (TN // 2) % 128 == 0 \
                and not _STACK_MODE.get():
            return Mr, TN // 2, 2, True
        return Mr, TN, 1, True
    TNs = _sub_tile_n(TN, cap=4096)
    return min(Mr, 512), TNs, TN // TNs, False


def _bitplane_call(kernel, xs, x_rows, fmt, plane, bp, ap, *, wsum=None,
                   TM, TNs, split, Mp, scratch_shapes, plane_rows=None):
    """Shared pallas_call plumbing for the bitplane kernel family: grid
    (m, n-subtile, k-block), tile-contiguous plane slabs, fused epilogue
    operands. ``xs``/``x_rows``: activation operands and their block rows
    (2TM stacked, TM each unstacked). ``plane_rows``: sublane rows of one
    plane slab — 2*tkb uint8 for the bitplanes (default), tkb int32 for the
    nibble-pair words."""
    tkb, TN = fmt.tkb, fmt.tile_n
    B = 8 * tkb
    nb, gn = plane.shape[0], plane.shape[1]
    if split * TNs != TN:
        raise ValueError(
            f"compute tile width {TNs} x split {split} != storage tile {TN}; "
            "the sub-tiling must cover the storage tile exactly")
    x_specs = [pl.BlockSpec((rows, B), lambda i, j, k: (i, k),
                            memory_space=pltpu.VMEM) for rows in x_rows]
    plane_spec = pl.BlockSpec((1, 1, plane_rows or 2 * tkb, TNs),
                              lambda i, j, k: (k, j // split, 0, j % split),
                              memory_space=pltpu.VMEM)
    ws_specs = []
    ws_args = ()
    if wsum is not None:
        ws_specs = [pl.BlockSpec((1, 1, 1, TNs),
                                 lambda i, j, k: (k, j // split, 0, j % split),
                                 memory_space=pltpu.VMEM)]
        ws_args = (wsum,)
    vec = pl.BlockSpec((1, TNs), lambda i, j, k: (0, j),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // TM, gn * split, nb),
        in_specs=x_specs + [plane_spec] + ws_specs + [vec, vec],
        out_specs=pl.BlockSpec((TM, TNs), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, gn * TN), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )
    return out(*xs, plane, *ws_args, bp, ap)


def _int8_split_reg(x):
    """In-register int8 split of an f32 tile (x = 8a + r - 512): the v4
    fusion of :func:`_int8_split` into the kernel body. The XLA pre-pass
    streamed X at ~8 B/element (4 read + 2x1 write + 2 re-read) and cost a
    separate device dispatch per call — at serving M the dispatch IS the
    cost (the ~1.1 us launch floor, VERDICT round-3 weak #2/#3); in-register
    the split is 4 VPU ops on a tile already in VMEM."""
    t = x + 512.0
    a = jnp.minimum(jnp.floor(t * 0.125), 127.0)
    r = t - 8.0 * a
    return a.astype(jnp.int8), r.astype(jnp.int8)


def _bitplane_i8fs_kernel(x_ref, p_ref, ws_ref, b_ref, al_ref, o_ref,
                          acc_ref, wsum_ref, *, tkb: int, tm: int,
                          has_alpha: bool):
    """v4 fused-split STACKED: one f32 X tile in, int8 split + (a; r) stack
    in registers (no XLA pre-pass, no HBM stack copy), two half-block dots."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    a, r = _int8_split_reg(x_ref[:])
    ar = jnp.concatenate([a, r], axis=0)          # (2TM, B), in-register
    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += jnp.dot(ar[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(ar[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _bitplane_i8fu_kernel(x_ref, p_ref, ws_ref, b_ref, al_ref, o_ref,
                          acc_ref, wsum_ref, *, tkb: int, has_alpha: bool):
    """v4 fused-split UNSTACKED: f32 X tile in, split in registers, four
    half-block dots, (TM, TNs) accumulator."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    a, r = _int8_split_reg(x_ref[:])
    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += 8 * (jnp.dot(a[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC)
                       + jnp.dot(a[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)) \
        + jnp.dot(r[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref,
                                has_alpha)


def _bitplane_i8s_kernel(ar_ref, p_ref, ws_ref, b_ref, al_ref, o_ref,
                         acc_ref, wsum_ref, *, tkb: int, tm: int,
                         has_alpha: bool):
    """Stacked (a; r) variant for serving M: two half-block dots per K-step."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += jnp.dot(ar_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(ar_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _bitplane_i8u_kernel(a_ref, r_ref, p_ref, ws_ref, b_ref, al_ref, o_ref,
                         acc_ref, wsum_ref, *, tkb: int, has_alpha: bool):
    """Unstacked variant for large M: 4 half-block dots, no (a; r) copy."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += 8 * (jnp.dot(a_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC)
                       + jnp.dot(a_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)) \
        + jnp.dot(r_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref,
                                has_alpha)


@register_kernel(
    "PallasTiledBitplane_i8", TiledBitplane,
    description="split-sign bitplanes (2 bits/weight) -> magic-multiply bit "
                "deposit + hardware bitcast decode with in-register sign "
                "merge (~1.75 VPU ops/weight), int8-split MXU dots per "
                "nibble group; the flagship exact kernel (integer "
                "activations |x|<=512)",
    reference="readme.md:108-111 roadmap codec done TPU-first; epilogue "
              "comp_prelu.h:12-70; activation domain perf.cpp:301",
    x_absmax=512, x_bytes=2.0)
def pallas_tiled_bitplane_i8_kernel(X, fmt: TiledBitplane, bias, alpha=None,
                                    *, fuse_split: bool = None,
                                    stacked: bool = None,
                                    tm: int = None, tns: int = None):
    """v4 default: at serving M (<= 128) the int8 split happens IN-REGISTER
    inside the kernel (``fuse_split=True``) — X streams once as f32 and the
    XLA pre-pass (split + pad + stack: ~8 B/element of traffic and extra
    device dispatches) disappears; measured 5.27 vs 5.33 us at the north
    star. Above serving M the two-operand (a8, r8) form keeps X at
    2 B/element across the per-N-tile re-streams (measured faster at
    K=N=11008: 81.2 vs 82.3 us). ``fuse_split``/``stacked``/``tm``/``tns``
    override the measured rule for A/B studies."""
    M = X.shape[0]
    tkb, TN = fmt.tkb, fmt.tile_n
    B = 8 * tkb
    nb, gn = fmt.plane.shape[0], fmt.plane.shape[1]
    TM, TNs, split, stacked_rule = _bitplane_tiles(M, TN, nb * gn)
    if stacked is None:
        stacked = stacked_rule
    if fuse_split is None:
        # Measured v4 rule: fuse the split in-register only when X streams
        # through the kernel ONCE (single N storage tile, serving M) — there
        # the win is deleting the pre-pass dispatches (5.27 vs 5.33 us at
        # the north star). With gn > 1 the fused f32 operand re-streams
        # 2 B/element extra per N-tile and loses (82.3 vs 81.2 us at
        # K=N=11008 M=32; 890.8 vs 810.8 at M=512).
        fuse_split = stacked and gn == 1
    if tm is not None:
        TM = tm
    if tns is not None:
        if TN % tns != 0:
            raise ValueError(
                f"tns={tns} must divide the storage tile width TN={TN}")
        TNs, split = tns, TN // tns
    Mp = round_up(M, TM)
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
    plane, wsum = jnp.asarray(fmt.plane), jnp.asarray(fmt.wsum)
    common = dict(wsum=wsum, TM=TM, TNs=TNs, split=split, Mp=Mp)
    if fuse_split:
        xf = jnp.pad(jnp.asarray(X, jnp.float32),
                     ((0, Mp - M), (0, nb * B - X.shape[1])))
        if stacked:
            # in-register (a; r) stack: accumulator is (2TM, TNs) i32
            out = _bitplane_call(
                functools.partial(_bitplane_i8fs_kernel, tkb=tkb, tm=TM,
                                  has_alpha=alpha is not None),
                (xf,), (TM,), fmt, plane, bp, ap,
                scratch_shapes=[pltpu.VMEM((2 * TM, TNs), jnp.int32),
                                pltpu.VMEM((1, TNs), jnp.int32)], **common)
        else:
            out = _bitplane_call(
                functools.partial(_bitplane_i8fu_kernel, tkb=tkb,
                                  has_alpha=alpha is not None),
                (xf,), (TM,), fmt, plane, bp, ap,
                scratch_shapes=[pltpu.VMEM((TM, TNs), jnp.int32),
                                pltpu.VMEM((1, TNs), jnp.int32)], **common)
        return out[:M, :fmt.N]
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    r8 = jnp.pad(r8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    if stacked:
        out = _bitplane_call(
            functools.partial(_bitplane_i8s_kernel, tkb=tkb, tm=TM,
                              has_alpha=alpha is not None),
            (_stack_tiles(a8, r8, TM),), (2 * TM,), fmt, plane, bp, ap,
            scratch_shapes=[pltpu.VMEM((2 * TM, TNs), jnp.int32),
                            pltpu.VMEM((1, TNs), jnp.int32)], **common)
    else:
        out = _bitplane_call(
            functools.partial(_bitplane_i8u_kernel, tkb=tkb,
                              has_alpha=alpha is not None),
            (a8, r8), (TM, TM), fmt, plane, bp, ap,
            scratch_shapes=[pltpu.VMEM((TM, TNs), jnp.int32),
                            pltpu.VMEM((1, TNs), jnp.int32)], **common)
    return out[:M, :fmt.N]


# ---------------------------------------------------------------------------
# 4-bit nibble-pair kernel (PallasTiledNibblePair_i8) — the round-3 verdict's
# untried design-space cell (VERDICT.md next-#9): 2x the plane bytes of the
# 2-bit bitplane for ~half the VPU decode ops, aimed at the shapes
# decode_roofline.json flags as decode-bound (32x4096^2).
# ---------------------------------------------------------------------------

_NIB_LO = 0x0F0F0F0F
_NIB_SIGN = 0x08080808


def _decode_nibpair_words(w):
    """int32 nibble-pair words (T, N) -> (lo, hi) int8 row groups (4T, N).

    Low nibbles = dense rows [0, 4T) of the block, high = [4T, 8T) — the
    same halves contract as :func:`_decode_halves_u8`. Decode is 9 int32
    lane-ops per word of 8 weights (~1.1 ops/weight): two nibble extractions
    plus a 3-op sign-extend each (0x08 sign bit -> 0xF0 fill via multiply;
    per-byte products never carry). ``w >> 4`` is an arithmetic shift, but
    the sign-fill only reaches bits 28-31, which the 0x0F0F0F0F mask drops."""
    lo = w & _NIB_LO
    hi = (w >> 4) & _NIB_LO
    lo = lo | ((lo & _NIB_SIGN) * 0x1E)
    hi = hi | ((hi & _NIB_SIGN) * 0x1E)
    return _words_to_byte_rows(lo), _words_to_byte_rows(hi)


def _nibpair_i8fs_kernel(x_ref, w_ref, ws_ref, b_ref, al_ref, o_ref,
                         acc_ref, wsum_ref, *, tkb: int, tm: int,
                         has_alpha: bool):
    """Fused-split STACKED (serving M): f32 X tile in, int8 split + (a; r)
    stack in registers, two half-block dots against the nibble groups."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    a, r = _int8_split_reg(x_ref[:])
    ar = jnp.concatenate([a, r], axis=0)
    lo, hi = _decode_nibpair_words(w_ref[0, 0])
    acc_ref[:] += jnp.dot(ar[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(ar[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _nibpair_i8s_kernel(ar_ref, w_ref, ws_ref, b_ref, al_ref, o_ref,
                        acc_ref, wsum_ref, *, tkb: int, tm: int,
                        has_alpha: bool):
    """Pre-split stacked (a; r) variant (serving M, multi-N-tile): the fused
    f32 operand would re-stream 2 B/element extra per N storage tile."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    lo, hi = _decode_nibpair_words(w_ref[0, 0])
    acc_ref[:] += jnp.dot(ar_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(ar_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _nibpair_i8u_kernel(a_ref, r_ref, w_ref, ws_ref, b_ref, al_ref, o_ref,
                        acc_ref, wsum_ref, *, tkb: int, has_alpha: bool):
    """Unstacked (large M): two int8 operands, four half-block dots."""
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    lo, hi = _decode_nibpair_words(w_ref[0, 0])
    acc_ref[:] += 8 * (jnp.dot(a_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC)
                       + jnp.dot(a_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)) \
        + jnp.dot(r_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(r_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _i8_epilogue(acc_ref[:], wsum_ref[:], b_ref, al_ref,
                                has_alpha)


@register_kernel(
    "PallasTiledNibblePair_i8", TiledNibblePair,
    description="signed-nibble words (4 bits/weight) -> mask + sign-extend "
                "decode (~1.1 VPU ops/weight, half the bitplane deposit) at "
                "2x the plane bytes; the round-3 verdict's untried "
                "decode-vs-bytes trade, measured in kernel_v4_study.json",
    reference="readme.md:108-111 roadmap codec; epilogue comp_prelu.h:12-70; "
              "activation domain perf.cpp:301",
    x_absmax=512, x_bytes=2.0)
def pallas_tiled_nibblepair_i8_kernel(X, fmt: TiledNibblePair, bias,
                                      alpha=None, *, tm: int = None,
                                      tns: int = None):
    """Same tiling/fusion rules as the 2-bit flagship
    (:func:`pallas_tiled_bitplane_i8_kernel`): stacked fused-split at serving
    M, unstacked two-operand dots above it."""
    M = X.shape[0]
    tkb, TN = fmt.tkb, fmt.tile_n
    B = 8 * tkb
    nb, gn = fmt.words.shape[0], fmt.words.shape[1]
    TM, TNs, split, stacked = _bitplane_tiles(M, TN, nb * gn)
    if tm is not None:
        TM = tm
    if tns is not None:
        if TN % tns != 0:
            raise ValueError(
                f"tns={tns} must divide the storage tile width TN={TN}")
        TNs, split = tns, TN // tns
    Mp = round_up(M, TM)
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
    words, wsum = jnp.asarray(fmt.words), jnp.asarray(fmt.wsum)
    common = dict(wsum=wsum, TM=TM, TNs=TNs, split=split, Mp=Mp,
                  plane_rows=tkb)
    if stacked and gn == 1:
        xf = jnp.pad(jnp.asarray(X, jnp.float32),
                     ((0, Mp - M), (0, nb * B - X.shape[1])))
        out = _bitplane_call(
            functools.partial(_nibpair_i8fs_kernel, tkb=tkb, tm=TM,
                              has_alpha=alpha is not None),
            (xf,), (TM,), fmt, words, bp, ap,
            scratch_shapes=[pltpu.VMEM((2 * TM, TNs), jnp.int32),
                            pltpu.VMEM((1, TNs), jnp.int32)], **common)
        return out[:M, :fmt.N]
    a8, r8 = _int8_split(X)
    a8 = jnp.pad(a8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    r8 = jnp.pad(r8, ((0, Mp - M), (0, nb * B - X.shape[1])))
    if stacked:
        out = _bitplane_call(
            functools.partial(_nibpair_i8s_kernel, tkb=tkb, tm=TM,
                              has_alpha=alpha is not None),
            (_stack_tiles(a8, r8, TM),), (2 * TM,), fmt, words, bp, ap,
            scratch_shapes=[pltpu.VMEM((2 * TM, TNs), jnp.int32),
                            pltpu.VMEM((1, TNs), jnp.int32)], **common)
    else:
        out = _bitplane_call(
            functools.partial(_nibpair_i8u_kernel, tkb=tkb,
                              has_alpha=alpha is not None),
            (a8, r8), (TM, TM), fmt, words, bp, ap,
            scratch_shapes=[pltpu.VMEM((TM, TNs), jnp.int32),
                            pltpu.VMEM((1, TNs), jnp.int32)], **common)
    return out[:M, :fmt.N]


def _tiled_bitplane_x8_kernel(x_ref, p_ref, b_ref, al_ref, o_ref, acc_ref, *,
                              tkb: int, has_alpha: bool):
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += jnp.dot(x_ref[:, :H], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
        + jnp.dot(x_ref[:, H:], hi, preferred_element_type=jnp.int32, precision=_IPREC)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:].astype(jnp.float32), b_ref, al_ref,
                             has_alpha)


def _to_x8(X):
    """f32 integer-valued activations -> int8, clamped to [-127, 127]."""
    t = jnp.round(jnp.asarray(X, jnp.float32))
    return jnp.clip(t, -127.0, 127.0).astype(jnp.int8)


@register_kernel(
    "PallasTiledBitplane_x8", TiledBitplane,
    description="split-sign bitplanes (2 bits/weight) with int8-NATIVE "
                "activations: one UNstacked int8 MXU dot per K-step (half "
                "the MXU work of the 8a+r split) and no wsum correction; "
                "the large-M flagship for the BitNet a8 regime (exact for "
                "integer activations |x|<=127, clamps outside)",
    reference="readme.md:108-111 roadmap codec; BitNet W1.58-A8 deployment "
              "regime (SURVEY.md §6)",
    x_absmax=127, x_bytes=1.0)
def pallas_tiled_bitplane_x8_kernel(X, fmt: TiledBitplane, bias, alpha=None):
    M = X.shape[0]
    tkb, TN = fmt.tkb, fmt.tile_n
    B = 8 * tkb
    nb, gn = fmt.plane.shape[0], fmt.plane.shape[1]
    TM, TNs, split, _ = _bitplane_tiles(M, TN, nb * gn)  # x8 never stacks
    Mp = round_up(M, TM)
    x8 = jnp.pad(_to_x8(X), ((0, Mp - M), (0, nb * B - X.shape[1])))
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
    out = _bitplane_call(
        functools.partial(_tiled_bitplane_x8_kernel, tkb=tkb,
                          has_alpha=alpha is not None),
        (x8,), (TM,), fmt, jnp.asarray(fmt.plane), bp, ap,
        TM=TM, TNs=TNs, split=split, Mp=Mp,
        scratch_shapes=[pltpu.VMEM((TM, TNs), jnp.int32)])
    return out[:M, :fmt.N]


def _tiled_bitplane_b16_kernel(x_ref, p_ref, b_ref, al_ref, o_ref, acc_ref, *,
                               tkb: int, has_alpha: bool):
    H = 4 * tkb

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _decode_halves_u8(p_ref[0, 0, :tkb], p_ref[0, 0, tkb:])
    acc_ref[:] += jnp.dot(x_ref[:, :H], lo.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) \
        + jnp.dot(x_ref[:, H:], hi.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, al_ref, has_alpha)


@register_kernel(
    "PallasTiledBitplane_bf16", TiledBitplane,
    description="split-sign bitplanes (2 bits/weight) decoded to bf16 "
                "in-register, ONE full-rate bf16 MXU dot per K-step (no "
                "int8-split stacking, no wsum correction): the f32-domain "
                "large-M path — DenseMXU_bf16 compute rate at 1/8 the "
                "weight traffic (exact for integer activations |x|<=256; "
                "bf16 rounding outside)",
    reference="readme.md:108-111 roadmap codec; activation domain "
              "perf.cpp:301 (bf16 integer-exact window)",
    x_absmax=256, x_bytes=2.0)
def pallas_tiled_bitplane_bf16_kernel(X, fmt: TiledBitplane, bias, alpha=None):
    M = X.shape[0]
    tkb, TN = fmt.tkb, fmt.tile_n
    B = 8 * tkb
    nb, gn = fmt.plane.shape[0], fmt.plane.shape[1]
    TM, TNs, split, _ = _bitplane_tiles(M, TN, nb * gn)  # bf16 never stacks
    Mp = round_up(M, TM)
    xb = jnp.pad(jnp.asarray(X, jnp.bfloat16),
                 ((0, Mp - M), (0, nb * B - X.shape[1])))
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
    out = _bitplane_call(
        functools.partial(_tiled_bitplane_b16_kernel, tkb=tkb,
                          has_alpha=alpha is not None),
        (xb,), (TM,), fmt, jnp.asarray(fmt.plane), bp, ap,
        TM=TM, TNs=TNs, split=split, Mp=Mp,
        scratch_shapes=[pltpu.VMEM((TM, TNs), jnp.float32)])
    return out[:M, :fmt.N]


# ---------------------------------------------------------------------------
# Bit-deposit ELL kernel (PallasEllDeposit_i8) — the round-2 true-sparse
# path. Index storage (1 byte/nonzero slot, scales with 1/s) but MXU-dense
# compute: each ELL offset deposits a bit into one of 8 int32 words via a
# lane-wise variable shift (2 VPU ops/nonzero), the words expand through the
# bitplane magic-multiply decode, and ONE stacked int8-split dot consumes
# the tile. Replaces the lane-shuffle gather (~285 us north-star) as the
# competitive sparse-storage kernel.
# ---------------------------------------------------------------------------


def _ell_deposit_kernel(cp_ref, cn_ref, ar_ref, pln_ref, ws_ref, b_ref,
                        al_ref, o_ref, acc_ref, wsum_ref, *, cap_p_max: int,
                        cap_n_max: int, tn: int, tm: int, has_alpha: bool,
                        static_caps: bool = True):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    def _dep(base):
        # One slot = 8 plane rows (one offset per deposit word); base and
        # 8*s keep the dynamic sublane index provably 8-aligned for Mosaic.
        def body(s, w):
            slab = pln_ref[0, 0, pl.ds(base + 8 * s, 8), :].astype(jnp.int32)
            return w | (jnp.full((8, tn), 1, jnp.int32) << slab)
        return body

    zero = jnp.zeros((8, tn), jnp.int32)
    if static_caps:
        # STATIC trip counts, unrolled: Mosaic schedules the slab loads and
        # shift/or chains instead of a dynamic loop — measured 121.9 -> 112.5
        # us at 32x16384x4096 s=16 and 18.6 -> 17.0 at the north star
        # (deposit_study.json, round 5). Exact: phantom slots hold the
        # sentinel offset 31, whose decoded row faces a zero activation
        # column, so depositing ALL padded slots changes nothing.
        wp = jax.lax.fori_loop(0, cap_p_max, _dep(0), zero, unroll=True)
        wn = jax.lax.fori_loop(0, cap_n_max, _dep(8 * cap_p_max), zero,
                               unroll=True)
    else:
        cap_p = cp_ref[pl.program_id(2), pl.program_id(1)]
        cap_n = cn_ref[pl.program_id(2), pl.program_id(1)]
        wp = jax.lax.fori_loop(0, cap_p, _dep(0), zero)
        wn = jax.lax.fori_loop(0, cap_n, _dep(8 * cap_p_max), zero)
    w = _decode_bitplanes_merged(_words_to_byte_rows(wp),
                                 _words_to_byte_rows(wn))
    acc_ref[:] += jnp.dot(ar_ref[:], w, preferred_element_type=jnp.int32, precision=_IPREC)
    wsum_ref[:] += ws_ref[0, 0]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        y = 8 * acc_ref[:tm, :] + acc_ref[tm:, :]
        o_ref[:] = _i8_epilogue(y, wsum_ref[:], b_ref, al_ref, has_alpha)


def _deposit_restructure(p8, nsb: int):
    """int8 activation plane (Mp, K) -> (Mp, nsb*256) in decoded-row order:
    pad K to nsb*248, append one (0, 0)-valued column per superblock, and
    gather columns so MXU row p faces the activation the decode chain puts
    there (sentinel rows face the zero column — phantoms contribute 0)."""
    from ternary_spgemm_tpu.formats.ell_deposit import (
        SB_ROWS, activation_row_order)
    Mp, K = p8.shape
    g = jnp.asarray(activation_row_order())
    x = jnp.pad(p8, ((0, 0), (0, nsb * SB_ROWS - K))).reshape(Mp, nsb, SB_ROWS)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    return jnp.take(x, g, axis=2).reshape(Mp, nsb * 256)


@register_kernel(
    "PallasEllDeposit_i8", TiledEllDeposit,
    description="ELL offset slots (8/s bits/weight before cap padding) -> "
                "in-VMEM bit deposit via lane-wise variable shifts + "
                "bitplane decode, ONE stacked int8-split MXU dot per "
                "superblock; the competitive true-sparse-storage kernel "
                "(exact for integer activations |x|<=512)",
    reference="cpp_impl/data_structures/VectorTCSC.h:5-73 (padded ELL) + "
              "comp.h:1068-1149 strategy-inverted: deposit-then-MXU instead "
              "of NEON gathers; epilogue comp_prelu.h:12-70",
    x_absmax=512, x_bytes=2.0)
def pallas_ell_deposit_i8_kernel(X, fmt: TiledEllDeposit, bias, alpha=None,
                                 *, tm: int = 256, static_caps: bool = True):
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
    ap = _row_vec(alpha if alpha is not None else np.zeros(fmt.N, np.float32),
                  TN)[:, :gn * TN]
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
        functools.partial(_ell_deposit_kernel, cap_p_max=fmt.cap_p_max,
                          cap_n_max=R // 8 - fmt.cap_p_max, tn=TN, tm=TM,
                          has_alpha=alpha is not None,
                          static_caps=static_caps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, gn * TN), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(jnp.asarray(fmt.cap_pos), jnp.asarray(fmt.cap_neg), ar,
      jnp.asarray(fmt.plane), jnp.asarray(fmt.wsum), bp, ap)
    return out[:M, :fmt.N]


# ---------------------------------------------------------------------------
# Blocked-ELL lane-shuffle gather (PallasEllGather)
# ---------------------------------------------------------------------------


def _ell_kernel(x_ref, ip_ref, in_ref, b_ref, a_ref, o_ref, acc_ref, *,
                cap_pos: int, cap_neg: int, tm: int, tn: int, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (TM, BK) — one K-block of X, lanes = local row offsets

    def plane(idx_ref, cap):
        acc = jnp.zeros((tm, tn), jnp.float32)
        for c in range(cap):
            # int8 local offsets (1 byte/slot in HBM), widened on the VPU
            idx = idx_ref[0, c, :].reshape(1, tn).astype(jnp.int32)
            valid = idx >= 0
            safe = jnp.where(valid, idx, 0)
            g = jnp.take_along_axis(x, jnp.broadcast_to(safe, (tm, tn)), axis=1)
            acc += jnp.where(jnp.broadcast_to(valid, (tm, tn)), g, 0.0)
        return acc

    acc_ref[:] += plane(ip_ref, cap_pos) - plane(in_ref, cap_neg)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, a_ref, has_alpha)


def _tiled_ell_kernel(cp_ref, cn_ref, x_ref, pln_ref, b_ref, a_ref, o_ref,
                      acc_ref, *, cap_p_max: int, tm: int, tn: int,
                      has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (TM, 128): lanes 0..126 = block rows, lane 127 = zero
    # exact per-(block, tile) capacities, scalar-prefetched (full (nb, gn)
    # tables live in SMEM; dynamic loop bounds per grid step)
    cap_p = cp_ref[pl.program_id(2), pl.program_id(1)]
    cap_n = cn_ref[pl.program_id(2), pl.program_id(1)]

    def gather_slabs(base):
        # Slot rows load in slabs of 8: Mosaic requires a dynamic sublane
        # index it can prove 8-aligned, and base + 8*s is (the format rounds
        # each sign section to 8 rows; rows past the exact cap hold the
        # sentinel block_k, whose gather returns the zero lane — no mask,
        # no clamp). Mosaic's lane gather needs idx tiles of exactly 128
        # lanes (x's register width), so each TN-wide slot row gathers in
        # 128-lane chunks.
        def body(s, a):
            slab = pln_ref[0, 0, pl.ds(base + 8 * s, 8), :].astype(jnp.int32)
            for r in range(8):
                row = slab[r:r + 1, :]
                parts = [
                    jnp.take_along_axis(
                        x,
                        jnp.broadcast_to(row[:, c * 128:(c + 1) * 128],
                                         (tm, 128)),
                        axis=1)
                    for c in range(tn // 128)]
                a = a + (parts[0] if len(parts) == 1
                         else jnp.concatenate(parts, axis=1))
            return a
        return body

    zero = jnp.zeros((tm, tn), jnp.float32)
    pos = jax.lax.fori_loop(0, (cap_p + 7) // 8, gather_slabs(0), zero)
    neg = jax.lax.fori_loop(0, (cap_n + 7) // 8, gather_slabs(cap_p_max), zero)
    acc_ref[:] += pos - neg

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, a_ref, has_alpha)


@register_kernel(
    "PallasTiledEllGather", TiledEllTCSC,
    description="tile-contiguous split-sign ELL gather with exact per-tile "
                "capacity loop bounds and a zero-lane sentinel (the round-2 "
                "true sparse path)",
    reference="cpp_impl/comp.h:44-61 (gather loop), VectorTCSC.h:5-73 with "
              "the per-tile capacity scan done right; sentinel idea from "
              "comp.h:1078 made sound")
def pallas_tiled_ell_kernel(X, fmt: TiledEllTCSC, bias, alpha=None):
    M = X.shape[0]
    N, K = fmt.N, fmt.K
    BK, TN = fmt.block_k, fmt.tile_n
    LAN = BK + 1
    nb, gn, CAPS, _ = fmt.plane.shape
    TM = min(round_up(M, 8), 256)
    Mp = round_up(M, TM)
    # Restructure X: one reserved zero lane per K-block (see ell_tiled.py).
    Xp = jnp.pad(jnp.asarray(X, jnp.float32),
                 ((0, Mp - M), (0, nb * BK - K)))
    Xp = jnp.pad(Xp.reshape(Mp, nb, BK), ((0, 0), (0, 0), (0, 1)))
    Xp = Xp.reshape(Mp, nb * LAN)
    bp = _row_vec(bias, TN)[:, :gn * TN]
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32),
                  TN)[:, :gn * TN]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,    # cap tables -> SMEM, dynamically indexed
        grid=(Mp // TM, gn, nb),
        in_specs=[
            pl.BlockSpec((TM, LAN), lambda i, j, b, *_: (i, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CAPS, TN), lambda i, j, b, *_: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, b, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, b, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, b, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_tiled_ell_kernel, cap_p_max=fmt.cap_p_max,
                          tm=TM, tn=TN, has_alpha=alpha is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, gn * TN), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(jnp.asarray(fmt.cap_pos), jnp.asarray(fmt.cap_neg), Xp,
      jnp.asarray(fmt.plane), bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasEllGather", BlockedEllTCSC,
    description="per-128-lane-block register-shuffle gather over local-offset "
                "ELL planes + masked accumulate (the true sparse path)",
    reference="cpp_impl/comp.h:44-61 (gather loop), 1068-1149 (NeonTCSCVertical), "
              "VectorTCSC.h:5-73 — re-designed for the TPU lane shuffle network")
def pallas_ell_gather_kernel(X, fmt: BlockedEllTCSC, bias, alpha=None):
    M = X.shape[0]
    N, K = fmt.N, fmt.K
    BK, TN = fmt.block_k, fmt.tile_n
    nb = fmt.num_blocks
    cap_p, cap_n = fmt.idx_pos.shape[1], fmt.idx_neg.shape[1]
    N_pad = fmt.idx_pos.shape[2]
    TM = min(round_up(M, 8), 256)
    Xp = jnp.pad(jnp.asarray(X, jnp.float32),
                 ((0, round_up(M, TM) - M), (0, nb * BK - K)))
    bp = _row_vec(bias, TN)[:, :N_pad]
    ap = _row_vec(alpha if alpha is not None else np.zeros(N, np.float32), TN)[:, :N_pad]
    grid = (Xp.shape[0] // TM, N_pad // TN, nb)
    out = pl.pallas_call(
        functools.partial(_ell_kernel, cap_pos=cap_p, cap_neg=cap_n,
                          tm=TM, tn=TN, has_alpha=alpha is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, BK), lambda i, j, b: (i, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap_p, TN), lambda i, j, b: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap_n, TN), lambda i, j, b: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, b: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, b: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, b: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], N_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(Xp, jnp.asarray(fmt.idx_pos), jnp.asarray(fmt.idx_neg), bp, ap)
    return out[:M, :N]
