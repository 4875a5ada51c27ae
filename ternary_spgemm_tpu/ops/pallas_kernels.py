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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_spgemm_tpu.formats import (
    BlockedEllTCSC,
    DenseTernary,
    PackedTernary2Bit,
    PackedTernary53,
)
from ternary_spgemm_tpu.ops.api import register_kernel
from ternary_spgemm_tpu.utils import cdiv, round_up


def _interpret() -> bool:
    """Pallas kernels compile via Mosaic on TPU, interpret elsewhere (tests
    run on a CPU mesh per tests/conftest.py)."""
    return jax.default_backend() not in ("tpu", "axon")


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


def _dense_fused(X, Wd, bias, alpha, *, bf16: bool):
    M, K = X.shape
    N = Wd.shape[1]
    TM = min(round_up(M, 8), 256)
    TN = min(round_up(N, 128), 256)
    TK = min(round_up(K, 32), 512)
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
        interpret=_interpret(),
    )(Xp, Wp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasDense", DenseTernary,
    description="tiled fused int8-dense -> f32 MXU matmul + bias/PReLU epilogue",
    reference="strategy inversion of cpp_impl/comp.h; epilogue comp_prelu.h:12-70")
def pallas_dense_kernel(X, fmt: DenseTernary, bias, alpha=None):
    return _dense_fused(X, fmt.dense, bias, alpha, bf16=False)


@register_kernel(
    "PallasDense_bf16", DenseTernary,
    description="tiled fused bf16 MXU matmul (inexact for |X|>256)",
    approximate=True)
def pallas_dense_bf16_kernel(X, fmt: DenseTernary, bias, alpha=None):
    return _dense_fused(X, fmt.dense, bias, alpha, bf16=True)


# ---------------------------------------------------------------------------
# Packed decode-and-dot (PallasPacked2Bit / PallasPacked53)
# ---------------------------------------------------------------------------


def _packed_kernel(x_ref, p_ref, b_ref, a_ref, o_ref, acc_ref, *,
                   factor: int, base3: bool, has_alpha: bool):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:].astype(jnp.int32)
    for j in range(factor):
        if base3:
            d = (p // (3 ** j)) % 3
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


def _packed_fused(X, packed, K: int, N: int, factor: int, bias, alpha, *, base3: bool):
    """Stride-packed decode-and-dot: packed byte row k' holds dense rows
    {k' + j*Kq}, so X.reshape(M, factor, Kq)[:, j, :] lines up with decoded
    field j (formats/packed.py 'Stride packing')."""
    M = X.shape[0]
    Kq = packed.shape[0]
    TM = min(round_up(M, 8), 128)
    TN = min(round_up(N, 128), 256)
    TKq = min(round_up(Kq, 128), 256)
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
        interpret=_interpret(),
    )(Xp, Pp, bp, ap)
    return out[:M, :N]


@register_kernel(
    "PallasPacked2Bit", PackedTernary2Bit,
    description="2-bit codes (2 bits/weight): VPU decode -> MXU dot, fused epilogue",
    reference="readme.md:108-111 roadmap codec, power-of-two variant")
def pallas_packed2_kernel(X, fmt: PackedTernary2Bit, bias, alpha=None):
    # K from X: under shard_map fmt.K is reconstructed from padded packed rows.
    return _packed_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                         alpha, base3=False)


@register_kernel(
    "PallasPacked53", PackedTernary53,
    description="base-3 codes (1.6 bits/weight): VPU decode -> MXU dot — the "
                "flagship bandwidth-optimal kernel",
    reference="readme.md:108-111 ('8 bits for 5 values')")
def pallas_packed53_kernel(X, fmt: PackedTernary53, bias, alpha=None):
    return _packed_fused(X, fmt.packed, X.shape[1], fmt.N, fmt.FACTOR, bias,
                         alpha, base3=True)


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
            idx = idx_ref[0, c, :].reshape(1, tn)           # (1, TN) local offsets
            valid = idx >= 0
            safe = jnp.where(valid, idx, 0)
            g = jnp.take_along_axis(x, jnp.broadcast_to(safe, (tm, tn)), axis=1)
            acc += jnp.where(jnp.broadcast_to(valid, (tm, tn)), g, 0.0)
        return acc

    acc_ref[:] += plane(ip_ref, cap_pos) - plane(in_ref, cap_neg)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref, a_ref, has_alpha)


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
        interpret=_interpret(),
    )(Xp, jnp.asarray(fmt.idx_pos), jnp.asarray(fmt.idx_neg), bp, ap)
    return out[:M, :N]
