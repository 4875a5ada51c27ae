"""Fused ternary FFN block: two SpMM layers in ONE Pallas kernel.

The TPU-first feature the reference's single-kernel design points at but
cannot express: its kernels each compute one ``Y = X W + b`` and return to
the driver (``cpp_impl/comp.h:25-69``); a BitNet FFN block therefore pays,
per layer, one kernel launch plus a full HBM round-trip of the hidden
activations. On TPU both costs are material at serving shapes — the measured
~1.3 us dispatch floor (docs/perf.md §14) and the hidden tile's HBM
write+read — and both disappear if the whole block

    h   = PReLU(x @ W1 * gamma1 + b1)            (up-projection, exact int8)
    hq  = round(127 * h / rowmax(|h|))           (per-row int8 requantize —
                                                  the BitNet W1.58-A8 regime,
                                                  docs/perf.md §11)
    y   = hq @ W2 * (rowmax/127 * gamma2) + b2   (down-projection)
    [y  = PReLU(y) with alpha2]                  (optional epilogue)

runs as ONE ``pallas_call``: the hidden activations never leave VMEM.

Phase structure: a 1-D grid of ``nb1 + nb2`` sequential K-block steps
(``dimension_semantics=("arbitrary",)``). Steps ``k < nb1`` accumulate the
up-projection over W1's bitplane blocks exactly like the flagship
(:func:`~ternary_spgemm_tpu.ops.pallas_kernels.pallas_tiled_bitplane_i8_kernel`
— in-register int8 split of f32 X, stacked (a; r) half-block MXU dots); the
last phase-1 step applies the fused epilogue and requantizes the hidden row
block into an int8 VMEM scratch (per-row scale kept in VMEM); steps
``k >= nb1`` stream W2's bitplane blocks against that scratch — plain int8
dots, no split needed, since |hq| <= 127 by construction. Mosaic's standard
operand pipelining prefetches W2's first block during phase-1 compute, so
the phase boundary costs no DMA stall.

The per-row requantize makes phase 2 the *deployed* BitNet-A8 numeric
regime: the only approximation in the whole block is the activation
rounding, identical to the unfused serving path
(:func:`ternary_spgemm_tpu.models.bitlinear.apply_exported_a8`) — fused and
unfused agree to f32 rounding (integer accumulations bit-identical; the
final scaling may differ by ~2 ULPs of XLA FMA contraction —
tests/test_fused_ffn.py; the shared formula is :func:`requantize_rows`).

Reference parity: net-new (SURVEY.md §2.3 — the reference has no model
layer); the per-layer math is ``comp.h:37-68`` + ``comp_prelu.h:12-70``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_spgemm_tpu.formats import TiledBitplane
from ternary_spgemm_tpu.ops.pallas_kernels import (
    _decode_halves_u8,
    _epilogue,
    _i8_epilogue,
    _int8_split_reg,
    _interpret,
    _row_vec,
)
from ternary_spgemm_tpu.utils import round_up


def requantize_rows(h, absmax: float = 127.0, eps: float = 1e-12):
    """Per-row symmetric int8 requantization -> (hq f32-int-valued, scale).

    ``hq = round(absmax * h / rowmax)``, ``scale = rowmax / absmax`` so that
    ``hq * scale ~= h``. The SINGLE formula both the fused kernel and the
    unfused A8 serving path use — bit-identical rounding is what lets the
    fused/unfused equivalence test demand exact agreement."""
    rowmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True) + eps
    scale = rowmax / absmax
    return jnp.round(h / scale), scale


def _ffn_kernel(x_ref, p1_ref, ws1_ref, p2_ref, b1_ref, a1_ref, b2_ref,
                a2_ref, o_ref, acc1_ref, ws1acc_ref, hq_ref, srow_ref,
                acc2_ref, *, tkb1: int, tkb2: int, nb1: int, nb2: int,
                tm: int, gamma1: float, gamma2: float, has_alpha1: bool,
                has_alpha2: bool):
    """One grid step of the fused block (see module docstring).

    Scratch: ``acc1`` (2TM, N1) i32 stacked up-proj accumulator;
    ``ws1acc`` (1, N1) i32 running W1 column sums (the -512 split
    correction); ``hq`` (nb2, TM, B2) int8 requantized hidden blocks;
    ``srow`` (TM, 1) f32 per-row output scale (gamma factors folded);
    ``acc2`` (TM, N2) i32 down-proj accumulator."""
    k = pl.program_id(0)
    H1, H2 = 4 * tkb1, 4 * tkb2
    B2 = 8 * tkb2

    @pl.when(k == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        ws1acc_ref[:] = jnp.zeros_like(ws1acc_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(k < nb1)
    def _():
        a, r = _int8_split_reg(x_ref[:])
        ar = jnp.concatenate([a, r], axis=0)              # (2TM, B1)
        lo, hi = _decode_halves_u8(p1_ref[0, 0, :tkb1], p1_ref[0, 0, tkb1:])
        acc1_ref[:] += jnp.dot(ar[:, :H1], lo, preferred_element_type=jnp.int32) \
            + jnp.dot(ar[:, H1:], hi, preferred_element_type=jnp.int32)
        ws1acc_ref[:] += ws1_ref[0, 0]

    @pl.when(k == nb1 - 1)
    def _():
        h_int = 8 * acc1_ref[:tm, :] + acc1_ref[tm:, :]
        # h = gamma1 * PReLU(h_int + b1/gamma1): positive homogeneity moves
        # gamma1 outside PReLU (b1_ref carries b1/gamma1, the wrapper folds
        # it); the per-row requantize is scale-invariant, so gamma1 rides
        # only in srow and hq is computed from the UNSCALED p.
        p = _i8_epilogue(h_int, ws1acc_ref[:], b1_ref, a1_ref, has_alpha1)
        hq, scale = requantize_rows(p)
        # scratch is 128 lanes wide (1-lane VMEM refs are not a safe Mosaic
        # layout); only lane 0 is read back
        srow_ref[:] = jnp.broadcast_to(scale * (gamma1 * gamma2),
                                       srow_ref.shape)
        hq8 = hq.astype(jnp.int8)                         # (TM, N1)
        if hq8.shape[1] < nb2 * B2:
            # hidden width not a K2-block multiple: the tail rows of W2 are
            # zero-padded in plane2, so zero-padding hq here is exact
            hq8 = jnp.pad(hq8, ((0, 0), (0, nb2 * B2 - hq8.shape[1])))
        for kk in range(nb2):                             # static unroll
            hq_ref[kk] = hq8[:, kk * B2:(kk + 1) * B2]

    @pl.when(k >= nb1)
    def _():
        kk = k - nb1
        lo, hi = _decode_halves_u8(p2_ref[0, 0, :tkb2], p2_ref[0, 0, tkb2:])
        hblk = hq_ref[kk]                                 # (TM, B2)
        acc2_ref[:] += jnp.dot(hblk[:, :H2], lo, preferred_element_type=jnp.int32) \
            + jnp.dot(hblk[:, H2:], hi, preferred_element_type=jnp.int32)

    @pl.when(k == nb1 + nb2 - 1)
    def _():
        y = acc2_ref[:].astype(jnp.float32) * srow_ref[:, 0:1]
        o_ref[:] = _epilogue(y, b2_ref, a2_ref, has_alpha2)


def fused_bitplane_ffn(X, fmt1: TiledBitplane, b1, alpha1,
                       fmt2: TiledBitplane, b2, alpha2=None, *,
                       gamma1: float = 1.0, gamma2: float = 1.0):
    """Run the fused FFN block (module docstring) over TiledBitplane weights.

    Contract: serving M (<= 128 rows), integer-valued f32 ``X`` with
    ``|X| <= 512`` (the flagship's exact domain, ``perf.cpp:301``), both
    containers single-N-tile (``gn == 1`` — FFN widths up to 4096 columns per
    tile; wider layers shard N across chips first, ``parallel/spgemm.py``),
    and ``fmt2.K == fmt1.N`` padded to K-block multiples. ``gamma*`` are the
    exported BitNet absmean scales (Python floats — static, like the
    reference's template parameters)."""
    M = X.shape[0]
    if M > 128:
        raise ValueError(
            f"fused_bitplane_ffn is the serving-M path (M <= 128), got {M}; "
            "at training M the hidden tile exceeds VMEM — run the layers "
            "unfused (they pipeline fine at large M, docs/perf.md §14)")
    nb1, gn1 = fmt1.plane.shape[0], fmt1.plane.shape[1]
    nb2, gn2 = fmt2.plane.shape[0], fmt2.plane.shape[1]
    if gn1 != 1 or gn2 != 1:
        raise ValueError(
            f"fused_bitplane_ffn needs single-N-tile containers (gn == 1), "
            f"got gn1={gn1}, gn2={gn2}; rebuild with tile_n >= N or shard N")
    tkb1, tkb2 = fmt1.tkb, fmt2.tkb
    B1, B2 = 8 * tkb1, 8 * tkb2
    N1, N2 = round_up(fmt1.N, 128), round_up(fmt2.N, 128)
    if nb2 * B2 != round_up(fmt1.N, B2) or fmt2.K != fmt1.N:
        raise ValueError(
            f"layer-2 container contracts over K={fmt2.K}, expected fmt1.N="
            f"{fmt1.N}")
    # hidden columns beyond fmt1.N are zero-padded in plane1, so their
    # quantized values are round(b1-ish)? No: padded W1 columns are zero AND
    # b1/alpha1 are zero-padded by _row_vec, so padded h == 0 exactly and
    # contributes nothing to phase 2 (padded W2 ROWS are zero anyway).
    TM = round_up(M, 32)
    xf = jnp.pad(jnp.asarray(X, jnp.float32),
                 ((0, TM - M), (0, nb1 * B1 - X.shape[1])))
    b1p = _row_vec(np.asarray(b1, np.float32) / gamma1, fmt1.tile_n)
    a1p = _row_vec(alpha1 if alpha1 is not None
                   else np.zeros(fmt1.N, np.float32), fmt1.tile_n)
    b2p = _row_vec(b2, fmt2.tile_n)
    a2p = _row_vec(alpha2 if alpha2 is not None
                   else np.zeros(fmt2.N, np.float32), fmt2.tile_n)
    plane1, wsum1 = jnp.asarray(fmt1.plane), jnp.asarray(fmt1.wsum)
    plane2 = jnp.asarray(fmt2.plane)
    TN1, TN2 = fmt1.tile_n, fmt2.tile_n

    kernel = functools.partial(
        _ffn_kernel, tkb1=tkb1, tkb2=tkb2, nb1=nb1, nb2=nb2, tm=TM,
        gamma1=float(gamma1), gamma2=float(gamma2),
        has_alpha1=alpha1 is not None, has_alpha2=alpha2 is not None)

    grid = (nb1 + nb2,)
    p1_idx = lambda k: (jnp.minimum(k, nb1 - 1), 0, 0, 0)
    p2_idx = lambda k: (jnp.clip(k - nb1, 0, nb2 - 1), 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, B1), lambda k: (0, jnp.minimum(k, nb1 - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb1, TN1), p1_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN1), p1_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb2, TN2), p2_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN2), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN2), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN2), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, TN2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * TM, TN1), jnp.int32),   # acc1 (stacked a; r)
            pltpu.VMEM((1, TN1), jnp.int32),        # ws1acc
            pltpu.VMEM((nb2, TM, B2), jnp.int8),    # hq hidden blocks
            pltpu.VMEM((TM, 128), jnp.float32),     # srow (lane 0 live)
            pltpu.VMEM((TM, TN2), jnp.int32),       # acc2
        ],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xf, plane1, wsum1, plane2, b1p[:, :TN1], a1p[:, :TN1],
      b2p[:, :TN2], a2p[:, :TN2])
    return out[:M, :fmt2.N]


def _swiglu_kernel(xq_ref, sx_ref, pg_ref, pu_ref, pd_ref, o_ref,
                   accg_ref, accu_ref, hq_ref, srow_ref, acc2_ref, *,
                   tkb1: int, tkb2: int, nb1: int, nb2: int,
                   gamma_gate: float, gamma_up: float, gamma_down: float):
    """Fused SwiGLU FFN step: ``y = (silu(gamma_g*sx*(xq@Wg)) *
    (gamma_u*sx*(xq@Wu))) |> requantize |> @Wd * (scale*gamma_d)``.

    The W1.58-A8 transformer block (``models/transformer.py`` SwiGLU FFN,
    biasless ternary projections): ``xq`` int8 per-row-quantized activations
    with row scale ``sx`` — no (a; r) split needed, |xq| <= 127 is MXU-native.
    Phase 1 streams BOTH up-projections' bitplane blocks per step."""
    k = pl.program_id(0)
    H1, H2 = 4 * tkb1, 4 * tkb2
    B2 = 8 * tkb2

    @pl.when(k == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(k < nb1)
    def _():
        xb = xq_ref[:]
        glo, ghi = _decode_halves_u8(pg_ref[0, 0, :tkb1], pg_ref[0, 0, tkb1:])
        ulo, uhi = _decode_halves_u8(pu_ref[0, 0, :tkb1], pu_ref[0, 0, tkb1:])
        accg_ref[:] += jnp.dot(xb[:, :H1], glo, preferred_element_type=jnp.int32) \
            + jnp.dot(xb[:, H1:], ghi, preferred_element_type=jnp.int32)
        accu_ref[:] += jnp.dot(xb[:, :H1], ulo, preferred_element_type=jnp.int32) \
            + jnp.dot(xb[:, H1:], uhi, preferred_element_type=jnp.int32)

    @pl.when(k == nb1 - 1)
    def _():
        sx = sx_ref[:, 0:1]
        g = gamma_gate * (sx * accg_ref[:].astype(jnp.float32))
        u = gamma_up * (sx * accu_ref[:].astype(jnp.float32))
        h = jax.nn.silu(g) * u
        hq, scale = requantize_rows(h)
        srow_ref[:] = jnp.broadcast_to(scale * gamma_down, srow_ref.shape)
        hq8 = hq.astype(jnp.int8)
        if hq8.shape[1] < nb2 * B2:
            hq8 = jnp.pad(hq8, ((0, 0), (0, nb2 * B2 - hq8.shape[1])))
        for kk in range(nb2):
            hq_ref[kk] = hq8[:, kk * B2:(kk + 1) * B2]

    @pl.when(k >= nb1)
    def _():
        kk = k - nb1
        lo, hi = _decode_halves_u8(pd_ref[0, 0, :tkb2], pd_ref[0, 0, tkb2:])
        hblk = hq_ref[kk]
        acc2_ref[:] += jnp.dot(hblk[:, :H2], lo, preferred_element_type=jnp.int32) \
            + jnp.dot(hblk[:, H2:], hi, preferred_element_type=jnp.int32)

    @pl.when(k == nb1 + nb2 - 1)
    def _():
        o_ref[:] = acc2_ref[:].astype(jnp.float32) * srow_ref[:, 0:1]


def fused_bitplane_swiglu(xq, sx, fmt_gate: TiledBitplane,
                          fmt_up: TiledBitplane, fmt_down: TiledBitplane, *,
                          gamma_gate: float = 1.0, gamma_up: float = 1.0,
                          gamma_down: float = 1.0):
    """Fused ternary SwiGLU FFN block over int8-quantized activations.

    ``xq`` (M, K) int8-valued f32/int8 (|xq| <= 127, e.g. from
    :func:`requantize_rows`), ``sx`` (M, 1) its per-row scale. Same serving
    contract as :func:`fused_bitplane_ffn`: M <= 128, single-N-tile
    containers, ``fmt_down.K == fmt_gate.N == fmt_up.N``. The three
    projections are biasless (the transformer's ternary projections,
    ``models/transformer.py``)."""
    M = xq.shape[0]
    if M > 128:
        raise ValueError(
            f"fused_bitplane_swiglu is the serving-M path (M <= 128), got "
            f"{M}; run the layers unfused at training M")
    nb1, gn1 = fmt_gate.plane.shape[0], fmt_gate.plane.shape[1]
    nbu, gnu = fmt_up.plane.shape[0], fmt_up.plane.shape[1]
    nb2, gn2 = fmt_down.plane.shape[0], fmt_down.plane.shape[1]
    if gn1 != 1 or gnu != 1 or gn2 != 1:
        raise ValueError("fused_bitplane_swiglu needs single-N-tile "
                         f"containers (gn == 1), got {gn1}/{gnu}/{gn2}")
    if (fmt_up.K, fmt_up.N, fmt_up.tkb) != (fmt_gate.K, fmt_gate.N, fmt_gate.tkb) \
            or nbu != nb1:
        raise ValueError("gate and up projections must share (K, N, tkb)")
    if fmt_down.K != fmt_gate.N:
        raise ValueError(
            f"down projection contracts over K={fmt_down.K}, expected "
            f"gate/up N={fmt_gate.N}")
    tkb1, tkb2 = fmt_gate.tkb, fmt_down.tkb
    B1, B2 = 8 * tkb1, 8 * tkb2
    TM = round_up(M, 32)
    xf = jnp.pad(jnp.asarray(xq, jnp.int8),
                 ((0, TM - M), (0, nb1 * B1 - xq.shape[1])))
    # 128-lane row-scale operand (1-lane VMEM refs are not a safe Mosaic
    # layout); the kernel reads lane 0
    sxf = jnp.pad(jnp.asarray(sx, jnp.float32).reshape(M, 1),
                  ((0, TM - M), (0, 127)))
    TN1, TN2 = fmt_gate.tile_n, fmt_down.tile_n
    kernel = functools.partial(
        _swiglu_kernel, tkb1=tkb1, tkb2=tkb2, nb1=nb1, nb2=nb2,
        gamma_gate=float(gamma_gate), gamma_up=float(gamma_up),
        gamma_down=float(gamma_down))
    p1_idx = lambda k: (jnp.minimum(k, nb1 - 1), 0, 0, 0)
    p2_idx = lambda k: (jnp.clip(k - nb1, 0, nb2 - 1), 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(nb1 + nb2,),
        in_specs=[
            pl.BlockSpec((TM, B1), lambda k: (0, jnp.minimum(k, nb1 - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 128), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb1, TN1), p1_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb1, TN1), p1_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb2, TN2), p2_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN2), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, TN2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TM, TN1), jnp.int32),       # accg
            pltpu.VMEM((TM, TN1), jnp.int32),       # accu
            pltpu.VMEM((nb2, TM, B2), jnp.int8),    # hq
            pltpu.VMEM((TM, 128), jnp.float32),     # srow (lane 0 live)
            pltpu.VMEM((TM, TN2), jnp.int32),       # acc2
        ],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xf, sxf, jnp.asarray(fmt_gate.plane), jnp.asarray(fmt_up.plane),
      jnp.asarray(fmt_down.plane))
    return out[:M, :fmt_down.N]


def unfused_reference_swiglu(xq, sx, fmt_gate, fmt_up, fmt_down, *,
                             gamma_gate: float = 1.0, gamma_up: float = 1.0,
                             gamma_down: float = 1.0, kernel: str = None):
    """The fused SwiGLU block as three registry SpMM calls + shared
    requantize — the bit-exact unfused counterpart and benchmark baseline."""
    from ternary_spgemm_tpu.ops import ternary_spgemm

    xq = jnp.asarray(xq, jnp.float32)
    sx = jnp.asarray(sx, jnp.float32)
    zg = jnp.zeros((fmt_gate.N,), jnp.float32)
    zd = jnp.zeros((fmt_down.N,), jnp.float32)
    g = gamma_gate * (sx * ternary_spgemm(xq, fmt_gate, zg, None, kernel=kernel))
    u = gamma_up * (sx * ternary_spgemm(xq, fmt_up, zg, None, kernel=kernel))
    h = jax.nn.silu(g) * u
    hq, scale = requantize_rows(h)
    y = ternary_spgemm(hq, fmt_down, zd, None, kernel=kernel)
    return y * (scale * gamma_down)


def unfused_reference_ffn(X, fmt1, b1, alpha1, fmt2, b2, alpha2=None, *,
                          gamma1: float = 1.0, gamma2: float = 1.0,
                          kernel: str = None):
    """The same block as two registry SpMM calls + the shared requantize —
    the unfused serving path the fused kernel must agree with bit-for-bit
    (and the baseline it is benchmarked against)."""
    from ternary_spgemm_tpu.ops import ternary_spgemm

    b1f = jnp.asarray(b1, jnp.float32) / gamma1
    h = ternary_spgemm(jnp.asarray(X, jnp.float32), fmt1, b1f, alpha1,
                       kernel=kernel)
    hq, scale = requantize_rows(h)
    zeros = jnp.zeros((fmt2.N,), jnp.float32)
    y = ternary_spgemm(hq, fmt2, zeros, None, kernel=kernel)
    y = y * (scale * (gamma1 * gamma2)) + jnp.asarray(b2, jnp.float32)
    if alpha2 is not None:
        y = jnp.where(y > 0, y, jnp.asarray(alpha2, jnp.float32)[None, :] * y)
    return y
