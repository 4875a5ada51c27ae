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

Phase structure: a 1-D grid of ``nb1*gn1 + nb2`` sequential steps
(``dimension_semantics=("arbitrary",)``). Phase 1 walks the up-projection's
bitplane blocks TILE-MAJOR (storage tile ``j = k // nb1``, K-block
``kb = k % nb1``): one (TM, TN1) accumulator is reused per tile, and as each
tile completes its epilogue (PReLU / silu·mul) runs *immediately* — spread
across phase 1 and overlapped with the next tile's plane DMAs — storing f32
hidden blocks to VMEM scratch and a running per-row absmax. Phase 2 streams
W2's blocks, requantizing each needed hidden block ON THE FLY from the f32
scratch (a few VPU ops per element, hidden under the plane DMA). The first
fused design materialized the whole hidden tile and quantized it in one
grid step; at BitNet-3B/7B widths that serialized ~10 us of VPU work on the
critical path and measured SLOWER than unfused (91.3 vs 79.3 us marginal at
ff=8640) — this layout exists because of that measurement.

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
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ternary_spgemm_tpu.formats import TiledBitplane
from ternary_spgemm_tpu.ops.pallas_kernels import (
    _IPREC,
    _decode_halves_u8,
    _epilogue,
    _i8_epilogue,
    _int8_split_reg,
    _interpret,
    _row_vec,
)
from ternary_spgemm_tpu.utils import round_up

#: Shared requantization constants: the kernels recompute the scale from the
#: running row-max with EXACTLY these ops so fused == unfused bitwise on the
#: integer side (tests demand it).
_RQ_ABSMAX = 127.0
_RQ_EPS = 1e-12


def requantize_rows(h, absmax: float = _RQ_ABSMAX, eps: float = _RQ_EPS):
    """Per-row symmetric int8 requantization -> (hq f32-int-valued, scale).

    ``hq = round(absmax * h / rowmax)``, ``scale = rowmax / absmax`` so that
    ``hq * scale ~= h``. The SINGLE formula both the fused kernels and the
    unfused A8 serving path use — identical op order is what lets the
    fused/unfused equivalence tests demand integer-exact agreement."""
    rowmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True) + eps
    scale = rowmax / absmax
    return jnp.round(h / scale), scale


def _update_rowmax(rmax_ref, h, is_first):
    """Fold one hidden tile's per-row absmax into the running maximum.

    max-of-per-tile-maxes == global max exactly (f32 max is associative),
    so the deferred scale matches :func:`requantize_rows` bitwise."""
    m = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    prev = jnp.where(is_first, 0.0, rmax_ref[:, 0:1])
    rmax_ref[:] = jnp.broadcast_to(jnp.maximum(prev, m), rmax_ref.shape)


def _store_hidden(hf_ref, h, j, tpb: int, bw: int):
    """Store one f32 hidden tile into (TM, bw) scratch blocks at dynamic
    leading index ``j*tpb + t`` (``bw = gcd(TN1, B2)`` so phase-2 reads
    align on whole blocks for any tile/K-block width combination)."""
    for t in range(tpb):                                  # static unroll
        hf_ref[j * tpb + t] = h[:, t * bw:(t + 1) * bw]


def _load_hidden_q(hf_ref, rmax_ref, kk, lpb: int):
    """Requantize one (TM, B2) hidden block on the fly: concat ``lpb``
    scratch blocks, divide by the (now final) per-row scale, round to int8.
    ~5 VPU ops/element, hidden under the phase-2 plane DMA."""
    scale = (rmax_ref[:, 0:1] + _RQ_EPS) / _RQ_ABSMAX
    hblk = jnp.concatenate([hf_ref[kk * lpb + t] for t in range(lpb)],
                           axis=1)
    return jnp.round(hblk / scale).astype(jnp.int8)


def _phase2_scale(rmax_ref, gamma: float):
    """The per-row output scale: requantize scale x the folded gammas."""
    return ((rmax_ref[:, 0:1] + _RQ_EPS) / _RQ_ABSMAX) * gamma


def _ffn_kernel(x_ref, p1_ref, ws1_ref, p2_ref, b1_ref, a1_ref, b2_ref,
                a2_ref, o_ref, acc1_ref, ws1acc_ref, hf_ref, rmax_ref,
                acc2_ref, *, tkb1: int, tkb2: int, nb1: int, gn1: int,
                nb2: int, tm: int, bw: int, nh_store: int,
                nh_total: int, gamma1: float, gamma2: float,
                has_alpha1: bool, has_alpha2: bool):
    """One grid step of the fused PReLU-FFN block (see module docstring).

    Scratch: ``acc1`` (2TM, TN1) i32 stacked up-proj accumulator (reused
    per storage tile); ``ws1acc`` (1, TN1) i32 W1 column sums of the
    current tile (the -512 split correction); ``hf`` (gn1*TN1/bw, TM, bw)
    f32 hidden blocks; ``rmax`` (TM, 128) f32 running per-row absmax
    (lane 0 live); ``acc2`` (TM, N2) i32 down-proj accumulator."""
    k = pl.program_id(0)
    H1, H2 = 4 * tkb1, 4 * tkb2
    B2 = 8 * tkb2
    P1 = nb1 * gn1
    tpb, lpb = acc1_ref.shape[1] // bw, B2 // bw

    @pl.when(k == 0)
    def _():
        acc2_ref[:] = jnp.zeros_like(acc2_ref)
        for t in range(nh_store, nh_total):
            # tail blocks phase 2 reads but phase 1 never writes (the
            # layer-2 K padding beyond the padded hidden width): zero once
            hf_ref[t] = jnp.zeros_like(hf_ref[t])

    @pl.when(k < P1)
    def _():
        kb = jax.lax.rem(k, nb1)
        j = k // nb1

        @pl.when(kb == 0)
        def _():
            acc1_ref[:] = jnp.zeros_like(acc1_ref)
            ws1acc_ref[:] = jnp.zeros_like(ws1acc_ref)

        a, r = _int8_split_reg(x_ref[:])
        ar = jnp.concatenate([a, r], axis=0)              # (2TM, B1)
        lo, hi = _decode_halves_u8(p1_ref[0, 0, :tkb1], p1_ref[0, 0, tkb1:])
        acc1_ref[:] += jnp.dot(ar[:, :H1], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(ar[:, H1:], hi, preferred_element_type=jnp.int32, precision=_IPREC)
        ws1acc_ref[:] += ws1_ref[0, 0]

        @pl.when(kb == nb1 - 1)
        def _():
            # tile j complete: run the epilogue NOW (overlaps the next
            # tile's plane DMAs instead of serializing at the phase end).
            # h = gamma1 * PReLU(h_int + b1/gamma1): positive homogeneity
            # moves gamma1 outside PReLU (b1_ref carries b1/gamma1); the
            # requantize is scale-invariant, so gamma1 rides only in the
            # output scale and the stored h stays UNSCALED.
            h_int = 8 * acc1_ref[:tm, :] + acc1_ref[tm:, :]
            p = _i8_epilogue(h_int, ws1acc_ref[:], b1_ref, a1_ref,
                             has_alpha1)
            _update_rowmax(rmax_ref, p, j == 0)
            _store_hidden(hf_ref, p, j, tpb, bw)

    @pl.when(k >= P1)
    def _():
        kk = k - P1
        lo, hi = _decode_halves_u8(p2_ref[0, 0, :tkb2], p2_ref[0, 0, tkb2:])
        hblk = _load_hidden_q(hf_ref, rmax_ref, kk, lpb)  # (TM, B2) int8
        acc2_ref[:] += jnp.dot(hblk[:, :H2], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(hblk[:, H2:], hi, preferred_element_type=jnp.int32, precision=_IPREC)

    @pl.when(k == P1 + nb2 - 1)
    def _():
        y = acc2_ref[:].astype(jnp.float32) \
            * _phase2_scale(rmax_ref, gamma1 * gamma2)
        o_ref[:] = _epilogue(y, b2_ref, a2_ref, has_alpha2)


def _ffn_geometry(fmt1: TiledBitplane, fmt2: TiledBitplane, name: str):
    """Shared contract checks -> (nb1, gn1, nb2, tkb1, tkb2, TN1, TN2, bw).

    The OUTPUT projection must fit one storage tile (N2 <= 4096 — shard N2
    across chips for wider outputs, ``parallel/spgemm.py``); the HIDDEN
    width may span multiple tiles (BitNet-3B/7B ff=8640/11008 stay fused).
    Hidden scratch blocks are ``bw = gcd(TN1, B2)`` wide so phase-2 reads
    align on whole blocks for any width combination."""
    nb1, gn1 = fmt1.plane.shape[0], fmt1.plane.shape[1]
    nb2, gn2 = fmt2.plane.shape[0], fmt2.plane.shape[1]
    if gn2 != 1:
        raise ValueError(
            f"{name} needs a single-N-tile OUTPUT container (gn == 1), got "
            f"gn2={gn2}; shard N2 across chips for wider outputs "
            "(the hidden width may span multiple tiles)")
    if fmt2.K != fmt1.N:
        raise ValueError(
            f"layer-2 container contracts over K={fmt2.K}, expected fmt1.N="
            f"{fmt1.N}")
    B2 = 8 * fmt2.tkb
    if nb2 * B2 != round_up(fmt1.N, B2):
        raise ValueError(
            f"{name}: layer-2 K padding ({nb2 * B2}) does not cover the "
            f"hidden width {fmt1.N}")
    TN1, TN2 = fmt1.tile_n, fmt2.tile_n
    bw = math.gcd(TN1, B2)
    # fmt2's K padding may exceed the padded hidden width (its extra plane
    # rows are zero); the hidden scratch covers the larger of the two and
    # the kernels zero the never-written tail blocks once at k == 0.
    nh_store = gn1 * TN1 // bw
    nh_total = max(nh_store, nb2 * B2 // bw)
    return (nb1, gn1, nb2, fmt1.tkb, fmt2.tkb, TN1, TN2, bw, nh_store,
            nh_total)


def fused_bitplane_ffn(X, fmt1: TiledBitplane, b1, alpha1,
                       fmt2: TiledBitplane, b2, alpha2=None, *,
                       gamma1: float = 1.0, gamma2: float = 1.0):
    """Run the fused FFN block (module docstring) over TiledBitplane weights.

    Contract: serving M (<= 128 rows), integer-valued f32 ``X`` with
    ``|X| <= 512`` (the flagship's exact domain, ``perf.cpp:301``), a
    single-N-tile OUTPUT container (see :func:`_ffn_geometry`), and
    ``fmt2.K == fmt1.N``. ``gamma*`` are the exported BitNet absmean scales
    (Python floats — static, like the reference's template parameters)."""
    M = X.shape[0]
    if M > 128:
        raise ValueError(
            f"fused_bitplane_ffn is the serving-M path (M <= 128), got {M}; "
            "at training M the hidden tile exceeds VMEM — run the layers "
            "unfused (they pipeline fine at large M, docs/perf.md §14)")
    (nb1, gn1, nb2, tkb1, tkb2, TN1, TN2, bw, nh_store,
     nh_total) = _ffn_geometry(fmt1, fmt2, "fused_bitplane_ffn")
    B1, B2 = 8 * tkb1, 8 * tkb2
    # hidden columns beyond fmt1.N are exactly zero: padded W1 columns are
    # zero AND b1/alpha1 are zero-padded by _row_vec, so padded h == 0 and
    # contributes nothing to phase 2 (padded W2 ROWS are zero anyway).
    TM = round_up(M, 32)
    xf = jnp.pad(jnp.asarray(X, jnp.float32),
                 ((0, TM - M), (0, nb1 * B1 - X.shape[1])))
    b1p = _row_vec(np.asarray(b1, np.float32) / gamma1, gn1 * TN1)
    a1p = _row_vec(alpha1 if alpha1 is not None
                   else np.zeros(fmt1.N, np.float32), gn1 * TN1)
    b2p = _row_vec(b2, TN2)
    a2p = _row_vec(alpha2 if alpha2 is not None
                   else np.zeros(fmt2.N, np.float32), TN2)
    plane1, wsum1 = jnp.asarray(fmt1.plane), jnp.asarray(fmt1.wsum)
    plane2 = jnp.asarray(fmt2.plane)

    kernel = functools.partial(
        _ffn_kernel, tkb1=tkb1, tkb2=tkb2, nb1=nb1, gn1=gn1, nb2=nb2, tm=TM,
        bw=bw, nh_store=nh_store, nh_total=nh_total,
        gamma1=float(gamma1), gamma2=float(gamma2),
        has_alpha1=alpha1 is not None, has_alpha2=alpha2 is not None)

    P1 = nb1 * gn1
    # phase-1 operand indices CLAMP at the last phase-1 step: a cycling
    # index (rem(k, nb1)) keeps changing during phase 2 and makes Mosaic
    # refetch the (megabyte) phase-1 plane blocks under the phase-2 steps —
    # measured +3.5 us at 2048x4096x2048 before the clamp.
    kc = lambda k: jnp.minimum(k, P1 - 1)
    jmap = lambda k: jnp.minimum(kc(k) // nb1, gn1 - 1)
    p1_idx = lambda k: (jax.lax.rem(kc(k), nb1), jmap(k), 0, 0)
    p2_idx = lambda k: (jnp.clip(k - P1, 0, nb2 - 1), 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(P1 + nb2,),
        in_specs=[
            pl.BlockSpec((TM, B1),
                         lambda k: (0, jax.lax.rem(kc(k), nb1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb1, TN1), p1_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN1), p1_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * tkb2, TN2), p2_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN1), lambda k: (0, jmap(k)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN1), lambda k: (0, jmap(k)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN2), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN2), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN2), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TM, TN2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * TM, TN1), jnp.int32),       # acc1 (stacked a; r)
            pltpu.VMEM((1, TN1), jnp.int32),            # ws1acc
            pltpu.VMEM((nh_total, TM, bw), jnp.float32),  # hf
            pltpu.VMEM((TM, 128), jnp.float32),         # rmax (lane 0 live)
            pltpu.VMEM((TM, TN2), jnp.int32),           # acc2
        ],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xf, plane1, wsum1, plane2, b1p[:, :gn1 * TN1], a1p[:, :gn1 * TN1],
      b2p[:, :TN2], a2p[:, :TN2])
    return out[:M, :fmt2.N]


def _swiglu_kernel(xq_ref, sx_ref, pg_ref, pu_ref, pd_ref, o_ref,
                   accg_ref, accu_ref, hf_ref, rmax_ref, acc2_ref, *,
                   tkb1: int, tkb2: int, nb1: int, gn1: int, nb2: int,
                   bw: int, nh_store: int, nh_total: int,
                   gamma_gate: float, gamma_up: float,
                   gamma_down: float):
    """Fused SwiGLU FFN step: ``y = (silu(gamma_g*sx*(xq@Wg)) *
    (gamma_u*sx*(xq@Wu))) |> requantize |> @Wd * (scale*gamma_d)``.

    The W1.58-A8 transformer block (``models/transformer.py`` SwiGLU FFN,
    biasless ternary projections): ``xq`` int8 per-row-quantized activations
    with row scale ``sx`` — no (a; r) split needed, |xq| <= 127 is
    MXU-native. Phase 1 streams BOTH up-projections' bitplane blocks per
    step, tile-major; the silu·mul epilogue runs per completed tile and the
    requantize happens on the fly in phase 2 (see module docstring)."""
    k = pl.program_id(0)
    H1, H2 = 4 * tkb1, 4 * tkb2
    B2 = 8 * tkb2
    P1 = nb1 * gn1
    tpb, lpb = accg_ref.shape[1] // bw, B2 // bw

    @pl.when(k == 0)
    def _():
        acc2_ref[:] = jnp.zeros_like(acc2_ref)
        for t in range(nh_store, nh_total):
            hf_ref[t] = jnp.zeros_like(hf_ref[t])

    @pl.when(k < P1)
    def _():
        kb = jax.lax.rem(k, nb1)
        j = k // nb1

        @pl.when(kb == 0)
        def _():
            accg_ref[:] = jnp.zeros_like(accg_ref)
            accu_ref[:] = jnp.zeros_like(accu_ref)

        xb = xq_ref[:]
        glo, ghi = _decode_halves_u8(pg_ref[0, 0, :tkb1], pg_ref[0, 0, tkb1:])
        ulo, uhi = _decode_halves_u8(pu_ref[0, 0, :tkb1], pu_ref[0, 0, tkb1:])
        accg_ref[:] += jnp.dot(xb[:, :H1], glo, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(xb[:, H1:], ghi, preferred_element_type=jnp.int32, precision=_IPREC)
        accu_ref[:] += jnp.dot(xb[:, :H1], ulo, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(xb[:, H1:], uhi, preferred_element_type=jnp.int32, precision=_IPREC)

        @pl.when(kb == nb1 - 1)
        def _():
            sx = sx_ref[:, 0:1]
            g = gamma_gate * (sx * accg_ref[:].astype(jnp.float32))
            u = gamma_up * (sx * accu_ref[:].astype(jnp.float32))
            h = jax.nn.silu(g) * u                        # (TM, TN1)
            _update_rowmax(rmax_ref, h, j == 0)
            _store_hidden(hf_ref, h, j, tpb, bw)

    @pl.when(k >= P1)
    def _():
        kk = k - P1
        lo, hi = _decode_halves_u8(pd_ref[0, 0, :tkb2], pd_ref[0, 0, tkb2:])
        hblk = _load_hidden_q(hf_ref, rmax_ref, kk, lpb)
        acc2_ref[:] += jnp.dot(hblk[:, :H2], lo, preferred_element_type=jnp.int32, precision=_IPREC) \
            + jnp.dot(hblk[:, H2:], hi, preferred_element_type=jnp.int32, precision=_IPREC)

    @pl.when(k == P1 + nb2 - 1)
    def _():
        o_ref[:] = acc2_ref[:].astype(jnp.float32) \
            * _phase2_scale(rmax_ref, gamma_down)


def fused_bitplane_swiglu(xq, sx, fmt_gate: TiledBitplane,
                          fmt_up: TiledBitplane, fmt_down: TiledBitplane, *,
                          gamma_gate: float = 1.0, gamma_up: float = 1.0,
                          gamma_down: float = 1.0):
    """Fused ternary SwiGLU FFN block over int8-quantized activations.

    ``xq`` (M, K) int8-valued f32/int8 (|xq| <= 127, e.g. from
    :func:`requantize_rows`), ``sx`` (M, 1) its per-row scale. Same serving
    contract as :func:`fused_bitplane_ffn`: M <= 128, single-N-tile OUTPUT
    (``fmt_down`` gn == 1; the hidden width may span multiple storage tiles
    — BitNet-3B/7B ff=8640/11008 stay fused), ``fmt_down.K == fmt_gate.N ==
    fmt_up.N``. The three projections are biasless (the transformer's
    ternary projections, ``models/transformer.py``)."""
    M = xq.shape[0]
    if M > 128:
        raise ValueError(
            f"fused_bitplane_swiglu is the serving-M path (M <= 128), got "
            f"{M}; run the layers unfused at training M")
    if (fmt_up.K, fmt_up.N, fmt_up.tkb, fmt_up.tile_n) != \
            (fmt_gate.K, fmt_gate.N, fmt_gate.tkb, fmt_gate.tile_n) \
            or fmt_up.plane.shape[:2] != fmt_gate.plane.shape[:2]:
        raise ValueError("gate and up projections must share (K, N, tkb, "
                         "tile_n)")
    (nb1, gn1, nb2, tkb1, tkb2, TN1, TN2, bw, nh_store,
     nh_total) = _ffn_geometry(fmt_gate, fmt_down, "fused_bitplane_swiglu")
    B1, B2 = 8 * tkb1, 8 * tkb2
    TM = round_up(M, 32)
    xf = jnp.pad(jnp.asarray(xq, jnp.int8),
                 ((0, TM - M), (0, nb1 * B1 - xq.shape[1])))
    # 128-lane row-scale operand (1-lane VMEM refs are not a safe Mosaic
    # layout); the kernel reads lane 0
    sxf = jnp.pad(jnp.asarray(sx, jnp.float32).reshape(M, 1),
                  ((0, TM - M), (0, 127)))
    kernel = functools.partial(
        _swiglu_kernel, tkb1=tkb1, tkb2=tkb2, nb1=nb1, gn1=gn1, nb2=nb2,
        bw=bw, nh_store=nh_store, nh_total=nh_total,
        gamma_gate=float(gamma_gate), gamma_up=float(gamma_up),
        gamma_down=float(gamma_down))
    P1 = nb1 * gn1
    # clamp phase-1 operand indices at the last phase-1 step (see
    # fused_bitplane_ffn: cycling indices refetch planes under phase 2)
    kc = lambda k: jnp.minimum(k, P1 - 1)
    jmap = lambda k: jnp.minimum(kc(k) // nb1, gn1 - 1)
    p1_idx = lambda k: (jax.lax.rem(kc(k), nb1), jmap(k), 0, 0)
    p2_idx = lambda k: (jnp.clip(k - P1, 0, nb2 - 1), 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(P1 + nb2,),
        in_specs=[
            pl.BlockSpec((TM, B1),
                         lambda k: (0, jax.lax.rem(kc(k), nb1)),
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
            pltpu.VMEM((TM, TN1), jnp.int32),           # accg
            pltpu.VMEM((TM, TN1), jnp.int32),           # accu
            pltpu.VMEM((nh_total, TM, bw), jnp.float32),  # hf
            pltpu.VMEM((TM, 128), jnp.float32),         # rmax (lane 0 live)
            pltpu.VMEM((TM, TN2), jnp.int32),           # acc2
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
    requantize — the integer-exact unfused counterpart and benchmark
    baseline."""
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
    the unfused serving path the fused kernel must agree with (and the
    baseline it is benchmarked against)."""
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
