"""Correctness gate: every registered kernel vs the dense reference.

TPU-native analogue of the reference's ``-correctness`` path
(``cpp_impl/main.cpp:206-249``): build every format from one random W, run
every registered kernel, compare elementwise against the dense ``jnp`` GEMM
within the reference tolerance (abs 1e-5, ``sparseUtils.h:147``). Approximate
kernels (bf16 MXU) get a relative tolerance instead.
"""

import numpy as np
import pytest

from ternary_spgemm_tpu import reference
from ternary_spgemm_tpu.formats import (
    BlockedEllTCSC,
    BlockedTCSC,
    DenseTernary,
    EllTCSC,
    InterleavedBlockedTCSC,
    InterleavedTCSC,
    PackedCSC,
    PackedTernary2Bit,
    PackedTernary53,
    TCSC,
    TCSR,
    TiledBitplane,
    TiledEllDeposit,
    TiledEllTCSC,
    generate_alpha,
    generate_bias,
    generate_ternary,
    generate_x,
)
from ternary_spgemm_tpu.ops import all_kernels

# Small enough to run the whole registry quickly on CPU (Pallas in interpret
# mode), large enough to exercise multi-tile grids in every dimension.
M, K, N, S = 40, 96, 160, 4

# Format construction kwargs sized for the test shapes (the driver's
# BLOCK_SIZE=512 analogue, main.cpp:7).
_FMT_KWARGS = {
    BlockedTCSC: dict(block_size=32),
    InterleavedBlockedTCSC: dict(block_size=32, group=2),
    BlockedEllTCSC: dict(block_k=32, tile_n=128),
    EllTCSC: dict(tile_n=128),
    TiledEllTCSC: dict(block_k=31, tile_n=128),
    TiledBitplane: dict(tkb=4, tile_n=128),
    TiledEllDeposit: dict(tile_n=128),
}


def _build(format_cls, W):
    return format_cls.from_dense(W, **_FMT_KWARGS.get(format_cls, {}))


@pytest.fixture(scope="module")
def problem():
    W = generate_ternary(K, N, S, seed=7)
    X = generate_x(M, K, seed=8)
    b = generate_bias(N)
    alpha = generate_alpha(N)
    want = np.asarray(reference.dense_gemm(X, W, b))
    want_prelu = np.asarray(reference.dense_gemm_prelu(X, W, b, alpha))
    return W, X, b, alpha, want, want_prelu


def _domain_inputs(problem, spec):
    """Restricted-domain kernels (x_absmax, e.g. the int8-native _x8 paths)
    gate on activations clamped INTO their domain, against a reference
    computed on the same clamped X (the harness does the same)."""
    W, X, b, alpha, want, want_prelu = problem
    if spec.x_absmax is not None and spec.x_absmax < 512:
        X = np.clip(X, -spec.x_absmax, spec.x_absmax)
        want = np.asarray(reference.dense_gemm(X, W, b))
        want_prelu = np.asarray(reference.dense_gemm_prelu(X, W, b, alpha))
    return W, X, b, alpha, want, want_prelu


@pytest.mark.parametrize("name", sorted(all_kernels()))
def test_kernel_matches_dense_reference(problem, name):
    spec = all_kernels()[name]
    W, X, b, alpha, want, _ = _domain_inputs(problem, spec)
    fmt = _build(spec.format_cls, W)
    got = np.asarray(spec(X, fmt, b))
    if spec.approximate:
        # bf16 operands: per-term abs error <= |x|*2^-9 <= 1, f32 accumulate
        # => bound = nnz-per-column ~= K/S terms of error 1 each.
        np.testing.assert_allclose(got, want, atol=2.0 * (K // S))
    else:
        res = reference.compare_results(got, want)
        assert res, f"{name}: {res}"


@pytest.mark.parametrize("name", sorted(all_kernels()))
def test_kernel_fused_prelu(problem, name):
    spec = all_kernels()[name]
    W, X, b, alpha, _, want_prelu = _domain_inputs(problem, spec)
    fmt = _build(spec.format_cls, W)
    got = np.asarray(spec(X, fmt, b, alpha))
    if spec.approximate:
        np.testing.assert_allclose(got, want_prelu, atol=2.0 * (K // S))
    else:
        res = reference.compare_results(got, want_prelu)
        assert res, f"{name}: {res}"


@pytest.mark.parametrize("m", [1, 3, 32])
def test_north_star_shape_small_m(m):
    """M=1 row (the reference sweep's smallest M) through the default path."""
    W = generate_ternary(64, 256, 4, seed=3)
    X = generate_x(m, 64, seed=4)
    b = generate_bias(256)
    want = np.asarray(reference.dense_gemm(X, W, b))
    for cls in (TCSC, DenseTernary, PackedTernary53):
        spec = next(s for s in all_kernels().values()
                    if s.format_cls is cls and not s.approximate)
        got = np.asarray(spec(X, cls.from_dense(W), b))
        assert reference.compare_results(got, want), spec.name


def test_default_dispatch_is_safe_and_exact():
    """Default ternary_spgemm dispatch must avoid approximate and
    integer-only (_i8) kernels when a fully-exact kernel exists, and still
    work for formats whose only kernel is integer-only."""
    from ternary_spgemm_tpu.formats import BlockPackedTernary
    from ternary_spgemm_tpu.ops import ternary_spgemm

    W = generate_ternary(64, 128, 4, seed=9)
    b = generate_bias(128)
    # non-integer activations: the default path must stay exact
    X_float = generate_x(4, 64, seed=10) + 0.25
    want = np.asarray(reference.dense_gemm(X_float, W, b))
    got = np.asarray(ternary_spgemm(X_float, DenseTernary.from_dense(W), b))
    assert reference.compare_results(got, want)
    # BlockPacked's only kernel is _i8 -> integer activations required
    X_int = generate_x(4, 64, seed=10)
    want_i = np.asarray(reference.dense_gemm(X_int, W, b))
    got_i = np.asarray(ternary_spgemm(X_int, BlockPackedTernary.from_dense(W), b))
    assert reference.compare_results(got_i, want_i)


def test_empty_column_and_row():
    """Columns/rows with no nonzeros must still produce bias-only outputs."""
    W = np.zeros((32, 64), np.int8)
    W[0, 0] = 1
    W[5, 1] = -1
    # value_range inside every kernel's activation domain (incl. _x8 |x|<=127)
    X = generate_x(4, 32, seed=0, value_range=127)
    b = generate_bias(64)
    want = np.asarray(reference.dense_gemm(X, W, b))
    for name, spec in all_kernels().items():
        if spec.approximate:
            continue
        fmt = _build(spec.format_cls, W)
        got = np.asarray(spec(X, fmt, b))
        assert reference.compare_results(got, want), name


def test_basetcsc_chunked_matches_unchunked(monkeypatch):
    """The M-chunked BaseTCSC path (sweep feasibility at every canonical
    config, VERDICT.md round-2 missing #4) is bit-identical to the direct
    segment-sum formulation."""
    import jax.numpy as jnp

    from ternary_spgemm_tpu.ops import xla_kernels

    W = generate_ternary(K, N, S, seed=11)
    X = jnp.asarray(generate_x(M, K, seed=12))
    b = generate_bias(N)
    a = generate_alpha(N)
    fmt = TCSC.from_dense(W)
    direct = np.asarray(xla_kernels.tcsc_kernel(X, fmt, b, a))
    # force chunking with MC > 1 and an M remainder (M=40, MC=ceil)
    nnz = int(np.count_nonzero(W))
    monkeypatch.setattr(xla_kernels, "_GATHER_CHUNK_FLOATS", 7 * nnz)
    chunked = np.asarray(xla_kernels.tcsc_kernel(X, fmt, b, a))
    np.testing.assert_array_equal(direct, chunked)
    # and MC == 1 (nnz exceeds the budget entirely)
    monkeypatch.setattr(xla_kernels, "_GATHER_CHUNK_FLOATS", 1)
    np.testing.assert_array_equal(
        direct, np.asarray(xla_kernels.tcsc_kernel(X, fmt, b, a)))


@pytest.mark.parametrize("fuse_split", [True, False])
@pytest.mark.parametrize("stacked", [True, False])
def test_bitplane_i8_fuse_split_paths(problem, fuse_split, stacked):
    """The v4 in-kernel int8 split (fuse_split=True, the default) and the v3
    two-operand pre-pass must agree exactly with the dense reference in both
    stacked and unstacked tile modes (VERDICT round-3 next #2)."""
    from ternary_spgemm_tpu.ops.pallas_kernels import (
        pallas_tiled_bitplane_i8_kernel)

    W, X, b, alpha, _, want_prelu = problem
    fmt = _build(TiledBitplane, W)
    got = np.asarray(pallas_tiled_bitplane_i8_kernel(
        X, fmt, b, alpha, fuse_split=fuse_split, stacked=stacked))
    res = reference.compare_results(got, want_prelu)
    assert res, f"fuse_split={fuse_split} stacked={stacked}: {res}"


@pytest.mark.parametrize("M_big", [200, 300])
def test_bitplane_family_unstacked_large_m(M_big):
    """M > 128 takes the v3 UNstacked tile path (docs/perf.md §13) — cover
    both the gm=1 and gm=2 grids of that branch in interpret mode."""
    import jax.numpy as jnp

    from ternary_spgemm_tpu.ops import all_kernels

    W = generate_ternary(K, N, S, seed=21)
    Xb = jnp.asarray(generate_x(M_big, K, seed=22))
    b = generate_bias(N)
    a = generate_alpha(N)
    fmt = _build(TiledBitplane, W)
    want = np.asarray(Xb, np.float64) @ np.asarray(W, np.float64) \
        + np.asarray(b)[None, :]
    want = np.where(want > 0, want, np.asarray(a)[None, :] * want)
    reg = all_kernels()
    for name in ("PallasTiledBitplane_i8", "PallasTiledBitplane_x8",
                 "PallasTiledBitplane_bf16"):
        Xk = jnp.clip(Xb, -reg[name].x_absmax, reg[name].x_absmax)
        wk = np.asarray(Xk, np.float64) @ np.asarray(W, np.float64) \
            + np.asarray(b)[None, :]
        wk = np.where(wk > 0, wk, np.asarray(a)[None, :] * wk)
        got = np.asarray(reg[name].fn(Xk, fmt, b, a))
        np.testing.assert_allclose(got, wk, atol=1e-5, err_msg=name)


def test_stack_mode_tile_rule(problem):
    """stack_mode() flips the serving-M single-step N-split OFF at trace
    time (the measured in-stack rule, docs/perf.md §16) and restores the
    isolated-call rule on exit — and the kernel stays correct either way."""
    from ternary_spgemm_tpu.ops import stack_mode, ternary_spgemm
    from ternary_spgemm_tpu.ops.pallas_kernels import _bitplane_tiles

    assert _bitplane_tiles(32, 4096, 1)[:3] == (32, 2048, 2)
    with stack_mode():
        assert _bitplane_tiles(32, 4096, 1)[:3] == (32, 4096, 1)
        with stack_mode(False):
            assert _bitplane_tiles(32, 4096, 1)[:3] == (32, 2048, 2)
        assert _bitplane_tiles(32, 4096, 1)[:3] == (32, 4096, 1)
    assert _bitplane_tiles(32, 4096, 1)[:3] == (32, 2048, 2)

    W, X, b, alpha, want, _ = problem
    fmt = _build(TiledBitplane, W)
    with stack_mode():
        got = np.asarray(ternary_spgemm(
            X, fmt, b, kernel="PallasTiledBitplane_i8"))
    assert np.abs(got - want).max() <= 1e-5
