"""Sharded SpMM tests on the 8-device virtual CPU mesh (conftest.py).

The multi-host capability is net-new vs the reference (SURVEY.md §2.3);
the test pattern follows §4's prescription: fake multi-device backend via
``--xla_force_host_platform_device_count``, correctness vs the dense
reference at the usual 1e-5 absolute tolerance.
"""

import jax
import numpy as np
import pytest

from ternary_spgemm_tpu import reference
from ternary_spgemm_tpu.formats import (
    BlockedEllTCSC,
    DenseTernary,
    PackedTernary53,
    TCSC,
    generate_alpha,
    generate_bias,
    generate_ternary,
    generate_x,
)
from ternary_spgemm_tpu.parallel import (
    column_leaf_specs,
    column_sharded_spgemm,
    make_mesh,
    overlapped_gather_spgemm,
    row_sharded_spgemm,
    shard_container,
)

M, K, N, S = 16, 128, 512, 4


@pytest.fixture(scope="module")
def problem():
    W = generate_ternary(K, N, S, seed=11)
    X = generate_x(M, K, seed=12)
    b = generate_bias(N)
    alpha = generate_alpha(N)
    want = np.asarray(reference.dense_gemm(X, W, b))
    want_p = np.asarray(reference.dense_gemm_prelu(X, W, b, alpha))
    return W, X, b, alpha, want, want_p


@pytest.mark.parametrize("fmt_cls", [DenseTernary, PackedTernary53, BlockedEllTCSC])
def test_column_sharded(problem, fmt_cls):
    W, X, b, alpha, want, want_p = problem
    mesh = make_mesh({"model": 4})
    fmt = fmt_cls.from_dense(W)
    got = np.asarray(column_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)
    got_p = np.asarray(column_sharded_spgemm(X, fmt, b, alpha, mesh=mesh, axis="model"))
    assert reference.compare_results(got_p, want_p)


def test_column_sharded_with_placed_container(problem):
    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"model": 4})
    fmt = DenseTernary.from_dense(W)
    placed = shard_container(fmt, mesh, column_leaf_specs(DenseTernary, "model"))
    got = np.asarray(column_sharded_spgemm(X, placed, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)


def test_2d_mesh_data_x_model(problem):
    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"data": 2, "model": 4})
    fmt = PackedTernary53.from_dense(W)
    got = np.asarray(column_sharded_spgemm(
        X, fmt, b, mesh=mesh, axis="model", batch_axis="data"))
    assert reference.compare_results(got, want)


@pytest.mark.parametrize("scatter", [False, True])
def test_row_sharded(problem, scatter):
    W, X, b, alpha, want, want_p = problem
    mesh = make_mesh({"model": 4})
    fmt = DenseTernary.from_dense(W)
    got = np.asarray(row_sharded_spgemm(
        X, fmt, b, mesh=mesh, axis="model", scatter_output=scatter))
    assert reference.compare_results(got, want)
    got_p = np.asarray(row_sharded_spgemm(
        X, fmt, b, alpha, mesh=mesh, axis="model", scatter_output=scatter))
    assert reference.compare_results(got_p, want_p)


def test_row_sharded_blocked_ell(problem):
    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"model": 4})
    # block_k must divide K/d so K-blocks never straddle shards
    fmt = BlockedEllTCSC.from_dense(W, block_k=32)
    got = np.asarray(row_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)


@pytest.mark.parametrize("fmt_cls", [DenseTernary, PackedTernary53])
def test_overlapped_gather(problem, fmt_cls):
    W, X, b, alpha, want, want_p = problem
    mesh = make_mesh({"model": 8})
    fmt = fmt_cls.from_dense(W)
    got = np.asarray(overlapped_gather_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)
    got_p = np.asarray(overlapped_gather_spgemm(
        X, fmt, b, alpha, mesh=mesh, axis="model"))
    assert reference.compare_results(got_p, want_p)


def test_row_sharded_blockpacked(problem):
    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"model": 4})
    # block-local stride: nb = K/(factor*tile_kq) = 128/32 = 4 blocks, one
    # per shard — decodes contiguous dense rows per device
    from ternary_spgemm_tpu.formats import BlockPackedTernary
    fmt = BlockPackedTernary.from_dense(W, factor=4, tile_kq=8)
    got = np.asarray(row_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)


def test_row_sharded_global_packed_raises(problem):
    """Globally stride-packed planes must refuse row sharding (a shard's
    bytes encode non-contiguous dense rows — silently wrong otherwise)."""
    W, X, b, *_ = problem
    mesh = make_mesh({"model": 4})
    fmt = PackedTernary53.from_dense(W)
    with pytest.raises(TypeError, match="not row-shardable"):
        row_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model")


def test_tiled_column_sharded(problem):
    from ternary_spgemm_tpu.formats import TiledDenseTernary

    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"model": 4})
    # N=512, tile_n=128 -> gn=4, one tile-column per device, N % tile_n == 0
    fmt = TiledDenseTernary.from_dense(W, tile_k=32, tile_n=128)
    got = np.asarray(column_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)


def test_tiled_row_sharded(problem):
    from ternary_spgemm_tpu.formats import TiledBlockPacked, TiledDenseTernary

    W, X, b, alpha, want, _ = problem
    mesh = make_mesh({"model": 4})
    # K=128, tile_k=32 -> gk=4 blocks, one per device
    fmt = TiledDenseTernary.from_dense(W, tile_k=32, tile_n=128)
    got = np.asarray(row_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)
    fbp = TiledBlockPacked.from_dense(W, factor=4, tile_kq=8, tile_n=128)
    got = np.asarray(row_sharded_spgemm(X, fbp, b, mesh=mesh, axis="model"))
    assert reference.compare_results(got, want)


def test_tiled_column_shard_misalignment_raises(problem):
    """Sharding a tiled container along a padded dimension must refuse:
    shard boundaries inside tiles silently corrupt results otherwise."""
    from ternary_spgemm_tpu.formats import TiledDenseTernary

    W, X, b, *_ = problem
    mesh = make_mesh({"model": 2})
    W_odd = W[:, :N - 128]                       # N=384, tile_n=256: padded
    fmt = TiledDenseTernary.from_dense(W_odd, tile_k=32, tile_n=256)
    with pytest.raises(ValueError, match="N % tile_n"):
        column_sharded_spgemm(X, fmt, b[:N - 128], mesh=mesh, axis="model")


def test_blockpacked_row_shard_misalignment_raises(problem):
    """ADVICE r1 (high): K % (factor*tile_kq) != 0 made per-shard packed rows
    decode dense rows beyond the device's X column shard — silently wrong.
    Must raise instead."""
    from ternary_spgemm_tpu.formats import BlockPackedTernary

    W, X, b, *_ = problem
    mesh = make_mesh({"model": 2})
    W_odd = W[:112]                  # K=112, factor*tile_kq=64: padded block
    fmt = BlockPackedTernary.from_dense(W_odd, factor=4, tile_kq=16)
    with pytest.raises(ValueError, match=r"K % \(factor"):
        row_sharded_spgemm(X[:, :112], fmt, b, mesh=mesh, axis="model")


def test_blockpacked_row_shard_block_split_raises(problem):
    """Even with K an exact block multiple, the device count must divide the
    block count — a shard boundary inside a packed block decodes the wrong
    dense rows."""
    from ternary_spgemm_tpu.formats import BlockPackedTernary

    W, X, b, *_ = problem
    mesh = make_mesh({"model": 4})
    # K=128, factor=4, tile_kq=16 -> blk=64, nb=2 blocks, 4 shards: boundary
    # would land mid-block.
    fmt = BlockPackedTernary.from_dense(W, factor=4, tile_kq=16)
    with pytest.raises(ValueError, match="divide the block count"):
        row_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model")


def test_blocked_ell_shard_misalignment_raises(problem):
    """ADVICE r1 (low): BlockedEllTCSC with unaligned dims must raise the
    guided ValueError, not an opaque shape error deep in shard_map."""
    W, X, b, *_ = problem
    mesh = make_mesh({"model": 2})
    W_odd = W[:, :N - 128]           # N=384, tile_n=256: padded tile
    fmt = BlockedEllTCSC.from_dense(W_odd, tile_n=256)
    with pytest.raises(ValueError, match="N % tile_n"):
        column_sharded_spgemm(X, fmt, b[:N - 128], mesh=mesh, axis="model")
    W_k = W[:112]                    # K=112, block_k=64: padded K-block
    fmt_k = BlockedEllTCSC.from_dense(W_k, block_k=64)
    with pytest.raises(ValueError, match="K % block_k"):
        row_sharded_spgemm(X[:, :112], fmt_k, b, mesh=mesh, axis="model")


def test_unshardable_format_raises(problem):
    W, X, b, *_ = problem
    mesh = make_mesh({"model": 4})
    fmt = TCSC.from_dense(W)
    with pytest.raises(TypeError, match="not column-shardable"):
        column_sharded_spgemm(X, fmt, b, mesh=mesh, axis="model")
