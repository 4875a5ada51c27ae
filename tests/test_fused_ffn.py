"""Fused FFN block kernel vs the unfused two-call serving path.

The fused kernel (``ops/fused_ffn.py``) must agree with the composition of
two registry SpMM calls + the shared per-row requantize: same formula
(:func:`requantize_rows`), same integer-exact dots, same f32 epilogue
order. The integer accumulations are bit-identical; the final f32 scaling
runs inside the kernel in the fused path and as XLA ops in the unfused
path, where the compiler may contract mul+add into an FMA — so the gate is
a few-ULP relative tolerance (observed max 2 ULPs), far below any real-bug
magnitude (a single requantize off-by-one already shifts an output by
~scale*colsum, orders of magnitude above it). The analogue of the
reference's ``-correctness`` gate (``cpp_impl/main.cpp:206-249``) applied
to the block level the reference never had.
"""

import numpy as np
import pytest

from ternary_spgemm_tpu.formats import (
    TiledBitplane,
    generate_alpha,
    generate_bias,
    generate_ternary,
    generate_x,
)
from ternary_spgemm_tpu.ops.fused_ffn import (
    fused_bitplane_ffn,
    unfused_reference_ffn,
)

KERNEL = "PallasTiledBitplane_i8"


def _block(M, K, N1, N2, s=4, *, prelu2=False, gammas=(1.0, 1.0), seed=0):
    W1 = generate_ternary(K, N1, s, seed=seed)
    W2 = generate_ternary(N1, N2, s, seed=seed + 1)
    fmt1 = TiledBitplane.from_dense(W1)
    fmt2 = TiledBitplane.from_dense(W2)
    X = generate_x(M, K, seed=seed + 2)
    b1 = generate_bias(N1)
    b2 = generate_bias(N2)
    a1 = generate_alpha(N1)
    a2 = generate_alpha(N2) if prelu2 else None
    g1, g2 = gammas
    return dict(X=X, fmt1=fmt1, b1=b1, alpha1=a1, fmt2=fmt2, b2=b2,
                alpha2=a2, gamma1=g1, gamma2=g2)


def _check(kw):
    got = np.asarray(fused_bitplane_ffn(**kw))
    want = np.asarray(unfused_reference_ffn(kernel=KERNEL, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.01)


@pytest.mark.parametrize("M", [1, 8, 33, 128])
def test_fused_matches_unfused(M):
    _check(_block(M, 128, 256, 128))


def test_prelu2_and_gammas():
    _check(_block(16, 128, 256, 128, prelu2=True, gammas=(0.037, 1.9)))


def test_hidden_width_not_block_multiple():
    # N1=1152 with K2-block B2=1024: round_up(1152, 128)=1152 < nb2*B2=2048
    # exercises the in-kernel zero-pad of the requantized hidden tile
    _check(_block(8, 128, 1152, 128))


@pytest.mark.parametrize("shape", [
    (1, 100, 256, 128),     # M=1, K not a multiple of 128
    (8, 128, 130, 128),     # hidden width barely over one lane tile
    (33, 96, 384, 96),      # odd M, sub-tile output width
])
def test_hostile_shapes(shape):
    M, K, N1, N2 = shape
    _check(_block(M, K, N1, N2))
    _check_swiglu(_swiglu_block(M, K, N1, N2))


def test_multi_block_phase1():
    # tkb=16 -> B1=128, so K=384 gives nb1=3 phase-1 K-blocks
    kw = _block(8, 384, 256, 128)
    kw["fmt1"] = TiledBitplane.from_dense(
        generate_ternary(384, 256, 4, seed=0), tkb=16)
    assert kw["fmt1"].plane.shape[0] > 1
    _check(kw)


def test_serving_m_contract():
    kw = _block(8, 128, 256, 128)
    kw["X"] = generate_x(256, 128, seed=5)
    with pytest.raises(ValueError, match="serving-M"):
        fused_bitplane_ffn(**kw)


def test_multi_tile_hidden():
    # hidden width spanning gn1=2 storage tiles (the BitNet-3B/7B ff>4096
    # regime scaled down): per-tile accumulators + dynamic leading index
    kw = _block(8, 128, 256, 128)
    kw["fmt1"] = TiledBitplane.from_dense(
        generate_ternary(128, 256, 4, seed=0), tile_n=128)  # gn1=2
    assert kw["fmt1"].plane.shape[1] == 2
    _check(kw)


def test_single_tile_output_contract():
    kw = _block(8, 128, 256, 128)
    kw["fmt2"] = TiledBitplane.from_dense(
        generate_ternary(256, 128, 4, seed=1), tile_n=64)   # gn2=2
    with pytest.raises(ValueError, match="OUTPUT"):
        fused_bitplane_ffn(**kw)


def test_mismatched_hidden_raises():
    kw = _block(8, 128, 256, 128)
    kw["fmt2"] = TiledBitplane.from_dense(generate_ternary(384, 128, 4, seed=9))
    with pytest.raises(ValueError, match="contracts over"):
        fused_bitplane_ffn(**kw)


# ---------------------------------------------------------------------------
# SwiGLU variant (the transformer's FFN, models/transformer.py)
# ---------------------------------------------------------------------------

from ternary_spgemm_tpu.ops.fused_ffn import (  # noqa: E402
    fused_bitplane_swiglu,
    requantize_rows,
    unfused_reference_swiglu,
)


def _swiglu_block(M, K, N1, N2, s=4, *, gammas=(1.0, 1.0, 1.0), seed=0):
    fmt_g = TiledBitplane.from_dense(generate_ternary(K, N1, s, seed=seed))
    fmt_u = TiledBitplane.from_dense(generate_ternary(K, N1, s, seed=seed + 1))
    fmt_d = TiledBitplane.from_dense(generate_ternary(N1, N2, s, seed=seed + 2))
    x = generate_x(M, K, seed=seed + 3)  # real-valued after the /127 scale
    xq, sx = requantize_rows(x)
    gg, gu, gd = gammas
    return dict(xq=xq, sx=sx, fmt_gate=fmt_g, fmt_up=fmt_u, fmt_down=fmt_d,
                gamma_gate=gg, gamma_up=gu, gamma_down=gd)


def _check_swiglu(kw):
    got = np.asarray(fused_bitplane_swiglu(**kw))
    want = np.asarray(unfused_reference_swiglu(kernel=KERNEL, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.01)


@pytest.mark.parametrize("M", [1, 8, 33])
def test_swiglu_matches_unfused(M):
    _check_swiglu(_swiglu_block(M, 128, 256, 128))


def test_swiglu_gammas_and_multiblock():
    kw = _swiglu_block(8, 384, 256, 128, gammas=(0.021, 0.034, 1.7))
    kw["fmt_gate"] = TiledBitplane.from_dense(
        generate_ternary(384, 256, 4, seed=0), tkb=16)
    kw["fmt_up"] = TiledBitplane.from_dense(
        generate_ternary(384, 256, 4, seed=1), tkb=16)
    assert kw["fmt_gate"].plane.shape[0] > 1
    _check_swiglu(kw)


def test_swiglu_shape_contracts():
    kw = _swiglu_block(8, 128, 256, 128)
    kw["fmt_up"] = TiledBitplane.from_dense(generate_ternary(128, 384, 4, seed=3))
    with pytest.raises(ValueError, match="share"):
        fused_bitplane_swiglu(**kw)


def test_swiglu_multi_tile_hidden():
    kw = _swiglu_block(8, 128, 256, 128)
    kw["fmt_gate"] = TiledBitplane.from_dense(
        generate_ternary(128, 256, 4, seed=0), tile_n=128)  # gn1=2
    kw["fmt_up"] = TiledBitplane.from_dense(
        generate_ternary(128, 256, 4, seed=1), tile_n=128)
    assert kw["fmt_gate"].plane.shape[1] == 2
    _check_swiglu(kw)


# ---------------------------------------------------------------------------
# Exported transformer block integration (fused_ffn=True)
# ---------------------------------------------------------------------------


def test_exported_block_fused_ffn():
    """ExportedTransformerBlock(fused_ffn=True) routes its SwiGLU FFN
    through the fused block kernel; the FFN output must match the unfused
    A8 composition with the exported layers' gammas."""
    import jax
    import jax.numpy as jnp
    from ternary_spgemm_tpu.models import (
        BitTransformerBlock, BitTransformerConfig, ExportedTransformerBlock)

    cfg = BitTransformerConfig(vocab=64, d_model=128, n_heads=2, d_ff=256,
                               n_layers=1)
    params = BitTransformerBlock(cfg).init(jax.random.key(0))
    blk = ExportedTransformerBlock.from_params(cfg, params, TiledBitplane,
                                               fused_ffn=True)
    assert blk._fused_ffn_applicable()   # row count does not gate: chunking

    h = jnp.asarray(generate_x(8, cfg.d_model, seed=4)) / 173.0
    got = np.asarray(jax.jit(lambda b, z: b._ffn(z))(blk, h))
    g, u, dn = (blk.linears[n] for n in ("w_gate", "w_up", "w_down"))
    hq, sx = requantize_rows(h)
    want = np.asarray(unfused_reference_swiglu(
        hq, sx, g.fmt, u.fmt, dn.fmt, gamma_gate=g.gamma, gamma_up=u.gamma,
        gamma_down=dn.gamma, kernel=KERNEL))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # >128 rows: the chunked path must equal row-wise application of the
    # fused kernel (per-row requantize makes each row independent)
    h_big = jnp.asarray(generate_x(150, cfg.d_model, seed=6)) / 173.0
    got_big = np.asarray(jax.jit(lambda b, z: b._ffn(z))(blk, h_big))
    np.testing.assert_allclose(got_big[:128],
                               np.asarray(blk._fused_ffn_call(h_big[:128])),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_big[128:],
                               np.asarray(blk._fused_ffn_call(h_big[128:])),
                               rtol=1e-6, atol=1e-6)

    # whole-block forward stays finite and jits with the flag on
    x = jnp.asarray(generate_x(1, cfg.d_model, seed=5)).reshape(1, 1, -1) / 300.0
    y = jax.jit(lambda b, z: b(z))(blk, x)
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_exported_block_fused_qkv():
    """fused_qkv=True merges q/k/v into one container; the block output
    must match the unfused block (same kernel, same quantized weights —
    only fp association of the gamma/bias fold differs)."""
    import jax
    import jax.numpy as jnp
    from ternary_spgemm_tpu.models import (
        BitTransformerBlock, BitTransformerConfig, ExportedTransformerBlock)

    cfg = BitTransformerConfig(vocab=64, d_model=128, n_heads=2, d_ff=256,
                               n_layers=1)
    params = BitTransformerBlock(cfg).init(jax.random.key(0))
    params["wk"]["b"] = params["wk"]["b"] + 0.25   # exercise the bias fold
    blk_u = ExportedTransformerBlock.from_params(cfg, params, TiledBitplane,
                                                 kernel=KERNEL)
    blk_f = ExportedTransformerBlock.from_params(cfg, params, TiledBitplane,
                                                 kernel=KERNEL,
                                                 fused_qkv=True)
    assert blk_f.qkv is not None
    assert blk_f.qkv["fmt"].N == 3 * cfg.d_model
    x = jnp.asarray(generate_x(4, cfg.d_model, seed=9)
                    ).reshape(1, 4, -1) / 300.0
    yu = np.asarray(jax.jit(lambda b, z: b(z))(blk_u, x))
    yf = np.asarray(jax.jit(lambda b, z: b(z))(blk_f, x))
    np.testing.assert_allclose(yf, yu, rtol=1e-5, atol=1e-4)


def test_exported_block_fused_ffn_bias_falls_back():
    import jax
    from ternary_spgemm_tpu.models import (
        BitTransformerBlock, BitTransformerConfig, ExportedTransformerBlock)

    cfg = BitTransformerConfig(vocab=64, d_model=128, n_heads=2, d_ff=256,
                               n_layers=1)
    params = BitTransformerBlock(cfg).init(jax.random.key(0))
    params["w_up"]["b"] = params["w_up"]["b"] + 1.0   # trained-in bias
    blk = ExportedTransformerBlock.from_params(cfg, params, TiledBitplane,
                                               fused_ffn=True)
    assert not blk._fused_ffn_applicable()
