"""BitNet-style transformer tests: QAT forward/training, TP sharding,
export-to-kernel parity (the model family behind the reference's LLM-serving
shapes, SURVEY.md §0/§6)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ternary_spgemm_tpu.formats import DenseTernary
from ternary_spgemm_tpu.models import (
    BitTransformerBlock,
    BitTransformerConfig,
    BitTransformerLM,
    ExportedTransformerBlock,
    lm_loss,
    lm_param_shardings,
    make_lm_train_step,
)
from ternary_spgemm_tpu.parallel import make_mesh

CFG = BitTransformerConfig(vocab=64, d_model=32, n_heads=2, d_ff=64,
                           n_layers=2)


def _tokens(key, B=2, T=16, vocab=64):
    return jax.random.randint(key, (B, T), 0, vocab)


def test_lm_forward_shape_and_finite():
    model = BitTransformerLM(CFG)
    params = model.init(jax.random.key(0))
    logits = jax.jit(model.apply)(params, _tokens(jax.random.key(1)))
    assert logits.shape == (2, 16, CFG.vocab)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causal_masking():
    """Future tokens must not affect earlier logits."""
    model = BitTransformerLM(CFG)
    params = model.init(jax.random.key(0))
    t1 = _tokens(jax.random.key(1))
    t2 = t1.at[:, -1].set((t1[:, -1] + 1) % CFG.vocab)
    l1 = model.apply(params, t1)
    l2 = model.apply(params, t2)
    np.testing.assert_allclose(np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(l1[:, -1] - l2[:, -1]).max()) > 0


def test_lm_training_reduces_loss():
    model = BitTransformerLM(CFG)
    params = model.init(jax.random.key(2))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_lm_train_step(model, opt))
    toks = _tokens(jax.random.key(3), B=4, T=16)
    first = float(lm_loss(model, params, toks))
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, toks)
    assert float(loss) < first * 0.9
    assert bool(jnp.isfinite(loss))


def test_sharded_lm_step_runs():
    """TP×DP train step compiles and executes on the 8-device CPU mesh with
    Megatron-style block shardings."""
    mesh = make_mesh({"data": 2, "model": 4})
    model = BitTransformerLM(CFG)
    params = model.init(jax.random.key(4))
    pshard = lm_param_shardings(model, mesh)
    params = jax.device_put(params, pshard)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    toks = jax.device_put(
        _tokens(jax.random.key(5), B=4, T=16),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None)))
    step = jax.jit(make_lm_train_step(model, opt))
    params, opt_state, loss = step(params, opt_state, toks)
    assert bool(jnp.isfinite(loss))


def test_exported_block_matches_qat_forward():
    """Freezing a block into DenseTernary containers and running it on the
    kernel registry reproduces the QAT forward (same Wq, same gamma)."""
    block = BitTransformerBlock(CFG)
    params = block.init(jax.random.key(6))
    x = jax.random.normal(jax.random.key(7), (2, 8, CFG.d_model))
    want = block.apply(params, x)
    exported = ExportedTransformerBlock.from_params(CFG, params, DenseTernary)
    got = jax.jit(lambda blk, z: blk(z))(exported, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_exported_block_input_gradients_flow():
    """The frozen block backpropagates to its input through the custom-VJP
    ternary layers (frozen-backbone fine-tuning path)."""
    block = BitTransformerBlock(CFG)
    params = block.init(jax.random.key(8))
    exported = ExportedTransformerBlock.from_params(CFG, params, DenseTernary)
    x = jax.random.normal(jax.random.key(9), (2, 8, CFG.d_model))
    g = jax.grad(lambda z: jnp.sum(exported(z) ** 2))(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0
