"""Pipeline-parallelism tests: GPipe schedule parity vs the plain forward,
microbatch invariance, and autodiff through the ppermute chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_spgemm_tpu.models import BitTransformerConfig, BitTransformerLM
from ternary_spgemm_tpu.parallel import make_mesh
from ternary_spgemm_tpu.parallel.pipeline import (
    lm_stage_params,
    pipeline_apply,
    pipeline_lm_apply,
    stack_stages,
)

CFG = BitTransformerConfig(vocab=32, d_model=16, n_heads=2, d_ff=32,
                           n_layers=4)


def _setup(seed=0, B=8, T=8):
    model = BitTransformerLM(CFG)
    params = model.init(jax.random.key(seed))
    toks = jax.random.randint(jax.random.key(seed + 1), (B, T), 0, CFG.vocab)
    return model, params, toks


@pytest.mark.parametrize("stages,n_micro", [(4, 2), (2, 4), (4, 8)])
def test_pipeline_lm_matches_plain_forward(stages, n_micro):
    model, params, toks = _setup()
    mesh = make_mesh({"pipe": stages})
    want = model.apply(params, toks)
    got = jax.jit(lambda p, t: pipeline_lm_apply(model, p, t, mesh,
                                                 n_micro=n_micro))(params, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_generic_stage_fn():
    """The generic core pipelines any stage_fn: y = ((x@A0)@A1)@...@A3."""
    mesh = make_mesh({"pipe": 4})
    key = jax.random.key(3)
    mats = [jax.random.normal(k, (8, 8)) * 0.5
            for k in jax.random.split(key, 4)]
    stacked = stack_stages([{"A": m} for m in mats])
    x = jax.random.normal(jax.random.key(4), (6, 8))
    got = pipeline_apply(lambda p, h: h @ p["A"], stacked, x, mesh, n_micro=3)
    want = x
    for m in mats:
        want = want @ m
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_plain():
    """Autodiff through the ppermute schedule equals the plain-forward grad
    (ppermute's transpose is the reverse ring)."""
    model, params, toks = _setup(seed=5)
    mesh = make_mesh({"pipe": 2})

    def loss_pipe(p):
        return jnp.mean(pipeline_lm_apply(model, p, toks, mesh, n_micro=4) ** 2)

    def loss_plain(p):
        return jnp.mean(model.apply(p, toks) ** 2)

    g_pipe = jax.grad(loss_pipe)(params)
    g_plain = jax.grad(loss_plain)(params)
    np.testing.assert_allclose(np.asarray(g_pipe["embed"]),
                               np.asarray(g_plain["embed"]),
                               rtol=5e-4, atol=5e-4)
    # the restructure happens inside loss_pipe, so grads share the original
    # params structure — compare every block leaf directly
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe["blocks"]),
                    jax.tree_util.tree_leaves(g_plain["blocks"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_pipeline_rejects_bad_split():
    model, params, toks = _setup()
    mesh = make_mesh({"pipe": 4})
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_lm_apply(model, params, toks[:6], mesh, n_micro=4)
    with pytest.raises(ValueError, match="stages"):
        lm_stage_params(model, params, 3)


def test_pipeline_composes_with_moe_blocks():
    """pp x ep composition: MoE-FFN blocks pipeline like dense ones (the
    experts stay local to each stage; aux is dropped in the pipelined
    forward, same as block.apply)."""
    cfg = BitTransformerConfig(vocab=32, d_model=16, n_heads=2, d_ff=32,
                               n_layers=4, moe_experts=2,
                               moe_capacity_factor=8.0)
    model = BitTransformerLM(cfg)
    params = model.init(jax.random.key(11))
    toks = jax.random.randint(jax.random.key(12), (4, 8), 0, cfg.vocab)
    mesh = make_mesh({"pipe": 2})
    want = model.apply(params, toks)
    got = jax.jit(lambda p, t: pipeline_lm_apply(model, p, t, mesh,
                                                 n_micro=2))(params, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_composes_with_bf16_compute():
    """Regression: bf16-compute blocks return a different dtype than the
    f32 scan carries; the pipeline pins carry dtypes so this works."""
    cfg = BitTransformerConfig(vocab=32, d_model=16, n_heads=2, d_ff=32,
                               n_layers=4, compute_dtype="bfloat16")
    model = BitTransformerLM(cfg)
    params = model.init(jax.random.key(13))
    toks = jax.random.randint(jax.random.key(14), (4, 8), 0, cfg.vocab)
    mesh = make_mesh({"pipe": 2})
    want = model.apply(params, toks)
    got = jax.jit(lambda p, t: pipeline_lm_apply(model, p, t, mesh,
                                                 n_micro=2))(params, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
