"""Production-training features: remat parity, bf16 compute policy, and
ZeRO-1 optimizer-state sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ternary_spgemm_tpu.models import (
    BitTransformerConfig,
    BitTransformerLM,
    make_sharded_lm_train_step,
)
from ternary_spgemm_tpu.parallel import make_mesh

BASE = dict(vocab=32, d_model=16, n_heads=2, d_ff=32, n_layers=2)


def _setup(cfg, seed=0):
    model = BitTransformerLM(cfg)
    params = model.init(jax.random.key(seed))
    toks = jax.random.randint(jax.random.key(seed + 1), (4, 8), 0, cfg.vocab)
    return model, params, toks


def test_remat_forward_and_grads_match_plain():
    """jax.checkpoint changes memory, never values: logits and grads are
    bit-comparable to the non-remat model."""
    plain, params, toks = _setup(BitTransformerConfig(**BASE))
    remat = BitTransformerLM(BitTransformerConfig(**BASE, remat=True))

    np.testing.assert_allclose(np.asarray(remat.apply(params, toks)),
                               np.asarray(plain.apply(params, toks)))

    def loss(model):
        return lambda p: jnp.mean(model.apply(p, toks) ** 2)

    g_plain = jax.grad(loss(plain))(params)
    g_remat = jax.grad(loss(remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bf16_compute_policy_tracks_f32():
    """bf16 blocks approximate the f32 forward (params stay f32 masters;
    norm/softmax accumulate f32 internally) and train stably."""
    f32, params, toks = _setup(BitTransformerConfig(**BASE))
    bf16 = BitTransformerLM(
        BitTransformerConfig(**BASE, compute_dtype="bfloat16"))

    y32 = np.asarray(f32.apply(params, toks))
    y16 = np.asarray(bf16.apply(params, toks))
    assert y16.dtype == np.float32  # logits come back f32 (head is f32)
    # bf16 has ~2-3 decimal digits; scale tolerance to the activations
    np.testing.assert_allclose(y16, y32, rtol=0.05, atol=0.05)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(q):
            return jnp.mean(bf16.apply(q, toks) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    p = params
    for _ in range(4):
        p, state, l = step(p, state)
        losses.append(float(l))
        # master params stay f32 through the whole loop
        assert all(q.dtype == jnp.float32
                   for q in jax.tree_util.tree_leaves(p))
    assert losses[-1] < losses[0]


def test_bf16_moe_block_runs():
    cfg = BitTransformerConfig(**BASE, compute_dtype="bfloat16",
                               moe_experts=4, moe_capacity_factor=4.0)
    model, params, toks = _setup(cfg)
    logits, aux = model.apply_with_aux(params, toks)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(float(aux))


def test_zero1_shards_moments_and_matches_plain():
    """ZeRO-1: adam moments shard over the data axis (asserted on the
    placed AND the updated state) and the loss trajectory matches the
    replicated-optimizer run."""
    mesh = make_mesh({"data": 4, "model": 2})
    cfg = BitTransformerConfig(**BASE)

    def run(zero1):
        model, params, toks = _setup(cfg)
        opt = optax.adam(1e-2)
        step, place = make_sharded_lm_train_step(model, opt, mesh,
                                                 zero1=zero1)
        p, s, t = place(params, opt.init(params), toks)
        losses = []
        for _ in range(3):
            p, s, loss = step(p, s, t)
            losses.append(float(loss))
        return losses, s

    losses_plain, _ = run(False)
    losses_z1, state_z1 = run(True)
    np.testing.assert_allclose(losses_z1, losses_plain, rtol=1e-5)

    # find the adam mu for the first block's wq weight and check its layout
    mu = state_z1[0].mu  # optax.adam state: (ScaleByAdamState, ...)
    w_moment = mu["blocks"][0]["wq"]["w"]  # (16, 16), param spec P(None, model)
    spec = w_moment.sharding.spec
    assert "data" in jax.tree_util.tree_leaves(tuple(spec)), spec


def test_zero1_respects_param_sharding():
    """zero1 never steals an axis the TP spec already shards."""
    mesh = make_mesh({"data": 4, "model": 2})
    cfg = BitTransformerConfig(**BASE)
    model, params, toks = _setup(cfg)
    opt = optax.adam(1e-2)
    step, place = make_sharded_lm_train_step(model, opt, mesh, zero1=True)
    p, s, t = place(params, opt.init(params), toks)
    mu = s[0].mu
    w = mu["blocks"][0]["wq"]["w"]
    # column-parallel wq: P(None, "model") -> zero1 must put data on axis 0
    assert w.sharding.spec == jax.sharding.PartitionSpec("data", "model")


def test_zero1_with_moe_experts():
    """zero1 composes with expert-parallel MoE params: expert moment
    stacks keep their leading-E model sharding and gain a data axis."""
    mesh = make_mesh({"data": 2, "model": 4})
    cfg = BitTransformerConfig(**BASE, moe_experts=4,
                               moe_capacity_factor=4.0)
    model, params, toks = _setup(cfg)
    opt = optax.adam(1e-2)
    step, place = make_sharded_lm_train_step(model, opt, mesh, zero1=True,
                                             sequence_parallel=True)
    p, s, t = place(params, opt.init(params), toks)
    mu = s[0].mu
    wg = mu["blocks"][0]["moe"]["w_gate"]  # (E, d, ff), spec P(model,)
    assert wg.sharding.spec[0] == "model" and "data" in tuple(wg.sharding.spec)
    p, s, loss = step(p, s, t)
    assert np.isfinite(float(loss))
