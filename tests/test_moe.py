"""MoE tests: routing parity vs a per-token loop reference, capacity drops,
load-balance aux, expert-parallel sharding parity, and the MoE transformer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_spgemm_tpu.models import (
    BitMoE,
    BitMoEConfig,
    BitTransformerConfig,
    BitTransformerLM,
    lm_loss,
    lm_param_shardings,
    moe_param_shardings,
)
from ternary_spgemm_tpu.models.bitlinear import ternary_quantize_ste
from ternary_spgemm_tpu.parallel import make_mesh


def _expert_out(params, e, x):
    """Dense per-token reference for expert ``e`` on rows ``x (s, d)``."""
    g = x @ ternary_quantize_ste(params["w_gate"][e])
    u = x @ ternary_quantize_ste(params["w_up"][e])
    return (jax.nn.silu(g) * u) @ ternary_quantize_ste(params["w_down"][e])


def _reference_moe(cfg, params, x):
    """Loop-over-tokens reference: top-k routing with per-expert capacity
    slots assigned in token order (the GShard contract), drops → 0."""
    xs = np.asarray(x.reshape(-1, cfg.d_model))
    probs = np.asarray(jax.nn.softmax(xs @ np.asarray(params["router"]), -1))
    S, E = probs.shape
    C = cfg.capacity(S)
    y = np.zeros_like(xs)
    fill = [[] for _ in range(E)]  # token rows accepted per expert
    gates = np.zeros((S, E))
    order = np.argsort(-probs, axis=-1)
    for k in range(cfg.top_k):
        for s in range(S):
            e = order[s, k]
            if len(fill[e]) < C:
                fill[e].append(s)
                gates[s, e] = probs[s, e]
    for e in range(E):
        if fill[e]:
            rows = np.array(fill[e])
            out = np.asarray(_expert_out(params, e, jnp.asarray(xs[rows])))
            y[rows] += gates[rows, e][:, None] * out
    return y.reshape(x.shape)


CFG = BitMoEConfig(d_model=16, d_ff=32, n_experts=4, top_k=1,
                   capacity_factor=4.0)


def _setup(cfg=CFG, seed=0, S=24, positive=False):
    moe = BitMoE(cfg)
    params = moe.init(jax.random.key(seed))
    x = jax.random.normal(jax.random.key(seed + 1), (S, cfg.d_model))
    if positive:
        x = jnp.abs(x)  # makes single-column router collapses deterministic
    return moe, params, x


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_per_token_reference(top_k):
    cfg = BitMoEConfig(16, 32, 4, top_k=top_k, capacity_factor=4.0)
    moe, params, x = _setup(cfg)
    y, aux = jax.jit(moe.apply)(params, x)
    want = _reference_moe(cfg, params, x)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)
    assert float(aux) > 0


def test_moe_capacity_drops_to_zero():
    """With capacity 4 (the floor) and all tokens routed to one expert, the
    overflow tokens must produce exactly 0 (the residual carries them)."""
    cfg = BitMoEConfig(16, 32, 4, capacity_factor=0.01)
    moe, params, x = _setup(cfg, S=24, positive=True)
    # collapse the router so every token picks expert 0
    params["router"] = params["router"].at[:].set(0.0)
    params["router"] = params["router"].at[:, 0].set(5.0)
    y, _ = moe.apply(params, x)
    assert cfg.capacity(24) == 4
    # capacity slots fill in token order: tokens 4.. all dropped
    np.testing.assert_allclose(np.asarray(y[4:]), 0.0)
    assert np.abs(np.asarray(y[:4])).max() > 0


def test_moe_aux_prefers_balance():
    """Aux loss is ~1 for a balanced router and ~E for a collapsed one."""
    moe, params, x = _setup(S=64, positive=True)
    balanced = params["router"].at[:].set(0.0)
    collapsed = balanced.at[:, 0].set(20.0)
    _, aux_b = moe.apply(dict(params, router=balanced), x)
    _, aux_c = moe.apply(dict(params, router=collapsed), x)
    assert float(aux_c) > 2.5 * float(aux_b)
    assert abs(float(aux_b) - 1.0) < 0.35


def test_moe_gradients_flow_to_all_parts():
    moe, params, x = _setup()

    def loss(p):
        y, aux = moe.apply(p, x)
        return jnp.mean(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    for name in ("router", "w_gate", "w_up", "w_down"):
        assert np.abs(np.asarray(g[name])).max() > 0, name


def test_moe_expert_parallel_matches_single_device():
    """EP over an 8-device mesh: params sharded on the expert axis + the
    dispatch constraint produce bit-identical results to the local run."""
    cfg = BitMoEConfig(16, 32, 8, top_k=2, capacity_factor=2.0)
    moe, params, x = _setup(cfg, S=64)
    want, aux_want = moe.apply(params, x)

    mesh = make_mesh({"expert": 8})
    shardings = moe_param_shardings(mesh)
    p_sh = jax.device_put(params, shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P
    ep = NamedSharding(mesh, P("expert", None, None))
    got, aux_got = jax.jit(
        lambda p, x: moe.apply(p, x, expert_sharding=ep))(p_sh, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux_got), float(aux_want), rtol=1e-5)


def test_moe_transformer_trains_and_shards():
    """A dp×ep-sharded MoE transformer LM step runs and reduces the loss."""
    import optax

    cfg = BitTransformerConfig(vocab=32, d_model=16, n_heads=2, d_ff=32,
                               n_layers=2, moe_experts=4,
                               moe_capacity_factor=4.0)
    model = BitTransformerLM(cfg)
    params = model.init(jax.random.key(0))
    toks = jax.random.randint(jax.random.key(1), (8, 8), 0, cfg.vocab)

    mesh = make_mesh({"data": 2, "model": 4})
    shardings = lm_param_shardings(model, mesh)
    p_sh = jax.device_put(params, shardings)

    opt = optax.adam(1e-2)
    state = opt.init(p_sh)

    @jax.jit
    def step(p, s, t):
        loss, g = jax.value_and_grad(lambda q: lm_loss(model, q, t))(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(4):
        p_sh, state, loss = step(p_sh, state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_moe_config_validation():
    with pytest.raises(ValueError, match="top_k"):
        BitMoEConfig(16, 32, 4, top_k=5)


def test_exported_moe_matches_qat_forward():
    """Freezing the experts into containers reproduces the QAT forward
    exactly (same ternarization, gamma folded into the kernel epilogue)."""
    from ternary_spgemm_tpu.formats import TCSC
    from ternary_spgemm_tpu.models import ExportedMoE

    cfg = BitMoEConfig(16, 32, 4, top_k=2, capacity_factor=4.0)
    moe, params, x = _setup(cfg, S=24)
    want, _ = moe.apply(params, x)
    exported = ExportedMoE.from_params(cfg, params, TCSC)
    got = jax.jit(lambda m, z: m(z))(exported, x)  # through-jit: literal-free
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_exported_moe_transformer_block():
    """A full MoE transformer block exports and matches its QAT forward."""
    from ternary_spgemm_tpu.formats import TCSC
    from ternary_spgemm_tpu.models import ExportedTransformerBlock
    from ternary_spgemm_tpu.models.transformer import BitTransformerBlock

    cfg = BitTransformerConfig(d_model=16, n_heads=2, d_ff=32,
                               moe_experts=2, moe_capacity_factor=4.0)
    blk = BitTransformerBlock(cfg)
    params = blk.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 8, 16))
    want = blk.apply(params, x)
    exported = ExportedTransformerBlock.from_params(cfg, params, TCSC)
    got = jax.jit(lambda b, z: b(z))(exported, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
