"""Model-layer tests: quantization, QAT training, export-to-kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ternary_spgemm_tpu import reference
from ternary_spgemm_tpu.formats import DenseTernary, PackedTernary53
from ternary_spgemm_tpu.models import (
    BitLinear,
    TernaryMLP,
    apply_exported,
    export_layer,
    make_sharded_train_step,
    make_train_step,
    mse_loss,
    ternary_quantize,
)
from ternary_spgemm_tpu.parallel import make_mesh


def test_quantize_values_and_scale():
    key = jax.random.key(0)
    W = jax.random.normal(key, (64, 32))
    Wq, gamma = ternary_quantize(W)
    assert set(np.unique(np.asarray(Wq))) <= {-1.0, 0.0, 1.0}
    np.testing.assert_allclose(float(gamma), float(jnp.mean(jnp.abs(W))), rtol=1e-4)


def test_ste_gradient_is_identity_shaped():
    layer = BitLinear(16, 8)
    params = layer.init(jax.random.key(1))
    x = jnp.ones((4, 16))

    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x)))(params)
    # STE: latent weights receive a dense, finite gradient
    assert g["w"].shape == (16, 8)
    assert bool(jnp.all(jnp.isfinite(g["w"])))
    assert float(jnp.abs(g["w"]).sum()) > 0


def test_training_reduces_loss():
    model = TernaryMLP([8, 32, 4])
    params = model.init(jax.random.key(2))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))
    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (64, 8))
    y = jax.random.normal(k2, (64, 4))
    first = float(mse_loss(model, params, x, y))
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, x, y)
    assert float(loss) < first * 0.9


@pytest.mark.parametrize("fmt_cls", [DenseTernary, PackedTernary53])
def test_export_matches_training_forward(fmt_cls):
    """Exported container + registry kernel == QAT forward, exactly."""
    layer = BitLinear(64, 128, prelu=True)
    params = layer.init(jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (8, 64))
    want = np.asarray(layer.apply(params, x))
    fmt, gamma, b, alpha = export_layer(params, fmt_cls)
    got = np.asarray(apply_exported(x, fmt, gamma, b, alpha))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_train_step_runs():
    mesh = make_mesh({"data": 2, "model": 4})
    model = TernaryMLP([16, 32, 16])
    params = model.init(jax.random.key(6))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step, place = make_sharded_train_step(model, opt, mesh)
    x = jnp.ones((8, 16))
    y = jnp.zeros((8, 16))
    params, opt_state, x, y = place(params, opt_state, x, y)
    params2, _, loss = step(params, opt_state, x, y)
    assert np.isfinite(float(loss))
    # params keep their shardings through the step
    spec0 = params2[0]["w"].sharding.spec
    assert spec0 == params[0]["w"].sharding.spec
