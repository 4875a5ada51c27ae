"""Training loop pieces: loss, optimizer step, and mesh-sharded training.

Net-new vs the reference (no training anywhere in it). The sharded training
step demonstrates the framework's full multi-chip story: data-parallel batch
sharding + Megatron-style alternating column/row tensor parallelism over the
BitLinear stack, expressed with ``NamedSharding`` and compiled by GSPMD —
collectives ride ICI, nothing is hand-scheduled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ternary_spgemm_tpu.models.bitlinear import TernaryMLP


def mse_loss(model: TernaryMLP, params, x, y):
    pred = model.apply(params, x)
    return jnp.mean((pred - y) ** 2)


def make_train_step(model: TernaryMLP, optimizer: optax.GradientTransformation):
    """Jittable ``(params, opt_state, x, y) -> (params, opt_state, loss)``."""

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: mse_loss(model, p, x, y))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def param_shardings(model: TernaryMLP, mesh: Mesh, axis: str = "model"):
    """Megatron-style alternating TP specs for the BitLinear stack: even
    layers split output features (column-parallel), odd layers split input
    features (row-parallel), so activations stay sharded between the pair and
    GSPMD inserts one reduce per pair."""
    specs = []
    for i, layer in enumerate(model.layers):
        col = (i % 2 == 0)
        entry = {"w": P(None, axis) if col else P(axis, None),
                 "b": P(axis) if col else P()}
        if layer.prelu:
            entry["alpha"] = entry["b"]
        specs.append(entry)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P))


def make_sharded_lm_train_step(model, optimizer, mesh: Mesh, *,
                               data_axis: str = "data",
                               model_axis: str = "model",
                               sequence_parallel: bool = False,
                               zero1: bool = False):
    """Compile the transformer-LM train step SPMD over a (data × model) mesh.

    Batch rides ``data_axis``; params follow
    :func:`~ternary_spgemm_tpu.models.transformer.lm_param_shardings`
    (Megatron TP + expert parallelism over ``model_axis`` for MoE configs).
    With ``sequence_parallel=True`` the activations between blocks are
    constrained to ``P(data, model, None)`` — the sequence dimension shards
    over the TP axis, so norms/residuals compute T-sharded and GSPMD emits
    the all-gather/reduce-scatter pair of Megatron sequence parallelism
    instead of keeping full activations replicated per TP rank.

    With ``zero1=True`` the optimizer moments additionally shard one free
    axis over ``data_axis`` (ZeRO stage 1): each data-parallel rank stores
    and updates 1/dp of the optimizer state, GSPMD reduce-scatters the
    gradients into the update and all-gathers the fresh params — optimizer
    memory O(P/dp) instead of O(P) per device.

    Returns ``(jitted_step, place)``; ``place(params, opt_state, tokens)``
    lays everything out.
    """
    from ternary_spgemm_tpu.models.transformer import (
        lm_param_shardings, make_lm_train_step)

    pshard = lm_param_shardings(model, mesh, model_axis)
    tshard = NamedSharding(mesh, P(data_axis, None))
    constrain = None
    if sequence_parallel:
        act = NamedSharding(mesh, P(data_axis, model_axis, None))
        constrain = lambda z: jax.lax.with_sharding_constraint(z, act)
    base_step = make_lm_train_step(model, optimizer, constrain=constrain)
    ptree = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda s: 0, pshard))

    def _mirrors_params(sub) -> bool:
        try:
            return jax.tree_util.tree_structure(sub) == ptree
        except Exception:
            return False

    def _zero1_sharding(s: NamedSharding, leaf):
        """Param sharding + one free axis sharded over data_axis (if any
        axis divides evenly); falls back to the param sharding."""
        leaf = jnp.asarray(leaf)
        spec = list(s.spec) + [None] * (leaf.ndim - len(s.spec))
        dp = mesh.shape[data_axis]
        for i, ax in enumerate(spec):
            if ax is None and leaf.ndim and leaf.shape[i] % dp == 0 \
                    and leaf.shape[i] >= dp:
                spec[i] = data_axis
                break
        return NamedSharding(mesh, P(*spec))

    def _place_moments(sub):
        if not zero1:
            return jax.device_put(sub, pshard)
        return jax.tree_util.tree_map(
            lambda s, l: jax.device_put(l, _zero1_sharding(s, l)),
            pshard, sub)

    def _constrain_moments(opt_state):
        """Pin updated moments back to the zero1 layout inside the compiled
        step — otherwise GSPMD may propagate them back to replicated after
        the first update and the memory win evaporates."""
        return jax.tree_util.tree_map(
            lambda sub: (jax.tree_util.tree_map(
                lambda s, l: jax.lax.with_sharding_constraint(
                    l, _zero1_sharding(s, l)), pshard, sub)
                if _mirrors_params(sub) else sub),
            opt_state, is_leaf=_mirrors_params)

    def step(params, opt_state, tokens):
        params, opt_state, loss = base_step(params, opt_state, tokens)
        if zero1:
            opt_state = _constrain_moments(opt_state)
        return params, opt_state, loss

    jitted = jax.jit(step)

    def place(params, opt_state, tokens):
        params = jax.device_put(params, pshard)
        opt_state = jax.tree_util.tree_map(
            lambda sub: (_place_moments(sub)
                         if _mirrors_params(sub) else sub),
            opt_state, is_leaf=_mirrors_params)
        return params, opt_state, jax.device_put(tokens, tshard)

    return jitted, place


def make_sharded_train_step(model: TernaryMLP,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh, *, data_axis: str = "data",
                            model_axis: str = "model"):
    """Compile the train step SPMD over a (data x model) mesh.

    Returns ``(jitted_step, place)``; ``place(params, opt_state, x, y)`` lays
    params out per :func:`param_shardings`, optimizer moments like the params
    they mirror, and the batch along ``data_axis``.
    """
    pshard = param_shardings(model, mesh, model_axis)
    xshard = NamedSharding(mesh, P(data_axis, None))
    ptree = jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda s: 0, pshard))
    jitted = jax.jit(make_train_step(model, optimizer))

    def _mirrors_params(sub) -> bool:
        try:
            return jax.tree_util.tree_structure(sub) == ptree
        except Exception:
            return False

    def place(params, opt_state, x, y):
        params = jax.device_put(params, pshard)
        opt_state = jax.tree_util.tree_map(
            lambda sub: jax.device_put(sub, pshard) if _mirrors_params(sub) else sub,
            opt_state, is_leaf=_mirrors_params)
        return params, opt_state, jax.device_put(x, xshard), jax.device_put(y, xshard)

    return jitted, place
