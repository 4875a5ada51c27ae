"""Flax (linen) wrappers around the BitNet layers.

The functional core lives in ``models/bitlinear.py``; these modules give
users of the flax ecosystem (train state utilities, module composition,
serialization) the same layers as ``nn.Module``s. The math is shared —
``ternary_quantize_ste`` — so flax-trained parameters export through
``export_layer`` unchanged (pass the module's ``w``/``b``/``alpha`` leaves).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ternary_spgemm_tpu.models.bitlinear import ternary_quantize_ste


class FlaxBitLinear(nn.Module):
    """BitNet-b1.58 linear layer: ``y = x @ quant_ste(w) + b`` (+ PReLU)."""

    features: int
    prelu: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("w", nn.initializers.variance_scaling(
            2.0, "fan_in", "normal"), (in_features, self.features), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.dot(x, ternary_quantize_ste(w),
                    preferred_element_type=jnp.float32) + b
        if self.prelu:
            alpha = self.param("alpha", nn.initializers.constant(0.1),
                               (self.features,), jnp.float32)
            y = jnp.where(y > 0, y, alpha * y)
        return y


class FlaxTernaryMLP(nn.Module):
    """BitLinear stack with PReLU between layers (TernaryMLP as linen)."""

    features: Sequence[int]   # hidden + output feature sizes

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = FlaxBitLinear(f, prelu=i < len(self.features) - 1,
                              name=f"layers_{i}")(x)
        return x
