"""Differentiable exported ternary layers — custom VJP over SpMM kernels.

An exported container runs through Pallas kernels, which have no automatic
derivative. But the backward pass of a ternary linear layer is *itself* a
ternary SpMM against the transposed weights:

    y = gamma * (x @ Wq) + b            dx = gamma * (dy' @ Wq^T)
    out = prelu(y, alpha)               dy' = where(y > 0, dy, alpha * dy)
                                        db = sum_m dy',  dalpha = sum_m dy * min(y, 0)...

so :class:`ExportedBitLinear` stores both the container and its transpose
(built once at export) and wires a ``jax.custom_vjp`` whose forward *and*
backward passes run on the registered kernels. This makes frozen-ternary-
backbone fine-tuning (gradients w.r.t. activations and downstream params)
run at inference-kernel speed in both directions — a capability with no
reference analogue (the reference has no training or autodiff at all).
"""

from __future__ import annotations

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from ternary_spgemm_tpu.formats.base import TernaryFormat
from ternary_spgemm_tpu.models.bitlinear import ternary_quantize
from ternary_spgemm_tpu.ops import ternary_spgemm


class ExportedBitLinear:
    """Frozen ternary linear layer, differentiable w.r.t. (x, bias, alpha).

    Build from trained BitLinear params with :meth:`from_params`, or directly
    from a ternary matrix with :meth:`from_dense`. Calling the layer inside
    ``jax.grad`` works; both directions use registry kernels.
    """

    def __init__(self, fmt: TernaryFormat, fmt_t: TernaryFormat, gamma: float,
                 bias, alpha=None, *, kernel: Optional[str] = None):
        self.fmt = fmt
        self.fmt_t = fmt_t
        self.gamma = float(gamma)
        self.bias = jnp.asarray(bias, jnp.float32)
        self.alpha = None if alpha is None else jnp.asarray(alpha, jnp.float32)
        self.kernel = kernel
        self._f = _make_vjp_fn(fmt, fmt_t, self.gamma, kernel,
                               has_alpha=self.alpha is not None)

    @classmethod
    def from_params(cls, params: dict, format_cls: Type[TernaryFormat], *,
                    kernel: Optional[str] = None, **fmt_kwargs):
        Wq, gamma = ternary_quantize(params["w"])
        Wq = np.asarray(Wq, np.int8)
        return cls(format_cls.from_dense(Wq, **fmt_kwargs),
                   format_cls.from_dense(np.ascontiguousarray(Wq.T), **fmt_kwargs),
                   float(gamma), params["b"], params.get("alpha"), kernel=kernel)

    @classmethod
    def from_dense(cls, W: np.ndarray, format_cls: Type[TernaryFormat], *,
                   gamma: float = 1.0, bias=None, alpha=None,
                   kernel: Optional[str] = None, **fmt_kwargs):
        W = np.asarray(W, np.int8)
        if bias is None:
            bias = np.zeros(W.shape[1], np.float32)
        return cls(format_cls.from_dense(W, **fmt_kwargs),
                   format_cls.from_dense(np.ascontiguousarray(W.T), **fmt_kwargs),
                   gamma, bias, alpha, kernel=kernel)

    def __call__(self, x):
        if self.alpha is None:
            return self._f(x, self.bias)
        return self._f(x, self.bias, self.alpha)


class ExportedMLP:
    """A trained TernaryMLP frozen into containers, layer by layer.

    Differentiable w.r.t. the input (chain of custom-VJP layers), so a
    frozen ternary backbone composes with trainable heads/adapters.
    """

    def __init__(self, layers):
        self.layers = list(layers)

    @classmethod
    def from_params(cls, model, params: list, format_cls: Type[TernaryFormat],
                    *, kernel: Optional[str] = None, **fmt_kwargs):
        return cls(ExportedBitLinear.from_params(p, format_cls, kernel=kernel,
                                                 **fmt_kwargs)
                   for p in params)

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


def _make_vjp_fn(fmt, fmt_t, gamma: float, kernel, *, has_alpha: bool):
    K, N = fmt.shape
    zero_b_t = jnp.zeros((K,), jnp.float32)

    def linear(x, b):
        # gamma * (x @ Wq) + b  ==  gamma * (x @ Wq + b/gamma)
        return ternary_spgemm(x, fmt, b / gamma, None, kernel=kernel) * gamma

    def linear_t(g):
        # gamma * (g @ Wq^T) through the transposed container
        return ternary_spgemm(g, fmt_t, zero_b_t, None, kernel=kernel) * gamma

    if not has_alpha:
        @jax.custom_vjp
        def f(x, b):
            return linear(x, b)

        def fwd(x, b):
            return linear(x, b), None

        def bwd(_, g):
            return linear_t(g), jnp.sum(g, axis=0)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def f(x, b, alpha):
        y = linear(x, b)
        return jnp.where(y > 0, y, alpha[None, :] * y)

    def fwd(x, b, alpha):
        y = linear(x, b)
        return jnp.where(y > 0, y, alpha[None, :] * y), (y, alpha)

    def bwd(res, g):
        y, alpha = res
        g_lin = jnp.where(y > 0, g, alpha[None, :] * g)
        dalpha = jnp.sum(jnp.where(y > 0, 0.0, y * g), axis=0)
        return linear_t(g_lin), jnp.sum(g_lin, axis=0), dalpha

    f.defvjp(fwd, bwd)
    return f
