"""Dense reference operators and the correctness comparator.

TPU-native analogue of the reference's correctness layer
(``cpp_impl/sparseUtils.h:93-156`` in alessiomelone/Ternary-spGEMM):

* :func:`dense_gemm`      — ``Y = X @ W + b``            (``GEMM``, ``sparseUtils.h:93-108``)
* :func:`dense_gemm_prelu``— ... with PReLU epilogue      (``GEMM_PreLU``, ``sparseUtils.h:111-137``)
* :func:`prelu`           — ``y > 0 ? y : alpha[n] * y``  (per-output-column alpha)
* :func:`compare_results` — elementwise absolute-tolerance comparator
  (``compare_results``, ``sparseUtils.h:140-156``; tolerance ``10e-6`` = 1e-5).

Everything here is plain jnp so it runs on CPU or TPU; the matmul is forced to
``precision=HIGHEST`` so float32 accumulation over the integer-valued test
data (X integer in [-512, 512], W in {-1,0,+1}) is *exact* — which is what
makes the reference's absolute tolerance of 1e-5 meaningful.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: Absolute tolerance of the reference comparator (``sparseUtils.h:147``,
#: written there as ``10e-6``).
TOLERANCE = 1e-5


def prelu(y: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with per-output-column slope: ``y if y > 0 else alpha[n] * y``.

    Matches the epilogue in ``GEMM_PreLU`` (``sparseUtils.h:128-133``) and the
    fused kernels in ``cpp_impl/comp_prelu.h``.
    """
    return jnp.where(y > 0, y, alpha * y)


def dense_gemm(X: jax.Array, W: jax.Array, b: jax.Array) -> jax.Array:
    """``Y[M,N] = X[M,K] @ W[K,N] + b[N]`` in float32, exact accumulation.

    The dense correctness reference (``GEMM``, ``sparseUtils.h:93-108``).
    """
    X = jnp.asarray(X, jnp.float32)
    W = jnp.asarray(W, jnp.float32)
    Y = jnp.dot(X, W, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    return Y + jnp.asarray(b, jnp.float32)[None, :]


def dense_gemm_prelu(X: jax.Array, W: jax.Array, b: jax.Array,
                     alpha: jax.Array) -> jax.Array:
    """Dense reference with fused PReLU (``GEMM_PreLU``, ``sparseUtils.h:111-137``)."""
    return prelu(dense_gemm(X, W, b), jnp.asarray(alpha, jnp.float32)[None, :])


@dataclasses.dataclass(frozen=True)
class CompareResult:
    """Outcome of a correctness comparison (mirrors the reference's failure
    print of the first offending cell, ``main.cpp:216-247``)."""

    ok: bool
    max_abs_err: float
    num_bad: int
    first_bad: Optional[tuple] = None   # (m, n, got, want)

    def __bool__(self) -> bool:  # allow `assert compare_results(...)`
        return self.ok


def compare_results(got, want, tol: float = TOLERANCE) -> CompareResult:
    """Elementwise absolute-tolerance comparison (``sparseUtils.h:140-156``).

    Returns a :class:`CompareResult`; truthy iff every element satisfies
    ``|got - want| <= tol``.
    """
    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        return CompareResult(ok=False, max_abs_err=float("inf"),
                             num_bad=-1, first_bad=None)
    err = np.abs(got.astype(np.float64) - want.astype(np.float64))
    bad = err > tol
    num_bad = int(bad.sum())
    first = None
    if num_bad:
        idx = tuple(int(i) for i in np.argwhere(bad)[0])
        first = (*idx, float(got[idx]), float(want[idx]))
    return CompareResult(ok=num_bad == 0, max_abs_err=float(err.max()) if err.size else 0.0,
                         num_bad=num_bad, first_bad=first)
