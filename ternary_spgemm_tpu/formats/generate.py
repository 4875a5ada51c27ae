"""Seeded ternary matrix / activation generators.

Reproduces the semantics of the reference generators
(``cpp_impl/sparseUtils.h:6-90`` in alessiomelone/Ternary-spGEMM) with two
deliberate improvements for a production framework:

* **Seeded by default.** The reference seeds from ``time(0)`` unless a seed is
  passed (``sparseUtils.h:10,54``), so its runs are not reproducible. Here a
  seed is required (or a ``numpy.random.Generator`` is passed in), and the
  same seed always produces the same matrix on every host.
* **Vectorized.** Per-row placement is done with one permutation per row
  instead of rejection sampling, which preserves the distribution (a uniformly
  random set of ``limitPos`` positive and ``limitNeg`` negative positions per
  row) while being fast enough for the 64000-row sweep shapes.

Distribution semantics (matching ``generateSparseMatrix``,
``sparseUtils.h:26-90``): for a ``K x N`` matrix with sparsity parameter
``s`` ("nonZero"; density 1/s), each row ``k`` gets

* ``posVari ~ UniformInt[0, N/s/20 + 1]`` (the per-row pos/neg imbalance),
* ``limitPos = (N//s)//2 + posVari`` entries equal to +1,
* ``limitNeg = (N//s)//2 - posVari`` entries equal to -1,

at distinct uniformly-random column positions. Note ``limitPos + limitNeg ==
2*((N//s)//2)`` exactly, independent of ``posVari``.

The "uniformDistribution" mode places exactly one +1 and one -1 at distinct
slots inside every window of ``2*s`` consecutive columns of a row
(``sparseUtils.h:34-51``). The reference expression ``rand() % nonZero * 2``
parses as ``(rand() % s) * 2`` — i.e. only *even* offsets within each window —
which looks like an operator-precedence accident; we implement the evident
intent (any offset in ``[0, 2s)``), and the round-trip/correctness tests do
not depend on the difference.
"""

from __future__ import annotations

import numpy as np


def _rng(seed) -> np.random.Generator:
    if isinstance(seed, np.random.Generator):
        return seed
    # SFC64: ~2-3x faster than the default PCG64 at identical statistical
    # quality for this use; matters because the sweep grid generates
    # matrices up to 16384 x 4096 on the host.
    return np.random.Generator(np.random.SFC64(seed))


def generate_ternary(K: int, N: int, s: int, *, seed=0, uniform: bool = False) -> np.ndarray:
    """Generate a ``K x N`` ternary weight matrix with density ~= 1/s.

    Mirrors ``generateSparseMatrix`` (``cpp_impl/sparseUtils.h:26-90``).

    Args:
      K: number of rows (the contraction dimension of ``Y = X @ W``).
      N: number of columns (output features).
      s: sparsity parameter; density is 1/s (``readme.md:84-85``).
      seed: int seed or a ``np.random.Generator``.
      uniform: if True, use the windowed "uniformDistribution" mode (exactly
        one +1 and one -1 per ``2s``-wide window of each row). Requires
        ``N % (2*s) == 0``.

    Returns:
      ``np.ndarray`` of shape ``(K, N)``, dtype ``int8``, values in {-1,0,+1}.
    """
    if s < 1:
        raise ValueError(f"sparsity parameter s must be >= 1, got {s}")
    rng = _rng(seed)
    W = np.zeros((K, N), dtype=np.int8)

    if uniform:
        if N % (2 * s) != 0:
            raise ValueError(f"uniform mode needs N divisible by 2*s (N={N}, s={s})")
        win = 2 * s
        nwin = N // win
        # One +1 and one -1 at distinct offsets per window.
        a = rng.integers(0, win, size=(K, nwin))
        b = rng.integers(0, win - 1, size=(K, nwin))
        b = np.where(b >= a, b + 1, b)  # distinct-from-a trick
        base = np.arange(nwin) * win
        rows = np.repeat(np.arange(K), nwin)
        W[rows, (base[None, :] + a).ravel()] = 1
        W[rows, (base[None, :] + b).ravel()] = -1
        return W

    half = (N // s) // 2
    vari_hi = N // s // 20 + 1  # inclusive upper bound in the reference
    pos_vari = rng.integers(0, vari_hi + 1, size=K)
    limit_pos = half + pos_vari
    limit_neg = half - pos_vari
    # Vectorized per-row placement: argsort of uniform keys = random
    # permutation (f32 keys: tie probability is negligible and ties only
    # perturb which of two columns gets picked — still uniform).
    keys = rng.random((K, N), dtype=np.float32)
    order = np.argsort(keys, axis=1)
    cols = np.arange(N)[None, :]
    plus_mask = cols < limit_pos[:, None]
    minus_mask = (cols >= limit_pos[:, None]) & (cols < (limit_pos + limit_neg)[:, None])
    rows = np.repeat(np.arange(K)[:, None], N, axis=1)
    W[rows[plus_mask], order[plus_mask]] = 1
    W[rows[minus_mask], order[minus_mask]] = -1
    return W


def generate_x(M: int, K: int, *, seed=0, value_range: int = 512, dtype=np.float32) -> np.ndarray:
    """Generate a dense activation matrix of random integers in [-range, range].

    Mirrors ``initX`` (``cpp_impl/sparseUtils.h:6-23``): integer values stored
    in a float container, so ternary accumulation in float32 is *exact* and
    the reference's absolute tolerance of 1e-5 is meaningful.
    """
    rng = _rng(seed)
    return rng.integers(-value_range, value_range + 1, size=(M, K)).astype(dtype)


def generate_bias(N: int, *, value: float = 2.0, dtype=np.float32) -> np.ndarray:
    """Constant bias, mirroring ``perf.cpp:304`` (B = 2)."""
    return np.full((N,), value, dtype=dtype)


def generate_alpha(N: int, *, value: float = 0.1, dtype=np.float32) -> np.ndarray:
    """Constant PReLU slope, mirroring ``perf.cpp:611`` (alpha = 0.1)."""
    return np.full((N,), value, dtype=dtype)
