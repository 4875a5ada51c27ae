"""Calibrated timing for asynchronously-dispatched TPU kernels.

TPU-native replacement for the reference's calibrated cycle timers
(``cpp_impl/perf.cpp:38-296``). The reference's protocol: run the kernel,
doubling ``num_runs`` until total >= CYCLES_REQUIRED = 1e8 cycles, then
re-time at the calibrated count and divide (``perf.cpp:28-29,45-68``). The
TPU complications it never had, and how this module handles them:

* **Async dispatch** — ``f(x)`` returns before the device runs. Worse, on
  tunneled devices even ``jax.block_until_ready`` has been observed to
  return before execution completes; the only reliable fence is a real
  device->host readback. Every timed region here therefore ends by fetching
  a scalar derived from the result.
* **Dispatch + readback overhead** — a Python->device round trip costs
  O(ms..tens of ms) with high jitter, swamping a microsecond kernel. Two
  defenses: (a) the kernel runs inside an on-device ``lax.while_loop`` whose
  carry forces a serial dependency between iterations (a multiplicative
  ``* (1 + s*1e-45)`` perturbation of the carried input's FIRST ROW — a
  bit-exact no-op on the f32 values, including zeros, which an additive
  epsilon would corrupt — but opaque to XLA; touching one row keeps the
  perturbation O(row) even for large activation matrices), amortizing one
  dispatch over the whole run; (b) the per-iteration
  time is the **slope** between a run of n and a run of n/2 iterations, so
  any fixed per-call overhead cancels exactly. The smallest agreeing pair
  of slope samples rejects both single spikes and sustained tunnel-stall
  windows (see the noise-model comment in ``time_device_loop``).
* **Compilation caching** — the first call compiles (tens of seconds on
  TPU) and the first readback initializes the transfer path (minutes on a
  tunneled device); both are excluded by the warm-up fetch, exactly like the
  reference's warm-up loop (``perf.cpp:45-52``).
"""

from __future__ import annotations

import dataclasses
import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

#: Calibration target for the (t(n) - t(n/2)) slope window — plays the role
#: of the reference's CYCLES_REQUIRED=1e8 (perf.cpp:28).
MIN_SECONDS = 0.2
#: Max calibrated runs (the reference caps at 2^14, perf.cpp:55; the slope
#: method needs headroom above the per-call overhead).
MAX_RUNS = 1 << 16


@dataclasses.dataclass(frozen=True)
class TimingResult:
    seconds: float       # per-invocation seconds (slope estimate)
    runs: int            # iterations of the larger calibrated run
    total_seconds: float # wall time of the larger calibrated run
    #: relative spread (max-min)/median across the independent estimates —
    #: the headline path repeats the whole slope protocol >= 3x because the
    #: r02->r03 driver captures differed 20% at the 5 us scale with no
    #: in-band evidence of which was real (VERDICT round-3 weak #1)
    seconds_spread: float = 0.0
    n_estimates: int = 1
    #: True when the estimate could not be cross-checked (e.g. the two
    #: single-run samples of a 10s+ kernel disagreed by > 25%)
    low_confidence: bool = False


def _device_loop(fn: Callable) -> Callable:
    """Wrap ``(x, *aux) -> y`` into ``(x, n, aux) -> scalar`` running ``fn``
    n times on-device with a serializing carry dependency. ``aux`` rides as
    plain jit arguments: not carried, not perturbed — and, critically, not
    baked into the program (closure-captured arrays become HLO literals,
    whose bytes ship with every (remote) compile and key the compile cache
    on the *values*; a 256 MB container plane overflows this tunnel's
    remote-compile request outright)."""

    @jax.jit
    def looped(x, n, aux):
        def cond(carry):
            i, _, _ = carry
            return i < n

        def body(carry):
            i, xc, s = carry
            # The barrier forces the FULL result buffer to materialize: only
            # one scalar of y is consumed below, and without the barrier XLA
            # fuses the slice into the producer and never writes the (M, N)
            # output to HBM — XLA-formulation kernels then measure with the
            # 4*M*N output bytes elided (observed: DenseMXU_bf16 at 106-114%
            # of the HBM roofline in the canonical sweep). Pallas kernels are
            # opaque custom calls and were never subject to this.
            y = jax.lax.optimization_barrier(fn(xc, *aux))
            # Multiplicative perturbation: 1 + s*1e-45 rounds to exactly 1.0f
            # for any |s| < ~1e37, so xc is bit-identical every iteration
            # (including zero entries, which an additive epsilon would
            # corrupt) — but s is dynamic, so XLA must still re-run fn.
            # Only the FIRST ROW is touched: the carried-buffer dependency
            # already serializes iterations, and an O(row) update (in-place
            # on the aliased while-carry) keeps the perturbation cost
            # negligible even when x is a large activation matrix (a
            # whole-array perturbation adds a read+write pass over x per
            # iteration — the round-1 "bandwidth cliff" mechanism).
            lead = (0,) * (xc.ndim - 1)
            row = jax.lax.dynamic_slice(
                xc, lead + (0,), (1,) * (xc.ndim - 1) + (xc.shape[-1],))
            row = jnp.asarray(row * (1.0 + s * 1e-45), xc.dtype)  # int x: exact
            xc = jax.lax.dynamic_update_slice(xc, row, lead + (0,))
            return i + 1, xc, s + jnp.asarray(y, jnp.float32).ravel()[0]

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x, jnp.float32(0.0)))[2]

    return looped


def time_device_loop(fn: Callable, x, *, aux=(), min_seconds: float = MIN_SECONDS,
                     max_runs: int = MAX_RUNS, repeats: int = 1) -> TimingResult:
    """Calibrated on-device-loop slope timing of ``fn(x, *aux)`` (the default).

    The serializing carry perturbs only the FIRST ROW of ``x`` (in-place on
    the aliased while-carry), so a large activation matrix may ride as the
    carried input at O(row) overhead. Round 1 perturbed the WHOLE array —
    one extra read+write pass per iteration — which manufactured the
    phantom "217 GB/s cliff at 256 MB" (root-caused 2026-08-17; the same
    DMAs run at ~750 GB/s without the full-array pass). Weight containers
    still belong in ``aux``, never in a closure (HLO-literal bloat:
    closure-captured arrays inline as constants that ship with every
    remote compile and key the compile cache on the values).
    """
    import warnings
    nbytes = sum(getattr(a, "nbytes", 0) for a in jax.tree_util.tree_leaves(x))
    if nbytes > 256 * 2**20:
        warnings.warn(
            f"time_device_loop: carried input is {nbytes/2**20:.0f} MB; the "
            "first-row perturbation is O(row), but if the while-carry fails "
            "to alias in-place the copy costs a full pass — cross-check "
            "against aux= placement (tools/membench.py methodology).",
            stacklevel=2)
    looped = _device_loop(fn)
    # Warm-up fetch: compiles, runs once, and forces transfer-path init.
    float(np.asarray(looped(x, 1, aux)))

    def t_at(n):
        t0 = time.perf_counter()
        float(np.asarray(looped(x, n, aux)))  # readback = the only true fence
        return time.perf_counter() - t0

    # Adaptive start: a single run that already exceeds the calibration
    # budget means the kernel is SLOW (seconds-scale baselines at the grid
    # corners) — the n=16 doubling protocol would pay ~70 runs of it. The
    # slope still cancels dispatch overhead at n=2 vs n=1.
    t1 = t_at(1)
    if t1 >= 10.0:
        # Do NOT wrap 10s+ kernels in an n=2 while_loop: a ~60 s single
        # device execution has crashed the tunneled TPU worker outright
        # (observed at the M=64000 grid corners, 2026-08-19). One dispatch
        # + readback is < 0.5% of t1 here — but ONE unamortized sample has
        # no stall defense (ADVICE round 3, medium: a sustained tunnel stall
        # during the single grid-corner baseline run inflates every gated
        # speedup computed against it). Take a second single-run sample and
        # keep the SMALLER: a stall can only inflate a reading, and the min
        # errs fast for the baseline denominators — conservative for the
        # reported speedups. Flag low_confidence when the two disagree.
        t1b = t_at(1)
        lo, hi = min(t1, t1b), max(t1, t1b)
        return TimingResult(seconds=lo, runs=1, total_seconds=t1 + t1b,
                            seconds_spread=(hi - lo) / lo, n_estimates=2,
                            low_confidence=hi > 1.25 * lo)
    if t1 >= min_seconds:
        n = 2
        t_half, t_n = t1, t_at(2)
    else:
        n = 16
        t_half, t_n = t_at(n // 2), t_at(n)
        while (t_n - t_half) < min_seconds and n < max_runs:
            n *= 2
            t_half, t_n = t_n, t_at(n)

    # Noise model (both observed on this tunnel, 2026-08-18): (a) single
    # 2-20x spikes, which can even drive (t(n) - t(n/2)) NEGATIVE — a
    # negative median once collapsed to the clamp and reported 62 ps for a
    # 134-GMAC matmul; (b) SUSTAINED slow windows of several seconds (the
    # tunnel is one Python relay process; network backpressure stalls every
    # reading in the window), which contaminate ALL of a median-of-3 — a
    # 186 us kernel once recorded as 76 ms. Defense: hardware-deterministic
    # kernels cluster tightly at the true time, so take the SMALLEST
    # AGREEING PAIR of positive diffs (within 25%) as the estimate —
    # contaminated samples scatter and a spuriously-small diff (stall on
    # the n/2 side) almost never finds a partner. Re-sample until a pair
    # agrees; if none ever does, fall back to the median of positive diffs,
    # then to the amortized t(n)/n upper bound (errs slow, never absurdly
    # fast).
    def smallest_agreeing_pair(ds):
        pos = sorted(d for d in ds if d > 1e-4)
        for a, b in zip(pos, pos[1:]):
            if b <= 1.25 * a:
                return (a + b) / 2
        return None

    def one_estimate(seed=None):
        """One full slope estimate (per-run seconds) from fresh diffs."""
        diffs = [] if seed is None else [seed]
        while len(diffs) < 3:
            diffs.append(t_at(n) - t_at(n // 2))
        est = smallest_agreeing_pair(diffs)
        retries = 0
        while est is None and retries < 5:
            diffs.append(t_at(n) - t_at(n // 2))
            est = smallest_agreeing_pair(diffs)
            retries += 1
        if est is None:
            pos = [d for d in diffs if d > 0]
            est = statistics.median(pos) if len(pos) >= 2 else t_at(n)
        return est / (n - n // 2)

    # >= 3 independent estimates when asked (the headline path): the slope
    # protocol itself is robust to spikes, but the r02 vs r03 driver records
    # differed 20% at the 5 us scale — only repeated independent estimates
    # put an error bar on the scoreboard number (VERDICT round-3 next #1).
    estimates = [one_estimate(seed=t_n - t_half)]
    for _ in range(max(0, repeats - 1)):
        estimates.append(one_estimate())
    sec = statistics.median(estimates)
    spread = (max(estimates) - min(estimates)) / sec if sec > 0 else 0.0
    return TimingResult(seconds=sec, runs=n, total_seconds=t_n,
                        seconds_spread=spread, n_estimates=len(estimates))


def time_wall(fn: Callable, x, *, aux=(), min_seconds: float = MIN_SECONDS,
              max_runs: int = MAX_RUNS, repeats: int = 1) -> TimingResult:
    """Host-dispatch wall timing (includes per-call dispatch overhead).

    What a user sees calling the op once per step from Python — the honest
    number for end-to-end layer latency, vs :func:`time_device_loop` which
    is the honest number for kernel throughput. The timed region ends with a
    scalar readback of the last result for a true fence.
    """
    f = jax.jit(fn)
    float(np.asarray(jnp.ravel(f(x, *aux))[0]))  # compile + transfer warm-up

    def t_at(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(x, *aux)
        float(np.asarray(jnp.ravel(out)[0]))
        return time.perf_counter() - t0

    n = 1
    t = t_at(n)
    while t < min_seconds and n < max_runs:
        n *= 2
        t = t_at(n)
    samples = [t] + [t_at(n) for _ in range(max(0, repeats - 1))]
    sec = statistics.median(samples) / n
    spread = ((max(samples) - min(samples)) / statistics.median(samples)
              if len(samples) > 1 else 0.0)
    return TimingResult(seconds=sec, runs=n, total_seconds=t,
                        seconds_spread=spread, n_estimates=len(samples))


TIMERS = {"device_loop": time_device_loop, "wall": time_wall}
