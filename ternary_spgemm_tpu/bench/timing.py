"""Calibrated timing for asynchronously-dispatched TPU kernels.

TPU-native replacement for the reference's calibrated cycle timers
(``cpp_impl/perf.cpp:38-296``). The reference's protocol: run the kernel,
doubling ``num_runs`` (from 1, capped 2^14) until total >= CYCLES_REQUIRED =
1e8 cycles, then re-time at the calibrated count and divide
(``perf.cpp:28-29,45-68``). The TPU complications it never had:

* **Async dispatch** — ``f(x)`` returns before the device runs; every timed
  region must end in ``jax.block_until_ready``.
* **Dispatch overhead** — a Python->C++->device round trip costs O(10us),
  swamping a microsecond-scale kernel. So the default timer runs the kernel
  inside an on-device ``lax.while_loop`` whose carry forces a serial
  dependency between iterations (a ``+ s*1e-30`` perturbation that is exactly
  representable as a no-op on the f32 values but opaque to XLA, so the loop
  body cannot be hoisted/CSE'd), amortizing one dispatch over the whole
  calibrated run.
* **Compilation caching** — the first call compiles (20-40s on TPU); warm-up
  runs are excluded exactly like the reference's warm-up loop
  (``perf.cpp:45-52``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


#: Calibration target, the reference's CYCLES_REQUIRED=1e8 at ~1GHz (perf.cpp:28).
MIN_SECONDS = 0.1
#: Max calibrated runs, the reference's 2^14 cap (perf.cpp:55).
MAX_RUNS = 1 << 14


@dataclasses.dataclass(frozen=True)
class TimingResult:
    seconds: float       # per-invocation wall seconds at the calibrated count
    runs: int            # calibrated invocation count
    total_seconds: float


def _device_loop(fn: Callable) -> Callable:
    """Wrap ``x -> y`` into ``(x, n) -> scalar`` running ``fn`` n times
    on-device with a serializing carry dependency."""

    @jax.jit
    def looped(x, n):
        def cond(carry):
            i, _, _ = carry
            return i < n

        def body(carry):
            i, xc, s = carry
            y = fn(xc)
            # s*1e-30 is far below half-ulp of every activation value, so xc
            # is bit-identical each iteration — but XLA must still re-run fn.
            return i + 1, xc + s * 1e-30, s + jnp.asarray(y, jnp.float32).ravel()[0]

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x, jnp.float32(0.0)))[2]

    return looped


def time_device_loop(fn: Callable, x, *, min_seconds: float = MIN_SECONDS,
                     max_runs: int = MAX_RUNS) -> TimingResult:
    """Calibrated on-device-loop timing of ``fn(x)`` (the default)."""
    looped = _device_loop(fn)
    jax.block_until_ready(looped(x, 1))  # compile + warm
    n = 1
    while True:
        t0 = time.perf_counter()
        jax.block_until_ready(looped(x, n))
        t = time.perf_counter() - t0
        if t >= min_seconds or n >= max_runs:
            break
        n *= 2
    # Re-time at the calibrated count (the reference re-times too,
    # perf.cpp:62-68) minus the loop's own overhead measured at n=0.
    t0 = time.perf_counter()
    jax.block_until_ready(looped(x, n))
    t = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(looped(x, 0))
    t_overhead = time.perf_counter() - t0
    t = max(t - t_overhead, 1e-12)
    return TimingResult(seconds=t / n, runs=n, total_seconds=t)


def time_wall(fn: Callable, x, *, min_seconds: float = MIN_SECONDS,
              max_runs: int = MAX_RUNS) -> TimingResult:
    """Host-dispatch wall timing (includes per-call dispatch overhead).

    Matches what a user sees calling the op once per step from Python; the
    honest number for end-to-end layer latency, vs :func:`time_device_loop`
    which is the honest number for kernel throughput.
    """
    f = jax.jit(fn)
    jax.block_until_ready(f(x))
    n = 1
    while True:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(x)
        jax.block_until_ready(out)
        t = time.perf_counter() - t0
        if t >= min_seconds or n >= max_runs:
            break
        n *= 2
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x)
    jax.block_until_ready(out)
    t = time.perf_counter() - t0
    return TimingResult(seconds=t / n, runs=n, total_seconds=t)


TIMERS = {"device_loop": time_device_loop, "wall": time_wall}
