"""Bench harness tests: instrumentation math, timing plumbing, JSON schema."""

import json
import subprocess
import sys

import numpy as np

from ternary_spgemm_tpu.bench import (
    BenchConfig,
    instrument,
    run_config,
    time_device_loop,
    time_wall,
    to_reference_json,
)
from ternary_spgemm_tpu.formats import TCSC, generate_ternary


def test_instrumentation_formulas():
    M, K, N, s = 8, 64, 128, 4
    W = generate_ternary(K, N, s, seed=0)
    fmt = TCSC.from_dense(W)
    inst = instrument(M, fmt)
    nnz = int(np.count_nonzero(W))
    assert inst.nnz == nnz
    assert inst.flops == M * (nnz + N)                      # readme.md:84-85
    assert inst.total_input_bytes == 4 * (M * K + M * N + N) + fmt.size_bytes()
    # TCSC bytes: CSP+CSN (N+1 each) + RIP+RIN (nnz), 4B each (TCSC.h:41-48)
    assert fmt.size_bytes() == 4 * (2 * (N + 1) + nnz)
    # PReLU adds one alpha vector (main.cpp:289)
    assert instrument(M, fmt, prelu=True).total_input_bytes == \
        inst.total_input_bytes + 4 * N
    assert inst.operational_intensity == inst.flops / inst.total_input_bytes


def test_timers_agree_roughly():
    import jax.numpy as jnp
    x = jnp.ones((64, 64))
    f = lambda a: a * 2.0 + 1.0
    t1 = time_device_loop(f, x, min_seconds=0.02)
    t2 = time_wall(f, x, min_seconds=0.02)
    assert t1.seconds > 0 and t2.seconds > 0
    assert t1.runs >= 1 and t2.runs >= 1
    # device-loop timing excludes dispatch: never slower than wall x5 slack
    assert t1.seconds < t2.seconds * 5


def test_run_config_and_schema():
    cfg = BenchConfig(M=4, K=32, N=64, s=4, min_seconds=0.01,
                      kernels=["BaseTCSC", "DenseMXU"])
    results = run_config(cfg)
    assert {r.name for r in results} == {"BaseTCSC", "DenseMXU"}
    for r in results:
        assert r.error is None
        assert r.correct is True
        assert r.seconds > 0
        assert r.speedup is not None           # BaseTCSC present => speedups
    rec = to_reference_json(cfg, results)
    assert rec["test_case"] == {"M": 4, "K": 32, "N": 64, "s": 4}
    for v in rec["results"].values():
        assert {"performance", "total_input_size", "operational_intensity"} <= set(v)
    json.dumps(rec)  # serializable


def test_bench_cli_runs_small():
    out = subprocess.run(
        [sys.executable, "bench.py", "--M", "4", "--K", "64", "--N", "128",
         "--platform", "cpu", "--kernels", "BaseTCSC,DenseMXU"],
        capture_output=True, text=True, cwd="/root/repo", timeout=1200)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout: {out.stdout!r}\n{out.stderr[-800:]}"
    rec = json.loads(lines[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_own_bytes_accounting():
    """Per-kernel activation byte widths (VERDICT.md round-2 weak #4): the
    own-bytes roofline charges the kernel's real X operand width, so the
    own fraction is <= the reference-formula fraction for sub-4-byte X."""
    from ternary_spgemm_tpu.bench.instrument import (
        own_roofline_fraction, roofline_fraction)
    from ternary_spgemm_tpu.ops import all_kernels

    M, K, N, s = 8, 64, 128, 4
    W = generate_ternary(K, N, s, seed=0)
    fmt = TCSC.from_dense(W)
    inst4 = instrument(M, fmt, x_bytes=4.0)
    inst2 = instrument(M, fmt, x_bytes=2.0)
    assert inst4.own_bytes == inst4.total_input_bytes
    assert inst4.own_bytes - inst2.own_bytes == 2 * M * K
    beta = 8.19e11
    assert own_roofline_fraction(inst2, 1e-5, beta) < \
        roofline_fraction(inst2, 1e-5, beta)
    reg = all_kernels()
    # stacked int8-split kernels stream 2 B/element, int8-native 1 B
    assert reg["PallasTiledBitplane_i8"].x_bytes == 2.0
    assert reg["PallasTiledBitplane_x8"].x_bytes == 1.0
    assert reg["DenseMXU_bf16"].x_bytes == 2.0
    assert reg["BaseTCSC"].x_bytes == 4.0
