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


def test_stacked_marginal_protocol():
    """measure_stacked_marginal (bench/stacked.py): chained full-width
    stacks at two depths, marginal = pairwise slope; schema carries spread,
    depths, and the own-bytes roofline fraction (the deployment-regime
    metric bench.py emits as stacked_* — round-4 VERDICT weak #1)."""
    from ternary_spgemm_tpu.bench import measure_stacked_marginal

    r = measure_stacked_marginal(8, 128, 256, 4, depths=(1, 2), repeats=1)
    assert r["stacked_marginal_seconds"] > 0
    assert r["stacked_depths"] == [1, 2]
    assert r["stacked_kernel"] == "PallasTiledBitplane_i8"
    assert 0 <= r["stacked_roofline_fraction"]
    assert set(r["stacked_rows"]) == {"1", "2"}


def test_trace_validation_parser(tmp_path):
    """tools/trace_validation.py parse_perfetto: device-process filtering,
    XLA Modules vs XLA Ops thread split, host events ignored."""
    import gzip
    import os
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from tools.trace_validation import parse_perfetto

    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 1, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "jit_f(123)", "ts": 0,
         "dur": 5.5},
        {"ph": "X", "pid": 1, "tid": 2, "name": "jit_f(123)", "ts": 10,
         "dur": 5.7},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion", "ts": 0,
         "dur": 5.0},
        {"ph": "X", "pid": 9, "tid": 1, "name": "host_noise", "ts": 0,
         "dur": 99.0},
    ]
    with gzip.open(d / "perfetto_trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    parsed = parse_perfetto(str(tmp_path))
    assert parsed["modules"] == {"jit_f(123)": [5.5, 5.7]}
    assert parsed["ops"] == {"fusion": [5.0]}
    assert "host_noise" not in parsed["modules"]
