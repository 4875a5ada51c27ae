#!/usr/bin/env python
"""XLA compiler-option sweep — the ``compiler_testing/test.sh`` analogue.

The reference sweeps six g++ flag sets at the north-star config and reports
the fastest (``compiler_testing/test.sh:19-26``). The TPU counterpart sweeps
XLA/libtpu option sets over the flagship kernel set by re-running bench.py
in a subprocess per option set (XLA flags are process-global, like the
reference recompiling per flag set), and reports cycles... seconds per
configuration.

Usage: python tools/compiler_sweep.py [--output compiler_results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

#: Option sets to sweep. Each entry: (name, env overrides).
#:
#: Flag-validity note (probed on this stack 2026-08-17): the PJRT plugin's
#: host-side flag registry rejects every ``--xla_tpu_*`` name in XLA_FLAGS
#: with a FATAL "Unknown flag" (the reference's O2/O3/Ofast analogues do not
#: exist here); only generic XLA flags parse. TPU-backend flags must travel
#: via LIBTPU_INIT_ARGS, which parses cleanly — whether each reaches the
#: remote compiler is exactly what the measured deltas reveal.
OPTION_SETS = [
    ("baseline", {}),
    ("opt_level_0", {"XLA_FLAGS": "--xla_backend_optimization_level=0"}),
    ("opt_level_2", {"XLA_FLAGS": "--xla_backend_optimization_level=2"}),
    ("libtpu_vmem_64m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("libtpu_vmem_16m",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=16384"}),
    ("libtpu_no_latency_hiding",
     {"LIBTPU_INIT_ARGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
    ("matmul_precision_highest", {"JAX_DEFAULT_MATMUL_PRECISION": "highest"}),
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="compiler_results.json")
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--K", type=int, default=1024)
    p.add_argument("--N", type=int, default=4096)
    p.add_argument("--s", type=int, default=4)
    p.add_argument("--kernels", default="PallasBlockPacked_i8,PallasDense_i8")
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--platform", default=None,
                   help="forwarded to bench.py (e.g. cpu for smoke runs)")
    args = p.parse_args(argv)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for name, env_over in OPTION_SETS:
        env = dict(os.environ)
        for k, v in env_over.items():
            env[k] = (env.get(k, "") + " " + v).strip()
        cmd = [sys.executable, "bench.py",
               "--M", str(args.M), "--K", str(args.K), "--N", str(args.N),
               "--s", str(args.s), "--kernels", args.kernels]
        if args.platform:
            cmd += ["--platform", args.platform]
        print(f"[{name}] {env_over or 'defaults'}", flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                                 cwd=root, timeout=args.timeout)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            rec = json.loads(line[-1]) if line else {"error": out.stderr[-500:]}
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {e}"}
        rec["option_set"] = name
        rec["env"] = env_over
        results.append(rec)
        print(f"  -> {rec.get('value', rec.get('error'))}", flush=True)
        with open(args.output, "w") as f:
            json.dump(results, f, indent=1)
    ok = [r for r in results if "value" in r]
    if ok:
        best = max(ok, key=lambda r: r["value"])
        print(f"fastest: {best['option_set']} at {best['value']} GFLOP/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
