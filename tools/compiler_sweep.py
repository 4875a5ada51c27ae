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
OPTION_SETS = [
    ("baseline", {}),
    ("no_autofusion", {"XLA_FLAGS": "--xla_tpu_enable_dot_strength_reduction=false"}),
    ("aggressive_fusion", {"XLA_FLAGS": "--xla_tpu_rwb_fusion=true"}),
    ("async_collectives", {"XLA_FLAGS": "--xla_tpu_enable_async_collective_fusion=true"}),
    ("latency_hiding", {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true"}),
    # Mosaic/Pallas-side knobs (the kernels here are all Pallas): scoped-VMEM
    # headroom shifts the double-buffering budget Mosaic gives pallas_call.
    ("scoped_vmem_64m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("scoped_vmem_16m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=16384"}),
    ("no_latency_hiding",
     {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
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
