#!/usr/bin/env python
"""Round-4 part-3 design-space measurements (kernel_v4_study.json part 3).

Two campaigns, both VERDICT round-3 obligations:

(a) **4-bit nibble-pair trade** (next-#9): `PallasTiledNibblePair_i8`
    (4 bits/weight, ~1.1 VPU decode ops/weight) vs the 2-bit flagship
    (~2 ops/weight) at the shapes `decode_roofline.json` flags as
    decode-bound (32x4096^2; 32x11008^2) plus the north star and one
    bytes-bound control (512x4096^2). The analytic expectation is a LOSS
    wherever plane bytes dominate (doubling the plane raises the bytes
    floor more than halving decode lowers the VPU floor) — this script
    settles it with gated measurements either way.

(b) **North-star single-grid-step pipelining** (next-#3, the ~1.3 us launch
    floor attack): at M=32 K=1024 N=4096 the flagship compiles to a
    grid-(1,1,1) pallas_call — ONE step, so Mosaic has nothing to
    double-buffer and the plane DMA, VPU decode and MXU dot serialize.
    Splitting K (smaller tkb at format build) or N (tns kernel override)
    into 2-4 steps gives the pipeliner windows to hide DMA behind compute.
    Each variant is gated against the default kernel's output (bit-exact
    expected: same arithmetic, different schedule).

Run on the real TPU (no other process may touch the chip):

    python tools/kernel_v4b_study.py
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_artifacts/kernel_v4_study.json")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.array(jax.device_put(np.zeros(8, np.float32)))  # warm the tunnel

    from ternary_spgemm_tpu.bench.harness import _cached_x, _cached_w
    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import (TiledBitplane, TiledNibblePair,
                                            generate_bias)
    from ternary_spgemm_tpu.ops import all_kernels

    bitplane = all_kernels()["PallasTiledBitplane_i8"]
    nibpair = all_kernels()["PallasTiledNibblePair_i8"]

    try:
        with open(args.out) as f:
            result = json.load(f)
    except FileNotFoundError:
        result = {"meta": {}}
    result["meta"]["part3_started"] = time.strftime("%Y-%m-%d %H:%M:%S")

    def measure(label, spec_fn, fmt, M, K, N, ref_y=None, **kw):
        """Gated timing of one kernel/format/shape cell. Returns device ref
        output (for gating later cells) alongside recording the row."""
        X = _cached_x(M, K, 1)
        b = generate_bias(N)
        fmt_dev = jax.tree_util.tree_map(jnp.asarray, fmt)
        fn = lambda x, fm, bb: spec_fn(x, fm, bb, **kw)
        y = fn(X, fmt_dev, b)
        y.block_until_ready()
        row = {}
        if ref_y is not None:
            row["max_err_vs_ref"] = float(
                jnp.max(jnp.abs(y - ref_y)).block_until_ready())
            row["ok"] = row["max_err_vs_ref"] == 0.0
        t = time_device_loop(fn, X, aux=(fmt_dev, b), repeats=args.repeats)
        row.update({"us": t.seconds * 1e6, "spread": t.seconds_spread,
                    "n_estimates": t.n_estimates})
        result[label] = row
        print(f"{label}: {t.seconds*1e6:.2f} us (spread {t.seconds_spread:.1%}"
              f", {row.get('max_err_vs_ref', 'ungated')})", flush=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        import os
        os.replace(tmp, args.out)
        return y

    # ---- (a) nibble-pair vs 2-bit bitplane --------------------------------
    for M, K, N, s in [(32, 1024, 4096, 4), (32, 4096, 4096, 4),
                       (32, 11008, 11008, 4), (512, 4096, 4096, 4)]:
        W = np.asarray(_cached_w(K, N, s, 0))
        tag = f"{M}x{K}x{N}"
        ref = measure(f"nib/{tag}/bitplane2", bitplane.fn,
                      TiledBitplane.from_dense(W), M, K, N)
        measure(f"nib/{tag}/nibpair4", nibpair.fn,
                TiledNibblePair.from_dense(W), M, K, N, ref_y=ref)
        del ref

    # ---- (b) north-star grid-step pipelining ------------------------------
    M, K, N, s = 32, 1024, 4096, 4
    W = np.asarray(_cached_w(K, N, s, 0))
    fmt128 = TiledBitplane.from_dense(W)            # tkb=128 -> grid (1,1,1)
    ref = measure("nssplit/base_g111", bitplane.fn, fmt128, M, K, N)
    for tns in (2048, 1024):
        measure(f"nssplit/tns{tns}", bitplane.fn, fmt128, M, K, N,
                ref_y=ref, tns=tns)
    for tkb in (64, 32):
        fmt = TiledBitplane.from_dense(W, tkb=tkb)
        measure(f"nssplit/tkb{tkb}", bitplane.fn, fmt, M, K, N, ref_y=ref)
    fmt64 = TiledBitplane.from_dense(W, tkb=64)
    measure("nssplit/tkb64_tns2048", bitplane.fn, fmt64, M, K, N,
            ref_y=ref, tns=2048)

    result["meta"]["part3_finished"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
