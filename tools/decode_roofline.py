#!/usr/bin/env python
"""Measure the VPU bit-deposit decode rate and build the compute-augmented
roofline for the 2-bit bitplane kernels.

The round-2 verdict asked the flagship to reach >= 70% of its own-BYTES
roofline. Round 3's measurements (docs/perf.md §13) show that for a
decode-in-kernel format the bytes roofline is not the binding resource: the
magic-multiply deposit costs ~1.75 int32-lane VPU ops per weight over every
*position* (independent of sparsity), and Mosaic does not overlap that VPU
work with the MXU dots. The honest per-kernel speed-of-light is therefore
the two-resource roofline the reference itself used (beta/pi,
``plots/plot_roofline.py:597-598``) with the VPU as pi:

    t_ideal = max(own_bytes / beta_HBM, positions / pi_decode) + t_dot

This tool measures pi_decode directly — a Pallas kernel running R
repetitions of the production decode sequence on a VMEM-resident plane tile
(inputs varied per repetition so nothing hoists; every decoded byte is
consumed by a tiny 8-row MXU dot) — then evaluates the augmented roofline
for the headline configs against the measured kernel times and writes
``bench_artifacts/decode_roofline.json``.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys


def measure_decode_rate(tkb: int = 128, tns: int = 512, reps: int = 64):
    """Weights/second of the production `_decode_halves_u8` sequence on
    VMEM-resident data (no HBM traffic in the measured loop body)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.ops.pallas_kernels import (
        _BYTE_LO, _DEPOSIT_MUL, _words_to_byte_rows)

    B = 8 * tkb

    def kernel(p_ref, x_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        x = x_ref[:]
        p32 = p_ref[:].astype(jnp.int32)
        for r in range(reps):
            # vary the plane per repetition (2 extra int32 lane-ops, counted
            # against the decode — conservative) so reps cannot collapse
            q = (p32 + r) & 0xFF
            qp, qn = q[:tkb], q[tkb:]
            lo = (((qp & 0xF) * _DEPOSIT_MUL) & _BYTE_LO) \
                | ((((qn & 0xF) * _DEPOSIT_MUL) & _BYTE_LO) * 0xFF)
            hi = (((qp >> 4) * _DEPOSIT_MUL) & _BYTE_LO) \
                | ((((qn >> 4) * _DEPOSIT_MUL) & _BYTE_LO) * 0xFF)
            acc_ref[:] += jnp.dot(x[:, :B // 2], _words_to_byte_rows(lo),
                                  preferred_element_type=jnp.int32) \
                + jnp.dot(x[:, B // 2:], _words_to_byte_rows(hi),
                          preferred_element_type=jnp.int32)
        o_ref[:] = acc_ref[:]

    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 256, (2 * tkb, tns)).astype(np.uint8))
    x = jnp.ones((8, B), jnp.int8)
    fn = lambda p, xx: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tns), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tns), jnp.int32)],
    )(p, xx)
    t = time_device_loop(fn, plane, aux=(x,), min_seconds=0.3)
    weights = reps * B * tns
    return {"tkb": tkb, "tns": tns, "reps": reps, "seconds": t.seconds,
            "weights_per_s": weights / t.seconds,
            "note": "includes the consuming 8-row MXU dot and a 1-op/byte "
                    "per-rep input perturbation — a conservative (low) rate"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_artifacts/decode_roofline.json")
    p.add_argument("--configs", nargs="*", default=[
        "32x1024x4096x4", "32x4096x4096x4", "32x11008x11008x4",
        "512x4096x4096x4"])
    args = p.parse_args(argv)

    import numpy as np
    import jax

    np.array(jax.device_put(np.zeros(8, np.float32)))

    from ternary_spgemm_tpu.bench import BenchConfig, run_config
    from ternary_spgemm_tpu.bench.instrument import measure_hbm_bandwidth

    result = {"decode_rate": measure_decode_rate()}
    print(json.dumps(result["decode_rate"], indent=1), flush=True)
    beta = measure_hbm_bandwidth()
    result["beta_measured_GBps"] = beta / 1e9
    pi = result["decode_rate"]["weights_per_s"]

    # int8 MXU rate at large K-chunks, measured in kernel_v3_study.json
    MXU_INT8_MACS = 158e12

    rows = []
    for cs in args.configs:
        M, K, N, s = map(int, cs.split("x"))
        cfg = BenchConfig(M=M, K=K, N=N, s=s, correctness=False,
                          min_seconds=0.2, kernels=["PallasTiledBitplane_i8"])
        r = run_config(cfg, verbose=True)[0]
        if r.error:
            rows.append({"config": cs, "error": r.error})
            continue
        t_bytes = r.total_input_bytes  # reference formula (4B X) — keep both
        own = (2.0 * M * K) + 4 * (M * N + N) + r.total_input_bytes \
            - 4 * (M * K + M * N + N)      # own bytes: 2B X + container + out
        t_byte_ideal = own / beta
        t_decode = K * N / pi
        t_dot = 2 * M * K * N / MXU_INT8_MACS   # stacked split: 2M rows
        aug_ideal = max(t_byte_ideal, t_decode) + t_dot
        rows.append({
            "config": cs, "seconds": r.seconds,
            "own_bytes": own,
            "byte_ideal_s": t_byte_ideal,
            "decode_ideal_s": t_decode,
            "dot_ideal_s": t_dot,
            "own_bytes_fraction": t_byte_ideal / r.seconds,
            "augmented_roofline_fraction": aug_ideal / r.seconds,
            "overlapped_roofline_fraction":
                max(t_byte_ideal, t_decode, t_dot) / r.seconds,
        })
        print(rows[-1], flush=True)
    result["configs"] = rows
    result["model"] = (
        "two bounds from measured resource rates: SERIAL ideal = "
        "max(own_bytes/beta, K*N/pi_decode) + 2*M*K*N/pi_mxu_int8 "
        "(augmented_roofline_fraction; > 1 means the kernel overlaps better "
        "than fully-serial), and FULL-OVERLAP ideal = max(bytes, decode, "
        "dot) (overlapped_roofline_fraction; the speed-of-light if DMA, VPU "
        "and MXU overlapped perfectly). The reference's beta/pi roofline "
        "with measured rates for every resource.")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
