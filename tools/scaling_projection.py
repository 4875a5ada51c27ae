#!/usr/bin/env python
"""Weak-scaling projection for the BASELINE multi-host config (N=65536,
>=2 hosts) from MEASURED single-chip shard times + an explicit,
falsifiable communication model.

One physical chip exists in this environment (BASELINE's >=80%
weak-scaling clause is unverifiable directly — STATUS.md known gap). This
tool replaces the shrug with a projection whose every input is either
measured on the real chip or stated as a named assumption a future
multi-chip run can check line by line (round-4 VERDICT #8):

* **Measured**: per-shard flagship kernel time for the N=8192 column shard
  at ring-chunk row counts (32..256 rows; chunks below 32 rows pad to the
  MXU tile — measured, not assumed, by timing them).
* **Assumed (named)**: ICI per-hop bandwidth, DCN per-host bandwidth, the
  overlap model (per-step time = max(compute, exposed comm) — the AOT
  v5e:2x2 schedule in overlap_evidence.json shows the compiler does place
  compute inside every async collective-permute window, so max() is the
  right composition when windows are long enough).

Ring model (overlapped_gather_spgemm, parallel/spgemm.py): d devices, X
row-sharded in M/d chunks, weights column-sharded at 8192 columns each;
step t computes the held chunk against the local columns while ppermute
forwards it. Each step every ICI edge carries one chunk; with h hosts the
h host-boundary edges run at DCN bandwidth and gate the step. Weak-scaling
efficiency = ideal / projected = d*t_chunk / (d * max(t_chunk, t_dcn_chunk)
+ (d-1) * pipeline-fill residual, fill taken as the chunk comm time).

Output: bench_artifacts/scaling_projection.json + printed table.
Run (TPU): python tools/scaling_projection.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

#: Named assumptions (GB/s). ICI: one v5e ICI link direction, conservative
#: public figure; DCN: per-host effective all-to-next bandwidth (200 Gbps
#: NICs derated). Falsifiable: re-measure on hardware and substitute.
ASSUMPTIONS = {
    "ici_GBps": 90.0,
    "dcn_GBps": 12.5,
    "overlap_model": "per-step time = max(compute_chunk, slowest-edge comm)",
    "fill_model": "(d-1) extra chunk-comm for ring fill/drain",
}


def main():
    import jax
    import jax.numpy as jnp

    from ternary_spgemm_tpu import native
    from ternary_spgemm_tpu.bench.timing import time_device_loop
    from ternary_spgemm_tpu.formats import (
        TiledBitplane, generate_bias, generate_ternary, generate_x)
    from ternary_spgemm_tpu.ops import all_kernels

    np.array(jax.device_put(np.zeros(8, np.float32)))
    K, N_shard, s = 1024, 8192, 4
    spec = all_kernels()["PallasTiledBitplane_i8"]
    gen = native.gen_ternary if native.native_available() else \
        (lambda K, N, s, seed: generate_ternary(K, N, s, seed=seed))
    W = gen(K, N_shard, s, seed=3)
    fmt = jax.tree_util.tree_map(jnp.asarray, TiledBitplane.from_dense(W))
    bias = jnp.asarray(generate_bias(N_shard))

    # measured: shard-local kernel time at every candidate chunk height
    chunk_rows = [4, 8, 16, 32, 64, 128, 256]
    t_chunk = {}
    for m in chunk_rows:
        X = jnp.asarray(generate_x(m, K, seed=1))
        r = time_device_loop(lambda x, f, b: spec.fn(x, f, b), X,
                             aux=(fmt, bias), repeats=3)
        t_chunk[m] = {"us": r.seconds * 1e6, "spread": r.seconds_spread}
        print(f"shard kernel M={m} x {K} x {N_shard}: "
              f"{r.seconds*1e6:.2f} us (spread {r.seconds_spread:.1%})",
              flush=True)

    ici = ASSUMPTIONS["ici_GBps"] * 1e9
    rows = []

    def tc_for(m_chunk):
        # measured chunk compute (MXU-tile padding included by measurement)
        m_eff = max(m_chunk, min(chunk_rows))
        return t_chunk[min(c for c in chunk_rows if c >= m_eff)]["us"] / 1e6

    # BASELINE config: N = 65536 = 8 shards of 8192; host counts 1..4.
    # Two schemes: (a) FLAT ring — every step every edge carries one chunk,
    # the slowest (DCN) edge gates the step; (b) HIERARCHICAL — intra-host
    # ICI ring per phase, the M/h row block rides DCN ONCE per phase,
    # overlapped against the whole phase's compute (the "How to Scale Your
    # Model" 2-level recipe). Both from the same measured chunk times.
    for d, hosts in [(8, 1), (8, 2), (8, 4)]:
        for M in (64, 256, 1024):
            for dcn_gbps in (12.5, 25.0, 50.0):
                if hosts == 1 and dcn_gbps != 12.5:
                    continue   # DCN unused single-host
                dcn = dcn_gbps * 1e9
                m_chunk = M // d
                tc = tc_for(m_chunk)
                chunk_bytes = m_chunk * K * 4
                t_ici = chunk_bytes / ici
                t_dcn = chunk_bytes / dcn if hosts > 1 else t_ici
                ideal = d * tc

                # flat ring
                flat = d * max(tc, t_dcn) + (d - 1) * t_dcn
                # hierarchical: h phases; per phase (d/h) intra-host steps
                # gated by max(compute, ici chunk); the next M/h-row block
                # crosses DCN once per phase, overlapped with the phase
                phase_c = (d // hosts) * max(tc, t_ici)
                t_dcn_block = (M // hosts) * K * 4 / dcn if hosts > 1 else 0
                hier = hosts * max(phase_c, t_dcn_block) + t_dcn_block
                for scheme, proj in (("flat_ring", flat),
                                     ("hierarchical", hier)):
                    eff = ideal / proj
                    rows.append({
                        "scheme": scheme, "devices": d, "hosts": hosts,
                        "M": M, "dcn_GBps": dcn_gbps,
                        "rows_per_chunk": m_chunk,
                        "compute_chunk_us": tc * 1e6,
                        "projected_total_us": proj * 1e6,
                        "projected_weak_scaling_efficiency": round(eff, 4),
                        "meets_baseline_80pct": bool(eff >= 0.80),
                    })
                print(f"d={d} h={hosts} M={M} dcn={dcn_gbps}: "
                      f"flat {ideal/flat:.1%} hier {ideal/hier:.1%}",
                      flush=True)

    out = {"config": {"K": K, "N_total": 65536, "N_shard": N_shard, "s": s,
                      "kernel": spec.name},
           "assumptions": ASSUMPTIONS,
           "measured_chunk_times": t_chunk,
           "projections": rows,
           "headline": next((r for r in rows
                             if r["scheme"] == "hierarchical"
                             and r["hosts"] == 2 and r["M"] == 256
                             and r["dcn_GBps"] == 25.0), None)}
    path = os.path.join(os.path.dirname(__file__), "..", "bench_artifacts",
                        "scaling_projection.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("written", path)


if __name__ == "__main__":
    main()
