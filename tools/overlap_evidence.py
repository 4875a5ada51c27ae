#!/usr/bin/env python
"""Inspect the compiled HLO of ``overlapped_gather_spgemm`` for comm/compute
overlap — evidence that the ring ppermute is scheduled concurrently with the
per-step SpMM rather than serialized (the collective-matmul recipe).

Two backends:

* ``--topology v5e:2x2`` (default when the TPU plugin exposes AOT
  topologies): compile-only AOT lowering for a REAL multi-chip TPU topology —
  no devices needed (``jax.experimental.topologies.get_topology_desc``). The
  optimized HLO comes from the actual TPU compiler with its latency-hiding
  scheduler, so ``collective-permute-start``/``-done`` windows containing the
  kernel's compute ops are *the* overlap evidence the round-2 verdict asked
  for (VERDICT.md round-2 missing #3).
* ``--cpu``: the round-2 fallback — jit over the 8-device CPU mesh. The CPU
  backend lowers collectives synchronously, so it can only prove program
  shape, not scheduling (kept for environments without the TPU plugin).

Method: walk the optimized HLO in (scheduled) instruction order; a permute is
overlappable iff compute ops (dot/fusion/convolution) sit between a
``collective-permute-start`` and its matching ``done``. Counts pairs and the
compute inside each window; writes JSON + the HLO excerpt so the claim is
checkable.

Usage: python tools/overlap_evidence.py [--out bench_artifacts/overlap_evidence.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

#: An HLO compute op: "<name> = <type-or-tuple> dot|fusion|convolution(...".
#: The operand type can be a TUPLE with spaces, so match non-greedily up to
#: the opcode (TPU-compiled modules print tuple-typed fusions).
_COMPUTE_RE = re.compile(r" = .*?\b(dot|fusion|convolution)\(")
_START_RE = re.compile(r"^\s*(%\S+) = .*?\bcollective-permute-start\(")
_DONE_RE = re.compile(r"\bcollective-permute-done\(([^),]+)")


def analyze_hlo(hlo: str) -> dict:
    """Count async collective-permute windows and the compute inside them.

    Compiled (scheduled) modules print instructions in schedule order, so
    compute between a start and its done IS scheduled inside the transfer
    window."""
    lines = hlo.splitlines()
    pairs = []
    open_starts = {}  # var name -> (line_no, computes-so-far list)
    for i, ln in enumerate(lines):
        m = _START_RE.search(ln)
        if m:
            open_starts[m.group(1)] = (i, [])
            continue
        md = _DONE_RE.search(ln)
        if md:
            key = md.group(1).strip()
            if key in open_starts:
                start_i, comps = open_starts.pop(key)
                pairs.append({"start_line": start_i, "done_line": i,
                              "compute_ops_in_window": len(comps),
                              "ops": comps[:4]})
            continue
        if open_starts and _COMPUTE_RE.search(ln):
            op = ln.strip().split(" = ")[0][:60]
            for k in open_starts:
                open_starts[k][1].append(op)
    return {
        "async_pairs": len(pairs),
        "pairs_with_compute_inside": sum(
            1 for q in pairs if q["compute_ops_in_window"] > 0),
        "sync_collective_permutes": len(
            re.findall(r" collective-permute\(", hlo)),
        "pairs": pairs,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_artifacts/overlap_evidence.json")
    p.add_argument("--topology", default="v5e:2x2",
                   help="AOT TPU topology to compile for (compile-only, no "
                        "devices needed); '' to skip")
    p.add_argument("--cpu", action="store_true",
                   help="use the virtual CPU mesh instead of AOT TPU")
    p.add_argument("--devices", type=int, default=8,
                   help="CPU-mesh device count (--cpu mode)")
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--K", type=int, default=256)
    p.add_argument("--n-per-device", type=int, default=512)
    args = p.parse_args(argv)

    import jax

    if args.cpu or not args.topology:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    import numpy as np

    from ternary_spgemm_tpu.formats import (
        BlockPackedTernary, generate_bias, generate_ternary)
    from ternary_spgemm_tpu.parallel import make_mesh, overlapped_gather_spgemm

    if args.cpu or not args.topology:
        d = args.devices
        mesh = make_mesh({"model": d})
        backend_desc = f"cpu mesh ({d} virtual devices)"
    else:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(args.topology, "tpu")
        devs = np.array(topo.devices)
        d = devs.size
        mesh = jax.sharding.Mesh(devs.reshape(d), ("model",))
        backend_desc = f"AOT TPU topology {args.topology} ({d} chips)"

    N = args.n_per_device * d
    W = generate_ternary(args.K, N, 4, seed=0)
    fmt = BlockPackedTernary.from_dense(W)
    b = generate_bias(N)
    M = max(args.M, d)

    fn = jax.jit(lambda x, f, bb: overlapped_gather_spgemm(
        x, f, bb, mesh=mesh, axis="model"))
    if args.cpu or not args.topology:
        X = np.zeros((M, args.K), np.float32)
        hlo = fn.lower(X, fmt, b).compile().as_text()
    else:
        # Compile-only AOT: abstract args (no arrays can live on AOT devices).
        sds = lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
        X = jax.ShapeDtypeStruct((M, args.K), np.float32)
        fmt_s = jax.tree_util.tree_map(sds, fmt)
        hlo = fn.lower(X, fmt_s, sds(b)).compile().as_text()

    result = analyze_hlo(hlo)
    result.update({
        "backend": backend_desc, "devices": d, "N": N, "K": args.K,
        "verdict": None,
    })

    # Structural-overlap kernel: AOT-compile the Pallas RDMA ring
    # (parallel/ring_kernel.py) for the same topology — proves the
    # make_async_remote_copy double-buffered ring lowers through Mosaic for
    # real multi-chip hardware (its numerics are interpret-tested on the CPU
    # mesh, tests/test_ring_kernel.py).
    if not (args.cpu or not args.topology):
        import numpy as _np

        from ternary_spgemm_tpu.formats import DenseTernary
        from ternary_spgemm_tpu.parallel import ring_allgather_spgemm

        try:
            Wd = generate_ternary(args.K, N, 4, seed=1)
            fmt_d = DenseTernary.from_dense(Wd)
            rf = jax.jit(lambda x, f, bb: ring_allgather_spgemm(
                x, f, bb, mesh=mesh, axis="model"))
            sds = lambda a: jax.ShapeDtypeStruct(_np.shape(a),
                                                 _np.asarray(a).dtype)
            Xs = jax.ShapeDtypeStruct((8 * d, args.K), _np.float32)
            rhlo = rf.lower(Xs, jax.tree_util.tree_map(sds, fmt_d),
                            sds(b)).compile().as_text()
            result["ring_kernel"] = {
                "aot_compiled": True, "topology": args.topology,
                "custom_calls": len(re.findall(r" custom-call", rhlo)),
                "note": "Pallas make_async_remote_copy ring compiled by the "
                        "TPU toolchain for this topology; overlap is "
                        "structural (rdma.start() precedes the local dot "
                        "inside the kernel body).",
            }
        except Exception as e:  # record, keep the ppermute evidence
            result["ring_kernel"] = {
                "aot_compiled": False,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }
    if result["async_pairs"] and result["pairs_with_compute_inside"] > 0:
        result["verdict"] = ("OVERLAPPED: async collective-permute windows "
                             "contain compute ops (TPU compiler schedule)"
                             if "AOT" in backend_desc else
                             "OVERLAPPED: async collective-permute windows "
                             "contain compute ops")
    elif result["async_pairs"]:
        result["verdict"] = ("ASYNC BUT ADJACENT: start/done pairs exist with "
                             "no compute inside the window on this backend")
    else:
        result["verdict"] = ("SYNC ON THIS BACKEND: collectives lowered "
                             "synchronously; overlap decided by the TPU "
                             "scheduler at run time")
    if args.cpu or not args.topology:
        result["caveat"] = ("CPU-backend HLO proves program shape; ICI-cycle "
                            "overlap needs the TPU schedule (use the default "
                            "AOT topology mode).")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    lines = hlo.splitlines()
    excerpt = "\n".join(
        ln for ln in lines
        if "collective-permute" in ln or _COMPUTE_RE.search(ln))[:12000]
    with open(args.out.replace(".json", "_hlo_excerpt.txt"), "w") as f:
        f.write(excerpt + "\n")
    print(json.dumps({k: v for k, v in result.items() if k != "pairs"},
                     indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
