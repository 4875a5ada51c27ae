"""Tensor-parallel fused SwiGLU FFN: the block kernel under ``shard_map``.

Megatron-style FFN tensor parallelism (the net-new distributed layer,
SURVEY.md §2.3) composed with the fused block kernel
(:func:`~ternary_spgemm_tpu.ops.fused_ffn.fused_bitplane_swiglu`): gate/up
projections COLUMN-sharded along ``axis`` (each device owns a hidden-width
shard), the down projection ROW-sharded on the same boundary, so each
device runs its entire local block — both up-projections, silu·mul,
per-row requantize, down-projection — as ONE Pallas call with the hidden
shard never leaving VMEM *or the device*; partial outputs reduce with one
``psum`` (or ``psum_scatter``) per block, the same single collective the
unfused Megatron FFN pays.

Numerics: the per-row int8 requantize between the projections happens
per-SHARD — each device scales its own hidden slice, i.e. per-(row, shard)
scale groups. That is a strictly *finer* quantization grid than the
single-device per-row scale (shard-local maxima are <= the global row
maximum), and the p=1 case degenerates to the single-device kernel
exactly. The test reference (tests/test_parallel_ffn.py) replicates the
per-shard semantics with unfused registry calls.

This also lifts the fused kernel's single-N-tile OUTPUT restriction at
scale: shard N2 across devices (``scatter_output``) and each device's
output shard is one storage tile again.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ternary_spgemm_tpu.formats import TiledBitplane
from ternary_spgemm_tpu.ops.fused_ffn import fused_bitplane_swiglu
from ternary_spgemm_tpu.parallel.sharding import (
    column_leaf_specs,
    localize,
    row_leaf_specs,
    spec_tree,
)
from ternary_spgemm_tpu.parallel.spgemm import (
    _check_tiled_alignment,
    _shard_map,
)


def tensor_parallel_fused_swiglu(xq, sx, fmt_gate: TiledBitplane,
                                 fmt_up: TiledBitplane,
                                 fmt_down: TiledBitplane, *, mesh: Mesh,
                                 axis: str,
                                 batch_axis: Optional[str] = None,
                                 scatter_output: bool = False,
                                 gamma_gate: float = 1.0,
                                 gamma_up: float = 1.0,
                                 gamma_down: float = 1.0):
    """Run the fused SwiGLU FFN block tensor-parallel over ``mesh[axis]``.

    ``xq``/``sx``: int8-quantized activations + per-row scale (replicated
    over ``axis``; optionally sharded along ``batch_axis``). ``fmt_gate``/
    ``fmt_up`` column-sharded along ``axis``; ``fmt_down`` row-sharded on
    the same hidden boundary. Requires the hidden width to split evenly:
    ``N1 % (tile_n * n_devices) == 0`` and ``K2`` alignment per
    :func:`~ternary_spgemm_tpu.parallel.spgemm._check_tiled_alignment`.
    Returns Y replicated (default) or column-sharded (``scatter_output``).
    """
    n_dev = mesh.shape[axis]
    _check_tiled_alignment(fmt_gate, "N")
    _check_tiled_alignment(fmt_up, "N")
    _check_tiled_alignment(fmt_down, "K", n_dev)
    gn = fmt_gate.plane.shape[1]
    if gn % n_dev:
        raise ValueError(
            f"tensor_parallel_fused_swiglu needs the hidden storage tiles "
            f"({gn}) to split evenly over {n_dev} devices")
    if fmt_down.K != fmt_gate.N or fmt_down.K % n_dev:
        raise ValueError(
            f"down projection K={fmt_down.K} must equal the hidden width "
            f"{fmt_gate.N} and split evenly over {n_dev} devices")
    if (fmt_down.K // n_dev) % (8 * fmt_down.tkb):
        raise ValueError(
            f"per-device down-projection shard ({fmt_down.K // n_dev} rows) "
            f"must be a multiple of the K-block (8*tkb={8 * fmt_down.tkb}); "
            "rebuild fmt_down with a smaller tkb")

    gspec = spec_tree(fmt_gate, column_leaf_specs(TiledBitplane, axis))
    dspec = spec_tree(fmt_down, row_leaf_specs(TiledBitplane, axis))
    xspec = P(batch_axis, None)
    yspec = P(batch_axis, axis if scatter_output else None)

    N2 = fmt_down.N
    if scatter_output and N2 % n_dev:
        raise ValueError(
            f"scatter_output needs N2={N2} divisible by {n_dev} devices")

    def local(x, s, fg, fu, fd):
        y = fused_bitplane_swiglu(
            x, s, localize(fg), localize(fu), localize(fd),
            gamma_gate=gamma_gate, gamma_up=gamma_up, gamma_down=gamma_down)
        # localize() reports the PADDED output width (gn*tile_n — it cannot
        # recover the true N from local leaves); the pad columns are exact
        # zeros, slice them before the collective
        y = y[:, :N2]
        if scatter_output:
            return jax.lax.psum_scatter(y, axis, scatter_dimension=1,
                                        tiled=True)
        return jax.lax.psum(y, axis)

    return _shard_map(local, mesh, (xspec, xspec, gspec, gspec, dspec),
                      yspec)(xq, sx, fmt_gate, fmt_up, fmt_down)
