#!/usr/bin/env python
"""Serving fast paths: the fused SwiGLU FFN kernel and the merged-QKV
container on an exported transformer block.

Two block-level fusions (docs/perf.md §16, measured 9.1% end-to-end on the
BitNet-7B decode block):

* ``fused_ffn=True`` — the whole SwiGLU FFN (gate+up → silu·mul → per-row
  int8 requantize → down) runs as ONE Pallas kernel; hidden activations
  never leave VMEM. This is also the numerically-proper W1.58-A8 path.
* ``fused_qkv=True`` — q/k/v projections merged into one ternary container
  over ``hstack(Wq, Wk, Wv)``: one SpMM instead of three (bit-identical).

Run:  python examples/05_fused_serving.py [--platform tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu")
args = parser.parse_args()

import jax  # noqa: E402

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ternary_spgemm_tpu.formats import TiledBitplane  # noqa: E402
from ternary_spgemm_tpu.models import (  # noqa: E402
    BitTransformerBlock,
    BitTransformerConfig,
    ExportedTransformerBlock,
)

cfg = BitTransformerConfig(vocab=256, d_model=128, n_heads=4, d_ff=256,
                           n_layers=1)
params = BitTransformerBlock(cfg).init(jax.random.key(0))

# Export the same trained block two ways: plain, and with both serving
# fast paths enabled. The flags are serving-only (they bypass the
# custom-VJP layers) and fall back automatically when their kernel
# contract is not met (batch > 128 rows, trained-in FFN biases, ...).
plain = ExportedTransformerBlock.from_params(
    cfg, params, TiledBitplane, kernel="PallasTiledBitplane_i8")
fast = ExportedTransformerBlock.from_params(
    cfg, params, TiledBitplane, kernel="PallasTiledBitplane_i8",
    fused_ffn=True, fused_qkv=True)

x = jax.random.normal(jax.random.key(1), (1, 8, cfg.d_model), jnp.float32)

# blocks are pytrees: pass them THROUGH jit so weights stay literal-free
run = jax.jit(lambda blk, z: blk(z))
y_plain, y_fast = np.asarray(run(plain, x)), np.asarray(run(fast, x))

print(f"decode-shaped block forward: {y_fast.shape}")
print(f"fused-vs-plain max |delta| = {np.abs(y_fast - y_plain).max():.4f} "
      "(the fused FFN applies the per-row A8 requantize — the deployed "
      "numeric regime — where the plain _i8 path rounds raw activations)")
assert np.all(np.isfinite(y_fast))
print("OK")
