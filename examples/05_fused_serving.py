#!/usr/bin/env python
"""Serving fast paths: the fused SwiGLU FFN kernel and the merged-QKV
container on an exported transformer block — and how to let measurement
pick them.

Two block-level fusions (docs/perf.md §16, §19):

* ``fused_ffn=True`` — the whole SwiGLU FFN (gate+up → silu·mul → per-row
  int8 requantize → down) runs as ONE Pallas kernel; hidden activations
  never leave VMEM. This is also the numerically-proper W1.58-A8 path.
  Wins 8-20% at multi-row shapes (ffn_bench.json).
* ``fused_qkv=True`` — q/k/v projections merged into one ternary container
  over ``hstack(Wq, Wk, Wv)``: one SpMM instead of three (bit-identical).

The winners are SHAPE-DEPENDENT (at BitNet-3B the merged QKV plane pads
9600 columns to three 4096 tiles and turning both flags on is a measured
6.7% regression — fused_block_decode_3b.json), so the deployment API
measures instead of guessing: ``ExportedTransformerLM.from_params(...,
auto=True)`` probes the combinations at the decode shape and applies the
fastest (``models/generate.py::autotune_serving_flags``, JSON-cacheable).

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

# --- measured flag selection on a whole LM export ---------------------
from ternary_spgemm_tpu.models import BitTransformerLM  # noqa: E402
from ternary_spgemm_tpu.models.generate import (  # noqa: E402
    ExportedTransformerLM)

lm_model = BitTransformerLM(cfg)
lm_params = lm_model.init(jax.random.key(2))
lm = ExportedTransformerLM.from_params(
    lm_model, lm_params, TiledBitplane, kernel="PallasTiledBitplane_i8",
    a8=True, with_transpose=False, auto=True)   # <- flags by measurement
blk = lm.blocks[0]
print(f"auto-measured flags: fused_ffn={blk.fused_ffn} "
      f"fused_qkv={blk.qkv is not None}")
toks = jax.random.randint(jax.random.key(3), (1, 4), 0, cfg.vocab)
assert np.all(np.isfinite(np.asarray(lm(toks))))
print("OK")
