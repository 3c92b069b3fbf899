"""Experimental Pallas kernels: tested, correct, and measured LOSERS in
the full train step.  Nothing here is on a default path.

This namespace exists so the package layout itself tells winners from
losers: production kernels live in ``cosmos_tpu.ops`` (the packed-QKV
fused attention, int8 export ops); everything under ``experimental`` is
kept as a reproducible negative result with parity tests, reachable
only behind explicit toggles.

Lessons index (all numbers from full-step, same-session A/B on v5e —
see README "perf campaign" tables for details):

- ``layer_norm.fused_layer_norm`` — single-pass Welford LN kernel.
  Standalone 3.5x faster than the XLA module; full step 228 -> 211
  img/s: the custom-call boundary breaks XLA's LN+residual-add fusion.
  Toggle: ``create_model(..., fuse_ln=True)`` / models.layers ``FUSE_LN``.
- ``layer_norm.hybrid_layer_norm`` — jnp forward (keeps XLA fusion) +
  Pallas backward.  LOSES 218.8 -> 208.4 img/s: the text/local towers
  run {2,0,1}-major activations and every Mosaic call forces row-major
  operands, adding ~37 ms/step of boundary transposes.
  Toggle: models.layers ``HYBRID_LN``.
- ``ln_matmul.ln_matmul`` — fused LN -> matmul (QKV / c_fc producer).
  Full step 394 -> 481 ms: the backward recomputes the c_fc matmul that
  XLA's rematerialization would have kept.  Removing a fusion boundary
  at a kernel's INPUT is the wrong direction when the step is
  compute-bound (contrast: the packed-QKV attention kernel removed
  layout copies at its OUTPUT and won 394 -> 290 ms).
- ``mlp_block.mlp_block`` — fused LN -> c_fc -> GELU -> c_proj chain;
  same verdict and mechanism as ln_matmul.

The common mechanism behind all four: XLA already fuses elementwise
work into matmul epilogues, so a custom call in the middle of a fused
region pays (a) the lost fusion, (b) Mosaic's row-major operand
requirement (transpose copies), (c) save-or-recompute residual choices
the jaxpr-level remat would have optimized globally.  A Pallas kernel
wins on TPU when it removes a LAYOUT boundary (transposes around the
attention einsums), not a fusion boundary.
"""

from cosmos_tpu.ops.experimental.layer_norm import (
    fused_layer_norm,
    hybrid_layer_norm,
)
from cosmos_tpu.ops.experimental.ln_matmul import ln_matmul
from cosmos_tpu.ops.experimental.mlp_block import mlp_block

__all__ = [
    "fused_layer_norm",
    "hybrid_layer_norm",
    "ln_matmul",
    "mlp_block",
]
