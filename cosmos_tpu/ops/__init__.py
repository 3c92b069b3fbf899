"""TPU Pallas kernels and quantized-inference ops.

Measured guidance (v5e, CC3M bench step — see README "perf campaign"):
  - fused_attention_qkv is the production attention path (on by default
    on TPU backends via models.attention's use_flash tri-state);
  - fused_layer_norm and the ln_matmul/mlp_block fusions are measured
    NEGATIVE results in the full train step (custom-call boundaries break
    XLA's surrounding fusions) — kept available, off by default;
  - int8 ops are for offline export / custom serving stacks.
"""

from cosmos_tpu.ops.fused_attention import fused_attention_qkv
from cosmos_tpu.ops.int8 import (
    int8_matmul,
    quantize_activations,
    quantize_dense_params,
    quantize_weight,
)
from cosmos_tpu.ops.layer_norm import fused_layer_norm, hybrid_layer_norm

__all__ = [
    "fused_attention_qkv",
    "fused_layer_norm",
    "hybrid_layer_norm",
    "int8_matmul",
    "quantize_activations",
    "quantize_dense_params",
    "quantize_weight",
]
