"""TPU Pallas kernels and quantized-inference ops.

Production paths (measured winners — v5e, CC3M bench step, README
"perf campaign"):
  - ``fused_attention_qkv`` is THE attention path: packed-QKV Pallas
    kernel, on by default on TPU backends via models.attention's
    ``use_flash`` tri-state, partitionable under a model axis
    (custom_partitioning — TP serving/training keep it);
  - int8 ops are for offline export / custom serving stacks
    (``tools/bench_infer.py --int8``).

Measured LOSERS (fused LN, LN->matmul, fused MLP block) live in
``cosmos_tpu.ops.experimental`` with a lessons index in its docstring —
kept as reproducible negative results behind explicit toggles, never on
a default path.  The package split IS the verdict: if it's importable
from ``cosmos_tpu.ops`` directly, it's a winner.
"""

from cosmos_tpu.ops.fused_attention import fused_attention_qkv
from cosmos_tpu.ops.int8 import (
    int8_matmul,
    quantize_activations,
    quantize_dense_params,
    quantize_weight,
)

__all__ = [
    "fused_attention_qkv",
    "int8_matmul",
    "quantize_activations",
    "quantize_dense_params",
    "quantize_weight",
]
