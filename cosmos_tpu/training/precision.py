"""Precision policy helpers.

Parity target: /root/reference/src/training/precision.py:5-12
(get_autocast: cuda amp fp16 / bf16 / null).  On TPU there is no autocast
context or GradScaler: the policy is a compute dtype (bf16) threaded into
the Flax modules, with f32 params/optimizer state and f32 LayerNorm /
softmax reductions.  These helpers centralize that mapping.
"""

from __future__ import annotations

import jax.numpy as jnp

from cosmos_tpu.models.factory import resolve_dtype  # noqa: F401  (re-export)


def get_input_dtype(precision: str):
    """dtype for image inputs entering the jitted step."""
    return resolve_dtype(precision)


def get_cast_dtype(precision: str):
    """Manual weight-cast dtype (reference model.py get_cast_dtype):
    non-None only for the 'pure' manual-mixed modes where the reference
    casts the weights themselves; amp/fp32 return None."""
    if precision in ("fp16", "pure_fp16"):
        return jnp.float16
    if precision in ("pure_bf16",):
        return jnp.bfloat16
    return None


def is_mixed_precision(precision: str) -> bool:
    return resolve_dtype(precision) == jnp.bfloat16
