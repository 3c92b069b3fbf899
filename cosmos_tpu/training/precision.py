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


def is_mixed_precision(precision: str) -> bool:
    return resolve_dtype(precision) == jnp.bfloat16
