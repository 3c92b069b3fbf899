"""HuggingFace text tower adapter (Flax).

Parity target: /root/reference/src/open_clip/hf_model.py:39-193 —
AutoModel text encoder + pooler registry (mean/cls/last pooling over
hidden states with attention masking) + linear or MLP projection head to
the CLIP embedding dim.  Uses transformers' Flax model classes so the
tower stays a pure-functional pytree like the rest of the framework.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

logger = logging.getLogger(__name__)

_POOLERS: Dict[str, Callable] = {}


def register_pooler(fn):
    _POOLERS[fn.__name__] = fn
    return fn


@register_pooler
def mean_pooler(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    m = attention_mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)


@register_pooler
def max_pooler(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    m = attention_mask[..., None].astype(bool)
    return jnp.where(m, hidden, -jnp.inf).max(axis=1)


@register_pooler
def cls_pooler(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    return hidden[:, 0]


@register_pooler
def cls_last_hidden_state_pooler(hidden, attention_mask):
    return hidden[:, 0]


class HFProjectionHead(nn.Module):
    output_dim: int
    proj_type: str = "mlp"   # 'linear' | 'mlp'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.proj_type == "linear":
            return nn.Dense(self.output_dim, use_bias=False,
                            dtype=self.dtype, name="proj")(x)
        d = (x.shape[-1] + self.output_dim) // 2
        h = nn.Dense(d, use_bias=False, dtype=self.dtype, name="dense1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                        name="dense2")(h)


class HFTextEncoder:
    """Wraps a transformers Flax model as a CLIP text tower.

    Not an nn.Module: holds the HF module + its params and exposes
    ``(tokens, attention_mask) -> (pooled, token_states)`` plus a
    projection-head module with separate params.
    """

    def __init__(
        self,
        model_name_or_config,
        output_dim: int,
        pooler_type: str = "mean_pooler",
        proj_type: str = "mlp",
        pretrained: bool = True,
        seed: int = 0,
    ):
        from transformers import AutoConfig, FlaxAutoModel

        if isinstance(model_name_or_config, str):
            if pretrained:
                self.hf_model = FlaxAutoModel.from_pretrained(model_name_or_config)
            else:
                config = AutoConfig.from_pretrained(model_name_or_config)
                self.hf_model = FlaxAutoModel.from_config(config)
        else:  # an AutoConfig instance (offline tests)
            self.hf_model = FlaxAutoModel.from_config(model_name_or_config)

        self.pooler = _POOLERS[pooler_type]
        self.proj = HFProjectionHead(output_dim=output_dim, proj_type=proj_type)
        hidden = self.hf_model.config.hidden_size
        self.proj_params = self.proj.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, hidden))
        )["params"]

    @property
    def params(self):
        return {"hf": self.hf_model.params, "proj": self.proj_params}

    def __call__(
        self,
        params,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        out = self.hf_model(
            input_ids=input_ids,
            attention_mask=attention_mask,
            params=params["hf"],
        )
        hidden = out.last_hidden_state
        pooled = self.pooler(hidden, attention_mask)
        projected = self.proj.apply({"params": params["proj"]}, pooled)
        return projected, hidden
