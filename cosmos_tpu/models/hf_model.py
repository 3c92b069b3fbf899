"""HuggingFace text tower (Flax-native, wired into the factory).

Parity target: /root/reference/src/open_clip/hf_model.py:39-193 —
AutoModel text encoder + pooler registry (mean/cls/last pooling over
hidden states with attention masking) + linear or MLP projection head to
the CLIP embedding dim.  The reference wires it through
factory.py:87-110 (tokenizer dispatch) and model.py text_cfg
``hf_model_name``; here the tower is a real flax.linen.Module wrapping
the transformers Flax *module* class, so it lives inside the CLIP param
pytree and works under jit/shard_map like the first-party text tower.
"""

from __future__ import annotations

import inspect
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


class HFTextTower(nn.Module):
    """A transformers Flax encoder as a CLIP text tower.

    Exposes the same ``(tokens) -> (pooled_projected, token_states)``
    surface as TextTransformer so CLIP can swap it in transparently
    (reference hf_model.py:96-152 HFTextEncoder.forward).
    """

    hf_config: Any          # transformers PretrainedConfig
    module_cls: Any         # e.g. FlaxBertModule (the *module*, not the wrapper)
    output_dim: int
    pooler_type: str = "mean_pooler"
    proj_type: str = "mlp"
    pad_id: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        self.hf = self.module_cls(config=self.hf_config, dtype=self.dtype,
                                  name="hf")
        self.proj = HFProjectionHead(
            output_dim=self.output_dim, proj_type=self.proj_type,
            dtype=self.dtype, name="proj",
        )
        # parity surface with TextTransformer (no COSMOS cross-pool on the
        # HF path — the reference's HF towers ride CustomTextCLIP, which
        # has no cosmos heads)
        self.attn_cross_pool = None

    def __call__(self, text: jax.Array) -> Tuple[jax.Array, jax.Array]:
        attention_mask = (text != self.pad_id).astype(jnp.int32)
        b, n = text.shape
        # transformers Flax module signatures differ per arch; feed only
        # the kwargs this one accepts
        accepted = set(inspect.signature(self.module_cls.__call__).parameters)
        kwargs: Dict[str, Any] = {}
        if "token_type_ids" in accepted:
            kwargs["token_type_ids"] = jnp.zeros_like(text)
        if "position_ids" in accepted:
            if getattr(self.hf_config, "model_type", "") in (
                    "roberta", "xlm-roberta", "camembert"):
                # roberta-family positions are PAD-OFFSET: real tokens
                # count up from padding_idx+1 and pads sit AT padding_idx
                # (transformers create_position_ids_from_input_ids — the
                # wrapper this tower bypasses fills them the same way);
                # a plain arange would read position rows shifted by 2,
                # including the reserved padding row
                pad = self.hf_config.pad_token_id
                kwargs["position_ids"] = (
                    jnp.cumsum(attention_mask, axis=1) * attention_mask + pad
                )
            else:
                kwargs["position_ids"] = jnp.broadcast_to(
                    jnp.arange(n), (b, n))
        if "head_mask" in accepted:
            kwargs["head_mask"] = None
        if "deterministic" in accepted:
            kwargs["deterministic"] = True
        out = self.hf(text, attention_mask, **kwargs)
        hidden = getattr(out, "last_hidden_state", None)
        if hidden is None:
            hidden = out[0]
        if self.pooler_type in ("cls_pooler",):
            # reference ClsPooler (hf_model.py:40-52): prefer the trained
            # pooler head (tanh(dense(cls))) when the arch provides one,
            # and strip the CLS position from the token sequence
            pooler_out = getattr(out, "pooler_output", None)
            pooled = (pooler_out if pooler_out is not None
                      else hidden[:, 0])
            tokens = hidden[:, 1:]
        else:
            pooled = _POOLERS[self.pooler_type](hidden, attention_mask)
            tokens = hidden
        return self.proj(pooled), tokens


def resolve_hf_config(text_cfg) -> Any:
    """text_cfg -> transformers PretrainedConfig.

    ``hf_model_config`` (a dict with at least ``model_type``) builds an
    offline config (tests / air-gapped); otherwise ``hf_model_name`` is
    fetched via AutoConfig.from_pretrained.
    """
    from transformers import AutoConfig

    if getattr(text_cfg, "hf_model_config", None):
        d = dict(text_cfg.hf_model_config)
        model_type = d.pop("model_type")
        return AutoConfig.for_model(model_type, **d)
    return AutoConfig.from_pretrained(text_cfg.hf_model_name)


def resolve_hf_module_cls(config) -> Any:
    """PretrainedConfig -> the arch's Flax *module* class.

    Encoder-decoder archs use their ENCODER (the reference takes
    .encoder when config.is_encoder_decoder, hf_model.py:124-126):
    t5/mt5 have a dedicated Flax encoder model; archs with no Flax
    implementation raise a clear error instead of a KeyError."""
    from transformers import FlaxAutoModel

    if getattr(config, "is_encoder_decoder", False):
        if config.model_type in ("t5", "mt5"):
            from transformers import FlaxT5EncoderModel

            return FlaxT5EncoderModel.module_class
        raise NotImplementedError(
            f"encoder-decoder arch {config.model_type!r} has no Flax "
            "encoder path here (transformers ships no Flax weights for "
            "it); use a bert/roberta-family text tower"
        )
    try:
        model_cls = FlaxAutoModel._model_mapping[type(config)]
    except KeyError:
        raise NotImplementedError(
            f"no Flax implementation for HF arch {config.model_type!r} "
            "in this transformers build"
        ) from None
    return model_cls.module_class


def build_hf_text_tower(text_cfg, embed_dim: int, dtype=jnp.float32,
                        name: str = "text") -> HFTextTower:
    """Factory hook: text_cfg with hf_model_name/hf_model_config -> tower.

    Pooler defaults follow the reference's per-arch registry
    (hf_configs.py arch_dict 'pooler' entries) unless hf_pooler_type
    overrides it.
    """
    from .hf_configs import arch_dict

    config = resolve_hf_config(text_cfg)
    module_cls = resolve_hf_module_cls(config)
    pooler = getattr(text_cfg, "hf_pooler_type", None) or arch_dict.get(
        config.model_type, {}
    ).get("pooler", "mean_pooler")
    return HFTextTower(
        hf_config=config,
        module_cls=module_cls,
        output_dim=embed_dim,
        pooler_type=pooler,
        proj_type=getattr(text_cfg, "hf_proj_type", None) or "mlp",
        # the attention/pooling mask must follow the HF architecture's own
        # padding id (reference hf_model.py uses config.pad_token_id):
        # roberta/xlm-roberta pad with 1, not the CLIP-default 0
        pad_id=(
            config.pad_token_id
            if getattr(config, "pad_token_id", None) is not None
            else getattr(text_cfg, "pad_id", 0)
        ),
        dtype=dtype,
        name=name,
    )


def load_hf_pretrained_params(params: Dict, hf_model_name: str) -> Dict:
    """Insert pretrained HF encoder weights under params['text']['hf']
    (reference builds the tower pretrained-by-default, hf_model.py:106)."""
    from transformers import FlaxAutoModel

    hf = FlaxAutoModel.from_pretrained(hf_model_name)
    params = dict(params)
    text = dict(params.get("text", {}))
    text["hf"] = hf.params
    params["text"] = text
    return params
