"""Core layers shared by the vision and text towers.

Functional parity targets (see /root/reference/src/open_clip/transformer.py:15-86):
  - LayerNorm computed in float32 and cast back to the input dtype
    (reference LayerNorm/LayerNormFp32, transformer.py:15-30).
  - QuickGELU x * sigmoid(1.702 x) (transformer.py:33-36).
  - LayerScale per-channel gain (transformer.py:39-46).
  - PatchDropout (transformer.py:49-86) — keep a random subset of patch
    tokens during training, always keeping the CLS token.

TPU notes: params are stored in float32; compute dtype (usually bfloat16)
is threaded through via the ``dtype`` attribute.  LayerNorm always reduces
in float32 — on TPU the cast is free relative to the HBM-bound reduction
and it matches the reference's mixed-precision semantics exactly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


# Toggle for the single-pass Pallas LN kernel (ops/experimental/layer_norm).  OFF by
# default: standalone the kernel streams at ~660 GB/s vs ~190 for XLA's
# two-pass lowering, but in the full train step it LOSES (228 -> 211
# img/s/chip measured) — the custom-call boundary breaks XLA's fusion of
# residual adds/casts into the LN and anchors extra layout conversions.
# Kept for inference/serving graphs and as a measured negative result.
FUSED_LN: bool = False

# Toggle for the HYBRID LN (ops/experimental/layer_norm.hybrid_layer_norm): forward
# stays plain jnp (same XLA fusions as the default path — no custom-call
# boundary), only the BACKWARD runs as a Pallas kernel.  OFF by default:
# measured 218.8 -> 208.4 img/s/chip on v5e.  The trace shows why — the
# text/local towers run in {2,0,1}-major (batch-minor) activation
# layouts, and every Mosaic custom call forces row-major operands, so
# ~37 ms/step of boundary transpose copies appear (bf16[384,77,512]
# copies x63, bf16[288,37,768] x60, ...), dwarfing the ~18 ms the kernel
# saves on the LN-backward math itself.  The packed-QKV attention kernel
# is the exception that proves the rule: it pays off only because XLA
# reorganizes the whole surrounding layout chain around it.  Conclusion
# recorded here so the next perf campaign doesn't re-walk this path:
# LN work must be attacked by giving XLA fewer/cheaper ops to fuse, not
# by cutting custom-call islands into the differentiated graph.
HYBRID_LN: bool = False


def _hybrid_ln_active(x) -> bool:
    if not HYBRID_LN:
        return False
    import jax as _jax

    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    from cosmos_tpu.ops.experimental import layer_norm as fln

    return fln.supported(x)


class LayerNorm(nn.Module):
    """LayerNorm with float32 accumulation, cast back to input dtype."""

    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_scale and self.use_bias and FUSED_LN:
            from cosmos_tpu.ops.experimental import layer_norm as fln

            if fln.supported(x):
                dim = x.shape[-1]
                scale = self.param(
                    "scale", nn.initializers.ones, (dim,), jnp.float32)
                bias = self.param(
                    "bias", nn.initializers.zeros, (dim,), jnp.float32)
                return fln.fused_layer_norm(x, scale, bias, self.epsilon)
        if self.use_scale and self.use_bias and _hybrid_ln_active(x):
            from cosmos_tpu.ops.experimental import layer_norm as fln

            dim = x.shape[-1]
            scale = self.param(
                "scale", nn.initializers.ones, (dim,), jnp.float32)
            bias = self.param(
                "bias", nn.initializers.zeros, (dim,), jnp.float32)
            return fln.hybrid_layer_norm(x, scale, bias, self.epsilon)
        # single-pass stats: reduce the COMPUTE-dtype input with an f32
        # accumulator (no materialized f32 copy, one read instead of the
        # centered two-pass form) — measured -57ms/step on v5e.
        # E[x^2]-E[x]^2 cancellation is ~(mu/sigma)^2 * eps_f32, negligible
        # for activation statistics.
        orig_dtype = x.dtype
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        meansq = jnp.mean(
            jax.lax.square(x.astype(jnp.float32)), axis=-1, keepdims=True
        )
        var = jnp.maximum(meansq - jax.lax.square(mean), 0.0)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        dim = x.shape[-1]
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            y = y + bias
        return y.astype(orig_dtype)


class LayerNormParams(nn.Module):
    """Declares LN scale/bias at this scope WITHOUT applying them — used by
    the fused LN->matmul path (cosmos_tpu.ops.experimental.ln_matmul), which consumes the
    raw params.  Same param tree layout as LayerNorm."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


class DenseParams(nn.Module):
    """Declares a Dense kernel/bias (nn.Dense-compatible init and layout)
    without applying — for fused ops that consume the raw params."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 * x) — the OpenAI CLIP activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch.nn.GELU's default."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU: ~23% faster full train step on v5e (erf is
    a multi-instruction VPU transcendental); max |diff| vs erf ~3e-4."""
    return jax.nn.gelu(x, approximate=True)


def get_act_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    if name in ("gelu", "GELU"):
        return gelu
    if name in ("gelu_tanh", "gelu_approx"):
        return gelu_tanh
    if name in ("quick_gelu", "QuickGELU"):
        return quick_gelu
    raise ValueError(f"unknown activation: {name}")


def act_name(fn: Callable) -> str:
    """Inverse of get_act_fn (fused kernels need the static name)."""
    for name, f in (("gelu", gelu), ("gelu_tanh", gelu_tanh),
                    ("quick_gelu", quick_gelu)):
        if fn is f:
            return name
    raise ValueError(f"unregistered activation fn: {fn}")


class LayerScale(nn.Module):
    """Per-channel learnable gain (transformer.py:39-46)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        gamma = self.param(
            "gamma",
            lambda key, shape, dtype: jnp.full(shape, self.init_value, dtype),
            (dim,),
            jnp.float32,
        )
        return x * gamma.astype(x.dtype)


class Mlp(nn.Module):
    """Transformer MLP: Dense -> act -> Dense (transformer.py c_fc/gelu/c_proj)."""

    hidden_dim: int
    out_dim: int
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, ln=None) -> jax.Array:
        """ln=(scale, bias): run the whole LN -> c_fc -> act -> c_proj
        chain as ONE fused kernel (ops.experimental.mlp_block) — x is then the
        UN-normalized input and the [R, hidden] activation never exists
        in HBM."""
        if ln is not None:
            from cosmos_tpu.ops.experimental.mlp_block import mlp_block

            k1, b1 = DenseParams(self.hidden_dim, name="c_fc")(x.shape[-1])
            k2, b2 = DenseParams(self.out_dim, name="c_proj")(self.hidden_dim)
            return mlp_block(
                x, ln[0], ln[1], k1, b1, k2, b2, 1e-5, act_name(self.act_fn)
            )
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="c_fc")(x)
        x = self.act_fn(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(x)
        return x


def patch_dropout(
    x: jax.Array,
    rng: jax.Array,
    prob: float,
    exclude_first_token: bool = True,
) -> jax.Array:
    """Randomly keep a fixed-size subset of patch tokens (PatchDropout).

    Reference: transformer.py:49-86.  Uses top-k over random scores so the
    kept count is static — jit friendly.
    """
    if prob <= 0.0:
        return x
    if exclude_first_token:
        cls_tokens, tokens = x[:, :1], x[:, 1:]
    else:
        # reference PatchDropout (transformer.py:64-67): with
        # exclude_first_token=False EVERY token is in the dropout pool
        # and nothing is re-prepended
        cls_tokens, tokens = None, x
    b, n, _ = tokens.shape
    num_keep = max(1, int(n * (1.0 - prob)))
    scores = jax.random.normal(rng, (b, n))
    _, keep_idx = jax.lax.top_k(scores, num_keep)
    kept = jnp.take_along_axis(tokens, keep_idx[..., None], axis=1)
    if cls_tokens is not None:
        kept = jnp.concatenate([cls_tokens, kept], axis=1)
    return kept


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize(dim=-1) equivalent (norm clamped at eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)
