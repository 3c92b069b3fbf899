"""ModifiedResNet vision tower (OpenAI CLIP ResNet) in Flax.

Parity target: /root/reference/src/open_clip/modified_resnet.py —
3-conv anti-aliased stem (avgpool instead of strided conv), 4 Bottleneck
stages where stride>1 becomes avgpool-then-conv, and a final
AttentionPool2d whose query is the mean token (:58-95).

Legacy architecture support (RN50-family checkpoints); NHWC layout.
BatchNorm statistics live in the param tree (frozen-BN inference math —
the RN path exists for loading/evaluating released OpenAI checkpoints,
reference openai.py:24-90, so running-stat updates aren't needed and the
whole tower stays a plain {"params": ...} pytree like every other model).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference BatchNorm with (scale, bias, mean, var) as params.

    Matches torch BatchNorm2d eval-mode math: (x - mean)/sqrt(var+eps)
    * weight + bias, computed in f32.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(self.dtype)


def avg_pool(x: jax.Array, stride: int) -> jax.Array:
    if stride <= 1:
        return x
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bn = lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        out = nn.relu(bn("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)))
        out = nn.relu(bn("bn2")(nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)))
        out = avg_pool(out, self.stride)
        out = bn("bn3")(nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv3",
        )(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = avg_pool(x, self.stride)
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        pe = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c ** -0.5),
            (h * w + 1, c),
            jnp.float32,
        )
        seq = seq + pe.astype(seq.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(seq[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(seq)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(seq)
        hd = c // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) * hd ** -0.5
        wts = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", wts.astype(v.dtype), split(v),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 512
    heads: int = 32
    image_size: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, csa: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        if csa:
            raise NotImplementedError("CSA segmentation needs a ViT tower")
        bn = lambda name: FrozenBatchNorm(dtype=self.dtype, name=name)
        # 3-layer stem
        x = nn.relu(bn("bn1")(nn.Conv(
            self.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            self.width // 2, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(
            self.width, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv3")(x)))
        x = avg_pool(x, 2)

        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for blk in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if blk == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x)
            planes *= 2

        tokens = x.reshape(x.shape[0], -1, x.shape[-1])
        pooled = AttentionPool2d(
            num_heads=self.heads, output_dim=self.output_dim,
            dtype=self.dtype, name="attnpool",
        )(x)
        return pooled, tokens
