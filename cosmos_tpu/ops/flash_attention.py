"""Fused attention Pallas kernels for the CLIP towers.

Replaces the reference's F.scaled_dot_product_attention / MultiheadAttention
CUDA kernels (/root/reference/src/open_clip/transformer.py:158-163, :247)
on TPU.  CLIP sequences are short (197 image patches, 77 text tokens, 37
local-crop patches), so unlike paged flash attention the ENTIRE sequence
of one (batch, head) pair fits in VMEM: each grid program computes
softmax(q kᵀ·s) v fully on-chip — the [L, L] probability matrix never
touches HBM (XLA's unfused path materializes it per layer).  The backward
pass recomputes the probabilities in VMEM (flash-style) and emits
dq/dk/dv in one fused kernel.

Sequences are padded to sublane multiples; padded KEY positions are
masked with -inf so results are exact for any length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _pad_len(l: int, multiple: int = 16) -> int:
    """Pad sequence to the bf16 sublane multiple (16) — NOT 128: the lane
    dim is Dh and over-padding L to 128 cost 2-3.5x HBM on the short CLIP
    sequences (37/77/197 tokens)."""
    return ((l + multiple - 1) // multiple) * multiple


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, causal):
    q = q_ref[0].astype(jnp.float32)              # [Lq, Dh]
    k = k_ref[0].astype(jnp.float32)              # [Lk, Dh]
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # [Lq, Lk]
    lq, lk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    mask = col >= kv_len                           # padded keys
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        mask = jnp.logical_or(mask, col > row)
    s = jnp.where(mask, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, kv_len, causal):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    lq, lk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    mask = col >= kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        mask = jnp.logical_or(mask, col > row)
    s = jnp.where(mask, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)                 # [Lq, Lk]
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # [Lk, Dh]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # [Lq, Lk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(mask, 0.0, ds) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(lq, lk, dh):
    def im(i):
        return (i, 0, 0)

    q_spec = pl.BlockSpec((1, lq, dh), im)
    k_spec = pl.BlockSpec((1, lk, dh), im)
    return q_spec, k_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(q kᵀ / sqrt(Dh)) v over [B, H, L, Dh] inputs."""
    return _flash_fwd(q, k, v, causal, interpret)[0]


def _resolve_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _flash_fwd(q, k, v, causal, interpret):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    lq_p, lk_p = _pad_len(lq), _pad_len(lk)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    bh = b * h
    qp = qp.reshape(bh, lq_p, dh)
    kp = kp.reshape(bh, lk_p, dh)
    vp = vp.reshape(bh, lk_p, dh)
    q_spec, k_spec = _specs(lq_p, lk_p, dh)
    out = pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel, scale=scale, kv_len=lk, causal=causal
        ),
        grid=(bh,),
        in_specs=[q_spec, k_spec, k_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, dh), q.dtype),
        interpret=_resolve_interpret(interpret),
    )(qp, kp, vp)
    out = out.reshape(b, h, lq_p, dh)[:, :, :lq]
    return out, (q, k, v)


def _flash_bwd(causal, interpret, res, g):
    q, k, v = res
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    lq_p, lk_p = _pad_len(lq), _pad_len(lk)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0))).reshape(-1, lq_p, dh)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0))).reshape(-1, lk_p, dh)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0))).reshape(-1, lk_p, dh)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0))).reshape(-1, lq_p, dh)
    bh = b * h
    q_spec, k_spec = _specs(lq_p, lk_p, dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=scale, kv_len=lk, causal=causal
        ),
        grid=(bh,),
        in_specs=[q_spec, k_spec, k_spec, q_spec],
        out_specs=(q_spec, k_spec, k_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_p, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, lk_p, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_p, dh), v.dtype),
        ),
        interpret=_resolve_interpret(interpret),
    )(qp, kp, vp, gp)
    dq = dq.reshape(b, h, lq_p, dh)[:, :, :lq]
    dk = dk.reshape(b, h, lk_p, dh)[:, :, :lk]
    dv = dv.reshape(b, h, lk_p, dh)[:, :, :lk]
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)
