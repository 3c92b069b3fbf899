"""Fused transformer-MLP block kernel: c_proj(act(c_fc(LayerNorm(x)))).

The reference runs this as four ATen kernels with two [R, 4D] HBM
round-trips (transformer.py:233-287 mlp path); XLA keeps BOTH the pre-act
and post-act [R, 4D] hiddens as backward residuals, which at CLIP batch
sizes is what pushes the step into remat-compression thrash (see the
ablation notes in tools/ablate_bench.py).  This kernel:

  - computes the whole LN -> matmul -> act -> matmul chain inside VMEM,
    so the [R, 4D] hidden never exists in HBM;
  - exposes a custom VJP whose only saved tensors are x and the weights —
    the backward recomputes the normalized input and the hidden (one
    extra c_fc matmul, the flash-attention trade) and then runs the usual
    four gradient matmuls as plain XLA ops.

Numerics: LN statistics in f32 with the same single-pass form as
models.layers.LayerNorm; matmuls keep compute-dtype inputs with f32
accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmos_tpu.models.layers import get_act_fn


def _pick_row_block(r: int, d: int, hd: int, itemsize: int) -> int:
    """Largest divisor row block whose VMEM working set (both resident
    weight matrices + x/y row blocks + the f32 hidden block) fits."""
    budget = 12 * 1024 * 1024
    weights = (d * hd + hd * d) * itemsize
    for cand in (256, 128, 64, 32, 16, 8):
        if r % cand:
            continue
        working = weights + cand * (d * (itemsize + 4) + hd * 4 + d * itemsize)
        if working <= budget:
            return cand
    # no power-of-two divisor: the whole array becomes one block — but
    # only if it actually fits (a non-8-divisible row count must not
    # bypass the budget; include the same y/hidden terms the loop does)
    if weights + r * (d * (itemsize + 4) + hd * 4 + d * itemsize) <= budget:
        return r
    raise ValueError(
        f"fused MLP block: no row block of {r} rows fits the VMEM "
        f"budget (weights {weights/2**20:.0f} MiB at d={d}, "
        f"hidden={hd}) — use the unfused XLA path (fuse_ln=False) for "
        "this shape"
    )


def _ln_f32(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
        - jax.lax.square(mean),
        0.0,
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * g.astype(jnp.float32) + b.astype(jnp.float32)


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps, act_fn):
    x = x_ref[:]
    y = _ln_f32(x, g_ref[:], b_ref[:], eps).astype(x.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = act_fn(h + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _resolve_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_impl(x2, g, b, w1, b1, w2, b2, eps, act, interpret):
    r, d = x2.shape
    hd = w1.shape[1]
    br = _pick_row_block(r, d, hd, x2.dtype.itemsize)
    act_fn = get_act_fn(act)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act_fn=act_fn),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), x2.dtype),
        interpret=_resolve_interpret(interpret),
    )(x2, g[None], b[None], w1, b1[None], w2, b2[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_block(
    x: jax.Array,       # [..., D] compute dtype
    g: jax.Array,       # [D] LN scale (f32)
    b: jax.Array,       # [D] LN bias (f32)
    w1: jax.Array,      # [D, HD]
    b1: jax.Array,      # [HD]
    w2: jax.Array,      # [HD, D]
    b2: jax.Array,      # [D]
    eps: float = 1e-5,
    act: str = "gelu",
    interpret: Optional[bool] = None,
) -> jax.Array:
    lead = x.shape[:-1]
    d = x.shape[-1]
    out = _fwd_impl(
        x.reshape(-1, d), g, b,
        w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
        eps, act, interpret,
    )
    return out.reshape(lead + (d,))


def _fwd(x, g, b, w1, b1, w2, b2, eps, act, interpret):
    return mlp_block(x, g, b, w1, b1, w2, b2, eps, act, interpret), (
        x, g, b, w1, b1, w2,
    )


def _bwd(eps, act, interpret, res, grad):
    x, g, b, w1, b1, w2 = res
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    g2 = grad.reshape(-1, d).astype(x.dtype)
    act_fn = get_act_fn(act)

    # recompute (flash-style): normalized input, pre-act hidden, post-act
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
        - jax.lax.square(mean),
        0.0,
    )
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    y = (xhat * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    h_pre = jnp.dot(
        y, w1.astype(x.dtype), preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    a_act, act_vjp = jax.vjp(act_fn, h_pre)
    a = a_act.astype(x.dtype)

    dw2 = jnp.einsum("rh,rd->hd", a, g2, preferred_element_type=jnp.float32)
    db2 = jnp.sum(grad.reshape(-1, d).astype(jnp.float32), axis=0)
    da = jnp.einsum("rd,hd->rh", g2, w2.astype(g2.dtype),
                    preferred_element_type=jnp.float32)
    dh = act_vjp(da)[0]
    dhc = dh.astype(x.dtype)
    db1 = jnp.sum(dh, axis=0)
    dw1 = jnp.einsum("rd,rh->dh", y, dhc, preferred_element_type=jnp.float32)
    dy = jnp.einsum("rh,dh->rd", dhc, w1.astype(dhc.dtype),
                    preferred_element_type=jnp.float32)
    dg = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    dxhat = dy * g.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)

    return (
        dx.reshape(x.shape),
        dg.astype(jnp.float32),
        db.astype(jnp.float32),
        dw1.astype(w1.dtype),
        db1.astype(jnp.float32),
        dw2.astype(w2.dtype),
        db2.astype(jnp.float32),
    )


mlp_block.defvjp(_fwd, _bwd)
