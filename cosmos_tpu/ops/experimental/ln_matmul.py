"""Fused LayerNorm -> matmul Pallas kernel.

Every transformer block has two LN -> big-matmul sites (ln_1 -> packed
QKV in-projection, ln_2 -> MLP c_fc; reference transformer.py:233-287
runs them as separate ATen kernels).  XLA on TPU does not fuse a
normalization reduction into a dot's operand, so the normalized [R, D]
activation round-trips HBM at every site.  This kernel computes

    out = LayerNorm(x; g, b) @ W + bias

in one pass: each grid program loads a row-tile of x into VMEM, computes
the f32 row statistics, normalizes, and feeds the MXU directly — the
normalized tensor never exists in HBM.

Backward recomputes the cheap normalization (flash-style) and uses plain
XLA matmuls for dW/dx — those are the same FLOPs autodiff would emit;
the win is the forward fusion plus not saving the normalized tensor as a
residual (x itself is the residual).

Accuracy: stats in f32 via E[x^2]-E[x]^2 over the compute-dtype input —
the same single-pass form as cosmos_tpu.models.layers.LayerNorm, so the
fused path is numerically interchangeable with the unfused one.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_block(r: int, d: int, o: int, itemsize: int) -> int:
    """Largest divisor row block whose VMEM working set (resident weight
    matrix + x/out row blocks) fits."""
    budget = 12 * 1024 * 1024
    weights = d * o * itemsize
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if r % cand:
            continue
        working = weights + cand * (d * (itemsize + 4) + o * 4)
        if working <= budget:
            return cand
    # no power-of-two divisor: the whole array becomes one block — but
    # only if it actually fits (a non-8-divisible row count must not
    # bypass the budget this function exists to enforce)
    if weights + r * (d * (itemsize + 4) + o * 4) <= budget:
        return r
    raise ValueError(
        f"fused LN->matmul: no row block of {r} rows fits the VMEM "
        f"budget (weights {weights/2**20:.0f} MiB at d={d}, out={o}) — "
        "use the unfused XLA path (fuse_ln=False) for this shape"
    )


def _kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps):
    x = x_ref[:]                                   # [BR, D] compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
        - jax.lax.square(mean),
        0.0,
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)
    o = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_matmul_fwd_impl(x2, g, b, w, bias, eps, interpret):
    r, d = x2.shape
    o = w.shape[1]
    br = _pick_row_block(r, d, o, x2.dtype.itemsize)
    grid = (r // br,)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, o), x2.dtype),
        interpret=interpret,
    )(x2, g[None], b[None], w, bias[None])
    return out


def _resolve_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _ln_stats(x2, eps):
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
        - jax.lax.square(mean),
        0.0,
    )
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    return xhat, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_matmul(
    x: jax.Array,        # [..., D] compute dtype
    g: jax.Array,        # [D] f32 LN scale
    b: jax.Array,        # [D] f32 LN bias
    w: jax.Array,        # [D, O] compute dtype
    bias: jax.Array,     # [O]
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm(x) @ w + bias with the LN fused into the matmul."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    out = _ln_matmul_fwd_impl(
        x2, g, b, w.astype(x.dtype), bias, eps, _resolve_interpret(interpret)
    )
    return out.reshape(lead + (w.shape[1],))


def _fwd(x, g, b, w, bias, eps, interpret):
    return ln_matmul(x, g, b, w, bias, eps, interpret), (x, g, b, w)


def _bwd(eps, interpret, res, grad):
    x, g, b, w = res
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    g2 = grad.reshape(-1, grad.shape[-1])

    xhat, rstd = _ln_stats(x2, eps)            # f32 [R, D], [R, 1]
    y = (xhat * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)

    dw = jnp.einsum("rd,ro->do", y, g2, preferred_element_type=jnp.float32)
    dbias = jnp.sum(g2.astype(jnp.float32), axis=0)
    dy = jnp.einsum("ro,do->rd", g2, w.astype(g2.dtype),
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
        dw.astype(w.dtype),
        dbias.astype(jnp.float32),
    )


ln_matmul.defvjp(_fwd, _bwd)
