"""Single-pass fused LayerNorm Pallas kernel (fwd + custom VJP).

Replaces XLA's lowering of the pre-LN normalizations in the transformer
blocks (reference semantics: LayerNorm in float32 cast back to the compute
dtype, /root/reference/src/open_clip/transformer.py:15-30).

Why a kernel: a device trace of the CC3M bench step shows the plain-LN
fusions running at ~120-180 GB/s effective — XLA emits a stats pass plus a
normalize pass (plus separately-materialized f32 stats), while the HBM
floor is one read + one write.  This kernel does the whole thing in one
VMEM-resident pass per block (read x, write y, stats stay as tiny [B,L]
side outputs for the backward): trace-measured at ~660 GB/s on v5e, ~3.5x
the XLA fusion at HBM-resident sizes.

Layout notes: operands/results of a Mosaic custom call are row-major; the
surrounding step otherwise tends to drift into {2,0,1}-major activation
layouts (see ops/fused_attention.py).  Blocks are 3-D [bblk, L, D] so no
flattening reshape (and therefore no relayout copy) is ever required.

Numerics match cosmos_tpu.models.layers.LayerNorm exactly: single-pass
E[x^2]-E[x]^2 stats accumulated in f32 over the compute-dtype input,
normalized in f32, cast back.  The backward recomputes nothing: it saves
(x, mean, rstd) and reduces dscale/dbias across row-blocks in an f32 VMEM
accumulator that revisits the same output block every grid step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 1024 * 1024


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[...]
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf, -1, keepdims=True) / d
    msq = jnp.sum(xf * xf, -1, keepdims=True) / d
    var = jnp.maximum(msq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * s_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = mean[..., 0]
    rstd_ref[...] = rstd[..., 0]


def _bwd_kernel(x_ref, s_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, ds_ref, db_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    s = s_ref[...]
    d = x.shape[-1]
    mean = mean_ref[...][..., None]
    rstd = rstd_ref[...][..., None]
    xh = (x - mean) * rstd
    gs = g * s
    m1 = jnp.sum(gs, -1, keepdims=True) / d
    m2 = jnp.sum(gs * xh, -1, keepdims=True) / d
    dx = rstd * (gs - m1 - xh * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    ds_part = jnp.sum(g * xh, axis=(0, 1))
    db_part = jnp.sum(g, axis=(0, 1))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds_ref[...] += ds_part[None]
    db_ref[...] += db_part[None]


# per-row-of-block bytes: the backward is the worst case — it holds x, g,
# dx blocks plus two f32 working copies (xf and gs/xh temporaries share
# registers but budget them explicitly)
def _row_bytes(d: int, itemsize: int) -> int:
    return d * (3 * itemsize + 2 * 4)


def _pick_bblk(batch: int, l: int, d: int, itemsize: int) -> int:
    budget = 12 * 1024 * 1024
    for b in (32, 16, 8, 4, 2, 1):
        if batch % b:
            continue
        if b * l * _row_bytes(d, itemsize) <= budget:
            return b
    return 1


def supported(x: jax.Array) -> bool:
    if x.ndim != 3:
        return False
    b, l, d = x.shape
    # even the 1-batch block must fit the (backward) working-set budget
    return (d % 128 == 0 and b % 2 == 0
            and l * _row_bytes(d, x.dtype.itemsize) <= 12 * 1024 * 1024)


def _resolve_interpret(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm over the last axis of a 3-D [B, L, D] array.

    scale/bias are f32 [D]; stats are f32; output is x.dtype.
    """
    return _ln_fwd(x, scale, bias, eps, interpret)[0]


def _ln_fwd(x, scale, bias, eps, interpret):
    b, l, d = x.shape
    bblk = _pick_bblk(b, l, d, x.dtype.itemsize)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(b // bblk,),
        in_specs=[
            pl.BlockSpec((bblk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bblk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l), jnp.float32),
            jax.ShapeDtypeStruct((b, l), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x, scale, bias)
    return y, (x, scale, mean, rstd)


def _ln_bwd(eps, interpret, res, g):
    x, scale, mean, rstd = res
    b, l, d = x.shape
    bblk = _pick_bblk(b, l, d, x.dtype.itemsize)
    dx, ds, db = pl.pallas_call(
        _bwd_kernel,
        grid=(b // bblk,),
        in_specs=[
            pl.BlockSpec((bblk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bblk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=_resolve_interpret(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x, scale, mean, rstd, g)
    return dx, ds[0], db[0]


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
