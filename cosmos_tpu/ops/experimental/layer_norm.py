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
    # stats are [bblk, L, 1]: keeping the trailing unit axis lets the block
    # equal the array's last-two dims (Mosaic requires lane-dim blocks be
    # 128-multiples OR full-dim; L=197/77/37 are not 128-multiples)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _bwd_kernel(x_ref, s_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, ds_ref, db_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    s = s_ref[...]
    d = x.shape[-1]
    mean = mean_ref[...]          # [bblk, L, 1]
    rstd = rstd_ref[...]
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
            pl.BlockSpec((bblk, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((b, l, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, l, 1), jnp.float32),
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
            pl.BlockSpec((bblk, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, l, 1), lambda i: (i, 0, 0),
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


# --- hybrid LN: XLA forward, Pallas backward ------------------------------
#
# The full-Pallas forward above LOSES in the train step (228 -> 211
# img/s/chip measured): the custom-call boundary breaks XLA's fusion of the
# surrounding residual adds / casts into the normalize pass.  But a device
# trace of the 218-img/s step shows the LN BACKWARD fusions are the single
# slowest op family (~26 ms/step across [96,197,768] / [384,77,512] /
# [288,37,768], each running ~5x under HBM bandwidth — XLA materializes the
# f32 per-row stats in transposed {0,1} layouts and multi-passes the
# cross-row dscale/dbias reduction).  The hybrid keeps the forward as plain
# jnp ops (XLA fuses them exactly as before — the fwd fusion signature
# (mean, rstd, y) is what the unhinted AD path already emits) and routes
# only the backward through the Pallas kernel, which does one VMEM pass per
# block and accumulates dscale/dbias in-kernel across grid steps.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hybrid_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm [B, L, D]: jnp forward (XLA-fusable), Pallas backward.

    Numerics match models.layers.LayerNorm exactly in the forward (same
    single-pass f32 stats); the backward is the standard LN gradient
    holding mean/rstd as constants of the forward pass.
    """
    return _hln_fwd(x, scale, bias, eps, interpret)[0]


def _hln_math(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * rstd * scale + bias).astype(x.dtype)
    return y, mean, rstd          # stats keep the [B, L, 1] trailing axis


def _hln_fwd(x, scale, bias, eps, interpret):
    y, mean, rstd = _hln_math(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


_hln_bwd = _ln_bwd  # identical residuals -> identical Pallas backward

hybrid_layer_norm.defvjp(_hln_fwd, _hln_bwd)
