"""PAMR — pixel-adaptive mask refinement, in pure jnp.

Parity target: /root/reference/src/training/pamr.py (vendored from
1-stage-wseg): 8-neighborhood affinity kernels at multiple dilations,
per-pixel softmax over neighbor positions of -|Δx| / (0.1·σ), and
``num_iter`` propagation steps of the mask through those affinities.

TPU redesign: the reference's fixed ±1 3x3 conv kernels are pure
neighbor SHIFTS — here they are jnp.pad + slice (no conv at all), which
XLA fuses into a handful of VPU ops.  Layout is NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# 8-neighborhood offsets (dy, dx), matching the reference kernel order
# (pamr.py:26-36): row-major around the center.
_OFFSETS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Neighbor view with replicate padding: out[.., i, j, :] =
    x[.., clamp(i+dy), clamp(j+dx), :]."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    h, w = x.shape[h_axis], x.shape[w_axis]
    pads = [(0, 0)] * x.ndim
    pads[h_axis] = (max(-dy, 0), max(dy, 0))
    pads[w_axis] = (max(-dx, 0), max(dx, 0))
    xp = jnp.pad(x, pads, mode="edge")
    idx = [slice(None)] * x.ndim
    idx[h_axis] = slice(max(-dy, 0) + dy, max(-dy, 0) + dy + h)
    idx[w_axis] = slice(max(-dx, 0) + dx, max(-dx, 0) + dx + w)
    return xp[tuple(idx)]


def _neighbors(x: jax.Array, dilations: Sequence[int]) -> jax.Array:
    """Stack of 8*len(dilations) neighbor views: [P, ..., H, W, C]."""
    views = []
    for d in dilations:
        for dy, dx in _OFFSETS:
            views.append(_shift(x, dy * d, dx * d))
    return jnp.stack(views, axis=0)


def _local_std(x: jax.Array, dilations: Sequence[int]) -> jax.Array:
    """Std over the UNION of all dilations' 3x3 windows (center included):
    the reference's LocalStDev takes std over P = 9*len(dilations) shifted
    copies jointly (pamr.py:100-105, .std(2, keepdim=True)) and broadcasts
    one value to every neighbor position."""
    vals = []
    for d in dilations:
        vals.append(x)
        for dy, dx in _OFFSETS:
            vals.append(_shift(x, dy * d, dx * d))
    stack = jnp.stack(vals, axis=0)  # [9*len(d), ..., H, W, C]
    return jnp.std(stack, axis=0, ddof=1)[None]  # [1, ..., H, W, C]


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics, NHWC."""
    b, h, w, c = x.shape
    th, tw = size
    if (h, w) == (th, tw):
        return x
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    g = x[:, y0][:, :, x0]
    g01 = x[:, y0][:, :, x1]
    g10 = x[:, y1][:, :, x0]
    g11 = x[:, y1][:, :, x1]
    top = g * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("num_iter", "dilations"))
def pamr(
    image: jax.Array,          # [B, H, W, 3] float
    mask: jax.Array,           # [B, h, w, C] logits/probs
    num_iter: int = 1,
    dilations: Sequence[int] = (1,),
) -> jax.Array:
    """Refine mask by image affinities (pamr.py:117-146)."""
    dilations = tuple(dilations)
    mask = resize_bilinear_align_corners(
        mask.astype(jnp.float32), image.shape[1:3]
    )
    img = image.astype(jnp.float32)

    x_std = _local_std(img, dilations)             # [P, B, H, W, 3]
    diffs = jnp.abs(_neighbors(img, dilations) - img[None])
    aff = -diffs / (1e-8 + 0.1 * x_std)
    aff = aff.mean(axis=-1, keepdims=True)          # mean over channels
    aff = jax.nn.softmax(aff, axis=0)               # over neighbor positions

    for _ in range(num_iter):
        m = _neighbors(mask, dilations)             # [P, B, H, W, C]
        mask = (m * aff).sum(axis=0)
    return mask
