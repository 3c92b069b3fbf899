"""Parameter re-initialization utilities.

Parity target: init_parameters_last_transformer_layer
(/root/reference/src/open_clip/transformer.py:368-377 and :614-628, wired
by --init-last-layer in main.py:281-283): re-draw the LAST transformer
block's attention and MLP weights in both towers with the OpenCLIP
init stds (attn N(0, w^-0.5), proj N(0, w^-0.5 (2L)^-0.5),
fc N(0, (2w)^-0.5)).  The reference calls it separately on student and
teacher, so the two towers get INDEPENDENT draws — pass different keys.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _reinit_block(block: Dict, width: int, layers: int, key) -> Dict:
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    k1, k2, k3, k4 = jax.random.split(key, 4)
    block = jax.tree.map(lambda x: x, block)  # shallow-ish copy
    block["attn"]["in_proj_kernel"] = attn_std * jax.random.normal(
        k1, block["attn"]["in_proj_kernel"].shape, jnp.float32
    )
    block["attn"]["out_proj"]["kernel"] = proj_std * jax.random.normal(
        k2, block["attn"]["out_proj"]["kernel"].shape, jnp.float32
    )
    block["mlp"]["c_fc"]["kernel"] = fc_std * jax.random.normal(
        k3, block["mlp"]["c_fc"]["kernel"].shape, jnp.float32
    )
    block["mlp"]["c_proj"]["kernel"] = proj_std * jax.random.normal(
        k4, block["mlp"]["c_proj"]["kernel"].shape, jnp.float32
    )
    return block


def reinit_last_transformer_layer(params: Dict, key) -> Dict:
    """Returns params with the last block of BOTH towers re-drawn."""
    out = dict(params)
    kv, kt = jax.random.split(key)
    for tower, k in (("visual", kv), ("text", kt)):
        if tower not in out:
            continue
        tower_p = dict(out[tower])
        blocks = dict(tower_p["transformer"])
        names = sorted(
            (n for n in blocks if n.startswith("resblocks_")),
            key=lambda n: int(n.split("_")[1]),
        )
        last = names[-1]
        width = blocks[last]["attn"]["in_proj_kernel"].shape[0]
        blocks[last] = _reinit_block(dict(blocks[last]), width, len(names), k)
        tower_p["transformer"] = blocks
        out[tower] = tower_p
    return out
