"""Native ConvNeXt vision trunk: the non-ViT timm tower family, no timm.

Parity target: the reference's timm adapter accepts any timm trunk
(/root/reference/src/open_clip/timm_model.py:28-90); the OpenCLIP config
family actually shipped on non-ViT trunks is ConvNeXt
(convnext_base_w/large_d/xxlarge).  This module implements the timm
ConvNeXt architecture (stem conv4x4/s4 + LN; 4 stages of
[dwconv7x7 -> LN -> pw 4x MLP -> layer-scale] blocks with LN+conv2x2/s2
downsampling between stages; global-avg-pool + final LN head) natively in
Flax, NHWC end-to-end.

TPU notes: ConvNeXt is a much better fit for the MXU than its CUDA
heritage suggests — the 1x1 "pointwise" MLP convs ARE matmuls over the
flattened spatial axis (flax Dense on NHWC does exactly that), and the
7x7 depthwise conv is a cheap VPU-side op XLA fuses with the surrounding
LN.  NHWC is the native TPU conv layout: no NCHW<->NHWC transposes exist
anywhere in the graph.  Stochastic depth (drop_path) is gated on the
'drop_path' rng collection so eval paths trace dropout-free.

Checkpoints load via ``convert_timm_convnext`` (timm key layout ->
this param tree); see timm_model.py for the tower-level dispatch.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm, gelu

Dtype = Any

# timm model name -> (depths, dims).  The standard (conv_mlp=False)
# family; the atto..nano members use timm's conv_mlp=True block variant
# and are out of scope (no OpenCLIP config uses them).
CONVNEXT_CONFIGS: Dict[str, Dict[str, Any]] = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
    "convnext_xxlarge": dict(depths=(3, 4, 30, 3), dims=(384, 768, 1536, 3072)),
}


def register_convnext(name: str, *, depths: Sequence[int],
                      dims: Sequence[int]) -> None:
    """Register an additional ConvNeXt geometry."""
    CONVNEXT_CONFIGS[name] = dict(depths=tuple(depths), dims=tuple(dims))


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> Dense(4x) -> GELU -> Dense -> gamma, residual.

    timm convnext.py ConvNeXtBlock (conv_mlp=False): the LN+MLP run
    channels-last there via permutes; here the whole network is NHWC so
    the permutes simply don't exist.
    """

    dim: int
    drop_path: float = 0.0
    ls_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="conv_dw",
        )(x)
        h = LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = gelu(h)  # exact erf GELU: timm's default act
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.ls_init),
            (self.dim,), jnp.float32,
        )
        h = h * gamma.astype(h.dtype)
        if self.drop_path > 0.0 and self.has_rng("drop_path"):
            # stochastic depth: drop the whole residual branch per sample
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("drop_path"), keep, (x.shape[0], 1, 1, 1))
            h = h * (mask.astype(h.dtype) / keep)
        return x + h


class ConvNeXt(nn.Module):
    """ConvNeXt trunk; returns ``(pooled [B, dims[-1]], tokens [B, N, dims[-1]])``.

    ``pooled`` matches timm's ``reset_classifier(0, global_pool='avg')``
    trunk output: final-stage features -> global average pool ->
    ``head.norm`` LayerNorm.  ``tokens`` are the flattened final-stage
    feature map (pre-pool, head-norm applied per token so dense use sees
    the same statistics as the pooled path).
    """

    model_name: str
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    remat: bool = False                 # --grad-checkpointing
    remat_policy: str = ""              # named jax.checkpoint policy

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        g = CONVNEXT_CONFIGS[self.model_name]
        depths, dims = g["depths"], g["dims"]
        block_cls = ConvNeXtBlock
        if self.remat:
            # per-block activation checkpointing (timm's
            # set_grad_checkpointing analog; reference main.py:336-338)
            import jax as _jax

            policy = (
                getattr(_jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy else None
            )
            block_cls = nn.remat(ConvNeXtBlock, prevent_cse=False,
                                 policy=policy)
        x = x.astype(self.dtype)
        x = nn.Conv(
            dims[0], (4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        # per-block drop-path rates ramp linearly over the whole depth
        # (timm convnext.py dp_rates)
        total = sum(depths)
        rates = np.linspace(0.0, self.drop_path_rate, total)
        done = 0
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            if s > 0:
                x = LayerNorm(epsilon=1e-6, name=f"down_norm_{s}")(x)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_conv_{s}",
                )(x)
            for b in range(depth):
                x = block_cls(
                    dim=dim, drop_path=float(rates[done + b]),
                    dtype=self.dtype, name=f"stages_{s}_blocks_{b}",
                )(x)
            done += depth
        B, H, Wd, C = x.shape
        tokens = x.reshape(B, H * Wd, C)
        head_norm = LayerNorm(epsilon=1e-6, name="head_norm")
        pooled = head_norm(jnp.mean(tokens, axis=1))
        return pooled, head_norm(tokens)


# --- timm checkpoint conversion ------------------------------------------

from .convert_util import ln_ as _ln, t_ as _t


def _conv(sd, p: str) -> Dict[str, np.ndarray]:
    # torch OIHW (depthwise: [C, 1, kh, kw]) -> flax HWIO
    return {
        "kernel": np.ascontiguousarray(
            np.asarray(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{p}.bias"]),
    }


def infer_timm_convnext_name(sd: Dict[str, Any]) -> str:
    """Match a timm ConvNeXt state dict to a registered geometry."""
    dim0 = int(np.asarray(sd["stem.0.weight"]).shape[0])
    depths = []
    for s in range(4):
        keys = [k for k in sd if k.startswith(f"stages.{s}.blocks.")]
        if not keys:
            break
        depths.append(1 + max(int(k.split(".")[3]) for k in keys))
    depths = tuple(depths)
    for name, g in CONVNEXT_CONFIGS.items():
        if g["dims"][0] == dim0 and g["depths"] == depths:
            return name
    raise KeyError(
        f"no registered ConvNeXt geometry matches dims[0]={dim0} "
        f"depths={depths}; add one via register_convnext"
    )


def convert_timm_convnext(sd: Dict[str, Any], model_name: str) -> Dict[str, Any]:
    """timm ConvNeXt state dict -> ConvNeXt trunk param subtree.

    Mapping (timm convnext.py key layout):
      stem.0 / stem.1                    -> stem_conv / stem_norm
      stages.s.downsample.{0,1} (s>=1)   -> down_norm_s / down_conv_s
      stages.s.blocks.b.conv_dw          -> stages_s_blocks_b/conv_dw
      stages.s.blocks.b.norm|mlp.fc1|mlp.fc2|gamma -> likewise
      head.norm                          -> head_norm
    Classifier (head.fc) keys are ignored.
    """
    g = CONVNEXT_CONFIGS[model_name]
    trunk: Dict[str, Any] = {
        "stem_conv": _conv(sd, "stem.0"),
        "stem_norm": _ln(sd, "stem.1"),
        "head_norm": _ln(sd, "head.norm"),
    }
    for s, depth in enumerate(g["depths"]):
        if s > 0:
            trunk[f"down_norm_{s}"] = _ln(sd, f"stages.{s}.downsample.0")
            trunk[f"down_conv_{s}"] = _conv(sd, f"stages.{s}.downsample.1")
        for b in range(depth):
            p = f"stages.{s}.blocks.{b}"
            trunk[f"stages_{s}_blocks_{b}"] = {
                "conv_dw": _conv(sd, f"{p}.conv_dw"),
                "norm": _ln(sd, f"{p}.norm"),
                "mlp_fc1": {"kernel": _t(sd[f"{p}.mlp.fc1.weight"]),
                            "bias": np.asarray(sd[f"{p}.mlp.fc1.bias"])},
                "mlp_fc2": {"kernel": _t(sd[f"{p}.mlp.fc2.weight"]),
                            "bias": np.asarray(sd[f"{p}.mlp.fc2.bias"])},
                "gamma": np.asarray(sd[f"{p}.gamma"]),
            }
    return jax.tree.map(jnp.asarray, trunk)
