"""The jitted COSMOS/CLIP train step.

TPU-native redesign of /root/reference/src/training/train.py:69-243's hot
loop: ONE pure function (state, batch) -> (state, metrics), shard_mapped
over the data mesh and jitted.  Everything the reference does between
host-side Python statements happens fused on device:

  - student forward on all crops + captions, teacher forward on the two
    global crops / captions (train.py:146-160);
  - COSMOS loss with the sharded contrastive gather (loss all-gathers
    features over ICI; gradients flow through the gather);
  - gradient pmean across the mesh (DDP all-reduce equivalent);
  - EMA teacher update k = m*k + (1-m)*q using the PRE-optimizer-step
    student params — the reference updates the teacher between backward
    and optimizer.step() (train.py:195-203 vs :205-231), so EMA sees the
    un-stepped student.  Here that ordering is explicit;
  - AdamW with the gain/bias/LN/logit_scale weight-decay exemption split
    (main.py:373-392) as an optax mask;
  - logit_scale clamp to [0, ln(100)] on BOTH student and teacher,
    including distill_logit_scale (train.py:237-243).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cosmos_tpu.losses import (
    ClipLoss,
    CoCaLoss,
    COSMOSLoss,
    DistillClipLoss,
    SigLipLoss,
)
from cosmos_tpu.parallel.mesh import DATA_AXIS

LN100 = 4.605170185988092  # ln(100), train.py:237


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    teacher_params: Any
    opt_state: Any


def wd_mask(params) -> Any:
    """True where weight decay applies (main.py:373-377: exclude ndim<2,
    LayerNorm/bias params, and logit scales)."""

    def keep(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(names).lower()
        if leaf.ndim < 2:
            return False
        if "ln" in joined or "bias" in joined or "logit_scale" in joined or "bn" in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def frozen_mask(params, lock_image: bool = False, lock_text: bool = False,
                unlocked_groups: int = 0, text_unlocked_layers: int = 0,
                text_freeze_layer_norm: Optional[bool] = None):
    """True where updates must be ZEROED (LiT locking, main.py:321-335).

    ``unlocked_groups`` > 0 keeps the LAST n image-tower groups trainable,
    matching the reference VisionTransformer.lock grouping exactly
    (transformer.py:560-578): group 1 = proj alone, group 2 = last
    resblock + ln_post, groups 3.. = earlier resblocks from the end,
    group n_layers+2 = the stem (conv1 / class_embedding /
    positional_embedding / ln_pre).

    ``text_unlocked_layers`` > 0 keeps the LAST n text resblocks (plus
    ln_final and text_projection) trainable — the reference's
    --lock-text-unlocked-layers semantics, which its HF towers implement
    (hf_model.py:171-186) but its native TextTransformer.lock silently
    ignores (transformer.py:881-883); here both tower kinds honor it.
    HF towers follow the reference module list exactly: the frozen set is
    ``[embeddings, *encoder.layer][:-n]``; the HF pooler and the CLIP
    projection head are never frozen (reference lock only walks
    ``self.transformer``).  ``text_freeze_layer_norm`` is TRI-STATE:
    ``None`` (default) reproduces the reference's per-tower behavior —
    native towers freeze their LayerNorms (TextTransformer.lock ignores
    the flag and freezes everything, transformer.py:881-883) while HF
    towers leave them trainable (hf_model.py:174 with the CLI's False
    default, params.py:447-450); an explicit True/False (the
    --[no-]lock-text-freeze-layer-norm CLI spellings) forces that
    behavior for either tower kind.  The
    reference's freeze-BN/LN *running stats* halves of these flags are
    no-ops by construction in JAX: LayerNorm has no running stats and
    frozen-BN batch_stats never update unless passed as mutable
    (PARITY.md)."""
    unlocked_layers = set()
    proj_unlocked = False
    lnpost_unlocked = False
    stem_unlocked = False
    if lock_image and unlocked_groups > 0:
        n_layers = len([
            k for k in params.get("visual", {}).get("transformer", {})
            if k.startswith("resblocks_")
        ])
        if n_layers == 0:
            # reference ModifiedResNet.lock has no group support either
            # (transformer lock path only) — fail instead of silently
            # unlocking nothing
            raise ValueError(
                "--lock-image-unlocked-groups needs a ViT image tower "
                "(per-group unlocking is undefined for this tower)"
            )
        if unlocked_groups > n_layers + 2:
            raise ValueError(
                f"--lock-image-unlocked-groups {unlocked_groups} exceeds the "
                f"{n_layers + 2} lock groups of this tower"
            )
        proj_unlocked = True                       # group 1: proj
        if unlocked_groups >= 2:                   # group 2: last block + ln_post
            lnpost_unlocked = True
        if unlocked_groups >= n_layers + 2:        # final group: the stem
            stem_unlocked = True
        for i in range(max(0, unlocked_groups - 1)):
            if i < n_layers:
                unlocked_layers.add(f"resblocks_{n_layers - 1 - i}")

    text_unlocked = set()
    if lock_text and text_unlocked_layers > 0:
        n_text = len([
            k for k in params.get("text", {}).get("transformer", {})
            if k.startswith("resblocks_")
        ])
        for i in range(min(text_unlocked_layers, n_text)):
            text_unlocked.add(f"resblocks_{n_text - 1 - i}")

    # HF text tower (params['text']['hf'] with transformers param names):
    # reference hf_model.py:172-186 freezes [embeddings, *encoder.layer]
    # [:-unlocked_layers] (everything when unlocked_layers == 0), keeps
    # LayerNorm params trainable when freeze_layer_norm is False, and
    # never walks the pooler or the projection head.
    hf_frozen_layers: Optional[set] = None   # None = not an HF tower
    hf_freeze_embeddings = False
    if lock_text and "hf" in params.get("text", {}):
        hf = params["text"]["hf"]
        layer_container = hf.get("encoder", {}).get("layer", None)
        if layer_container is None:
            raise NotImplementedError(
                "--lock-text on an HF text tower needs the standard "
                "encoder.layer module layout (bert/roberta-family); this "
                "checkpoint's layout is not recognized"
            )
        n_hf = len(layer_container)
        modules = ["embeddings"] + [str(i) for i in range(n_hf)]
        frozen = modules[:-text_unlocked_layers] if text_unlocked_layers \
            else modules
        hf_freeze_embeddings = "embeddings" in frozen
        hf_frozen_layers = {m for m in frozen if m != "embeddings"}

    _STEM = ("conv1_kernel", "conv1_bias", "class_embedding",
             "positional_embedding", "ln_pre")

    def mark(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        top = names[0] if names else ""
        if lock_image and top == "visual":
            if proj_unlocked and "proj" in names:
                return False
            if lnpost_unlocked and "ln_post" in names:
                return False
            if stem_unlocked and any(n in _STEM for n in names):
                return False
            if any(n in unlocked_layers for n in names):
                return False
            return True
        if lock_text and top == "text" and hf_frozen_layers is not None:
            # ['text','hf','encoder','layer','5',...] / ['text','hf',
            # 'embeddings',...] / ['text','hf','pooler',...] / ['text',
            # 'proj',...]; pooler and projection head are never frozen
            if len(names) < 2 or names[1] != "hf":
                return False
            frozen = False
            if "embeddings" in names:
                frozen = hf_freeze_embeddings
            elif "layer" in names:
                li = names.index("layer")
                frozen = (li + 1 < len(names)
                          and names[li + 1] in hf_frozen_layers)
            hf_fln = (False if text_freeze_layer_norm is None
                      else text_freeze_layer_norm)
            if frozen and not hf_fln and any(
                n == "LayerNorm" for n in names
            ):
                return False
            return frozen
        if lock_text and top == "text":
            if text_unlocked_layers > 0:
                if any(n in text_unlocked for n in names):
                    return False
                if any(
                    n == "ln_final" or n.startswith("text_projection")
                    for n in names
                ):
                    return False
            native_fln = (True if text_freeze_layer_norm is None
                          else text_freeze_layer_norm)
            if not native_fln and any(
                n.startswith("ln_") for n in names
            ):
                return False
            return True
        return False

    return jax.tree_util.tree_map_with_path(mark, params)


def create_optimizer(
    lr_schedule: Callable,
    *,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    lock_image: bool = False,
    lock_text: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text_unlocked_layers: int = 0,
    lock_text_freeze_layer_norm: Optional[bool] = None,
) -> optax.GradientTransformation:
    txs = []
    if lock_image or lock_text:
        # zero frozen grads BEFORE clipping: the reference's locked params
        # have requires_grad=False, so clip_grad_norm_ never sees them —
        # clipping against ||g_frozen + g_trainable|| would throttle the
        # trainable tower by the (large) frozen tower's gradient norm
        txs.append(
            optax.masked(
                optax.set_to_zero(),
                lambda params: frozen_mask(
                    params, lock_image, lock_text,
                    lock_image_unlocked_groups,
                    lock_text_unlocked_layers,
                    lock_text_freeze_layer_norm,
                ),
            )
        )
    if grad_clip_norm is not None:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    txs.append(
        optax.adamw(
            learning_rate=lr_schedule,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mask=wd_mask,
        )
    )
    if lock_image or lock_text:
        # ...and zero frozen UPDATES after adamw: with zero grads adamw's
        # grad-based term is zero but its decoupled weight decay would
        # still shrink the locked weights every step
        txs.append(
            optax.masked(
                optax.set_to_zero(),
                lambda params: frozen_mask(
                    params, lock_image, lock_text,
                    lock_image_unlocked_groups,
                    lock_text_unlocked_layers,
                    lock_text_freeze_layer_norm,
                ),
            )
        )
    return optax.chain(*txs)


def create_train_state(params, optimizer, mesh: Optional[Mesh] = None) -> TrainState:
    """Student + EMA teacher (initialized as a copy — main.py:280) + opt.

    Pass ``mesh`` to commit the state replicated onto it up front: the
    step's FIRST call then compiles with the steady-state input shardings.
    Without it, jit compiles once for the uncommitted host arrays and a
    SECOND time (with donation aliasing — measured ~10 min for the
    ViT-B-16 COSMOS step on v5e) when the first call's sharded outputs
    feed call two."""
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        teacher_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding

        state = jax.device_put(state, NamedSharding(mesh, P()))
    return state


def _clamp_logit_scales(params):
    params = dict(params)
    for key in ("logit_scale", "distill_logit_scale"):
        if key in params:
            params[key] = jnp.clip(params[key], 0.0, LN100)
    return params


def _views(x: jax.Array, v: int) -> jax.Array:
    """[V*B, D] views-major -> [V, B, D]."""
    return x.reshape(v, x.shape[0] // v, *x.shape[1:])


@dataclasses.dataclass
class TrainStepConfig:
    cosmos: bool = True
    siglip: bool = False
    # model distillation from a SECOND frozen CLIP (reference
    # --distill-model/--distill-pretrained, main.py:232-240, train.py:75-76,
    # loss.py:256-292).  The step then takes (state, batch, dist_params).
    distill: bool = False
    # CoCa captioning: contrastive + teacher-forced caption CE through the
    # generic loss(**model_out) path (reference train.py:162-190,
    # factory.py:372-397)
    coca: bool = False
    coca_caption_loss_weight: float = 2.0
    coca_contrastive_loss_weight: float = 1.0
    coca_pad_id: int = 0
    local_loss: bool = False
    gather_with_grad: bool = True
    # multislice contrastive-gather scope (losses/contrastive.py):
    # 'global' = hierarchical ICI-then-DCN gather, loss identical to the
    # flat single-axis form; 'slice' = negatives stay within each slice
    # (zero DCN traffic in the loss).  Ignored on 1-D meshes.
    gather_scope: str = "global"
    momentum_schedule: Optional[Callable] = None   # step -> momentum
    fix_momentum: bool = True
    momentum_teacher: float = 0.999
    lr_schedule: Optional[Callable] = None          # for metric reporting
    input_dtype: Any = jnp.float32
    # gradient accumulation: micro-batches arrive stacked on a leading
    # axis.  Plain CLIP uses the OpenCLIP-exact cached-features algorithm
    # (accum == big-batch gradients exactly); cosmos/siglip average
    # per-microbatch grads instead (the reference asserts accum_freq==1 in
    # its COSMOS path, train.py:143 — per-microbatch denominators is the
    # documented divergence)
    accum_freq: int = 1
    # on-device normalization for uint8 batches (loader ships uint8 crops;
    # the (x/255 - mean)/std runs fused on the TPU, 4x less H2D traffic)
    image_mean: Tuple[float, ...] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, ...] = (0.26862954, 0.26130258, 0.27577711)
    # LiT locking: pytree of python bools (True = frozen leaf), computed
    # by frozen_mask in main.py.  Zeroing the frozen grads INSIDE the step
    # keeps the grad_norm metric and clip_by_global_norm on the trainable
    # subset only (reference: requires_grad=False params simply have no
    # grads) and lets XLA dead-code-eliminate the frozen towers' dW work.
    frozen: Optional[Any] = None
    # base seed for in-step randomness (patch dropout).  Mirrors the
    # reference's seed + rank dropout keying (main.py:46-49): the mask
    # stream is PRNGKey(seed) folded with a domain tag, the step, the
    # device index and the microbatch — different --seed values draw
    # different masks, same seed reproduces the run exactly.
    seed: int = 0
    # per-step grad-norm metric.  OFF by default: the global_norm is a
    # second full read of every gradient leaf plus a scalar reduce baked
    # into each update fusion — measured 218.8 -> 231.8 img/s/chip on v5e
    # when dropped.  The reference computes the norm only when clipping
    # (train.py:210-229 under args.grad_clip_norm); main.py turns this on
    # when clipping is active (XLA CSEs it against clip_by_global_norm's
    # identical reduction, so it is then ~free) or on --log-grad-norm.
    log_grad_norm: bool = False


def _build_step(model, optimizer, cfg: TrainStepConfig, dist_model,
                axis_name: Optional[str],
                slice_axis: Optional[str] = None):
    """Shared step builder: the pure (state, batch[, dist_params]) ->
    (state, metrics) function.  ``axis_name=DATA_AXIS`` is the shard_map
    per-device form (losses gather features over the named axis,
    grads/metrics pmean); ``axis_name=None`` is the GLOBAL form for the
    GSPMD 2-D-mesh step — the loss sees the whole batch and XLA derives
    every collective from the operand shardings."""
    if sum((cfg.cosmos, cfg.siglip, cfg.distill, cfg.coca)) > 1:
        raise ValueError(
            "cosmos / siglip / distill / coca train modes are exclusive"
        )
    if cfg.distill and dist_model is None:
        raise ValueError("cfg.distill needs the frozen dist_model module")
    if cfg.accum_freq > 1 and (cfg.distill or cfg.coca):
        # reference asserts accum_freq == 1 for distillation (main.py:236);
        # CoCa accumulation would need the caption-CE denominators split
        raise ValueError("accum_freq > 1 unsupported with distill/coca")
    if slice_axis is not None and cfg.siglip:
        # the ppermute negatives ring is a 1-D-axis concept; on
        # multislice the ring would need a hierarchical rewrite — refuse
        # rather than silently ring across DCN every hop
        raise ValueError("siglip is unsupported on a multislice "
                         "('slice','data') mesh")
    if cfg.cosmos:
        loss_obj = COSMOSLoss(
            local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
            axis_name=axis_name,
            slice_axis=slice_axis,
            gather_scope=cfg.gather_scope,
        )
    elif cfg.siglip:
        # pairwise sigmoid loss with the ppermute negatives ring
        loss_obj = SigLipLoss(axis_name=axis_name)
    elif cfg.distill:
        loss_obj = DistillClipLoss(
            local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
            axis_name=axis_name,
            slice_axis=slice_axis,
            gather_scope=cfg.gather_scope,
        )
    elif cfg.coca:
        loss_obj = CoCaLoss(
            caption_loss_weight=cfg.coca_caption_loss_weight,
            clip_loss_weight=cfg.coca_contrastive_loss_weight,
            pad_id=cfg.coca_pad_id,
            local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
            axis_name=axis_name,
            slice_axis=slice_axis,
            gather_scope=cfg.gather_scope,
        )
    else:
        loss_obj = ClipLoss(
            local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
            axis_name=axis_name,
            slice_axis=slice_axis,
            gather_scope=cfg.gather_scope,
        )

    mean = jnp.asarray(cfg.image_mean, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(cfg.image_std, jnp.float32) * 255.0)

    def _prep_images(x):
        """uint8 [.., H, W, 3] -> normalized compute-dtype; f32 passthrough."""
        if x.dtype == jnp.uint8:
            return ((x.astype(jnp.float32) - mean) * inv_std).astype(cfg.input_dtype)
        return x.astype(cfg.input_dtype)

    # --force-patch-dropout: the vision tower pulls a 'patch_drop' rng
    # collection (vit.py) — the STUDENT forwards supply it per step; the
    # teacher/distill forwards and every eval path trace dropout-free
    # (reference PatchDropout is identity in eval, transformer.py:57)
    patch_drop_active = (
        getattr(getattr(model, "cfg", None), "vision_cfg", None) is not None
        and getattr(model.cfg.vision_cfg, "patch_dropout", 0.0) > 0.0
    )

    def _student_rngs(step, micro_idx=None):
        if not patch_drop_active or step is None:
            return {}
        # 17 is a domain tag separating the patch-drop stream from other
        # PRNGKey(seed) consumers (init, last-layer re-init)
        r = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 17)
        r = jax.random.fold_in(r, step)
        if axis_name is not None:   # per-device streams under shard_map
            r = jax.random.fold_in(r, jax.lax.axis_index(axis_name))
            if slice_axis is not None:
                r = jax.random.fold_in(r, jax.lax.axis_index(slice_axis))
        if micro_idx is not None:   # per-microbatch streams under accum
            r = jax.random.fold_in(r, micro_idx)
        return {"rngs": {"patch_drop": r}}

    def _loss_fn(params, teacher_params, batch, step, dist_params=None):
        g = batch["global_images"]          # [2, B, H, W, 3]
        vg, b = g.shape[0], g.shape[1]
        g_flat = _prep_images(g.reshape((vg * b,) + g.shape[2:]))
        l = batch.get("local_images")
        l_flat = None
        vl = 0
        if l is not None:
            vl = l.shape[0]
            l_flat = _prep_images(l.reshape((vl * b,) + l.shape[2:]))
        t = batch["texts"]                  # [k, B, L]
        k = t.shape[0]
        t_flat = t.reshape(k * b, t.shape[2])

        if cfg.cosmos:
            # the teacher distills against TWO global caption views; with
            # k < 2 the t_flat[: 2*b] slice would silently pair unrelated
            # samples (the reference hard-asserts len(t_text_features)==2,
            # loss.py:189).  k is static at trace time, so this is free.
            if k < 2:
                raise ValueError(
                    f"COSMOS training needs >=2 caption views, got k={k}; "
                    "use --caption-sampling-mode textcrop/random with "
                    "--num-sampled-captions >= 2"
                )
            s_out = model.apply(
                {"params": params}, g_flat, t_flat, l_flat, batch_size=b,
                **_student_rngs(step),
            )
            # teacher: 2 global crops + first 2 caption views, stop-grad
            t_out = model.apply(
                {"params": teacher_params}, g_flat, t_flat[: 2 * b]
            )
            losses = loss_obj(
                s_image_features=_views(s_out["image_features"], vg + vl),
                s_text_features=_views(s_out["text_features"], k),
                logit_scale=s_out["logit_scale"],
                t_image_features=_views(t_out["image_features"], 2),
                t_text_features=_views(t_out["text_features"], 2),
                distill_logit_scale=s_out.get("distill_logit_scale"),
                s_img_crossmodal_features=_views(
                    s_out["img_crossmodal_features"], vg + vl
                ),
                s_txt_crossmodal_features=_views(
                    s_out["txt_crossmodal_features"], k
                ),
                output_dict=True,
            )
        elif cfg.siglip:
            s_out = model.apply({"params": params}, g_flat, t_flat, l_flat,
                                **_student_rngs(step))
            losses = loss_obj(
                _views(s_out["image_features"], vg + vl)[0],
                _views(s_out["text_features"], k)[0],
                s_out["logit_scale"],
                s_out.get("logit_bias"),
                output_dict=True,
            )
        elif cfg.coca:
            # CoCa trains on single-view batches (crop 0 / caption 0): the
            # decoder CE is per-caption and the reference CoCa recipe uses
            # plain (non-multicrop) transforms (coca_model.py:157-191)
            s_out = model.apply(
                {"params": params}, g_flat[:b], t[0], output_labels=True,
                **_student_rngs(step),
            )
            losses = loss_obj(
                s_out["image_features"],
                s_out["text_features"],
                s_out["logits"],
                s_out["labels"],
                s_out["logit_scale"],
                output_dict=True,
            )
        elif cfg.distill:
            # frozen distillation teacher forward on the same views
            # (reference train.py:148-166); stop_gradient inside the loss
            s_out = model.apply({"params": params}, g_flat, t_flat, l_flat,
                                **_student_rngs(step))
            d_out = dist_model.apply(
                {"params": dist_params}, g_flat, t_flat, l_flat
            )
            losses = loss_obj(
                _views(s_out["image_features"], vg + vl),
                _views(s_out["text_features"], k),
                s_out["logit_scale"],
                _views(d_out["image_features"], vg + vl),
                _views(d_out["text_features"], k),
                d_out["logit_scale"],
                output_dict=True,
            )
        else:
            s_out = model.apply({"params": params}, g_flat, t_flat, l_flat,
                                **_student_rngs(step))
            losses = loss_obj(
                _views(s_out["image_features"], vg + vl),
                _views(s_out["text_features"], k),
                s_out["logit_scale"],
                output_dict=True,
            )
        total = sum(losses.values())
        losses = dict(losses)
        losses["logit_scale"] = s_out["logit_scale"]
        return total, losses

    def _fwd_features(params, mb, step=None, micro_idx=None):
        """Normalized (image_views, text_views, logit_scale) for one
        microbatch — the eval-style forward (no cosmos heads).

        (step, micro_idx) key the patch-dropout rng; the cache pass and
        the gradient pass of _accum_exact use the SAME key per microbatch
        so the cached features equal the re-forwarded ones and the
        accum == big-batch gradient identity survives dropout."""
        g = mb["global_images"]
        vg, b = g.shape[0], g.shape[1]
        g_flat = _prep_images(g.reshape((vg * b,) + g.shape[2:]))
        l = mb.get("local_images")
        l_flat = None
        vl = 0
        if l is not None:
            vl = l.shape[0]
            l_flat = _prep_images(l.reshape((vl * b,) + l.shape[2:]))
        t = mb["texts"]
        k = t.shape[0]
        t_flat = t.reshape(k * b, t.shape[2])
        s_out = model.apply({"params": params}, g_flat, t_flat, l_flat,
                            **_student_rngs(step, micro_idx))
        return (
            _views(s_out["image_features"], vg + vl),
            _views(s_out["text_features"], k),
            s_out["logit_scale"],
        )

    def _accum_exact(state: TrainState, batch):
        """OpenCLIP-exact gradient accumulation for the contrastive loss
        (upstream open_clip train.py accum branch, which the reference
        inherits): pass 1 caches no-grad features for every microbatch;
        pass 2 re-forwards each microbatch and computes the loss against
        the FULL batch of negatives, so sum-of-grads == big-batch grad
        exactly (each pass's gradient flows only through its own slice).
        logit_scale sees the full loss every pass, so its grad (alone)
        averages over passes instead of summing."""
        A = cfg.accum_freq

        def cache_one(_, inp):
            m, mb = inp
            img, txt, _scale = _fwd_features(state.params, mb, state.step, m)
            return None, (img, txt)

        _, (imgs, txts) = jax.lax.scan(
            cache_one, None, (jnp.arange(A), batch)
        )
        # [A, V, B, D] -> [V, A*B, D]
        a_, v_, b_, d_ = imgs.shape
        k_ = txts.shape[1]
        img_cache = imgs.transpose(1, 0, 2, 3).reshape(v_, a_ * b_, d_)
        txt_cache = txts.transpose(1, 0, 2, 3).reshape(k_, a_ * b_, d_)

        def micro(carry, inp):
            grads_s, _ = carry
            m, mb = inp

            def loss_fn(params):
                img_m, txt_m, scale = _fwd_features(params, mb,
                                                    state.step, m)
                img_full = jax.lax.dynamic_update_slice(
                    img_cache, img_m, (0, m * b_, 0)
                )
                txt_full = jax.lax.dynamic_update_slice(
                    txt_cache, txt_m, (0, m * b_, 0)
                )
                losses = loss_obj(img_full, txt_full, scale, output_dict=True)
                total = sum(losses.values())
                aux = dict(losses)
                aux["logit_scale"] = scale
                return total, aux

            (t, a), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return (jax.tree.map(jnp.add, grads_s, g), (t, a)), None

        zero_aux = {"contrastive_loss": jnp.zeros(()),
                    "logit_scale": jnp.zeros(())}
        init = (
            jax.tree.map(jnp.zeros_like, state.params),
            (jnp.zeros(()), zero_aux),
        )
        (grads, (total, aux)), _ = jax.lax.scan(
            micro, init, (jnp.arange(A), batch)
        )

        def _fix(path, gleaf):
            names = [p.key for p in path if hasattr(p, "key")]
            if any("logit_scale" in n or "logit_bias" in n for n in names):
                return gleaf / A
            return gleaf

        grads = jax.tree_util.tree_map_with_path(_fix, grads)
        return total, aux, grads

    def _step(
        state: TrainState, batch, dist_params=None
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if cfg.accum_freq > 1 and not cfg.cosmos and not cfg.siglip:
            total, aux, grads = _accum_exact(state, batch)
        elif cfg.accum_freq > 1:
            # batch leaves are [A, V, B_local, ...]
            def micro(carry, mb):
                tot_s, aux_s, grads_s = carry
                (t, a), g = jax.value_and_grad(_loss_fn, has_aux=True)(
                    state.params, state.teacher_params, mb, state.step
                )
                return (
                    tot_s + t,
                    jax.tree.map(jnp.add, aux_s, a),
                    jax.tree.map(jnp.add, grads_s, g),
                ), None

            zero_aux = {
                "clip_loss" if cfg.cosmos else "contrastive_loss": 0.0,
                **({"distill_loss": 0.0, "logit_scale": 0.0} if cfg.cosmos
                   else {"logit_scale": 0.0}),
            }
            zero_aux = {k: jnp.zeros(()) for k in zero_aux}
            init = (
                jnp.zeros(()),
                zero_aux,
                jax.tree.map(jnp.zeros_like, state.params),
            )
            (total, aux, grads), _ = jax.lax.scan(micro, init, batch)
            inv = 1.0 / cfg.accum_freq
            total = total * inv
            aux = jax.tree.map(lambda x: x * inv, aux)
            grads = jax.tree.map(lambda x: x * inv, grads)
        else:
            (total, aux), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                state.params, state.teacher_params, batch, state.step,
                dist_params,
            )
        if cfg.frozen is not None:
            grads = jax.tree.map(
                lambda f, gl: jnp.zeros_like(gl) if f else gl,
                cfg.frozen, grads,
            )
        if axis_name is not None:
            # shard_map per-device form: average across the data axis —
            # and the slice axis on a multislice mesh (data parallelism
            # spans slices whatever the gather scope; this is the one
            # unavoidable DCN collective, and it is bandwidth-friendly:
            # one reduce per step of grad-sized payload).
            # (GSPMD form: the loss already saw the global batch; XLA
            # derives every cross-device reduction from the shardings.)
            red_axes = (axis_name,) if slice_axis is None \
                else (slice_axis, axis_name)
            grads = jax.lax.pmean(grads, red_axes)
            total = jax.lax.pmean(total, red_axes)
            aux = {k: jax.lax.pmean(v, red_axes)
                   for k, v in aux.items()}

        # EMA with PRE-update student params (reference ordering).
        if cfg.fix_momentum or cfg.momentum_schedule is None:
            momentum = jnp.asarray(cfg.momentum_teacher, jnp.float32)
        else:
            momentum = cfg.momentum_schedule(state.step)
        # one fused sub-mul-add per leaf: hoisting (1-m) out of the
        # tree_map and using the k + (1-m)(q-k) form collapsed the EMA
        # from ~970 device ops to ~320 (trace-measured bucket 13ms)
        one_minus_m = 1.0 - momentum
        new_teacher = jax.tree.map(
            lambda kp, qp: kp + one_minus_m * (qp - kp),
            state.teacher_params,
            state.params,
        )

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        new_params = _clamp_logit_scales(new_params)
        new_teacher = _clamp_logit_scales(new_teacher)

        metrics = {
            "loss": total,
            "momentum": momentum,
            **aux,
        }
        if cfg.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        if cfg.lr_schedule is not None:
            metrics["lr"] = cfg.lr_schedule(state.step)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            teacher_params=new_teacher,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return _step


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepConfig,
    dist_model=None,
):
    """Returns jitted (state, batch) -> (state, metrics) — or, with
    ``cfg.distill``, (state, batch, dist_params) -> (state, metrics) where
    ``dist_params`` is the frozen distillation teacher's param pytree
    (kept OUT of TrainState: it is never updated, checkpointed, or donated).

    Batch layout (views-leading, batch axis sharded over the mesh):
      global_images [2, B, H, W, 3]
      local_images  [n, B, h, w, 3]   (optional)
      texts         [k, B, L] int32
    """
    from cosmos_tpu.parallel.mesh import SLICE_AXIS, data_axes

    slice_axis = SLICE_AXIS if SLICE_AXIS in mesh.shape else None
    _step = _build_step(model, optimizer, cfg, dist_model, DATA_AXIS,
                        slice_axis)

    axes = data_axes(mesh)   # ('slice','data') on a multislice mesh
    batch_axis = 2 if cfg.accum_freq > 1 else 1
    batch_spec = (
        P(None, None, axes) if cfg.accum_freq > 1 else P(None, axes)
    )  # prefix spec: the batch axis of every leaf
    if cfg.distill:
        sharded_step = shard_map(
            _step,
            mesh=mesh,
            in_specs=(P(), batch_spec, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded_step, donate_argnums=(0,))
    sharded_step = shard_map(
        lambda state, batch: _step(state, batch),
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded_step, donate_argnums=(0,))


def make_train_step_gspmd(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: TrainStepConfig,
    dist_model=None,
):
    """Tensor-parallel TRAINING: the step jitted over a 2-D (data, model)
    mesh with GSPMD.

    Beyond the reference (DP is its only scaling axis, SURVEY §2.3): for
    models too large to replicate per chip, weights are placed
    Megatron-style (parallel/tp.py column/row-parallel specs), the batch
    shards over 'data', and — with no shard_map and therefore no named
    axes — the loss computes over the GLOBAL batch while XLA's SPMD
    partitioner derives every collective from the operand shardings.
    Gradients, Adam moments and the EMA teacher all inherit the weight
    shardings, so the optimizer update runs tensor-parallel too.

    Constraints (validated): cfg.local_loss and the SigLIP ppermute ring
    are per-device concepts that need the 1-D shard_map step;
    accum_freq must be 1.  The Pallas attention kernel is fine under a
    real model axis: its custom_partitioning wrapper keeps the batch
    sharding and re-gathers the feature columns (parallel/tp.py notes).
    Pair with create_train_state_gspmd and parallel.mesh.shard_batch
    over the same mesh.
    """
    if cfg.siglip:
        raise ValueError(
            "siglip's ppermute ring needs the 1-D shard_map step")
    if cfg.local_loss:
        raise ValueError(
            "local_loss is a per-device concept; the GSPMD step computes "
            "global logits — leave it False")
    if cfg.accum_freq > 1:
        raise ValueError("accum_freq > 1 unsupported in the GSPMD step")

    _step = _build_step(model, optimizer, cfg, dist_model, None)
    if cfg.distill:
        return jax.jit(_step, donate_argnums=(0,))
    return jax.jit(lambda state, batch: _step(state, batch),
                   donate_argnums=(0,))


def create_train_state_gspmd(params, optimizer, mesh: Mesh) -> TrainState:
    """TrainState for the GSPMD step: student and EMA teacher placed
    tensor-parallel over the 2-D mesh (parallel/tp.py specs); the Adam
    moments inherit those shardings through optax's zeros_like init."""
    from jax.sharding import NamedSharding

    from cosmos_tpu.parallel.tp import shard_params_tp

    p = shard_params_tp(params, mesh)
    teacher = shard_params_tp(jax.tree.map(jnp.copy, params), mesh)
    return TrainState(
        step=jax.device_put(
            jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        params=p,
        teacher_params=teacher,
        opt_state=optimizer.init(p),
    )


def create_train_state_fsdp(params, optimizer, mesh: Mesh,
                            min_size: int = None) -> TrainState:
    """TrainState for the GSPMD step with FSDP/ZeRO placement
    (parallel/fsdp.py): params, grads, Adam moments AND the EMA teacher
    shard over the data axis — per-chip stateful memory drops ~Nx on an
    N-way mesh.  Pair with make_train_step_gspmd (the step is placement-
    agnostic; XLA derives the ZeRO all-gather/reduce-scatter pattern
    from these shardings)."""
    from jax.sharding import NamedSharding

    from cosmos_tpu.parallel.fsdp import FSDP_MIN_SIZE, shard_params_fsdp

    if min_size is None:
        min_size = FSDP_MIN_SIZE
    p = shard_params_fsdp(params, mesh, min_size)
    teacher = shard_params_fsdp(jax.tree.map(jnp.copy, params), mesh,
                                min_size)
    return TrainState(
        step=jax.device_put(
            jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        params=p,
        teacher_params=teacher,
        opt_state=optimizer.init(p),
    )
