"""End-to-end training-DYNAMICS parity vs an independent torch trainer.

The tower forwards are oracle-tested (test_full_model_torch_oracle);
this closes the remaining gap: the full COSMOS TRAIN STEP — COSMOS loss
composition, AdamW(0.9, 0.98, eps 1e-6, wd 0.5 with the gain/bias
exemption split), the EMA teacher update from PRE-update student params,
and the logit-scale clamps — must produce the same per-step loss
trajectory as a minimal torch implementation of the reference recipe
(/root/reference/src/training/train.py:186-243 ordering: backward ->
EMA -> optimizer step -> clamp; /root/reference/src/main.py:373-392
param-group split) from identical init and identical synthetic data.

Everything deliberate-deviation is OFF here: exact GELU (no
--gelu-approx), no text bucketing, f32 end to end, XLA attention path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from cosmos_tpu.models.checkpoint import params_to_torch_state_dict
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_mesh, shard_batch

from test_full_model_torch_oracle import (
    TorchText,
    TorchVision,
    _load_tower,
)

TINY = {
    "embed_dim": 32,
    "vision_image_size": 32,
    "vision_patch_size": 8,
    "vision_width": 32,
    "vision_layers": 2,
    "vision_head_width": 16,
    "text_context_length": 12,
    "text_vocab_size": 128,
    "text_width": 32,
    "text_heads": 2,
    "text_layers": 2,
}
N_STEPS = 6
B = 8
LN100 = float(np.log(100.0))


class TorchCrossPooler(nn.Module):
    """AttentionalCrossPooler (reference transformer.py:210-230): LN on q
    and kv, MultiheadAttention with add_zero_attn."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_q = nn.LayerNorm(d)
        self.ln_k = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(
            d, heads, add_zero_attn=True, batch_first=True)

    def forward(self, context, q):
        out, _ = self.attn(self.ln_q(q), self.ln_k(context),
                           self.ln_k(context), need_weights=False)
        return out


class TorchCosmos(nn.Module):
    """Minimal COSMOS model: towers + token mappings + cross poolers +
    both logit scales (reference model.py:240-408)."""

    def __init__(self, cfg=TINY, pooler_heads=8):
        super().__init__()
        d = cfg["embed_dim"]
        self.visual = TorchVision(
            d=cfg["vision_width"], patch=cfg["vision_patch_size"],
            image=cfg["vision_image_size"],
            heads=cfg["vision_width"] // cfg["vision_head_width"],
            layers=cfg["vision_layers"], out=d)
        self.text = TorchText(
            d=cfg["text_width"], vocab=cfg["text_vocab_size"],
            ctx=cfg["text_context_length"], heads=cfg["text_heads"],
            layers=cfg["text_layers"], out=d)
        self.image_token_mapping = nn.Linear(cfg["vision_width"], d)
        self.text_token_mapping = nn.Linear(cfg["text_width"], d)
        self.visual_pool = TorchCrossPooler(d, pooler_heads)
        self.text_pool = TorchCrossPooler(d, pooler_heads)
        self.logit_scale = nn.Parameter(torch.zeros(()))
        self.distill_logit_scale = nn.Parameter(torch.zeros(()))

    def encode_image_all(self, x):
        """(pooled@proj, ln_post tokens) — matches vit.py: tokens are
        post-ln_post, pre-proj, cls dropped."""
        v = self.visual
        x = v.conv1(x).flatten(2).transpose(1, 2)
        cls = v.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], 1) + v.positional_embedding
        x = v.ln_pre(x)
        for b in v.blocks:
            x = b(x)
        x = v.ln_post(x)
        return x[:, 0] @ v.proj, x[:, 1:]

    def encode_text_all(self, text):
        """(pooled@proj, ln_final tokens) — text.py argmax pool keeps all
        tokens."""
        t = self.text
        x = t.token_embedding(text) + t.positional_embedding
        for b in t.blocks:
            x = b(x, attn_mask=t.mask)
        x = t.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(-1)]
        return pooled @ t.text_projection, x

    def forward(self, g_flat, t_flat, l_flat, batch_size):
        """COSMOS student forward, views-major flat inputs (model.py:348-408)."""
        b = batch_size
        gi, g_tok = self.encode_image_all(g_flat)
        li, _ = self.encode_image_all(l_flat)
        img_features = torch.cat([gi, li], 0)            # [(2+n)B, D] unnorm
        img_tokens = self.image_token_mapping(g_tok)     # [2B, N, D]
        txt_features, t_tok = self.encode_text_all(t_flat)
        txt_tokens = self.text_token_mapping(t_tok)      # [kB, L, D]

        img_num = img_features.shape[0] // b
        txt_num = txt_features.shape[0] // b

        def pool(pooler, ctx, queries, v):
            q = queries.reshape(v, b, -1).permute(1, 0, 2)   # [B, V, D]
            out = pooler(ctx, q)                             # [B, V, D]
            return out.permute(1, 0, 2).reshape(v * b, -1)

        txt_pooled = pool(self.text_pool, txt_tokens[:b], img_features,
                          img_num)
        img_cm = F.normalize(img_features + txt_pooled, dim=-1)
        img_pooled = pool(self.visual_pool, img_tokens[:b], txt_features,
                          txt_num)
        txt_cm = F.normalize(txt_features + img_pooled, dim=-1)
        return {
            "image_features": F.normalize(img_features, dim=-1),
            "text_features": F.normalize(txt_features, dim=-1),
            "img_crossmodal_features": img_cm,
            "txt_crossmodal_features": txt_cm,
        }

    @torch.no_grad()
    def teacher_forward(self, g_flat, t2_flat):
        gi, _ = self.encode_image_all(g_flat)
        ti, _ = self.encode_text_all(t2_flat)
        return F.normalize(gi, dim=-1), F.normalize(ti, dim=-1)


def _load_cosmos(tm: TorchCosmos, sd):
    _load_tower(tm.visual, sd, "visual.")
    _load_tower(tm.text, sd, "", text=True)
    own = {
        "image_token_mapping.weight": sd["image_token_mapping.weight"],
        "image_token_mapping.bias": sd["image_token_mapping.bias"],
        "text_token_mapping.weight": sd["text_token_mapping.weight"],
        "text_token_mapping.bias": sd["text_token_mapping.bias"],
        "logit_scale": sd["logit_scale"],
        "distill_logit_scale": sd["distill_logit_scale"],
    }
    for tn, rn in (("visual_pool", "visual.attn_cross_pool"),
                   ("text_pool", "text_attn_cross_pool")):
        for leaf in ("ln_q.weight", "ln_q.bias", "ln_k.weight", "ln_k.bias",
                     "attn.in_proj_weight", "attn.in_proj_bias",
                     "attn.out_proj.weight", "attn.out_proj.bias"):
            own[f"{tn}.{leaf}"] = sd[f"{rn}.{leaf}"]
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)).reshape(
            dict(tm.named_parameters())[k].shape)
         for k, v in own.items()},
        strict=False)


def _clip_loss_views(img_views, txt_views, scale):
    """Reference ClipLoss N x M view loop (loss.py:129-141)."""
    terms = []
    for qi in img_views:
        for tj in txt_views:
            logits = scale * qi @ tj.T
            labels = torch.arange(logits.shape[0])
            terms.append(0.5 * (F.cross_entropy(logits, labels)
                                + F.cross_entropy(logits.T, labels)))
    return torch.stack(terms).mean()


def _views_t(x, v):
    return [x[i * (x.shape[0] // v):(i + 1) * (x.shape[0] // v)]
            for i in range(v)]


def _torch_train(model: TorchCosmos, teacher: TorchCosmos, batches, lrs,
                 *, wd=0.5, momentum=0.999, clip=None, momentum_fn=None):
    """The reference COSMOS trainer loop, minimally (train.py:104-243)."""
    gain_or_bias, rest = [], []
    for n, p in model.named_parameters():
        if p.ndim < 2 or "bn" in n or "ln" in n or "bias" in n \
                or "logit_scale" in n:
            gain_or_bias.append(p)
        else:
            rest.append(p)
    opt = torch.optim.AdamW(
        [{"params": gain_or_bias, "weight_decay": 0.0},
         {"params": rest, "weight_decay": wd}],
        lr=lrs[0], betas=(0.9, 0.98), eps=1e-6)

    losses = []
    for step, batch in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = lrs[step]
        g_img, l_img, txt = batch
        vg, vl, k = g_img.shape[0], l_img.shape[0], txt.shape[0]
        g_flat = g_img.reshape(-1, *g_img.shape[2:]).permute(0, 3, 1, 2)
        l_flat = l_img.reshape(-1, *l_img.shape[2:]).permute(0, 3, 1, 2)
        t_flat = txt.reshape(-1, txt.shape[-1])

        opt.zero_grad()
        out = model(g_flat, t_flat, l_flat, B)
        t_img, t_txt = teacher.teacher_forward(g_flat, t_flat[: 2 * B])

        scale = model.logit_scale.exp()
        dscale = model.distill_logit_scale.exp()
        s_img = _views_t(out["image_features"], vg + vl)
        s_txt = _views_t(out["text_features"], k)
        s_img_cm = _views_t(out["img_crossmodal_features"], vg + vl)
        s_txt_cm = _views_t(out["txt_crossmodal_features"], k)
        ti = _views_t(t_img.detach(), 2)
        tt = _views_t(t_txt.detach(), 2)

        cosmos_loss = (_clip_loss_views(s_img_cm, ti, dscale)
                       + _clip_loss_views(s_img_cm, tt, dscale)
                       + _clip_loss_views(s_txt_cm, ti, dscale)
                       + _clip_loss_views(s_txt_cm, tt, dscale)) / 4.0
        clip_loss = _clip_loss_views(s_img[:2], s_txt, scale)
        total = cosmos_loss + clip_loss
        total.backward()

        # EMA from PRE-update student params (train.py:195-203);
        # per-step teacher momentum when scheduled (main.py:469-470)
        m = momentum if momentum_fn is None else float(momentum_fn(step))
        with torch.no_grad():
            for ps, pt in zip(model.parameters(), teacher.parameters()):
                pt.mul_(m).add_((1.0 - m) * ps)
        if clip is not None:
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()
        # clamp both scales (train.py:237-243)
        with torch.no_grad():
            model.logit_scale.clamp_(0, LN100)
            model.distill_logit_scale.clamp_(0, LN100)
            teacher.logit_scale.clamp_(0, LN100)
            teacher.distill_logit_scale.clamp_(0, LN100)
        losses.append(float(total))
    return losses


def test_cosmos_train_dynamics_match_torch():
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    torch.manual_seed(0)
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY)

    # non-degenerate logit scales: clamping must actually engage
    sd = params_to_torch_state_dict(params)

    tm = TorchCosmos()
    _load_cosmos(tm, sd)
    teacher = TorchCosmos()
    _load_cosmos(teacher, sd)
    for p in teacher.parameters():
        p.requires_grad_(False)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(N_STEPS):
        g = rng.normal(size=(2, B, 32, 32, 3)).astype(np.float32)
        loc = rng.normal(size=(2, B, 32, 32, 3)).astype(np.float32)
        txt = rng.integers(1, 127, size=(3, B, 12)).astype(np.int64)
        batches.append((g, loc, txt))

    lr_fn = cosine_lr(1e-3, 2, 20)
    lrs = [float(lr_fn(s)) for s in range(N_STEPS)]

    torch_losses = _torch_train(
        tm, teacher,
        [(torch.from_numpy(g), torch.from_numpy(l), torch.from_numpy(t))
         for g, l, t in batches],
        lrs)

    mesh = create_mesh(8)
    opt = create_optimizer(lr_fn, beta1=0.9, beta2=0.98, eps=1e-6,
                           weight_decay=0.5)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr_fn,
                          momentum_teacher=0.999, fix_momentum=True)
    step = make_train_step(model, opt, mesh, cfg)
    state = create_train_state(params, opt, mesh)
    jax_losses = []
    for g, loc, txt in batches:
        batch = shard_batch(
            {"global_images": g, "local_images": loc,
             "texts": txt.astype(np.int32)}, mesh, batch_axis=1)
        state, metrics = step(state, batch)
        jax_losses.append(float(metrics["loss"]))

    # loss trajectories agree step by step (tolerance widens as optimizer
    # noise compounds through f32 reassociation differences)
    for s, (tl, jl) in enumerate(zip(torch_losses, jax_losses)):
        assert abs(tl - jl) < 1e-3 * (s + 1), (
            f"step {s}: torch {tl:.6f} vs jax {jl:.6f} "
            f"(full: {torch_losses} vs {jax_losses})")
    # the trajectory moved (training is real, not a frozen fixture)
    assert abs(torch_losses[0] - torch_losses[-1]) > 1e-3

    # end-state params agree too: N optimizer updates + EMA + clamps
    # compound any wd-split/eps/ordering mistake into a visible gap
    got_scale = float(np.asarray(jax.device_get(
        state.params["logit_scale"])))
    np.testing.assert_allclose(got_scale, float(tm.logit_scale), atol=1e-4)
    got_k = np.asarray(jax.device_get(
        state.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    want_k = tm.visual.blocks[0].mlp[0].weight.detach().numpy().T
    np.testing.assert_allclose(got_k, want_k, atol=5e-4)
    got_t = np.asarray(jax.device_get(
        state.teacher_params["visual"]["transformer"]["resblocks_0"]
        ["mlp"]["c_fc"]["kernel"]))
    want_t = teacher.visual.blocks[0].mlp[0].weight.detach().numpy().T
    np.testing.assert_allclose(got_t, want_t, atol=5e-4)


def test_dynamics_with_clipping_and_momentum_schedule():
    """Same oracle with the two remaining step-level knobs engaged:
    --grad-clip-norm (optax clip_by_global_norm vs torch
    clip_grad_norm_, applied to the same pre-optimizer grads) and the
    COSMOS teacher-momentum cosine schedule (--fix-momentum off;
    reference main.py:469-470 cosine_scheduler -> 1.0)."""
    from cosmos_tpu.training.scheduler import cosine_lr, cosine_scheduler
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    torch.manual_seed(0)
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY)
    sd = params_to_torch_state_dict(params)
    tm = TorchCosmos()
    _load_cosmos(tm, sd)
    teacher = TorchCosmos()
    _load_cosmos(teacher, sd)
    for p in teacher.parameters():
        p.requires_grad_(False)

    rng = np.random.default_rng(11)
    batches = []
    for _ in range(4):
        batches.append((
            rng.normal(size=(2, B, 32, 32, 3)).astype(np.float32),
            rng.normal(size=(2, B, 32, 32, 3)).astype(np.float32),
            rng.integers(1, 127, size=(3, B, 12)).astype(np.int64)))

    lr_fn = cosine_lr(2e-3, 1, 16)
    lrs = [float(lr_fn(s)) for s in range(4)]
    mom_fn = cosine_scheduler(0.996, 1.0, 0, 16)
    # clip threshold low enough to ENGAGE (tiny-model grad norms ~O(1))
    clip = 0.05

    torch_losses = _torch_train(
        tm, teacher,
        [(torch.from_numpy(g), torch.from_numpy(l), torch.from_numpy(t))
         for g, l, t in batches],
        lrs, clip=clip, momentum_fn=mom_fn)

    mesh = create_mesh(8)
    opt = create_optimizer(lr_fn, beta1=0.9, beta2=0.98, eps=1e-6,
                           weight_decay=0.5, grad_clip_norm=clip)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr_fn,
                          momentum_schedule=mom_fn, fix_momentum=False)
    step = make_train_step(model, opt, mesh, cfg)
    state = create_train_state(params, opt, mesh)
    jax_losses = []
    for g, loc, txt in batches:
        batch = shard_batch(
            {"global_images": g, "local_images": loc,
             "texts": txt.astype(np.int32)}, mesh, batch_axis=1)
        state, metrics = step(state, batch)
        jax_losses.append(float(metrics["loss"]))

    for s, (tl, jl) in enumerate(zip(torch_losses, jax_losses)):
        assert abs(tl - jl) < 1e-3 * (s + 1), (
            f"step {s}: torch {tl:.6f} vs jax {jl:.6f} "
            f"(full: {torch_losses} vs {jax_losses})")
    # the clip genuinely engaged: re-run torch WITHOUT it and see a
    # different trajectory from step 1 on
    tm2 = TorchCosmos()
    _load_cosmos(tm2, sd)
    teacher2 = TorchCosmos()
    _load_cosmos(teacher2, sd)
    for p in teacher2.parameters():
        p.requires_grad_(False)
    unclipped = _torch_train(
        tm2, teacher2,
        [(torch.from_numpy(g), torch.from_numpy(l), torch.from_numpy(t))
         for g, l, t in batches],
        lrs, momentum_fn=mom_fn)
    assert abs(unclipped[-1] - torch_losses[-1]) > 1e-3
