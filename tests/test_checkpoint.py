"""Checkpoint conversion tests: round-trip bijection and torch-oracle
numerics parity for the attention/LayerNorm building blocks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cosmos_tpu.models.checkpoint import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from cosmos_tpu.models.factory import create_model

TINY = {
    "embed_dim": 16,
    "vision_image_size": 16,
    "vision_patch_size": 8,
    "vision_width": 16,
    "vision_layers": 2,
    "vision_head_width": 8,
    "text_context_length": 10,
    "text_vocab_size": 64,
    "text_width": 16,
    "text_heads": 2,
    "text_layers": 2,
}


def test_roundtrip_bijection():
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, **TINY
    )
    sd = params_to_torch_state_dict(params)
    # expected reference key set present
    for key in (
        "visual.conv1.weight",
        "visual.transformer.resblocks.0.attn.in_proj_weight",
        "transformer.resblocks.1.mlp.c_proj.bias",
        "text_projection",
        "logit_scale",
        "distill_logit_scale",
        "image_token_mapping.weight",
        "visual.attn_cross_pool.attn.out_proj.weight",
        "text_attn_cross_pool.ln_k.bias",
    ):
        assert key in sd, key
    # conv layout is torch OIHW
    assert sd["visual.conv1.weight"].shape == (16, 3, 8, 8)
    assert sd["visual.transformer.resblocks.0.attn.in_proj_weight"].shape == (48, 16)

    back = torch_state_dict_to_params(sd, params, strict=True)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=str(pa))


def test_module_prefix_stripped():
    model, params = create_model("ViT-B-16", **TINY)
    sd = params_to_torch_state_dict(params)
    prefixed = {"module." + k: v for k, v in sd.items()}
    back = torch_state_dict_to_params(prefixed, params, strict=True)
    np.testing.assert_allclose(
        np.asarray(back["visual"]["proj"]), np.asarray(params["visual"]["proj"])
    )


def test_attention_matches_torch_mha():
    """Our packed-QKV attention vs torch.nn.MultiheadAttention (self)."""
    from cosmos_tpu.models.attention import MultiheadAttention

    d, h, B, L = 16, 4, 3, 7
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(B, L, d)
    with torch.no_grad():
        ref, _ = mha(x, x, x, need_weights=False)

    m = MultiheadAttention(num_heads=h)
    params = {
        "in_proj_kernel": mha.in_proj_weight.detach().numpy().T,
        "in_proj_bias": mha.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": mha.out_proj.weight.detach().numpy().T,
            "bias": mha.out_proj.bias.detach().numpy(),
        },
    }
    got = m.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_attention_matches_torch_mha_causal_mask():
    from cosmos_tpu.models.attention import MultiheadAttention
    from cosmos_tpu.models.text import causal_mask

    d, h, B, L = 16, 4, 2, 6
    torch.manual_seed(1)
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(B, L, d)
    tmask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref, _ = mha(x, x, x, attn_mask=tmask, need_weights=False)

    m = MultiheadAttention(num_heads=h)
    params = {
        "in_proj_kernel": mha.in_proj_weight.detach().numpy().T,
        "in_proj_bias": mha.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": mha.out_proj.weight.detach().numpy().T,
            "bias": mha.out_proj.bias.detach().numpy(),
        },
    }
    got = m.apply({"params": params}, jnp.asarray(x.numpy()),
                  mask=causal_mask(L))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_cross_attention_with_zero_attn_matches_torch():
    """Cross attention + add_zero_attn vs torch (the COSMOS pooler core)."""
    from cosmos_tpu.models.attention import MultiheadAttention

    d, h, B, Lq, Lk = 16, 4, 2, 1, 5
    torch.manual_seed(2)
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True, add_zero_attn=True)
    q = torch.randn(B, Lq, d)
    kv = torch.randn(B, Lk, d)
    with torch.no_grad():
        ref, _ = mha(q, kv, kv, need_weights=False)

    m = MultiheadAttention(num_heads=h, add_zero_attn=True)
    params = {
        "in_proj_kernel": mha.in_proj_weight.detach().numpy().T,
        "in_proj_bias": mha.in_proj_bias.detach().numpy(),
        "out_proj": {
            "kernel": mha.out_proj.weight.detach().numpy().T,
            "bias": mha.out_proj.bias.detach().numpy(),
        },
    }
    got = m.apply({"params": params}, jnp.asarray(q.numpy()),
                  kv=jnp.asarray(kv.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_layernorm_matches_torch():
    from cosmos_tpu.models.layers import LayerNorm

    torch.manual_seed(3)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.mul_(1.7).add_(0.1)
        ln.bias.add_(0.3)
    x = torch.randn(4, 16)
    ref = ln(x).detach().numpy()
    got = LayerNorm().apply(
        {"params": {"scale": ln.weight.detach().numpy(),
                    "bias": ln.bias.detach().numpy()}},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_gelu_matches_torch():
    from cosmos_tpu.models.layers import gelu, quick_gelu

    x = torch.linspace(-4, 4, 101)
    np.testing.assert_allclose(
        np.asarray(gelu(jnp.asarray(x.numpy()))),
        torch.nn.functional.gelu(x).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x.numpy()))),
        (x * torch.sigmoid(1.702 * x)).numpy(),
        atol=1e-6,
    )


def test_pos_embed_resize_on_mismatch():
    model, params = create_model("ViT-B-16", **TINY)  # 16px, patch 8 -> 4+1
    sd = params_to_torch_state_dict(params)
    # fake a checkpoint trained at 32px (patch 8 -> 16+1 positions)
    sd["visual.positional_embedding"] = np.random.default_rng(0).normal(
        size=(17, 16)
    ).astype(np.float32)
    back = torch_state_dict_to_params(sd, params)
    assert back["visual"]["positional_embedding"].shape == (5, 16)


def test_custom_text_clip_prefix_normalized():
    model, params = create_model("ViT-B-16", **TINY)
    sd = params_to_torch_state_dict(params)
    # re-encode as a CustomTextCLIP-style state dict
    remapped = {}
    for k, v in sd.items():
        if k.split(".")[0] in ("transformer", "token_embedding", "ln_final") \
           or k in ("positional_embedding", "text_projection"):
            remapped["text." + k] = v
        else:
            remapped[k] = v
    back = torch_state_dict_to_params(remapped, params, strict=True)
    np.testing.assert_allclose(
        np.asarray(back["text"]["text_projection_kernel"]),
        np.asarray(params["text"]["text_projection_kernel"]),
    )


def test_resize_text_pos_embed():
    """Context-length mismatch path (reference model.py:696-724): linear
    interpolation with F.interpolate's align_corners=False sampling
    (output i samples source (i+0.5)*src/dst-0.5, edge-clamped — NOT the
    endpoint-pinned linspace this test used to pin), identity when
    lengths match."""
    from cosmos_tpu.models.checkpoint import resize_text_pos_embed

    pe = np.arange(8, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    out = resize_text_pos_embed(pe, 15)
    assert out.shape == (15, 4)
    want = np.clip((np.arange(15) + 0.5) * (8 / 15) - 0.5, 0.0, 7.0)
    np.testing.assert_allclose(out[:, 0], want, rtol=1e-6)
    down = resize_text_pos_embed(pe, 5)
    assert down.shape == (5, 4)
    want = np.clip((np.arange(5) + 0.5) * (8 / 5) - 0.5, 0.0, 7.0)
    np.testing.assert_allclose(down[:, 0], want, rtol=1e-6)
    assert resize_text_pos_embed(pe, 8) is pe


def test_remote_checkpoint_restore_localizes(tmp_path):
    """restore_checkpoint must download remote snapshot dirs instead of
    Path-resolving the URI into a bogus local path (which made remote
    resume a guaranteed FileNotFoundError).  Uses fsspec's memory://
    filesystem as the 'remote'."""
    import fsspec

    from cosmos_tpu.training.checkpoint import _localize

    local = tmp_path / "epoch_3"
    local.mkdir()
    (local / "meta.json").write_text('{"epoch": 3}')
    (local / "blob.bin").write_bytes(b"x" * 16)
    fs = fsspec.filesystem("memory")
    fs.put(str(local), "/ckpts/epoch_3", recursive=True)

    got = _localize("memory://ckpts/epoch_3")
    assert "://" not in got
    import json as _json
    import os as _os
    assert _json.loads(open(_os.path.join(got, "meta.json")).read())["epoch"] == 3
    # local paths pass through untouched
    assert _localize(str(local)) == str(local)


def test_remote_save_rejected(tmp_path):
    """Saving straight to a URI is not the supported flow (save locally +
    --remote-sync); it used to mkdir a literal 'gs:' directory."""
    import pytest as _pytest

    from cosmos_tpu.training.checkpoint import save_checkpoint

    with _pytest.raises(ValueError, match="remote-sync"):
        save_checkpoint({"x": np.zeros(2)}, "gs://bucket/ckpts", 1)


def test_resize_text_pos_embed_matches_torch_interpolate():
    """align_corners=False semantics, exactly as the reference's
    F.interpolate call (model.py:717-722) — the endpoint-pinned linspace
    form differs on every interpolated row."""
    import torch
    import torch.nn.functional as F

    from cosmos_tpu.models.checkpoint import resize_text_pos_embed

    rng = np.random.default_rng(0)
    for src, dst in ((77, 64), (77, 100), (16, 7)):
        pe = rng.normal(size=(src, 8)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(pe).T[None], size=dst,
                            mode="linear", align_corners=False)[0].T.numpy()
        got = resize_text_pos_embed(pe, dst)
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_coca_cls_pad_mask_matches_reference_build_cls_mask():
    """Reference transformer.py:896-903 quirk included: only the CLS
    query row is pad-masked, with key validity shifted by one."""
    import torch
    import torch.nn.functional as F

    from cosmos_tpu.models.text import NEG_INF, coca_cls_pad_mask

    text = np.array([[5, 9, 0, 0], [3, 0, 7, 0]], np.int32)
    t = torch.from_numpy(text)
    cls_mask = (t != 0).unsqueeze(1)
    ref_bool = F.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=True)
    ref = np.where(ref_bool.numpy(), 0.0, NEG_INF)
    got = np.asarray(coca_cls_pad_mask(text, 0))
    np.testing.assert_array_equal(got, ref)


def test_linear_text_projection_loads():
    """proj_bias=True models store text_projection as nn.Linear
    (reference transformer.py:850) — the converter must load both forms."""
    from cosmos_tpu.models.checkpoint import torch_state_dict_to_params
    from cosmos_tpu.models.factory import create_model

    model, params = create_model("ViT-B-16", text_proj_bias=True, **TINY)
    assert "text_projection" in params["text"]      # Dense form
    rng = np.random.default_rng(1)
    w = rng.normal(size=params["text"]["text_projection"]["kernel"].shape[::-1]
                   ).astype(np.float32)
    b = rng.normal(size=params["text"]["text_projection"]["bias"].shape
                   ).astype(np.float32)
    sd = {"text_projection.weight": w, "text_projection.bias": b}
    out = torch_state_dict_to_params(sd, params, strict=False)
    np.testing.assert_allclose(
        np.asarray(out["text"]["text_projection"]["kernel"]), w.T, atol=0)
    np.testing.assert_allclose(
        np.asarray(out["text"]["text_projection"]["bias"]), b, atol=0)


def test_remote_localize_rekeys_on_content_change(tmp_path):
    """A re-written snapshot at the SAME URI must not restore stale
    cached weights: the cache key folds in the remote listing."""
    import fsspec

    from cosmos_tpu.training.checkpoint import _localize

    fs = fsspec.filesystem("memory")
    fs.pipe("/rekey/epoch_1/meta.json", b'{"epoch": 1, "v": "old"}')
    got1 = _localize("memory://rekey/epoch_1")
    assert b"old" in open(got1 + "/meta.json", "rb").read()

    # delete-and-rerun: same URI, different bytes (and size)
    fs.pipe("/rekey/epoch_1/meta.json", b'{"epoch": 1, "v": "newer!"}')
    got2 = _localize("memory://rekey/epoch_1")
    assert got2 != got1
    assert b"newer!" in open(got2 + "/meta.json", "rb").read()
    # the unchanged listing reuses the cache dir (no fresh download)
    assert _localize("memory://rekey/epoch_1") == got2
    # superseded snapshots survive a grace period (a concurrent reader's
    # Orbax restore may still be inside them) ...
    assert os.path.exists(got1)
    # ... and are evicted once out of grace (bounded cache): backdate the
    # stale dir past the 1h window and re-localize
    from pathlib import Path as _P

    old = os.stat(got1).st_mtime - 7200
    os.utime(_P(got1).parent, (old, old))
    assert _localize("memory://rekey/epoch_1") == got2
    assert not os.path.exists(got1)
    # ... while other URIs' entries are untouched
    fs.pipe("/rekey/epoch_2/meta.json", b'{"epoch": 2}')
    got3 = _localize("memory://rekey/epoch_2")
    assert os.path.exists(got2) and os.path.exists(got3)
