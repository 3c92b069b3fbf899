"""Packed-QKV fused attention kernel vs the split-head jnp reference:
forward, gradients, causal masking, and the MultiheadAttention module
routing (fused result == XLA result for the same params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.attention import MultiheadAttention, dot_product_attention
from cosmos_tpu.ops.fused_attention import fused_attention_qkv, supported


def _ref_packed(qkv, heads, causal):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def split(x):
        return x.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    mask = jnp.triu(jnp.full((l, l), -1e30), k=1) if causal else None
    o = dot_product_attention(split(q), split(k), split(v), mask=mask)
    return o.transpose(0, 2, 1, 3).reshape(b, l, d)


@pytest.mark.parametrize("l", [8, 77, 197])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_qkv_matches_reference(l, causal):
    b, heads, dh = 4, 2, 64
    d = heads * dh
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, l, 3 * d))
    got = fused_attention_qkv(qkv, heads, causal, True)
    want = _ref_packed(qkv, heads, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_qkv_grads_match(causal):
    b, heads, dh, l = 2, 2, 64, 37
    d = heads * dh
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, l, 3 * d))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (b, l, d))

    def loss_fused(x):
        return jnp.sum((fused_attention_qkv(x, heads, causal, True) - tgt) ** 2)

    def loss_ref(x):
        return jnp.sum((_ref_packed(x, heads, causal) - tgt) ** 2)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=1e-3, rtol=1e-3
    )


@pytest.mark.parametrize("causal", [False, True])
def test_head_grid_backward_matches(causal, monkeypatch):
    """The (batch, head-group, 3) backward variant == whole-slab backward
    (it lost the on-chip A/B but stays available behind BWD_HEAD_GRID)."""
    import cosmos_tpu.ops.fused_attention as fa

    b, heads, dh, l = 4, 4, 64, 37
    d = heads * dh
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, l, 3 * d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (b, l, d))

    def loss(x):
        return jnp.sum((fused_attention_qkv(x, heads, causal, True) - tgt) ** 2)

    g_slab = jax.grad(loss)(qkv)
    monkeypatch.setattr(fa, "BWD_HEAD_GRID", True)
    g_hg = jax.grad(loss)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_hg), np.asarray(g_slab), atol=1e-5, rtol=1e-5
    )


def test_supported_predicate():
    assert supported(12, 768) and supported(8, 512) and supported(16, 1024)
    assert not supported(5, 768)     # dh not integral
    assert not supported(12, 384)    # dh == 32
    # the sequence-length bound must track the dtype's byte width: an L
    # that fits in bf16 but not f32 (f32 would hit the Mosaic compile
    # cliff the guard exists to prevent)
    assert supported(16, 1024, 577, itemsize=2)
    assert not supported(16, 1024, 577, itemsize=4)
    assert not supported(12, 768, 4096, itemsize=2)  # too long even bf16


@pytest.mark.parametrize("causal", [False, True])
def test_module_fused_equals_xla_path(causal):
    """MultiheadAttention(use_flash=True via interpret) == use_flash=False."""
    b, l, d, heads = 2, 19, 128, 2
    x = jax.random.normal(jax.random.PRNGKey(3), (b, l, d))
    mod_ref = MultiheadAttention(num_heads=heads, use_flash=False)
    params = mod_ref.init(jax.random.PRNGKey(4), x, causal=causal,
                          mask=None if not causal else jnp.triu(
                              jnp.full((l, l), -1e30), k=1))
    mask = jnp.triu(jnp.full((l, l), -1e30), k=1) if causal else None
    want = mod_ref.apply(params, x, mask=mask, causal=causal)

    import cosmos_tpu.ops.fused_attention as fa
    orig = fa._resolve_interpret
    fa._resolve_interpret = lambda i: True   # force interpret on CPU
    try:
        mod_fused = MultiheadAttention(num_heads=heads, use_flash=True)
        got = mod_fused.apply(params, x, mask=mask, causal=causal)
    finally:
        fa._resolve_interpret = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
