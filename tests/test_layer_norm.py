"""Fused single-pass LayerNorm kernel (ops/experimental/layer_norm) vs the XLA module.

Reference semantics under test: LayerNorm computed in float32, cast back
to the compute dtype (/root/reference/src/open_clip/transformer.py:15-30),
with the single-pass E[x^2]-E[x]^2 stats the XLA path uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models import layers
from cosmos_tpu.ops.experimental.layer_norm import fused_layer_norm, supported


@pytest.fixture()
def data():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 37, 256)) * 3 + 1, jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    return x, s, b


def test_forward_matches_module(data):
    x, s, b = data
    ref = layers.LayerNorm().apply({"params": {"scale": s, "bias": b}}, x)
    out = fused_layer_norm(x, s, b, 1e-5, True)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=0,
    )


def test_grads_match_module(data):
    x, s, b = data
    ln = layers.LayerNorm()

    def loss_ref(x, s, b):
        y = ln.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_kernel(x, s, b):
        y = fused_layer_norm(x, s, b, 1e-5, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, s, b)
    for name, a, c in zip(("dx", "dscale", "dbias"), gr, gk):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(
            c / scale, a / scale, atol=1e-2, rtol=0, err_msg=name
        )


def test_f32_input_tight_tolerance():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    s = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    ref = layers.LayerNorm().apply({"params": {"scale": s, "bias": b}}, x)
    out = fused_layer_norm(x, s, b, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_supported_gating():
    assert supported(jnp.zeros((4, 37, 256), jnp.bfloat16))
    assert not supported(jnp.zeros((4, 256), jnp.bfloat16))       # 2-D
    assert not supported(jnp.zeros((4, 37, 100), jnp.bfloat16))   # lanes
    assert not supported(jnp.zeros((2, 8192, 768), jnp.bfloat16))  # block too big


def test_hybrid_grads_match_module(data):
    """hybrid_layer_norm: jnp forward + Pallas backward == jnp AD."""
    from cosmos_tpu.ops.experimental.layer_norm import hybrid_layer_norm

    x, s, b = data
    ln = layers.LayerNorm()

    def loss_ref(x, s, b):
        y = ln.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_hybrid(x, s, b):
        y = hybrid_layer_norm(x, s, b, 1e-5, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    # forward is the SAME jnp math — bit-identical, not just close
    np.testing.assert_array_equal(
        np.asarray(loss_ref(x, s, b)), np.asarray(loss_hybrid(x, s, b)))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
    gk = jax.grad(loss_hybrid, argnums=(0, 1, 2))(x, s, b)
    for name, a, c in zip(("dx", "dscale", "dbias"), gr, gk):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(
            c / scale, a / scale, atol=1e-2, rtol=0, err_msg=name
        )


def test_module_dispatch_uses_hybrid(data, monkeypatch):
    """With the hybrid path forced active (interpret), module output and
    grads still match the plain jnp path."""
    x, s, b = data
    params = {"params": {"scale": s, "bias": b}}
    ln = layers.LayerNorm()

    def loss(p, x):
        y = ln.apply(p, x)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    ref_val = loss(params, x)
    ref_grad = jax.grad(loss)(params, x)
    monkeypatch.setattr(layers, "HYBRID_LN", True)
    monkeypatch.setattr(layers, "_hybrid_ln_active",
                        lambda x: x.ndim == 3 and x.shape[-1] % 128 == 0)
    import cosmos_tpu.ops.experimental.layer_norm as fln
    monkeypatch.setattr(fln, "_resolve_interpret", lambda interpret: True)
    np.testing.assert_array_equal(np.asarray(loss(params, x)),
                                  np.asarray(ref_val))
    got_grad = jax.grad(loss)(params, x)
    for key in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(got_grad["params"][key]),
            np.asarray(ref_grad["params"][key]), atol=1e-2, rtol=0)


def test_module_dispatch_uses_kernel(data, monkeypatch):
    """With FUSED_LN forced on (interpret), the module output still matches."""
    x, s, b = data
    params = {"params": {"scale": s, "bias": b}}
    ref = layers.LayerNorm().apply(params, x)
    monkeypatch.setattr(layers, "FUSED_LN", True)
    import cosmos_tpu.ops.experimental.layer_norm as fln
    monkeypatch.setattr(
        fln, "_resolve_interpret", lambda interpret: True
    )
    out = layers.LayerNorm().apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=0,
    )
