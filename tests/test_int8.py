"""Int8 quantized matmul: numerics vs f32 reference."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_tpu.ops.int8 import (
    int8_matmul,
    quantize_dense_params,
    quantize_weight,
)


def test_int8_matmul_close_to_f32():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 256))
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128)) * 0.02
    ref = x @ w
    q, s = quantize_weight(w)
    got = int8_matmul(x, q, s)
    rel = np.abs(np.asarray(got - ref)) / (np.abs(np.asarray(ref)) + 1e-3)
    assert np.median(rel) < 0.02, np.median(rel)
    # cosine similarity per row stays high
    a, b = np.asarray(got), np.asarray(ref)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999


def test_quantize_dense_params_walk():
    params = {
        "visual": {
            "proj": jnp.ones((512, 512)),
            "ln": {"scale": jnp.ones((512,))},
        },
        "small": {"kernel": jnp.ones((4, 4))},
    }
    out = quantize_dense_params(params, min_size=1024)
    assert "proj_int8" in out["visual"] and "proj_scale" in out["visual"]
    assert out["visual"]["proj_int8"].dtype == jnp.int8
    assert "kernel" in out["small"]  # too small: untouched


def test_quantize_dequantize_roundtrip():
    """Weight-only compression (the bench_infer --int8 load path): the
    dequantized tree has the original structure and <1% relative error on
    every quantized kernel."""
    import numpy as np
    from cosmos_tpu.ops.int8 import (
        dequantize_dense_params,
        quantize_dense_params,
        quantized_bytes,
    )

    rng = np.random.default_rng(0)
    params = {
        "visual": {"proj": jnp.asarray(rng.normal(size=(512, 512)), jnp.float32)},
        "ln": {"scale": jnp.ones((512,))},
    }
    q = quantize_dense_params(params, min_size=1024)
    assert "proj_int8" in q["visual"] and "proj_scale" in q["visual"]
    back = dequantize_dense_params(q)
    assert set(back["visual"]) == {"proj"}
    err = np.abs(np.asarray(back["visual"]["proj"]) - np.asarray(params["visual"]["proj"]))
    denom = np.abs(np.asarray(params["visual"]["proj"])).max()
    assert err.max() / denom < 0.01
    np.testing.assert_array_equal(np.asarray(back["ln"]["scale"]), 1.0)
    after, before = quantized_bytes(params)
    assert after < before / 3
