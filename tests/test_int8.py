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
