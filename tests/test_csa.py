"""SCLIP CSA (correlative self-attention) numerics vs a stock-torch
oracle: softmax(q qT * s) + softmax(k kT * s) applied to v with the
block's own in/out projections (reference transformer.py:731-764)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cosmos_tpu.models.attention import MultiheadAttention


def test_csa_matches_torch_oracle():
    d, heads, b, l = 32, 4, 2, 5
    mod = MultiheadAttention(num_heads=heads)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    params = mod.init(__import__("jax").random.PRNGKey(0), x)["params"]
    got = mod.apply({"params": params}, x, csa=True)

    w_in = torch.from_numpy(np.asarray(params["in_proj_kernel"]).T.copy())
    b_in = torch.from_numpy(np.asarray(params["in_proj_bias"]).copy())
    w_out = torch.from_numpy(
        np.asarray(params["out_proj"]["kernel"]).T.copy()
    )
    b_out = torch.from_numpy(np.asarray(params["out_proj"]["bias"]).copy())

    xt = torch.from_numpy(np.asarray(x))                 # [B, L, D]
    q, k, v = F.linear(xt, w_in, b_in).chunk(3, dim=-1)
    hd = d // heads
    scale = hd ** -0.5

    def split(t):  # [B, L, D] -> [B*H, L, hd]
        return (t.reshape(b, l, heads, hd).permute(0, 2, 1, 3)
                .reshape(b * heads, l, hd))

    qh, kh, vh = split(q), split(k), split(v)
    qa = torch.bmm(qh, qh.transpose(1, 2)) * scale
    ka = torch.bmm(kh, kh.transpose(1, 2)) * scale
    w = F.softmax(qa, dim=-1) + F.softmax(ka, dim=-1)
    out = torch.bmm(w, vh)
    out = (out.reshape(b, heads, l, hd).permute(0, 2, 1, 3)
           .reshape(b, l, d))
    want = F.linear(out, w_out, b_out).numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
