"""PAMR parity vs an independent torch conv-based oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cosmos_tpu.segmentation.pamr import pamr, resize_bilinear_align_corners


def torch_pamr_oracle(image_nchw, mask_nchw, num_iter, dilations):
    """Conv-kernel formulation of PAMR (independent of the jnp shifts)."""
    # shift kernels: center 1, neighbor -1 (affinity) / neighbor 1 (copy)
    def make_kernels(center, neighbor):
        w = torch.zeros(8, 1, 3, 3)
        pos = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
        for i, (r, c) in enumerate(pos):
            w[i, 0, 1, 1] = center
            w[i, 0, r, c] = neighbor
        return w

    k_aff = make_kernels(1.0, -1.0)
    k_copy = make_kernels(0.0, 1.0)
    k_std = torch.zeros(9, 1, 3, 3)
    pos9 = [(r, c) for r in range(3) for c in range(3)]
    for i, (r, c) in enumerate(pos9):
        k_std[i, 0, r, c] = 1.0

    def apply_k(x, kernel, d):
        B, K, H, W = x.shape
        x = x.reshape(B * K, 1, H, W)
        outs = []
        xp = F.pad(x, [d] * 4, mode="replicate")
        out = F.conv2d(xp, kernel, dilation=d)
        return out.reshape(B, K, -1, H, W)

    x = image_nchw
    mask = F.interpolate(mask_nchw, size=x.shape[-2:], mode="bilinear",
                         align_corners=True)
    affs = [apply_k(x, k_aff, d) for d in dilations]
    x_aff = torch.cat(affs, 2).abs()
    # std over the union of all dilations' 9-point windows (LocalStDev)
    x_std = torch.cat([apply_k(x, k_std, d) for d in dilations], 2).std(
        2, keepdim=True, unbiased=True
    )
    w = -x_aff / (1e-8 + 0.1 * x_std)
    w = w.mean(1, keepdim=True)
    w = F.softmax(w, 2)
    for _ in range(num_iter):
        m = torch.cat([apply_k(mask, k_copy, d) for d in dilations], 2)
        mask = (m * w).sum(2)
    return mask


@pytest.mark.parametrize("dilations", [(1,), (1, 2)])
def test_pamr_matches_torch_oracle(dilations):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 12, 14, 3)).astype(np.float32)
    mask = rng.normal(size=(2, 6, 7, 4)).astype(np.float32)

    got = np.asarray(pamr(img, mask, num_iter=2, dilations=dilations))

    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2))
    t_mask = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    want = torch_pamr_oracle(t_img, t_mask, 2, dilations)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_align_corners_resize_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 5, 7, 2)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(x, (11, 13)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(t, size=(11, 13), mode="bilinear",
                         align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
