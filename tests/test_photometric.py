"""Parity tests for ops/photometric.py against torch-expressed goldens."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from dynamo_depth_tpu.ops import reprojection_loss, smooth_loss, ssim


def torch_ssim(x, y):
    # 3x3 avg-pool SSIM with reflection pad (tools.py:227-257)
    refl = nn.ReflectionPad2d(1)
    pool = nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch(rng):
    B, H, W, C = 2, 8, 11, 3
    x = rng.rand(B, H, W, C).astype(np.float32)
    y = np.clip(x + rng.randn(B, H, W, C).astype(np.float32) * 0.1, 0, 1)

    ours = ssim(jnp.asarray(x), jnp.asarray(y))
    gold = torch_ssim(torch.tensor(np.moveaxis(x, -1, 1)), torch.tensor(np.moveaxis(y, -1, 1)))
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=1e-5)


def test_ssim_identical_images_zero(rng):
    x = jnp.asarray(rng.rand(1, 6, 6, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 0.0, atol=1e-6)


def test_reprojection_loss_matches_torch(rng):
    B, H, W, C = 2, 8, 11, 3
    pred = rng.rand(B, H, W, C).astype(np.float32)
    target = rng.rand(B, H, W, C).astype(np.float32)

    ours = reprojection_loss(jnp.asarray(pred), jnp.asarray(target), ssim_weight=0.85)

    tp = torch.tensor(np.moveaxis(pred, -1, 1))
    tt = torch.tensor(np.moveaxis(target, -1, 1))
    l1 = torch.abs(tt - tp).mean(1, True)
    s = torch_ssim(tp, tt).mean(1, True)
    gold = 0.85 * s + 0.15 * l1
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=1e-5)


def test_smooth_loss_matches_torch(rng):
    B, H, W = 2, 8, 11
    inp = rng.rand(B, H, W, 3).astype(np.float32)
    img = rng.rand(B, H, W, 3).astype(np.float32)

    def gold_fn(inp_t, img_t=None):
        gx = torch.abs(inp_t[:, :, :, :-1] - inp_t[:, :, :, 1:])
        gy = torch.abs(inp_t[:, :, :-1, :] - inp_t[:, :, 1:, :])
        if img_t is not None:
            igx = torch.mean(torch.abs(img_t[:, :, :, :-1] - img_t[:, :, :, 1:]), 1, keepdim=True)
            igy = torch.mean(torch.abs(img_t[:, :, :-1, :] - img_t[:, :, 1:, :]), 1, keepdim=True)
            gx = gx * torch.exp(-igx)
            gy = gy * torch.exp(-igy)
        return gx.mean() + gy.mean()

    ti, tm = torch.tensor(np.moveaxis(inp, -1, 1)), torch.tensor(np.moveaxis(img, -1, 1))
    np.testing.assert_allclose(
        float(smooth_loss(jnp.asarray(inp))), float(gold_fn(ti)), atol=1e-6
    )
    np.testing.assert_allclose(
        float(smooth_loss(jnp.asarray(inp), jnp.asarray(img))), float(gold_fn(ti, tm)), atol=1e-6
    )
