"""Photometric losses: SSIM, reprojection (SSIM+L1), edge-aware smoothness.

Capability parity with the reference's ``SSIM`` (``tools.py:227-257``),
``compute_reprojection_loss`` (``Trainer.py:413-423``) and
``compute_smooth_loss`` (``tools.py:311-326``), in NHWC with pure functions.
The 3x3 mean pooling is expressed as a reduce_window over a reflection-padded
tensor, which XLA lowers to fused VPU code on TPU (no im2col, no conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3x3(x):
    """3x3/stride-1 mean pool, VALID. x: (B, H, W, C) -> (B, H-2, W-2, C).

    Expressed as six separable shifted adds (static slices) rather than
    ``lax.reduce_window``: on the v5e this backend lowers reduce-window
    ~2x slower than the fused slice-adds, in forward AND backward
    (measured 0.88 -> 0.52 ms fwd, 0.68 -> 0.39 ms fwd+bwd for six KITTI
    frames; BENCH.md "SSIM pooling")."""
    r = x[:, :-2] + x[:, 1:-1] + x[:, 2:]
    return (r[:, :, :-2] + r[:, :, 1:-1] + r[:, :, 2:]) / 9.0


def ssim(x, y, *, c1=0.01 ** 2, c2=0.03 ** 2):
    """Per-pixel SSIM distance in [0, 1]: (1 - SSIM)/2, clamped.

    x, y: (B, H, W, C) images in [0, 1]. Reflection-padded 3x3 windows, same
    constants and clamping as tools.py:227-257.
    """
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    x = jnp.pad(x, pad, mode="reflect")
    y = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3x3(x)
    mu_y = _avg_pool3x3(y)
    sigma_x = _avg_pool3x3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3x3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3x3(x * y) - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def reprojection_loss(pred, target, *, ssim_weight=0.85):
    """Per-pixel photometric error ``(B, H, W, 1)``: w*SSIM + (1-w)*L1.

    Channel-mean of each term, as in Trainer.py:413-423.
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    ssim_term = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return ssim_weight * ssim_term + (1.0 - ssim_weight) * l1


def smooth_loss(inp, img=None):
    """Edge-aware first-order smoothness for ``(B, H, W, C)`` (tools.py:311-326).

    When ``img`` is given, gradients are attenuated by exp(-|∇img|) with the
    image gradient channel-meaned.
    """
    gx = jnp.abs(inp[:, :, :-1, :] - inp[:, :, 1:, :])
    gy = jnp.abs(inp[:, :-1, :, :] - inp[:, 1:, :, :])

    if img is not None:
        igx = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
        igy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)
        gx = gx * jnp.exp(-igx)
        gy = gy * jnp.exp(-igy)

    return jnp.mean(gx) + jnp.mean(gy)
