"""Bilinear warping (grid_sample) and image resizing under XLA.

``grid_sample`` reproduces the exact semantics of the reference's hot op
``F.grid_sample(..., padding_mode='border', align_corners=True)``
(``Trainer.py:281``) — including its gradient, which backpropagates through
the sample coordinates into depth, pose, and flow. It is expressed as four
flat gathers + lerp so XLA lowers it to TPU gather ops and fuses the lerp;
``ops/pallas/warp_kernel.py`` provides a hand-tiled kernel alternative.

``resize_bilinear`` / ``resize_nearest`` reproduce ``F.interpolate``
(align_corners=False bilinear, legacy nearest) used throughout the reference
(``utils.py:98-101``, ``networks/layers.py:120``); ``resize_bicubic_aa``
covers the antialiased bicubic pyramid resize (``Trainer.py:729-734``,
``datasets/base_dataset.py:80``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(image, grid):
    """Bilinear sampling with border padding and align_corners=True.

    The four bilinear taps are (y0, y0+1) x (x0, x0+1) — a contiguous
    ``(2, 2, C)`` patch — so they are fetched with ONE ``lax.gather`` of
    2x2xC slices instead of four pointwise gathers. Gather cost on TPU is
    slice-count-bound (measured: 4x1-row taps 22.0 ms vs 1x4-row patches
    18.6 ms for six KITTI frames, identical values bit-for-bit), and the
    train step's gathers are its single largest op cost (BENCH.md).

    :param image: ``(B, H, W, C)``
    :param grid:  ``(B, Ho, Wo, 2)`` normalized coords in [-1, 1], last dim (x, y)
    :return:      ``(B, Ho, Wo, C)``
    """
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo

    # Unnormalize (align_corners=True) then clamp the coordinate itself
    # (border padding semantics).
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = jnp.clip(gx, 0.0, W - 1)
    gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(gx), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(gy), 0, max(H - 2, 0))
    wx = (gx - x0)[..., None]  # in [0, 1]; == 1 at the right border
    wy = (gy - y0)[..., None]

    starts = jnp.stack(
        [y0.reshape(B, P), x0.reshape(B, P)], axis=-1
    ).astype(jnp.int32)  # (B, P, 2) slice origins (y, x)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    sizes = (min(2, H), min(2, W), C)  # degenerate 1-pixel axes still work

    def one(img, st):
        return jax.lax.gather(img, st, dnums, slice_sizes=sizes)  # (P, 2, 2, C)

    # Lerp in the gather result's own (B, P, 2, 2, C) space: reshaping the
    # raw taps to (B, Ho, Wo, 2, 2, C) first is not layout-preserving and
    # costs a ~1 ms re-tiling copy of the full 2x2xC tap tensor per warp
    # (6x/step); only the C-sized lerp output is reshaped (profiled on v5e,
    # BENCH.md).
    taps = jax.vmap(one)(image, starts)  # (B, P, 2, 2, C)
    v00 = taps[:, :, 0, 0]
    v01 = taps[:, :, 0, -1]
    v10 = taps[:, :, -1, 0]
    v11 = taps[:, :, -1, -1]

    wxf = wx.reshape(B, P, 1)
    wyf = wy.reshape(B, P, 1)
    top = v00 + (v01 - v00) * wxf
    bot = v10 + (v11 - v10) * wxf
    return (top + (bot - top) * wyf).reshape(B, Ho, Wo, C)


def resize_bilinear(x, out_hw):
    """``F.interpolate(mode='bilinear', align_corners=False)`` for NHWC."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x

    def src_coords(out_n, in_n):
        d = jnp.arange(out_n, dtype=x.dtype)
        s = (d + 0.5) * (in_n / out_n) - 0.5
        s = jnp.clip(s, 0.0, in_n - 1)
        i0 = jnp.clip(jnp.floor(s), 0, max(in_n - 2, 0))
        return i0.astype(jnp.int32), (s - i0)

    y0, wy = src_coords(Ho, H)
    x0, wx = src_coords(Wo, W)

    # Separable: rows then columns.
    rows = x[:, y0, :, :] * (1 - wy)[None, :, None, None] + x[:, y0 + 1, :, :] * wy[None, :, None, None]
    out = rows[:, :, x0, :] * (1 - wx)[None, None, :, None] + rows[:, :, x0 + 1, :] * wx[None, None, :, None]
    return out


def resize_nearest(x, out_hw):
    """``F.interpolate(mode='nearest')`` (legacy floor semantics) for NHWC."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    ys = jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32)
    return x[:, ys, :, :][:, :, xs, :]


def resize_bicubic_aa(x, out_hw):
    """Antialiased bicubic resize (torchvision Resize BICUBIC, antialias=True).

    Used for the color pyramid (Trainer.py:729-734); values clamped to [0, 1]
    as the reference clamps after its pyramid resize.
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    out = jax.image.resize(x, (B, Ho, Wo, C), method="bicubic", antialias=True)
    return jnp.clip(out, 0.0, 1.0)


def upsample2x_nearest(x):
    """Fast path for the Monodepth2 decoder's x2 nearest upsample."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
