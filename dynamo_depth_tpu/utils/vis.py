"""Visualization helpers (reference ``utils.py:81-164``), numpy host-side.

Flow colorwheel (cart2polar + hsv->rgb), score-map colormapping, identity
index map, and mp4 writing — consumed by eval/visualize.py, the training
visualization grid, and the quick demo.
"""

from __future__ import annotations

import os.path as osp

import numpy as np


def make_ind_map(height, width):
    """Identity sample grid (1, H, W, 2) with corners [-1,-1]..[1,1]
    (utils.py:141-147). NOTE: normalized by dim (not dim-1), as reference."""
    v = np.arange(height, dtype=np.float32) / height * 2 - 1
    h = np.arange(width, dtype=np.float32) / width * 2 - 1
    grid = np.stack(np.meshgrid(h, v, indexing="xy"), axis=-1)  # (H, W, 2)
    return grid[None]


def cart2polar(cart):
    """(..., 2) [x, y] -> (r, theta) with the reference's quadrant convention
    (utils.py:149-161)."""
    assert cart.shape[-1] == 2
    r = np.sqrt(np.sum(cart ** 2, -1))
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = np.arctan(cart[..., 0] / cart[..., 1])
    theta = np.nan_to_num(theta, nan=0.0)
    theta[cart[..., 1] < 0] += np.pi
    theta = (5 * np.pi / 2 - theta) % (2 * np.pi)
    return r, theta


def hsv_to_rgb(hsv):
    """(..., H, W, 3) channels-last hsv -> rgb (utils.py:163-189 semantics)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0) % 6
    f = (h * 6.0) % 6 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(np.int64)
    table = np.stack(
        [
            np.stack([v, q, p, p, t, v], -1),
            np.stack([t, v, v, q, p, p], -1),
            np.stack([p, p, t, v, v, q], -1),
        ],
        axis=-2,
    )  # (..., 3, 6)
    return np.take_along_axis(table, i[..., None, None].repeat(3, -2), axis=-1)[..., 0]


def flow_vis(flow_xy, max_mag=None):
    """2D flow (..., H, W, 2) -> (rgb in [0,1], hsv, max_mag), matching the
    colorwheel construction of Trainer.py:596-605."""
    mag, theta = cart2polar(flow_xy)
    if max_mag is None:
        max_mag = float(mag.max()) + 1e-8
    hsv = np.ones(flow_xy.shape[:-1] + (3,), dtype=np.float32)
    hsv[..., 0] = (theta - np.pi / 4) % (2 * np.pi) / (2 * np.pi)
    hsv[..., 1] = 1.0
    hsv[..., 2] = mag / max_mag
    return 1.0 - hsv_to_rgb(hsv), hsv, max_mag


def score_map_vis(score_map, cmap="bone", vminmax=None, max_perc=95):
    """Colormapped score map -> rgb float array (utils.py:103-118)."""
    import matplotlib as mpl
    import matplotlib.cm as cm

    sm = np.asarray(score_map).squeeze()
    if vminmax is None:
        vmin, vmax = sm.min(), np.percentile(sm, max_perc)
    else:
        vmin, vmax = vminmax
    normalizer = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
    mapper = cm.ScalarMappable(norm=normalizer, cmap=cmap)
    return mapper.to_rgba(sm)[:, :, :3]


def make_mp4(images, filename, fps=30, quality=8, macro_block_size=1, bgr=True):
    """Write frames to mp4 (utils.py:81-96)."""
    import imageio

    ext = osp.splitext(filename)[1]
    if ext == "":
        filename = filename + ".mp4"
    elif ext != ".mp4":
        raise ValueError(f"filename does not end with .mp4: `{filename}`")
    frames = np.stack(images, axis=0)
    if bgr:
        frames = frames[..., ::-1]
    try:
        imageio.mimwrite(
            filename, frames, fps=fps, quality=quality, macro_block_size=macro_block_size
        )
    except Exception as e:
        # No ffmpeg/pyav backend available: fall back to per-frame PNGs so the
        # visualization is still produced.
        from PIL import Image

        from dynamo_depth_tpu.utils.io import join_dir

        frame_dir = join_dir(osp.splitext(filename)[0] + "_frames")
        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(osp.join(frame_dir, f"{i:06}.png"))
        print(f"mp4 encode unavailable ({e}); wrote {len(frames)} PNG frames to {frame_dir}")


def vis_motion(depth, K, inv_K, motion_map=None, camTcam=None):
    """Optical-flow colorwheel inputs from depth + motion (Trainer.py:574-605).

    depth: (B, H, W, 1); motion_map: (B, H, W, 3) or None; camTcam: (B, 4, 4)
    or None. Returns (hsv (B, H, W, 3), max_mag). Projection error at T=None
    is subtracted as in the reference.
    """
    import jax.numpy as jnp

    from dynamo_depth_tpu.ops.geometry import backproject, project

    B, h, w, _ = depth.shape
    ind_map = make_ind_map(h, w)  # (1, H, W, 2)

    pts = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    pix_id, _ = project(pts, jnp.asarray(K), None, height=h, width=w)
    err = np.asarray(pix_id) - ind_map

    pts2 = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    if motion_map is not None:
        pts2 = pts2 + jnp.asarray(motion_map).reshape(B, h * w, 3)
    T = None if camTcam is None else jnp.asarray(camTcam)
    pix, _ = project(pts2, jnp.asarray(K), T, height=h, width=w)
    motion_raw = np.asarray(pix) - ind_map - err  # (B, H, W, 2)

    mag, theta = cart2polar(motion_raw)
    max_mag = float(mag.max()) + 1e-8
    hsv = np.ones((B, h, w, 3), np.float32)
    hsv[..., 0] = (theta - np.pi / 4) % (2 * np.pi) / (2 * np.pi)
    hsv[..., 1] = 1.0
    hsv[..., 2] = mag / max_mag
    return hsv, max_mag
