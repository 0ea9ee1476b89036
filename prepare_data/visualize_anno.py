"""Depth-annotation QA helpers (reference ``prepare_data/visualize_anno.ipynb``).

The reference ships a notebook that sanity-checks an ETL'd segment by (a)
lifting the exported sparse depth annotations back into a colored 3-D point
cloud via the exported ``cam.json`` intrinsics, (b) overlaying the depth
points on the RGB frame, and (c) mapping the camera-frame cloud back into
the LiDAR frame (waymo axis convention) to compare against the original
sensor returns. These are the pure-array equivalents, unit-tested in
``tests/test_visualize_anno.py``; ``visualize_anno.ipynb`` next to this
file drives them on a segment directory (the tfrecord comparison leg stays
SDK-gated exactly like ``prepare_data/waymo.py``).

Depth annotation layout (this repo's ETL output, matching the reference):
``depth/NNNNNN.npy`` holds (N, 3) rows ``[x_pix, y_pix, z_depth]`` in
full-res pixel coordinates; ``rgb/cam.json`` holds the *normalized*
``intrinsic_mat`` (see ``dynamo_depth_tpu/data/waymo.py``).
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np

# (x front, y left, z up) LiDAR frame -> (x right, y down, z front) camera
# frame: the waymo extrinsic is camera-to-vehicle in sensor axes, so the
# camera cloud returns to LiDAR space via extrinsic @ AXIS_SWAP (reference
# visualize_anno.ipynb, "Converting Cam PC into LiDAR Space" cell).
AXIS_SWAP = np.array(
    [[0, 0, 1, 0],
     [-1, 0, 0, 0],
     [0, -1, 0, 0],
     [0, 0, 0, 1]], dtype=np.float64,
)


def load_frame(seg_dir, frame_idx, cam="FRONT", rgb_kind="original"):
    """Read (rgb, depth_points, K_pixels) for one exported frame.

    ``K_pixels`` is the 3x3 intrinsic scaled to the loaded image's pixel
    grid (cam.json stores it normalized by width/height).
    """
    from PIL import Image

    rgb_path = osp.join(seg_dir, cam, "rgb", rgb_kind, f"{frame_idx:06}.jpg")
    rgb = np.asarray(Image.open(rgb_path), dtype=np.float32) / 255.0
    pts = np.load(osp.join(seg_dir, cam, "depth", f"{frame_idx:06}.npy"))
    with open(osp.join(seg_dir, cam, "rgb", "cam.json")) as fh:
        K = np.array(json.load(fh)["intrinsic_mat"], dtype=np.float64)
    H, W = rgb.shape[:2]
    K_pix = K.copy()
    K_pix[0] *= W
    K_pix[1] *= H
    return rgb, pts, K_pix


def depth_points_to_cloud(rgb, pts, K_pix):
    """Unproject sparse depth rows ``[x_pix, y_pix, z]`` into a colored
    camera-frame cloud.

    :return: (xyz (N, 3) with +x right / +y down / +z forward,
              colors (N, 3) sampled from ``rgb`` at each annotation pixel)
    """
    H, W = rgb.shape[:2]
    fx, fy = K_pix[0, 0], K_pix[1, 1]
    cx, cy = K_pix[0, 2], K_pix[1, 2]
    x_pix, y_pix, z = pts[:, 0], pts[:, 1], pts[:, 2]
    xyz = np.stack([(x_pix - cx) * z / fx, (y_pix - cy) * z / fy, z], axis=-1)
    xi = np.clip(x_pix.astype(int), 0, W - 1)
    yi = np.clip(y_pix.astype(int), 0, H - 1)
    return xyz, rgb[yi, xi]


def project_cloud(xyz, K_pix):
    """Inverse of :func:`depth_points_to_cloud`'s unprojection: camera-frame
    points back to ``[x_pix, y_pix, z]`` rows."""
    z = xyz[:, 2]
    x_pix = xyz[:, 0] / z * K_pix[0, 0] + K_pix[0, 2]
    y_pix = xyz[:, 1] / z * K_pix[1, 1] + K_pix[1, 2]
    return np.stack([x_pix, y_pix, z], axis=-1)


def cam_cloud_to_lidar(xyz, extrinsic):
    """Map a camera-frame cloud into the waymo vehicle/LiDAR frame.

    :param extrinsic: the 4x4 camera-to-vehicle transform from the tfrecord
        calibration (``cam_cal.extrinsic.transform``).
    """
    ext = np.asarray(extrinsic, dtype=np.float64) @ AXIS_SWAP
    return xyz @ ext[:3, :3].T + ext[:3, 3]


def depth_overlay(rgb, pts, dot=2, max_depth=75.0, cmap="plasma"):
    """Rasterize the sparse depth annotations over the image — the
    notebook's 2-D QA view. Returns an (H, W, 3) float image."""
    import matplotlib

    out = rgb.copy()
    H, W = rgb.shape[:2]
    colors = matplotlib.colormaps[cmap](np.clip(pts[:, 2] / max_depth, 0, 1))[:, :3]
    x = pts[:, 0].astype(int)
    y = pts[:, 1].astype(int)
    keep = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    x, y, colors = x[keep], y[keep], colors[keep]
    r = max(int(dot) // 2, 0)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            yy = np.clip(y + dy, 0, H - 1)
            xx = np.clip(x + dx, 0, W - 1)
            out[yy, xx] = colors
    return out
