"""Generate the repo's vendored tiny test fixtures (round-2 VERDICT item 3).

Writes synthetic-but-geometrically-consistent `assets/tiny_kitti`,
`assets/tiny_waymo`, `assets/tiny_nuscenes` in the PROCESSED layout the
dataset loaders consume (the same layout the prepare_data ETLs emit and the
reference ships as `assets/tiny_*`, /root/reference/prepare_data/
compare_datasets.py:17-43) — so the data tests and the quick demo run with
no reference mount and no dataset imagery shipped.

Scene: a textured ground plane + frontal wall viewed by a forward-moving
camera (same recipe as scripts/bf16_convergence.py::render_scene), rendered
per dataset at its native intrinsics/resolutions, with sparse depth points,
motion masks, odometry and calib/timestamp sidecars in each dataset's format.

Usage: python scripts/make_tiny_fixtures.py [--out assets] [--frames 3]
Deterministic (fixed seeds); re-running reproduces identical content except
for JPEG encoder jitter (none observed with PIL's fixed settings).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from scripts.bf16_convergence import CAM_HEIGHT, DZ, _texture  # noqa: E402

# Fixture-scene wall position (the convergence script's wall moved to a
# trajectory-dependent position in round 3; the vendored fixtures keep the
# original fixed 22 m wall so regeneration stays byte-stable).
WALL_Z = 22.0
RNG_GROUND, RNG_WALL, RNG_PTS = 11, 12, 13


def render_frame(W, H, fx_n, fy_n, cam_z, horizon=0.553):
    """One consistent frame: RGB in [0,1] + per-pixel depth (camera frame).

    fx_n/fy_n are normalized intrinsics (fx/W, fy/H); the ground plane sits
    CAM_HEIGHT below the optical axis, a frontal wall at WALL_Z - cam_z.
    """
    rng_g, rng_w = np.random.RandomState(RNG_GROUND), np.random.RandomState(RNG_WALL)
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    rx = (uu - 0.5) / fx_n
    ry = (vv - 0.5) / fy_n
    ground = vv > horizon
    z_ground = CAM_HEIGHT / np.maximum(ry, 1e-6)
    z_wall = np.maximum(WALL_Z - cam_z, 1.0)
    z = np.where(ground, z_ground, z_wall)
    wx = rx * z
    wz = z + cam_z
    img = np.where(
        ground[..., None],
        _texture(rng_g, 0.35 * wx, 0.35 * wz),
        _texture(rng_w, 0.35 * wx, 0.35 * (ry * z)),
    )
    return img.astype(np.float32), z


def save_jpg(img, path, quality=87):
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        path, quality=quality)


def sparse_points(z_full, stride=9, max_depth=60.0, order="hwz"):
    """Sparse gt rows sampled on a grid from the full-res depth image."""
    H, W = z_full.shape
    hh, ww = np.meshgrid(np.arange(4, H, stride), np.arange(4, W, stride),
                         indexing="ij")
    zz = z_full[hh, ww]
    keep = zz < max_depth
    cols = dict(h=hh[keep], w=ww[keep], z=zz[keep])
    return np.stack([cols[c] for c in order], -1).astype(np.float32)


def forward_odometry(n, dz=DZ):
    """n flattened 4x4 world_T_cam poses for a camera moving +z."""
    rows = []
    for i in range(n):
        T = np.eye(4)
        T[2, 3] = i * dz
        rows.append(" ".join(f"{v:.12g}" for v in T.reshape(-1)))
    return "\n".join(rows) + "\n"


def make_nuscenes(root, frames):
    """assets/tiny_nuscenes: scenes/scene-0001/FRONT, 1600x900 original,
    512x288 downsample, depth rows [w, h, z], mask npz {panoptic_label,
    motion_label} aligned with the depth rows (data/nuscenes.py contract)."""
    W0, H0, Wd, Hd = 1600, 900, 512, 288
    fx_n, fy_n = 0.7915, 1.4071
    cam = osp.join(root, "tiny_nuscenes", "scenes", "scene-0001", "FRONT")
    for i in range(frames):
        img, z = render_frame(W0, H0, fx_n, fy_n, cam_z=i * DZ)
        save_jpg(img, osp.join(cam, "rgb", "original", f"{i:06d}.jpg"), 70)
        small = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize((Wd, Hd), Image.BICUBIC),
            np.float32) / 255
        save_jpg(small, osp.join(cam, "rgb", "downsample", f"{i:06d}.jpg"))
    # key-frame (frame 0) annotations
    img, z = render_frame(W0, H0, fx_n, fy_n, cam_z=0.0)
    pts = sparse_points(z, order="whz")  # on-disk rows [w, h, z]
    os.makedirs(osp.join(cam, "depth"), exist_ok=True)
    np.save(osp.join(cam, "depth", "000000.npy"), pts.astype(np.float64))
    # motion labels per point: ground static (2), wall in-motion (1) — gives
    # the mask-reconstruction path both classes to scatter.
    motion = np.where(pts[:, 1] > 0.553 * H0, 2, 1).astype(np.uint8)
    os.makedirs(osp.join(cam, "mask"), exist_ok=True)
    np.savez_compressed(
        osp.join(cam, "mask", "000000.npz"),
        panoptic_label=np.ones(len(pts), np.uint16),
        motion_label=motion,
    )
    with open(osp.join(cam, "odometry.txt"), "w") as f:
        f.write(forward_odometry(frames))
    K = np.array([[fx_n * W0, 0, W0 / 2], [0, fy_n * H0, H0 / 2], [0, 0, 1.0]])
    with open(osp.join(cam, "rgb", "cam.json"), "w") as f:
        json.dump({
            "camera_intrinsic": K.tolist(), "dim": [H0, W0],
            "intrinsic_mat": (K / np.array([[W0], [H0], [1]])).tolist(),
        }, f)
    with open(osp.join(cam, "rgb", "ts.json"), "w") as f:
        json.dump([100, 100, 50] * ((frames + 3) // 3), f)


def make_waymo(root, frames):
    """assets/tiny_waymo: val/segment-tiny.../FRONT, 1920x1280 original,
    480x320 downsample, depth rows [w, h, z], mask npz {semantic} + pickled
    contour objects (data/waymo.py contract)."""
    W0, H0, Wd, Hd = 1920, 1280, 480, 320
    fx_n, fy_n = 1.07, 1.61  # waymo-front-like FoV
    seg = osp.join(root, "tiny_waymo", "val", "segment-0000000000_tiny_fixture",
                   "FRONT")
    for i in range(frames):
        img, z = render_frame(W0, H0, fx_n, fy_n, cam_z=i * DZ)
        save_jpg(img, osp.join(seg, "rgb", "original", f"{i:06d}.jpg"), 70)
        small = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize((Wd, Hd), Image.BICUBIC),
            np.float32) / 255
        save_jpg(small, osp.join(seg, "rgb", "downsample", f"{i:06d}.jpg"))
        pts = sparse_points(z, stride=16, order="whz")  # < MAX_LIDAR_NUM rows
        os.makedirs(osp.join(seg, "depth"), exist_ok=True)
        np.save(osp.join(seg, "depth", f"{i:06d}.npy"), pts.astype(np.float64))
        # semantic map: 1 above horizon (wall), 0 ground; motion objects as
        # cv2-style rectangular contours — one moving, one static, one
        # unlabeled (exercises all three label branches in get_mask).
        sem = (np.arange(H0)[:, None] < 0.553 * H0) * np.ones((H0, W0), np.uint8)
        os.makedirs(osp.join(seg, "mask"), exist_ok=True)
        np.savez_compressed(osp.join(seg, "mask", f"{i:06d}.npz"), semantic=sem)

        def rect(x0, y0, x1, y1):
            c = np.array([[[x0, y0]], [[x1, y0]], [[x1, y1]], [[x0, y1]]], np.int32)
            return (c,)

        objects = [
            dict(mask=rect(200, 700, 400, 900), mask_label=1, speed=[5.0, 0.0],
                 accel=[0.0, 0.0], center=[10.0, 2.0, 1.0], dim=[4.0, 2.0, 1.5],
                 heading=0.0, box_label=1, match=0),
            dict(mask=rect(900, 700, 1100, 900), mask_label=2, speed=[0.1, 0.0],
                 accel=[0.0, 0.0], center=[12.0, -2.0, 1.0], dim=[4.0, 2.0, 1.5],
                 heading=0.0, box_label=2, match=1),
            dict(mask=rect(1500, 700, 1700, 900), mask_label=3, speed=[0.0, 0.0],
                 accel=[0.0, 0.0], center=[14.0, -4.0, 1.0], dim=[4.0, 2.0, 1.5],
                 heading=None, box_label=None, match=2),
        ]
        with open(osp.join(seg, "mask", f"{i:06d}.pickle"), "wb") as f:
            pickle.dump(objects, f)
    with open(osp.join(seg, "odometry.txt"), "w") as f:
        f.write(forward_odometry(frames))
    K = np.array([[fx_n * W0, 0, W0 / 2], [0, fy_n * H0, H0 / 2], [0, 0, 1.0]])
    with open(osp.join(seg, "rgb", "cam.json"), "w") as f:
        json.dump({
            "camera_intrinsic": K.tolist(), "dim": [H0, W0],
            "intrinsic_mat": (K / np.array([[W0], [H0], [1]])).tolist(),
        }, f)


def make_kitti(root, frames):
    """assets/tiny_kitti: 2011_09_26 drive layout, image_02 + image_03,
    1242x375 original, 640x192 downsample, depth rows [h, w, z], calib
    sidecars (data/kitti.py contract; fixed K_NORM intrinsics)."""
    W0, H0, Wd, Hd = 1242, 375, 640, 192
    fx_n, fy_n = 0.58, 1.92
    drive = osp.join(root, "tiny_kitti", "2011_09_26",
                     "2011_09_26_drive_0001_sync")
    baseline = 0.54  # m, KITTI stereo
    for cam_i, cam in enumerate(("image_02", "image_03")):
        for i in range(frames):
            # image_03 is the right camera: shift the camera x by +baseline
            img, z = render_frame(W0, H0, fx_n, fy_n, cam_z=i * DZ)
            if cam_i == 1:
                # re-render with the texture coordinates shifted by the
                # baseline (wx' = wx - baseline in world coords)
                u = (np.arange(W0) + 0.5) / W0
                v = (np.arange(H0) + 0.5) / H0
                uu, vv = np.meshgrid(u, v)
                rx = (uu - 0.5) / fx_n
                ry = (vv - 0.5) / fy_n
                ground = vv > 0.553
                zg = CAM_HEIGHT / np.maximum(ry, 1e-6)
                zw = np.maximum(WALL_Z - i * DZ, 1.0)
                z = np.where(ground, zg, zw)
                wx = rx * z + baseline
                wz = z + i * DZ
                img = np.where(
                    ground[..., None],
                    _texture(np.random.RandomState(RNG_GROUND), 0.35 * wx, 0.35 * wz),
                    _texture(np.random.RandomState(RNG_WALL), 0.35 * wx,
                             0.35 * (ry * z)),
                ).astype(np.float32)
            base = osp.join(drive, cam)
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                _mk(osp.join(base, "rgb", "original", f"{i:010d}.png")))
            small = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    (Wd, Hd), Image.BICUBIC), np.float32) / 255
            save_jpg(small, osp.join(base, "rgb", "downsample", f"{i:010d}.jpg"))
            pts = sparse_points(z, order="hwz")  # kitti on-disk rows [h, w, z]
            os.makedirs(osp.join(base, "depth"), exist_ok=True)
            np.save(osp.join(base, "depth", f"{i:010d}.npy"), pts.astype(np.float64))
            # motion/semantic masks: static scene -> zeros + wall semantic
            sem = (np.arange(H0)[:, None] < 0.553 * H0) * np.ones((H0, W0), np.uint8)
            os.makedirs(osp.join(base, "mask"), exist_ok=True)
            np.save(osp.join(base, "mask", f"{i:010d}_sem.npy"), sem)
            np.save(osp.join(base, "mask", f"{i:010d}_mot.npy"),
                    np.zeros((H0, W0), np.uint8))
    with open(_mk(osp.join(drive, "calib_cam_to_cam.txt")), "w") as f:
        R = " ".join(["1 0 0", "0 1 0", "0 0 1"])
        for c in (2, 3):
            fx, fy = fx_n * W0, fy_n * H0
            tx = -fx * baseline if c == 3 else 0.0
            f.write(f"S_rect_0{c}: {W0:.6e} {H0:.6e}\n")
            f.write(f"R_rect_0{c if c else 0}: {R}\n")
            f.write(f"P_rect_0{c}: {fx:.6e} 0 {W0 / 2:.6e} {tx:.6e} "
                    f"0 {fy:.6e} {H0 / 2:.6e} 0 0 0 1 0\n")
        f.write(f"R_rect_00: {R}\n")
    with open(osp.join(drive, "calib_velo_to_cam.txt"), "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
    with open(osp.join(drive, "calib_imu_to_velo.txt"), "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")


def _mk(path):
    os.makedirs(osp.dirname(path), exist_ok=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "assets"))
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()
    make_nuscenes(args.out, args.frames)
    make_waymo(args.out, args.frames)
    make_kitti(args.out, args.frames)
    total = 0
    for dirpath, _, files in os.walk(args.out):
        total += sum(osp.getsize(osp.join(dirpath, f)) for f in files)
    print(f"fixtures written under {args.out} ({total / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
