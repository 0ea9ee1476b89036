"""KITTI calibration + velodyne projection utilities
(reference ``prepare_data/kitti_util.py``; the projection itself follows the
standard KITTI devkit recipe also used by monodepth2)."""

from __future__ import annotations

import os.path as osp

import numpy as np


def load_velodyne_points(filename):
    """Velodyne .bin -> (N, 4) homogeneous points (x fwd, y left, z up)."""
    points = np.fromfile(filename, dtype=np.float32).reshape(-1, 4)
    points[:, 3] = 1.0
    return points


def read_calib_file(path):
    """KITTI calib txt -> dict of float arrays where parseable."""
    float_chars = set("0123456789.e+- ")
    data = {}
    with open(path, "r") as f:
        for line in f.readlines():
            key, value = line.split(":", 1)
            value = value.strip()
            data[key] = value
            if float_chars.issuperset(value):
                try:
                    data[key] = np.array(list(map(float, value.split(" "))))
                except ValueError:
                    pass
    return data


def generate_depth_map(calib_dir, velo_filename, cam=2, vel_depth=False):
    """Project velodyne points into the rectified camera -> dense (H, W) depth
    map with nearest-depth de-duplication."""
    cam2cam = read_calib_file(osp.join(calib_dir, "calib_cam_to_cam.txt"))
    velo2cam_raw = read_calib_file(osp.join(calib_dir, "calib_velo_to_cam.txt"))
    velo2cam = np.hstack((velo2cam_raw["R"].reshape(3, 3), velo2cam_raw["T"][..., np.newaxis]))
    velo2cam = np.vstack((velo2cam, np.array([0, 0, 0, 1.0])))

    im_shape = cam2cam["S_rect_02"][::-1].astype(np.int32)

    R_cam2rect = np.eye(4)
    R_cam2rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)
    P_rect = cam2cam["P_rect_0" + str(cam)].reshape(3, 4)
    P_velo2im = P_rect @ R_cam2rect @ velo2cam

    velo = load_velodyne_points(velo_filename)
    velo = velo[velo[:, 0] >= 0, :]  # drop points behind the image plane

    pts_im = (P_velo2im @ velo.T).T
    pts_im[:, :2] = pts_im[:, :2] / pts_im[:, 2][..., np.newaxis]
    if vel_depth:
        pts_im[:, 2] = velo[:, 0]

    # -1 to match the KITTI matlab devkit exactly
    pts_im[:, 0] = np.round(pts_im[:, 0]) - 1
    pts_im[:, 1] = np.round(pts_im[:, 1]) - 1
    valid = (pts_im[:, 0] >= 0) & (pts_im[:, 1] >= 0)
    valid &= (pts_im[:, 0] < im_shape[1]) & (pts_im[:, 1] < im_shape[0])
    pts_im = pts_im[valid, :]

    depth = np.zeros(im_shape[:2])
    depth[pts_im[:, 1].astype(np.int64), pts_im[:, 0].astype(np.int64)] = pts_im[:, 2]

    # Duplicates -> keep the closest return. The KITTI matlab devkit groups
    # points by the (quirky, collision-prone) key y*(W-1)+x-1 and writes each
    # group's min depth at the group's FIRST point — reproduced here
    # vectorized: stable-sort by key, segment-min, write dup groups in
    # first-occurrence order so any same-pixel write races resolve as the
    # devkit's insertion-ordered loop did.
    n = depth.shape[1]
    inds = pts_im[:, 1] * (n - 1) + pts_im[:, 0] - 1
    if inds.size:
        order = np.argsort(inds, kind="stable")
        sorted_inds = inds[order]
        is_first = np.r_[True, sorted_inds[1:] != sorted_inds[:-1]]
        group_of = np.cumsum(is_first) - 1
        n_groups = int(group_of[-1]) + 1
        gmin = np.full(n_groups, np.inf)
        np.minimum.at(gmin, group_of, pts_im[order, 2])
        counts = np.bincount(group_of, minlength=n_groups)
        first_pt = order[is_first]  # first occurrence (stable sort) per group
        dup = counts > 1
        write_order = np.argsort(first_pt[dup], kind="stable")
        ys = pts_im[first_pt[dup], 1].astype(np.int64)[write_order]
        xs = pts_im[first_pt[dup], 0].astype(np.int64)[write_order]
        depth[ys, xs] = gmin[dup][write_order]
    depth[depth < 0] = 0
    return depth
