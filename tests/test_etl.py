"""ETL tests (round-1 VERDICT item 9).

1. Unit tests for the SDK-free pure helpers in prepare_data/etl_common.py
   (point-in-box fraction, instance-mask extraction, LiDAR projection,
   index-map scatter, odometry assembly) on synthetic arrays — these back
   the waymo/nuScenes ETLs whose SDKs are absent in this image.
2. An end-to-end drive of the runnable KITTI ETL on a synthetic raw-KITTI
   fixture, validated by loading the produced layout with KITTIDataset.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "prepare_data"))

from etl_common import (  # noqa: E402
    assemble_odometry_lines,
    box_point_fraction,
    instance_masks,
    lidar_index_map,
    project_points_to_camera,
    undistort,
)


def _unit_box_corners():
    """Axis-aligned unit cube corners in the waymo/nuScenes corner order:
    base p1..p4 counter-clockwise, then the top starting above p1."""
    base = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    top = base + np.array([0, 0, 1.0])
    return np.concatenate([base, top])


def test_box_point_fraction_unit_cube():
    corners = _unit_box_corners()
    pts = np.array([
        [0.5, 0.5, 0.5],   # inside
        [0.99, 0.01, 0.9],  # inside near corner
        [1.5, 0.5, 0.5],   # outside x
        [0.5, -0.1, 0.5],  # outside y
        [0.5, 0.5, 1.2],   # outside z
        [0.0, 0.5, 0.5],   # on the face -> strict inequality, outside
    ])
    assert box_point_fraction(pts, corners) == pytest.approx(2 / 6)
    assert box_point_fraction(np.zeros((0, 3)), corners) == 0


def test_box_point_fraction_rotated_box():
    # rotate the cube 45 deg about z and translate; inside-ness must follow
    th = np.pi / 4
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    t = np.array([3.0, -2.0, 1.0])
    corners = _unit_box_corners() @ R.T + t
    inside_local = np.array([[0.5, 0.5, 0.5], [0.1, 0.9, 0.1]])
    outside_local = np.array([[1.1, 0.5, 0.5]])
    pts = np.concatenate([inside_local, outside_local]) @ R.T + t
    assert box_point_fraction(pts, corners) == pytest.approx(2 / 3)


def test_instance_masks():
    sem = np.array([[2, 2, 0], [0, 5, 5]])
    inst = np.array([[0, 1, 0], [0, 0, 0]])
    masks, labels = instance_masks(sem, inst, labels=[2, 5])
    # class 2 has instances 0 and 1 -> two masks; class 5 has instance 0 -> one
    assert labels == [2, 2, 5]
    np.testing.assert_array_equal(masks[0], [[1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(masks[1], [[0, 1, 0], [0, 0, 0]])
    np.testing.assert_array_equal(masks[2], [[0, 0, 0], [0, 1, 1]])


def test_project_points_to_camera_identity_extrinsic():
    # camera at the vehicle origin, looking forward (extrinsic = identity):
    # a point at (z_fwd=10, y_left=0, x...) in vehicle frame maps to the
    # principal point at depth 10 after the axis swap.
    intr = (100.0, 100.0, 320.0, 240.0)
    pts = np.array([
        [10.0, 0.0, 0.0],    # straight ahead -> (cx, cy, 10)
        [10.0, -1.0, 0.0],   # 1m to the right -> u = cx + fx/10
        [10.0, 0.0, 1.0],    # 1m up -> v = cy - fy/10
        [-5.0, 0.0, 0.0],    # behind the camera -> dropped
        [0.1, 50.0, 0.0],    # projects far outside the image -> dropped
    ])
    out = project_points_to_camera(pts, intr, np.eye(4), width=640, height=480)
    assert out.shape == (3, 3)
    np.testing.assert_allclose(out[0], [320.0, 240.0, 10.0], atol=1e-9)
    np.testing.assert_allclose(out[1], [330.0, 240.0, 10.0], atol=1e-9)
    np.testing.assert_allclose(out[2], [320.0, 230.0, 10.0], atol=1e-9)


def test_undistort_zero_distortion_roundtrip(rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    intr = [50.0, 50.0, 32.0, 24.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    out, K = undistort(img, intr, dim=[48, 64])
    np.testing.assert_array_equal(out, img)  # no distortion -> identity
    K = np.asarray(K)
    assert K[0, 0] == pytest.approx(50.0 / 64)  # normalized by width
    assert K[1, 1] == pytest.approx(50.0 / 48)  # normalized by height


def test_lidar_index_map_scatter():
    coords = np.array([[3, 1], [0, 0], [3, 1]])  # [col, row]; duplicate pixel
    m = lidar_index_map(coords, height=4, width=5)
    assert m.shape == (4, 5, 1)
    assert m[0, 0, 0] == 1
    assert m[1, 3, 0] == 2  # last scatter wins (matches the reference loop)
    assert (m == -1).sum() == 4 * 5 - 2


def test_assemble_odometry_lines():
    T = np.eye(4)
    T[0, 3] = 2.5
    lines = assemble_odometry_lines([T, T.reshape(-1)])
    assert lines[0] == lines[1]
    vals = np.fromstring(lines[0], sep=" ")  # noqa: NPY201 - test-only
    np.testing.assert_array_equal(vals.reshape(4, 4), T)


# ---------------------------------------------------------------------------
# KITTI ETL end-to-end on a synthetic raw fixture


def _write_raw_kitti(root, rng):
    """Minimal raw-KITTI drive: image_02/03 PNGs, velodyne bins, calibs."""
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    ddir = osp.join(root, date, drive)
    H, W = 96, 320
    for cam in ("image_02", "image_03"):
        os.makedirs(osp.join(ddir, cam, "data"), exist_ok=True)
    os.makedirs(osp.join(ddir, "velodyne_points", "data"), exist_ok=True)

    from PIL import Image

    for i in range(3):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        for cam in ("image_02", "image_03"):
            Image.fromarray(img).save(osp.join(ddir, cam, "data", f"{i:010}.png"))
        # forward-facing points: x in [4, 40] fwd, y lateral, z height
        n = 500
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.rand(n) * 36 + 4
        pts[:, 1] = (rng.rand(n) - 0.5) * 10
        pts[:, 2] = (rng.rand(n) - 0.5) * 2
        pts[:, 3] = rng.rand(n)
        pts.tofile(osp.join(ddir, "velodyne_points", "data", f"{i:010}.bin"))

    # calib: rectified size HxW, identity rectification, simple projection
    P = f"7.0e+01 0.0 {W / 2:.1f} 0.0 0.0 7.0e+01 {H / 2:.1f} 0.0 0.0 0.0 1.0 0.0"
    lines = [
        f"S_rect_02: {W:.6e} {H:.6e}",
        f"S_rect_03: {W:.6e} {H:.6e}",
        "R_rect_00: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0",
        f"P_rect_02: {P}",
        f"P_rect_03: {P}",
    ]
    with open(osp.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # velodyne -> camera: axis swap (x fwd, y left, z up) -> (x right, y down, z fwd)
    with open(osp.join(root, date, "calib_velo_to_cam.txt"), "w") as f:
        f.write("R: 0.0 -1.0 0.0 0.0 0.0 -1.0 1.0 0.0 0.0\n")
        f.write("T: 0.0 0.0 0.0\n")
    return date, drive, (H, W)


def test_kitti_etl_end_to_end(tmp_path, rng):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "processed")
    date, drive, (H, W) = _write_raw_kitti(raw, rng)

    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "prepare_data", "kitti.py"), raw, out],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    ddir = osp.join(out, date, drive)
    for cam in ("image_02", "image_03"):
        for i in range(3):
            assert osp.exists(osp.join(ddir, cam, "rgb", "original", f"{i:010}.png"))
            assert osp.exists(osp.join(ddir, cam, "rgb", "downsample", f"{i:010}.jpg"))
            assert osp.exists(osp.join(ddir, cam, "depth", f"{i:010}.npy"))
    assert osp.exists(osp.join(ddir, "calib_cam_to_cam.txt"))

    # depth points: rows [h, w, z] within image bounds, positive depths
    pts = np.load(osp.join(ddir, "image_02", "depth", "0000000000.npy"))
    assert pts.shape[1] == 3 and len(pts) > 50
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] < H).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] < W).all()
    assert (pts[:, 2] > 0).all()

    # the produced layout feeds the dataset loader end-to-end
    from dynamo_depth_tpu.data import KITTIDataset

    ds = KITTIDataset(
        data_path=out, filenames=[f"{date}/{drive} 1 l"], height=64, width=96,
        cam_name=None, img_type="downsample", frame_idxs=[0, -1, 1],
        num_scales=2, img_ext=".jpg", is_train=False, load_depth=True,
        load_mask=False,
    )
    item = ds[0]
    assert item[("color", 0, 0)].shape == (64, 96, 3)
    assert item["depth_gt"].shape[1] == 3
    assert tuple(item["gt_dim"]) == (H, W)


def test_generate_depth_map_dedup_matches_devkit_loop(tmp_path, rng):
    """The vectorized closest-return dedup in kitti_util.generate_depth_map
    must reproduce the KITTI matlab devkit's insertion-ordered loop exactly —
    including its quirky y*(W-1)+x-1 grouping key, whose collisions make two
    different pixels share a dedup group (reference prepare_data/kitti_util.py
    inherits this verbatim from monodepth2)."""
    from kitti_util import generate_depth_map, load_velodyne_points, read_calib_file

    # tiny synthetic calib: identity-ish rectification, small image
    H, W = 24, 32
    calib = tmp_path / "calib"
    calib.mkdir()
    P = np.array([[20.0, 0, W / 2, 0], [0, 20.0, H / 2, 0], [0, 0, 1, 0]])
    (calib / "calib_cam_to_cam.txt").write_text(
        f"S_rect_02: {W:.6e} {H:.6e}\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: " + " ".join(f"{v:.6e}" for v in P.ravel()) + "\n"
    )
    # velo->cam: x fwd -> z fwd axis shuffle
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    (calib / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n"
    )
    # dense cloud so many pixels collect multiple returns (and the quirky
    # key collides across pixels)
    n_pts = 4000
    velo = np.zeros((n_pts, 4), np.float32)
    velo[:, 0] = rng.uniform(2.0, 30.0, n_pts)      # fwd
    velo[:, 1] = rng.uniform(-10.0, 10.0, n_pts)    # left
    velo[:, 2] = rng.uniform(-3.0, 3.0, n_pts)      # up
    binf = tmp_path / "velo.bin"
    velo.tofile(binf)

    got = generate_depth_map(str(calib), str(binf), cam=2, vel_depth=True)

    # literal devkit loop (the reference's Counter-based form)
    from collections import Counter

    cam2cam = read_calib_file(str(calib / "calib_cam_to_cam.txt"))
    velo2cam_raw = read_calib_file(str(calib / "calib_velo_to_cam.txt"))
    velo2cam = np.hstack((velo2cam_raw["R"].reshape(3, 3), velo2cam_raw["T"][..., None]))
    velo2cam = np.vstack((velo2cam, np.array([0, 0, 0, 1.0])))
    im_shape = cam2cam["S_rect_02"][::-1].astype(np.int32)
    R_cam2rect = np.eye(4)
    R_cam2rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)
    P_velo2im = cam2cam["P_rect_02"].reshape(3, 4) @ R_cam2rect @ velo2cam
    v = load_velodyne_points(str(binf))
    v = v[v[:, 0] >= 0, :]
    pts_im = (P_velo2im @ v.T).T
    pts_im[:, :2] = pts_im[:, :2] / pts_im[:, 2][..., None]
    pts_im[:, 2] = v[:, 0]
    pts_im[:, 0] = np.round(pts_im[:, 0]) - 1
    pts_im[:, 1] = np.round(pts_im[:, 1]) - 1
    val = (pts_im[:, 0] >= 0) & (pts_im[:, 1] >= 0)
    val &= (pts_im[:, 0] < im_shape[1]) & (pts_im[:, 1] < im_shape[0])
    pts_im = pts_im[val, :]
    want = np.zeros(im_shape[:2])
    want[pts_im[:, 1].astype(np.int64), pts_im[:, 0].astype(np.int64)] = pts_im[:, 2]
    inds = pts_im[:, 1] * (im_shape[1] - 1) + pts_im[:, 0] - 1
    for dd in [item for item, count in Counter(inds).items() if count > 1]:
        pts = np.where(inds == dd)[0]
        want[int(pts_im[pts[0], 1]), int(pts_im[pts[0], 0])] = pts_im[pts, 2].min()
    want[want < 0] = 0

    # sanity: the fixture actually exercises dup groups AND key collisions
    cnt = Counter(inds)
    assert any(c > 1 for c in cnt.values())
    np.testing.assert_array_equal(got, want)
