"""Golden tests for ops/geometry.py against torch-expressed reference math.

The torch snippets here re-express the mathematical definitions from the
reference (tools.py / networks/layers.py) to produce goldens; the jax
implementations under test are independent TPU-first designs.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dynamo_depth_tpu.ops import (
    backproject,
    depth_to_disp,
    disp_to_depth,
    project,
    transformation_from_parameters,
)


def torch_rot_from_axisangle(vec):
    # Rodrigues with the reference's 1e-7 guard (layers.py:43-82)
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def torch_transformation(axisangle, translation, invert):
    R = torch_rot_from_axisangle(axisangle)
    t = translation.clone()
    if invert:
        R = R.transpose(1, 2)
        t *= -1
    T = torch.zeros(t.shape[0], 4, 4)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3] = t.view(-1, 3)
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def test_disp_depth_roundtrip():
    disp = jnp.linspace(0.0, 1.0, 101)
    scaled, depth = disp_to_depth(disp, 0.1, 100.0)
    assert float(depth.max()) == pytest.approx(100.0)
    assert float(depth.min()) == pytest.approx(0.1)
    back = depth_to_disp(depth, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(disp), atol=1e-5)
    # scaled disp is exactly 1/depth
    np.testing.assert_allclose(np.asarray(scaled), 1.0 / np.asarray(depth), rtol=1e-6)


@pytest.mark.parametrize("invert", [False, True])
def test_transformation_from_parameters(rng, invert):
    aa = rng.randn(4, 3).astype(np.float32) * 0.1
    tr = rng.randn(4, 3).astype(np.float32) * 0.5

    ours = transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr), invert=invert)
    gold = torch_transformation(torch.tensor(aa)[:, None], torch.tensor(tr)[:, None], invert)
    np.testing.assert_allclose(np.asarray(ours), gold.numpy(), atol=1e-5)


def test_transformation_invert_is_inverse(rng):
    aa = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.2)
    tr = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    M = transformation_from_parameters(aa, tr, invert=False)
    Minv = transformation_from_parameters(aa, tr, invert=True)
    eye = np.matmul(np.asarray(M), np.asarray(Minv))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-5)


def _make_K(B, H, W):
    K = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K = K.copy()
    K[0] *= W
    K[1] *= H
    return np.broadcast_to(K, (B, 4, 4)).copy()


def test_backproject_project_identity(rng):
    """Projecting backprojected points with T=None lands on the pixel grid."""
    B, H, W = 2, 8, 12
    K = _make_K(B, H, W)
    inv_K = np.linalg.pinv(K)
    depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 20 + 1)

    pts = backproject(depth, jnp.asarray(inv_K))
    pix, flow = project(pts, jnp.asarray(K), None, height=H, width=W)

    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    gx = (xs / (W - 1) - 0.5) * 2
    gy = (ys / (H - 1) - 0.5) * 2
    gold = np.broadcast_to(np.stack([gx, gy], -1), (B, H, W, 2))
    np.testing.assert_allclose(np.asarray(pix), gold, atol=1e-4)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-6)


def test_project_matches_torch_reference_math(rng):
    """Full backproject->transform->project chain vs the reference formulas
    expressed with torch ops (tools.py:191-224)."""
    B, H, W = 2, 6, 10
    K = _make_K(B, H, W)
    inv_K = np.linalg.pinv(K)
    depth = rng.rand(B, H, W).astype(np.float32) * 10 + 0.5
    aa = rng.randn(B, 3).astype(np.float32) * 0.05
    tr = rng.randn(B, 3).astype(np.float32) * 0.2
    T = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr), invert=True))

    # torch golden
    tK, tinvK, tdepth, tT = map(torch.tensor, (K, inv_K, depth, T))
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pix = torch.tensor(
        np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(H * W)], 0)[None].repeat(B, 0),
        dtype=torch.float32,
    )
    cam = torch.matmul(tinvK[:, :3, :3], pix) * tdepth.view(B, 1, -1)
    cam_h = torch.cat([cam, torch.ones(B, 1, H * W)], 1)
    moved = torch.matmul(tT, cam_h)
    uvw = torch.matmul(tK[:, :3, :], moved)
    gpix = uvw[:, :2] / (uvw[:, 2:3] + 1e-7)
    gpix = gpix.view(B, 2, H, W).permute(0, 2, 3, 1).numpy()
    gpix[..., 0] /= W - 1
    gpix[..., 1] /= H - 1
    gpix = (gpix - 0.5) * 2
    gflow = (moved[:, :3] - cam_h[:, :3]).permute(0, 2, 1).numpy()

    pts = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    ours_pix, ours_flow = project(pts, jnp.asarray(K), jnp.asarray(T), height=H, width=W)
    np.testing.assert_allclose(np.asarray(ours_pix), gpix, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_flow), gflow, atol=1e-4)
