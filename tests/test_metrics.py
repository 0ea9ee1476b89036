"""Tests for ops/metrics.py and ops/ground_plane.py."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.ground_plane import ground_plane_fit
from dynamo_depth_tpu.ops.metrics import DEPTH_METRIC_NAMES, compute_errors, depth_metrics


def torch_reference_metrics(disp_p, depth_g, valid, gt_dim, img_bound, min_depth, max_depth):
    """The reference DepthMetrics math (tools.py:27-53) expressed in torch."""
    gt_h, gt_w = int(gt_dim[0]), int(gt_dim[1])
    up, down = int(img_bound[0] * gt_h), int(img_bound[1] * gt_h)
    left, right = int(img_bound[2] * gt_w), int(img_bound[3] * gt_w)

    dg = torch.tensor(depth_g)
    v = torch.tensor(valid) > 0
    v &= (dg[:, 0] >= up) & (dg[:, 0] < down) & (dg[:, 1] >= left) & (dg[:, 1] < right)
    v &= (dg[:, 2] > min_depth) & (dg[:, 2] < max_depth)

    valid_ind = dg[:, 0][v].long(), dg[:, 1][v].long()
    dp = torch.tensor(np.moveaxis(disp_p, -1, 0))[None]  # (1, 1, H, W)
    depth_full = 1 / F.interpolate(dp, (gt_h, gt_w), mode="bilinear", align_corners=False).squeeze()

    d_gt = dg[:, 2][v]
    d_pd = depth_full[valid_ind]
    d_pd = d_pd * (torch.median(d_gt) / torch.median(d_pd))
    d_pd = torch.clamp(d_pd, min_depth, max_depth)

    thresh = torch.max(d_gt / d_pd, d_pd / d_gt)
    a1 = (thresh < 1.25).float().mean()
    a2 = (thresh < 1.25 ** 2).float().mean()
    a3 = (thresh < 1.25 ** 3).float().mean()
    rmse = torch.sqrt(((d_gt - d_pd) ** 2).mean())
    rmse_log = torch.sqrt(((torch.log(d_gt) - torch.log(d_pd)) ** 2).mean())
    abs_rel = (torch.abs(d_gt - d_pd) / d_gt).mean()
    sq_rel = ((d_gt - d_pd) ** 2 / d_gt).mean()
    return [float(x) for x in (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)]


def test_depth_metrics_matches_torch_reference(rng):
    B, H, W, N = 2, 24, 32, 500
    gt_h, gt_w = 90, 160
    disp = (rng.rand(B, H, W, 1).astype(np.float32) * 0.2 + 0.02)
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.randint(0, gt_h, (B, N))
    pts[..., 1] = rng.randint(0, gt_w, (B, N))
    pts[..., 2] = rng.rand(B, N) * 60 + 0.5
    valid = (rng.rand(B, N) > 0.2).astype(np.float32)
    gt_dim = np.tile(np.array([[gt_h, gt_w]], np.int32), (B, 1))
    img_bound = np.array([0.1, 0.95, 0.05, 0.9], np.float32)

    out = depth_metrics(
        jnp.asarray(disp), jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt_dim),
        img_bound, min_depth=1e-3, max_depth=80.0,
    )

    golds = np.stack([
        torch_reference_metrics(disp[b], pts[b], valid[b], gt_dim[b], img_bound, 1e-3, 80.0)
        for b in range(B)
    ])
    for i, name in enumerate(DEPTH_METRIC_NAMES):
        assert float(out[name]) == __import__("pytest").approx(golds[:, i].mean(), abs=2e-4), name


def test_depth_metrics_sample_weight_ignores_padding(rng):
    B, H, W, N = 3, 16, 20, 200
    disp = rng.rand(B, H, W, 1).astype(np.float32) * 0.2 + 0.05
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.randint(0, 60, (B, N))
    pts[..., 1] = rng.randint(0, 80, (B, N))
    pts[..., 2] = rng.rand(B, N) * 40 + 1
    valid = np.ones((B, N), np.float32)
    gt_dim = np.tile(np.array([[60, 80]], np.int32), (B, 1))
    bound = np.array([0, 1, 0, 1], np.float32)

    full = depth_metrics(jnp.asarray(disp[:2]), jnp.asarray(pts[:2]), jnp.asarray(valid[:2]),
                         jnp.asarray(gt_dim[:2]), bound)
    weighted = depth_metrics(jnp.asarray(disp), jnp.asarray(pts), jnp.asarray(valid),
                             jnp.asarray(gt_dim), bound,
                             sample_weight=jnp.asarray([1.0, 1.0, 0.0]))
    for name in DEPTH_METRIC_NAMES:
        assert float(full[name]) == __import__("pytest").approx(float(weighted[name]), abs=1e-6)


def test_compute_errors_perfect_prediction():
    gt = jnp.asarray(np.linspace(1, 50, 100).astype(np.float32))
    m, cnt = compute_errors(gt, gt)
    m = np.asarray(m)
    assert cnt == 100
    assert m[0] == 0 and m[1] == 0 and m[2] == 0 and m[3] == 0
    assert m[4] == 1 and m[5] == 1 and m[6] == 1


def test_ground_plane_recovers_synthetic_plane(rng):
    """Points on y = 0.1*x + 0.05*z + 1.5 with outliers above the plane."""
    B, H, W = 2, 16, 24
    x = rng.randn(B, H, W).astype(np.float32) * 5
    z = rng.rand(B, H, W).astype(np.float32) * 30
    y = 0.1 * x + 0.05 * z + 1.5
    # corrupt the top half (non-ground region, above the plane)
    y[:, : H // 2] -= rng.rand(B, H // 2, W) * 3
    pts = np.stack([x, y, z], axis=-1)

    dist, param = ground_plane_fit(
        jnp.asarray(pts), jax.random.PRNGKey(0),
        num_points_per_it=5, max_it=100, tol=0.01, g_prior=0.5,
    )
    param = np.asarray(param)[..., 0]
    for b in range(B):
        assert param[b, 0] == __import__("pytest").approx(0.1, abs=0.02)
        assert param[b, 1] == __import__("pytest").approx(0.05, abs=0.02)
        assert param[b, 2] == __import__("pytest").approx(1.5, abs=0.1)
    # distances of bottom-half (ground) points ~ 0
    d = np.asarray(dist)[:, H // 2 :, :, 0]
    assert np.abs(d).mean() < 0.05
