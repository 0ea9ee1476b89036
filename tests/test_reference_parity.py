"""Direct numerical parity against the reference implementation itself.

``/root/reference/tools.py`` depends only on torch+numpy, so when a reference
checkout is mounted we import it and compare our jax ops against the actual
reference modules on random inputs (no reference code is copied — it is
executed as the golden). Skipped when no checkout is available.
"""

import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not osp.exists(osp.join(REF, "tools.py")), reason="reference checkout not mounted"
)

if osp.exists(osp.join(REF, "tools.py")):
    sys.path.insert(0, REF)
    import importlib.util

    import torch

    import tools as ref_tools  # the reference module, as golden

    # networks/__init__.py pulls in torchvision (absent here); load layers.py
    # directly by path instead.
    _spec = importlib.util.spec_from_file_location(
        "ref_layers", osp.join(REF, "networks", "layers.py")
    )
    ref_layers = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(ref_layers)


def _nchw(x):
    return torch.tensor(np.moveaxis(x, -1, 1))


def test_ssim_parity(rng):
    x = rng.rand(2, 12, 18, 3).astype(np.float32)
    y = rng.rand(2, 12, 18, 3).astype(np.float32)
    from dynamo_depth_tpu.ops import ssim

    gold = ref_tools.SSIM()(_nchw(x), _nchw(y)).detach().numpy()
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, np.moveaxis(gold, 1, -1), atol=1e-5)


def test_disp_depth_parity():
    from dynamo_depth_tpu.ops import depth_to_disp, disp_to_depth

    disp = np.linspace(0, 1, 97, dtype=np.float32)
    g_scaled, g_depth = ref_tools.disp_to_depth(torch.tensor(disp), 0.1, 100.0)
    scaled, depth = disp_to_depth(jnp.asarray(disp), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(scaled), g_scaled.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), g_depth.numpy(), rtol=1e-5)

    g_disp = ref_tools.depth_to_disp(g_depth, 0.1, 100.0)
    np.testing.assert_allclose(
        np.asarray(depth_to_disp(depth, 0.1, 100.0)), g_disp.numpy(), atol=1e-5
    )


def test_backproject_project_parity(rng):
    from dynamo_depth_tpu.ops import backproject, project

    B, H, W = 2, 6, 9
    K = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K = K.copy()
    K[0] *= W
    K[1] *= H
    Kb = np.broadcast_to(K, (B, 4, 4)).copy()
    inv_K = np.linalg.pinv(Kb)
    depth = rng.rand(B, H, W).astype(np.float32) * 30 + 1
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T[:, :3, 3] = rng.randn(B, 3).astype(np.float32) * 0.3

    ref_bp = ref_tools.BackprojectDepth(B, H, W)
    ref_pj = ref_tools.Project3D(B, H, W)
    cam_points = ref_bp(torch.tensor(depth)[:, None], torch.tensor(inv_K))
    g_pix, g_flow = ref_pj(cam_points, torch.tensor(Kb), torch.tensor(T))

    pts = backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    pix, flow = project(pts, jnp.asarray(Kb), jnp.asarray(T), height=H, width=W)

    np.testing.assert_allclose(np.asarray(pix), g_pix.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(flow),
        g_flow.detach().numpy().transpose(0, 2, 1),
        atol=1e-4,
    )


def test_transformation_parity(rng):
    from dynamo_depth_tpu.ops import transformation_from_parameters

    aa = rng.randn(3, 3).astype(np.float32) * 0.1
    tr = rng.randn(3, 3).astype(np.float32) * 0.4
    for invert in (False, True):
        gold = ref_layers.transformation_from_parameters(
            torch.tensor(aa)[:, None], torch.tensor(tr)[:, None], invert
        ).numpy()
        ours = np.asarray(
            transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr), invert=invert)
        )
        np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_smooth_loss_parity(rng):
    from dynamo_depth_tpu.ops import smooth_loss

    inp = rng.rand(2, 10, 14, 1).astype(np.float32)
    img = rng.rand(2, 10, 14, 3).astype(np.float32)
    gold = ref_tools.compute_smooth_loss(_nchw(inp), _nchw(img)).item()
    ours = float(smooth_loss(jnp.asarray(inp), jnp.asarray(img)))
    assert ours == pytest.approx(gold, abs=1e-6)


def test_compute_errors_parity(rng):
    from dynamo_depth_tpu.ops import compute_errors

    gt = (rng.rand(500) * 60 + 1).astype(np.float32)
    pred = np.clip(gt + rng.randn(500).astype(np.float32) * 4, 0.5, None)
    gold = [float(m) for m in ref_tools.compute_errors(torch.tensor(gt), torch.tensor(pred))]
    ours, cnt = compute_errors(jnp.asarray(gt), jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(ours), gold, atol=1e-4)


def test_depth_metrics_parity_vs_reference_module(rng):
    """Full DepthMetrics forward (tools.py:6-73) vs our static-shape
    formulation, including the per-mask-label breakdown."""
    from dynamo_depth_tpu.ops.metrics import DEPTH_METRIC_NAMES, depth_metrics

    B, H, W, N = 2, 24, 32, 400
    gt_h, gt_w = 96, 160
    disp = (rng.rand(B, H, W, 1) * 0.2 + 0.02).astype(np.float32)
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.randint(0, gt_h, (B, N))
    pts[..., 1] = rng.randint(0, gt_w, (B, N))
    pts[..., 2] = rng.rand(B, N) * 60 + 0.5
    valid = (rng.rand(B, N) > 0.15).astype(np.float32)
    gt_dim = np.tile(np.array([[gt_h, gt_w]], np.int32), (B, 1))
    bound = [0.1, 0.95, 0.05, 0.9]
    mask_full = rng.randint(0, 4, (B, gt_h, gt_w)).astype(np.uint8)

    ref_metrics = ref_tools.DepthMetrics(bound, 1e-3, 80.0)
    inputs = {
        "depth_gt": torch.tensor(pts),
        "depth_valid": torch.tensor(valid),
        "gt_dim": torch.tensor(gt_dim),
    }
    outputs = {("disp_scaled", 0, 0): _nchw(disp)}
    gold = ref_metrics(inputs, outputs, mask=torch.tensor(mask_full))

    mask_pts = np.zeros((B, N), np.int32)
    for b in range(B):
        mask_pts[b] = mask_full[b][
            pts[b, :, 0].astype(np.int64), pts[b, :, 1].astype(np.int64)
        ]
    ours = depth_metrics(
        jnp.asarray(disp), jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt_dim),
        np.asarray(bound, np.float32), min_depth=1e-3, max_depth=80.0,
        mask_pts=jnp.asarray(mask_pts), labels=(0, 1, 2, 3),
    )

    for name in DEPTH_METRIC_NAMES:
        assert float(ours[name]) == pytest.approx(float(gold[name]), abs=3e-4), name
        for lbl in (0, 1, 2, 3):
            if lbl in gold[f"{name}_mask"]:
                gsum, gcnt = gold[f"{name}_mask"][lbl]
                osum, ocnt = ours[f"{name}_mask/{lbl}"]
                assert float(ocnt) == pytest.approx(gcnt, abs=0.5), (name, lbl)
                assert float(osum) == pytest.approx(gsum, rel=2e-3, abs=2e-3), (name, lbl)


def test_inv3x3_matches_lu_inverse(rng):
    """ground_plane._inv3x3 (closed-form adjugate, replaces the LU
    custom-calls that cost 5.5 ms/step on the v5e — BENCH.md round 4) must
    match numpy's inverse on RANSAC-shaped normal-equation matrices."""
    from dynamo_depth_tpu.ops.ground_plane import _inv3x3

    A = rng.randn(400, 5, 3).astype(np.float32)
    m = np.einsum("bni,bnj->bij", A, A) + 1e-6  # AtA + reg, as in the solve
    ref = np.linalg.inv(m.astype(np.float64))
    got = np.asarray(_inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_ground_plane_deterministic_parts_parity(rng):
    """RANSAC sampling differs (host numpy vs jax PRNG), but the plane
    least-squares solve and distance computation must match exactly."""
    gp = ref_tools.GroundPlane(num_points_per_it=5, max_it=4, tol=0.1)
    pts = torch.tensor(rng.randn(2, 4 * 5, 3).astype(np.float32))
    w_gold = gp.calc_param(pts).reshape(-1, 3, 1)
    d_gold = gp.dist_from_plane(pts.repeat(4, 1, 1), w_gold)

    from dynamo_depth_tpu.ops.ground_plane import _plane_AB

    samp = jnp.asarray(pts.numpy()).reshape(2 * 4, 5, 3)
    A, b = _plane_AB(samp)
    At = jnp.swapaxes(A, 1, 2)
    w = jnp.linalg.inv(At @ A + 1e-6) @ At @ b
    np.testing.assert_allclose(np.asarray(w), w_gold.numpy(), atol=2e-4)

    # distance formula: same (points, plane) pairing as the golden call above.
    # (NOTE: the reference's *scoring* pairs ws b-major with ps batch-tiled —
    # tools.py:131-133 — scoring hypothesis (b, m) against batch element
    # (b*max_it+m) % B; our ground_plane_fit deliberately scores each
    # hypothesis against its own batch element.)
    ps = pts.repeat(4, 1, 1)  # the reference's tiled ordering
    Ac, bc = _plane_AB(jnp.asarray(ps.numpy()))
    d = jnp.einsum("bnk,bkj->bnj", Ac, jnp.asarray(w_gold.numpy())) - bc
    np.testing.assert_allclose(np.asarray(d), d_gold.numpy(), atol=2e-4)


def test_ground_plane_reference_score_mode_full_parity(rng):
    """score_mode='reference' reproduces the reference GroundPlane end to end
    (tools.py:76-164) including its batch-mixing hypothesis pairing, given
    the same sampled points (host sampling injected via sample_idx)."""
    from dynamo_depth_tpu.ops.ground_plane import ground_plane_fit

    B, H, W = 3, 10, 8
    max_it, npts, tol, g_prior = 6, 5, 0.05, 0.4
    pts = rng.randn(B, H, W, 3).astype(np.float32)
    # make the bottom rows roughly planar so inlier counts differentiate
    gh = int(g_prior * H)
    pts[:, H - gh :, :, 1] = 0.1 * pts[:, H - gh :, :, 0] + 0.05 \
        + rng.randn(B, gh, W).astype(np.float32) * 0.02

    gp = ref_tools.GroundPlane(num_points_per_it=npts, max_it=max_it, tol=tol,
                               g_prior=g_prior)
    t_pts = torch.tensor(np.moveaxis(pts, -1, 1))  # (B, 3, H, W)

    np.random.seed(7)
    g_dist, g_param = gp(t_pts)

    # replay the reference's np.random.choice draws for injection
    N = gh * W
    np.random.seed(7)
    idx = np.stack([np.random.choice(np.arange(N), npts * max_it, replace=True)
                    for _ in range(B)])

    dist, param = ground_plane_fit(
        jnp.asarray(pts), jax.random.PRNGKey(0),
        num_points_per_it=npts, max_it=max_it, tol=tol, g_prior=g_prior,
        score_mode="reference", sample_idx=jnp.asarray(idx),
    )

    np.testing.assert_allclose(np.asarray(param), g_param.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dist)[..., 0], g_dist.numpy()[:, 0], atol=1e-4
    )
