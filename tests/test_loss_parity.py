"""End-to-end loss-assembly parity for the fine_tune phase.

The reference's ``Trainer.generate_images_pred`` + ``compute_losses``
(Trainer.py:215-411) cannot be imported here (wandb/torchvision deps), so
this test re-expresses that math with torch ops as the golden and feeds the
SAME random network outputs through both paths. Deterministic sub-paths only:
automask off (tie-break RNG) and d_ground off (RANSAC RNG) — those are
covered by dedicated tests.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.config import DynamoConfig
from dynamo_depth_tpu.training.losses import compute_losses, view_synthesis

B, H, W = 2, 32, 48
SCALES = [0, 1]
SOURCES = [-1, 1]


def t_nchw(x):
    return torch.tensor(np.moveaxis(np.asarray(x), -1, 1))


def make_cfg():
    return DynamoConfig(
        dataset="kitti", height=H, width=W, scales=list(SCALES),
        depth_model="monodepthv2", g_d_ground=0.0,
    )


def make_data(rng):
    inputs, outputs = {}, {}
    for f in [0] + SOURCES:
        inputs[("color", f, 0)] = rng.rand(B, H, W, 3).astype(np.float32)
        # nuScenes-style variable timesteps scale the complete flow
        # (Trainer.py:251); frame 0's ts is unused.
        inputs[("ts", f)] = (rng.rand(B) * 0.8 + 0.6).astype(np.float32)
    for s in SCALES:
        if s > 0:
            inputs[("color", 0, s)] = rng.rand(B, H // 2 ** s, W // 2 ** s, 3).astype(np.float32)
    K = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    for s in SCALES:
        Ks = K.copy()
        Ks[0] *= W // 2 ** s
        Ks[1] *= H // 2 ** s
        inputs[("K", s)] = np.broadcast_to(Ks, (B, 4, 4)).copy()
        inputs[("inv_K", s)] = np.broadcast_to(np.linalg.pinv(Ks), (B, 4, 4)).copy()

    from dynamo_depth_tpu.ops.geometry import transformation_from_parameters

    for s in SCALES:
        h, w = H // 2 ** s, W // 2 ** s
        outputs[("disp", 0, s)] = (rng.rand(B, h, w, 1) * 0.3 + 0.02).astype(np.float32)
        for f in SOURCES:
            outputs[("complete_flow", f, s)] = (rng.randn(B, h, w, 3) * 0.05).astype(np.float32)
            outputs[("motion_prob", f, s)] = (rng.randn(B, h, w, 1) * 2).astype(np.float32)
            outputs[("motion_mask", f, s)] = 1 / (1 + np.exp(-outputs[("motion_prob", f, s)]))
    for f in SOURCES:
        aa = (rng.randn(B, 3) * 0.02).astype(np.float32)
        tr = (rng.randn(B, 3) * 0.1).astype(np.float32)
        outputs[("cam_T_cam", 0, f)] = np.asarray(
            transformation_from_parameters(jnp.asarray(aa), jnp.asarray(tr), invert=True)
        )
    return inputs, outputs


def torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 1e-4) * (2 * sigma_xy + 9e-4)
    d = (mu_x ** 2 + mu_y ** 2 + 1e-4) * (sigma_x + sigma_y + 9e-4)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def torch_reprojection(pred, target):
    l1 = torch.abs(target - pred).mean(1, True)
    s = torch_ssim(pred, target).mean(1, True)
    return 0.85 * s + 0.15 * l1


def torch_smooth(inp, img):
    gx = torch.abs(inp[:, :, :, :-1] - inp[:, :, :, 1:])
    gy = torch.abs(inp[:, :, :-1, :] - inp[:, :, 1:, :])
    igx = torch.mean(torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1, keepdim=True)
    igy = torch.mean(torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1, keepdim=True)
    return (gx * torch.exp(-igx)).mean() + (gy * torch.exp(-igy)).mean()


def torch_golden_loss(cfg, inputs, outputs):
    """Reference Trainer math (generate_images_pred + compute_losses) for the
    fine_tune phase, automask off, d_ground off."""
    def interp(x, hw):
        return F.interpolate(x, hw, mode="bilinear", align_corners=False)

    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pix = torch.tensor(
        np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(H * W)], 0)[None].repeat(B, 0),
        dtype=torch.float32,
    )
    ones = torch.ones(B, 1, H * W)
    K = torch.tensor(inputs[("K", 0)])
    inv_K = torch.tensor(inputs[("inv_K", 0)])

    def backproject(depth):
        cam = torch.matmul(inv_K[:, :3, :3], pix) * depth.view(B, 1, -1)
        return torch.cat([cam, ones], 1)

    def project(points, T):
        p3 = torch.matmul(T, points) if T is not None else points
        uvw = torch.matmul(K[:, :3, :], p3)
        pc = uvw[:, :2] / (uvw[:, 2:3] + 1e-7)
        pc = pc.view(B, 2, H, W).permute(0, 2, 3, 1).clone()
        pc[..., 0] /= W - 1
        pc[..., 1] /= H - 1
        pc = (pc - 0.5) * 2
        return pc, (p3[:, :3] - points[:, :3])

    warped, out = {}, {}
    for s in SCALES:
        disp = interp(t_nchw(outputs[("disp", 0, s)]), (H, W))
        min_disp, max_disp = 1 / cfg.max_depth, 1 / cfg.min_depth
        depth = 1 / (min_disp + (max_disp - min_disp) * disp)
        for f in SOURCES:
            T = torch.tensor(outputs[("cam_T_cam", 0, f)])
            cam_points = backproject(depth)
            mask_r = interp(t_nchw(outputs[("motion_mask", f, s)]), (H, W))
            sample_ego, ego_flow = project(cam_points, T)
            ts = torch.tensor(inputs[("ts", f)]).view(B, 1, 1)
            cflow = interp(t_nchw(outputs[("complete_flow", f, s)]), (H, W)).view(B, 3, -1) * ts
            residual = cflow - ego_flow
            independ = residual * mask_r.view(B, 1, -1)
            tmp = cam_points.detach().clone()
            tmp[:, :3] += cflow
            sample_complete, _ = project(tmp, None)
            cam_points2 = backproject(depth)
            cam_points2[:, :3] = cam_points2[:, :3] + independ
            sample, _ = project(cam_points2, T)
            warped[(f, s)] = F.grid_sample(
                t_nchw(inputs[("color", f, 0)]), sample,
                padding_mode="border", align_corners=True,
            )
            out[("sample_ego", f, s)] = sample_ego.detach()
            out[("sample_complete", f, s)] = sample_complete.detach()
            out[("residual_flow", f, s)] = interp(
                residual.view(B, 3, H, W), (H // 2 ** s, W // 2 ** s)
            )

    total = torch.tensor(0.0)
    terms = {}
    coefs = {"p_photo": 1.0, "d_smooth": 1e-3, "c_smooth": 1e-3,
             "c_consistency": 5.0, "m_sparsity": 0.04, "m_smooth": 0.1}
    target = t_nchw(inputs[("color", 0, 0)])
    bce = torch.nn.BCEWithLogitsLoss()
    num_frames = len(SOURCES)

    for s in SCALES:
        ps = {k: torch.tensor(0.0) for k in coefs}
        color_s = t_nchw(inputs[("color", 0, s)]) if s else target
        reproj = torch.cat([torch_reprojection(warped[(f, s)], target) for f in SOURCES], 1)
        to_opt, _ = torch.min(reproj, dim=1)
        ps["p_photo"] = to_opt.mean()

        disp = t_nchw(outputs[("disp", 0, s)])
        norm_disp = disp / (disp.mean(2, True).mean(3, True) + 1e-7)
        ps["d_smooth"] = torch_smooth(norm_disp, color_s) / (2 ** s)

        h, w = H // 2 ** s, W // 2 ** s
        for f in SOURCES:
            mask = t_nchw(outputs[("motion_mask", f, s)])
            cflow = t_nchw(outputs[("complete_flow", f, s)])
            ps["c_smooth"] = ps["c_smooth"] + torch_smooth(cflow, color_s) / (2 ** s) / num_frames
            valid_disp = (disp > 0.03).detach().float()
            ps["c_consistency"] = ps["c_consistency"] + torch.mean(
                valid_disp * (1 - mask.detach()) * torch.abs(out[("residual_flow", f, s)])
            ) / (2 ** s) / num_frames

            se = interp(out[("sample_ego", f, s)].permute(0, 3, 1, 2), (h, w))
            sc = interp(out[("sample_complete", f, s)].permute(0, 3, 1, 2), (h, w))
            disp_mag = torch.sum((se - sc) ** 2, 1)
            static = (disp_mag < disp_mag.mean()).unsqueeze(1)
            prob = t_nchw(outputs[("motion_prob", f, s)])
            if torch.all(torch.sum(static, (1, 2, 3)) > 0):
                ps["m_sparsity"] = ps["m_sparsity"] + bce(
                    prob[static], torch.zeros_like(prob[static])
                ) / (2 ** s) / num_frames
            ps["m_smooth"] = ps["m_smooth"] + torch_smooth(mask, color_s) / (2 ** s) / num_frames

        terms[s] = sum(coefs[k] * ps[k] for k in coefs)
        total = total + terms[s] / len(SCALES)
    return float(total), {k: float(v) for k, v in terms.items()}


def test_fine_tune_loss_parity(rng):
    cfg = make_cfg()
    inputs_np, outputs_np = make_data(rng)

    gold_total, gold_terms = torch_golden_loss(cfg, inputs_np, outputs_np)

    inputs = {k: jnp.asarray(v) for k, v in inputs_np.items()}
    outputs = {k: jnp.asarray(v) for k, v in outputs_np.items()}
    view_synthesis(cfg, inputs, outputs, bool_CmpFlow=True, bool_MotMask=True, automask=False)
    losses = compute_losses(
        cfg, inputs, outputs, jax.random.PRNGKey(0),
        bool_CmpFlow=True, bool_MotMask=True, automask=False,
        trainable_networks=("Depth", "Pose", "CmpFlow", "MotMask"),
        step_in_phase=jnp.int32(1000), steps_per_epoch=100,  # ramp saturated
    )

    assert float(losses["loss"]) == pytest.approx(gold_total, rel=2e-4, abs=2e-5)
    for s in SCALES:
        assert float(losses[f"loss_term/{s}"]) == pytest.approx(
            gold_terms[s], rel=2e-4, abs=2e-5
        ), f"scale {s}"


def test_disp_init_loss_parity(rng):
    """disp_init (no motion networks): photometric + d_smooth only, automask
    disabled for determinism."""
    cfg = make_cfg()
    inputs_np, outputs_np = make_data(rng)
    outputs_np = {
        k: v for k, v in outputs_np.items()
        if k[0] in ("disp", "cam_T_cam")
    }

    # torch golden: warp with T only (Trainer.py:273-278)
    def interp(x, hw):
        return F.interpolate(x, hw, mode="bilinear", align_corners=False)

    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pix = torch.tensor(
        np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(H * W)], 0)[None].repeat(B, 0),
        dtype=torch.float32,
    )
    ones = torch.ones(B, 1, H * W)
    K = torch.tensor(inputs_np[("K", 0)])
    inv_K = torch.tensor(inputs_np[("inv_K", 0)])
    target = t_nchw(inputs_np[("color", 0, 0)])

    gold_total = torch.tensor(0.0)
    for s in SCALES:
        disp = interp(t_nchw(outputs_np[("disp", 0, s)]), (H, W))
        depth = 1 / (1 / 100.0 + (1 / 0.1 - 1 / 100.0) * disp)
        reprojs = []
        for f in SOURCES:
            T = torch.tensor(outputs_np[("cam_T_cam", 0, f)])
            cam = torch.matmul(inv_K[:, :3, :3], pix) * depth.view(B, 1, -1)
            cam = torch.cat([cam, ones], 1)
            uvw = torch.matmul(K[:, :3, :], torch.matmul(T, cam))
            pc = uvw[:, :2] / (uvw[:, 2:3] + 1e-7)
            pc = pc.view(B, 2, H, W).permute(0, 2, 3, 1).clone()
            pc[..., 0] /= W - 1
            pc[..., 1] /= H - 1
            pc = (pc - 0.5) * 2
            warped = F.grid_sample(t_nchw(inputs_np[("color", f, 0)]), pc,
                                   padding_mode="border", align_corners=True)
            reprojs.append(torch_reprojection(warped, target))
        to_opt, _ = torch.min(torch.cat(reprojs, 1), dim=1)
        d = t_nchw(outputs_np[("disp", 0, s)])
        nd = d / (d.mean(2, True).mean(3, True) + 1e-7)
        color_s = t_nchw(inputs_np[("color", 0, s)]) if s else target
        term = to_opt.mean() + 1e-3 * torch_smooth(nd, color_s) / (2 ** s)
        gold_total = gold_total + term / len(SCALES)

    inputs = {k: jnp.asarray(v) for k, v in inputs_np.items()}
    outputs = {k: jnp.asarray(v) for k, v in outputs_np.items()}
    view_synthesis(cfg, inputs, outputs, bool_CmpFlow=False, bool_MotMask=False, automask=False)
    losses = compute_losses(
        cfg, inputs, outputs, jax.random.PRNGKey(0),
        bool_CmpFlow=False, bool_MotMask=False, automask=False,
        trainable_networks=("Depth", "Pose"),
        step_in_phase=jnp.int32(0), steps_per_epoch=100,
    )
    assert float(losses["loss"]) == pytest.approx(float(gold_total), rel=2e-4, abs=2e-5)
