"""View synthesis + loss assembly (reference ``Trainer.py:215-461``).

Pure functions of (config, inputs, outputs, rng) that trace into the jitted
train step. ``bool_CmpFlow`` / ``bool_MotMask`` / ``automask`` and the set of
trainable networks are static per curriculum phase, so each phase compiles
its own specialization with dead branches eliminated.

Warping happens at full resolution for every scale (disparity upsampled
first), exactly as Trainer.py:225-287. The reprojection minimum over source
frames with identity automasking + tie-break noise follows
Trainer.py:327-350; the motion regularizers (flow smoothness, static-region
flow<->ego consistency, mask sparsity BCE on below-mean 2D displacement,
mask smoothness) follow Trainer.py:366-402.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.geometry import (
    backproject,
    depth_to_disp,
    disp_to_depth,
    pixel_grid,
)
from dynamo_depth_tpu.ops.ground_plane import ground_plane_fit
from dynamo_depth_tpu.ops.photometric import reprojection_loss as _reprojection_loss_xla, smooth_loss
from dynamo_depth_tpu.ops.warp import grid_sample, resize_bilinear

LOSS_TERMS = ("p_photo", "d_smooth", "d_ground", "c_smooth", "c_consistency", "m_sparsity", "m_smooth")


def _image_dtype(cfg, image=None):
    """Warp-gather operand storage dtype.

    ``auto`` (default) picks bf16 only for large per-device operands: the
    v5e A/Bs (BENCH.md round-4 table + round-5 knee validation) measured
    bf16 operands LOSING at batch 3 (102.7 vs 95.3 ms/step — the sub-word
    gather overhead beats the byte savings on a small working set, matching
    the round-2 isolated probe), batch 6 (171.5 vs 165.0) and batch 7
    (189.1 vs 181.5), but WINNING at batch 8 (214.3 vs 219.7) and batch 16
    where the 4x packed operand is HBM-bound. Threshold 7*2**17 = 917504
    pixels separates the nearest measured loss (b7: 860k) from the nearest
    measured win (b8: 983k); round 4's 2**19 guess sat below the b6/b7
    losses."""
    mode = getattr(cfg, "image_dtype", "auto")
    if mode == "auto":
        if image is None:
            return jnp.float32
        B, H, W = image.shape[0], image.shape[1], image.shape[2]
        return jnp.bfloat16 if B * H * W >= 7 * 2**17 else jnp.float32
    return jnp.bfloat16 if mode == "bfloat16" else jnp.float32


def _reprojection_loss(cfg, pred, target):
    """Photometric error, optionally via the fused Pallas kernel.

    Stays float32 regardless of ``--image_dtype``: casting the SSIM inputs
    to bf16 was measured at up to ~7% relative per-pixel loss error (the
    variance/covariance terms amplify quantization), enough to flip
    per-pixel min-over-sources choices — not worth the traffic win."""
    if getattr(cfg, "pallas_photometric", False):
        from dynamo_depth_tpu.ops.pallas import reprojection_loss_fused

        return reprojection_loss_fused(pred, target, cfg.ssim_weight)
    return _reprojection_loss_xla(pred, target, ssim_weight=cfg.ssim_weight)


def _grid_sample(cfg, image, grid):
    """Bilinear warp, optionally via the Pallas gather kernel.

    Under ``--image_dtype bfloat16`` the gather operand is stored bf16
    (halving the warp gathers' HBM traffic — the largest single item in the
    step profile, BENCH.md); the sample coordinates and lerp weights stay
    float32, so the geometry is exact.

    Probe-gated: the 2026-08-16 Mosaic toolchain only compiles within-tile
    dynamic gathers (see ops/pallas/warp_kernel.py docstring), so on TPU the
    probe fails and the XLA gather path is used even under --pallas_warp."""
    image = image.astype(_image_dtype(cfg, image))
    if getattr(cfg, "pallas_warp", False):
        from dynamo_depth_tpu.ops.pallas import grid_sample_pallas
        from dynamo_depth_tpu.ops.pallas.warp_kernel import supported

        if supported():
            return grid_sample_pallas(image, grid)
    return grid_sample(image, grid)


def loss_coefficients(cfg, step_in_phase, steps_per_epoch) -> Dict[str, jnp.ndarray]:
    """Per-term coefficients with the weight ramp
    (Trainer.py:303-310): ramped coefs scale by
    clip(ramp_red * step / steps_per_epoch, 0, 1)."""
    ramp = jnp.clip(cfg.ramp_red * step_in_phase / steps_per_epoch, 0.0, 1.0)
    coefs = {}
    for term in LOSS_TERMS:
        c = jnp.asarray(getattr(cfg, "g_" + term), jnp.float32)
        if ("g_" + term) in cfg.weight_ramp:
            c = c * ramp
        coefs[term] = c
    return coefs


def view_synthesis(cfg, inputs, outputs, *, bool_CmpFlow, bool_MotMask, automask):
    """Generate warped reconstructions per (scale, source frame)
    (Trainer.py:215-287). Mutates and returns ``outputs``."""
    H, W = cfg.height, cfg.width
    sources = list(cfg.frame_ids[1:])
    K = inputs[("K", 0)]
    inv_K = inputs[("inv_K", 0)]

    for scale in cfg.scales:
        disp_native = outputs[("disp", 0, scale)]
        disp = resize_bilinear(disp_native, (H, W))
        disp_scaled, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        outputs[("depth", 0, scale)] = depth
        outputs[("disp_scaled", 0, scale)] = disp_scaled

        cam_points = backproject(depth, inv_K)  # (B, H*W, 3)
        B = depth.shape[0]
        h, w = disp_native.shape[1], disp_native.shape[2]

        for f in sources:
            T = outputs[("cam_T_cam", 0, f)]

            if bool_MotMask:
                mask_r = resize_bilinear(outputs[("motion_mask", f, scale)], (H, W))
            else:
                mask_r = jnp.ones((B, H, W, 1), depth.dtype)
            outputs[("motion_mask_r", f, scale)] = mask_r

            if bool_CmpFlow:
                sample_ego, ego_flow = _project(cam_points, K, T, H, W)
                cflow = resize_bilinear(outputs[("complete_flow", f, scale)], (H, W))
                cflow = cflow.reshape(B, H * W, 3) * inputs[("ts", f)].reshape(B, 1, 1)
                residual_flow = cflow - ego_flow
                independ_flow = residual_flow * mask_r.reshape(B, H * W, 1)

                # Detached 2D samples for mask supervision (Trainer.py:255-260).
                outputs[("sample_ego", f, scale)] = jax.lax.stop_gradient(sample_ego)
                pts_detached = jax.lax.stop_gradient(cam_points)
                sample_complete, _ = _project(pts_detached + cflow, K, None, H, W)
                outputs[("sample_complete", f, scale)] = jax.lax.stop_gradient(sample_complete)

                if bool_MotMask:
                    sample, _ = _project(cam_points + independ_flow, K, T, H, W)
                else:
                    sample, _ = _project(cam_points + cflow, K, None, H, W)
            else:
                sample, ego_flow = _project(cam_points, K, T, H, W)
                residual_flow = jnp.zeros_like(ego_flow)
                independ_flow = jnp.zeros_like(ego_flow)

            outputs[("sample", f, scale)] = sample
            outputs[("color", f, scale)] = _grid_sample(cfg, inputs[("color", f, 0)], sample)
            outputs[("ego_flow", f, scale)] = ego_flow
            outputs[("independ_flow", f, scale)] = independ_flow.reshape(B, H, W, 3)
            outputs[("residual_flow", f, scale)] = resize_bilinear(
                residual_flow.reshape(B, H, W, 3), (h, w)
            )
            if automask:
                outputs[("color_identity", f, scale)] = inputs[("color", f, 0)]

    return outputs


def _project(points, K, T, H, W):
    from dynamo_depth_tpu.ops.geometry import project

    return project(points, K, T, height=H, width=W)


def _bce_with_logits(logits, targets):
    """Elementwise BCEWithLogits (no reduction)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def process_ground(cfg, inputs, outputs, scale, rng):
    """Ground-plane fit + below-ground disparity penalty terms
    (Trainer.py:425-461)."""
    disp = outputs[("disp", 0, scale)]
    _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
    inv_K = inputs[("inv_K", scale)]
    B = disp.shape[0]
    h, w = disp.shape[1], disp.shape[2]

    pts = backproject(depth, inv_K).reshape(B, h, w, 3)
    plane_dist, plane_param = ground_plane_fit(
        pts, rng,
        num_points_per_it=cfg.gp_np_per_it, max_it=cfg.gp_max_it,
        tol=cfg.gp_tol, g_prior=cfg.gp_prior,
        score_mode=getattr(cfg, "gp_score_mode", "per_batch"),
    )

    g_mask = (jnp.abs(plane_dist) < cfg.gp_tol).astype(disp.dtype)
    w1 = plane_param[:, 0]
    w2 = plane_param[:, 1]
    w3 = plane_param[:, 2] + cfg.gp_tol  # Trainer.py:437-438

    # Unit-depth rays v = inv_K @ pix (Trainer.py:452-457).
    pix = pixel_grid(h, w)
    rays = jnp.einsum("bij,nj->bni", inv_K[:, :3, :3], pix, precision=jax.lax.Precision.HIGHEST)
    vx, vy, vz = rays[..., 0], rays[..., 1], rays[..., 2]
    # NaN-safe division (double-where): a ray parallel to the fitted plane
    # gives denom ~ 0 — w3/0 = +-inf is caught by the range check below, but
    # 0/0 = NaN is NOT (NaN compares false), and even a where() on the
    # result still leaks NaN through the *gradient* of the untaken branch.
    # Caught live: two NaN d_ground val losses in the round-4 TPU bf16
    # convergence arm (BENCH.md). The reference's in-place masked assign has
    # the same latent hole (Trainer.py:458-459); semantics only diverge on
    # degenerate fits where the reference NaNs out.
    denom = vy - vx * w1 - vz * w2
    degenerate = jnp.abs(denom) < 1e-12
    safe_denom = jnp.where(degenerate, 1.0, denom)
    ground_depth = jnp.where(degenerate, cfg.max_depth + 1.0, w3 / safe_denom)
    ground_depth = ground_depth.reshape(B, h, w, 1)
    # ~(x > 0) also catches NaN (compares false) and exactly-0 depth, whose
    # depth_to_disp is inf (plane through the camera center — the reference's
    # `< 0` check lets it through and the loss is +-inf there).
    invalid = ~(ground_depth > 0) | (ground_depth > cfg.max_depth)
    ground_depth = jnp.where(invalid, cfg.max_depth, ground_depth)
    ground_disp = depth_to_disp(ground_depth, cfg.min_depth, cfg.max_depth)

    disp_diff = disp - ground_disp
    disp_diff = jnp.where(ground_depth == cfg.max_depth, 0.0, disp_diff)
    return plane_dist, disp_diff, g_mask


def compute_losses(
    cfg,
    inputs,
    outputs,
    rng,
    *,
    bool_CmpFlow: bool,
    bool_MotMask: bool,
    automask: bool,
    trainable_networks: Tuple[str, ...],
    step_in_phase,
    steps_per_epoch: int,
) -> Dict[str, jnp.ndarray]:
    """Assemble the total loss (Trainer.py:289-411). Returns a dict with
    'loss' plus per-term / per-coefficient scalars for logging."""
    move_Depth = "Depth" in trainable_networks
    move_CmpFlow = "CmpFlow" in trainable_networks
    move_MotMask = "MotMask" in trainable_networks

    sources = list(cfg.frame_ids[1:])
    num_frames = len(sources)
    H, W = cfg.height, cfg.width

    coefs = loss_coefficients(cfg, step_in_phase, steps_per_epoch)
    losses: Dict[str, jnp.ndarray] = {"loss": jnp.float32(0.0)}
    for term in LOSS_TERMS:
        losses[f"loss_term/{term}"] = jnp.float32(0.0)
        losses[f"loss_coef/{term}"] = coefs[term]
    for scale in cfg.scales:
        losses[f"loss_term/{scale}"] = jnp.float32(0.0)

    target = inputs[("color", 0, 0)]

    rng_noise, rng_ground = jax.random.split(rng)

    for scale in cfg.scales:
        ps = {k: jnp.float32(0.0) for k in LOSS_TERMS}
        color_s = inputs[("color", 0, scale)]

        # --- photometric with min over sources (+ identity automask) -------
        reproj = jnp.concatenate(
            [_reprojection_loss(cfg, outputs[("color", f, scale)], target) for f in sources],
            axis=-1,
        )  # (B, H, W, F)

        if automask:
            identity = jnp.concatenate(
                [_reprojection_loss(cfg, inputs[("color", f, 0)], target) for f in sources],
                axis=-1,
            )
            noise = jax.random.normal(jax.random.fold_in(rng_noise, scale), identity.shape) * 1e-5
            combined = jnp.concatenate([identity + noise, reproj], axis=-1)
        else:
            combined = reproj

        if combined.shape[-1] == 1:
            to_optimise = combined[..., 0]
        else:
            to_optimise = jnp.min(combined, axis=-1)
            if automask:
                idxs = jnp.argmin(combined, axis=-1)
                outputs[f"identity_selection/{scale}"] = (
                    idxs > (identity.shape[-1] - 1)
                ).astype(jnp.float32)

        ps["p_photo"] = jnp.mean(to_optimise)

        # --- disparity regularization --------------------------------------
        if move_Depth:
            disp = outputs[("disp", 0, scale)]
            if cfg.g_d_smooth > 0:
                norm_disp = disp / (jnp.mean(disp, axis=(1, 2), keepdims=True) + 1e-7)
                ps["d_smooth"] = smooth_loss(norm_disp, color_s) / (2 ** scale)

            if cfg.g_d_ground > 0 and bool_MotMask:
                _, disp_diff, _ = process_ground(
                    cfg, inputs, outputs, scale, jax.random.fold_in(rng_ground, scale)
                )
                disp_diff = jnp.minimum(disp_diff, 0.0)  # below ground is negative
                ps["d_ground"] = -1.0 * jnp.mean(disp_diff) / (2 ** scale)

        # --- motion regularization -----------------------------------------
        for f in sources:
            disp = outputs[("disp", 0, scale)]
            motion_mask = outputs.get(("motion_mask", f, scale))
            h, w = disp.shape[1], disp.shape[2]

            if move_CmpFlow and bool_CmpFlow:
                complete_flow = outputs[("complete_flow", f, scale)]
                residual_flow = outputs[("residual_flow", f, scale)]

                if cfg.g_c_smooth > 0:
                    ps["c_smooth"] += smooth_loss(complete_flow, color_s) / (2 ** scale) / num_frames

                if bool_MotMask and cfg.g_c_consistency > 0:
                    valid_disp = jax.lax.stop_gradient((disp > cfg.mask_disp_thrd).astype(disp.dtype))
                    mask_det = jax.lax.stop_gradient(motion_mask)
                    ps["c_consistency"] += (
                        jnp.mean(valid_disp * (1 - mask_det) * jnp.abs(residual_flow))
                        / (2 ** scale) / num_frames
                    )

            if move_MotMask and bool_MotMask:
                if cfg.g_m_sparsity > 0:
                    sample_ego = resize_bilinear(outputs[("sample_ego", f, scale)], (h, w))
                    sample_complete = resize_bilinear(outputs[("sample_complete", f, scale)], (h, w))
                    disp_mag = jnp.sum((sample_ego - sample_complete) ** 2, axis=-1)  # (B, h, w)
                    static = disp_mag < jnp.mean(disp_mag)  # global batch mean (Trainer.py:397)
                    motion_prob = outputs[("motion_prob", f, scale)][..., 0]
                    n_static = jnp.sum(static.astype(jnp.int32), axis=(1, 2))
                    all_have_static = jnp.all(n_static > 0)
                    bce = _bce_with_logits(motion_prob, jnp.zeros_like(motion_prob))
                    masked_mean = jnp.sum(jnp.where(static, bce, 0.0)) / jnp.maximum(
                        jnp.sum(static.astype(jnp.float32)), 1.0
                    )
                    ps["m_sparsity"] += jnp.where(all_have_static, masked_mean, 0.0) / (
                        2 ** scale
                    ) / num_frames

                if cfg.g_m_smooth > 0:
                    ps["m_smooth"] += smooth_loss(motion_mask, color_s) / (2 ** scale) / num_frames

        # --- compile (Trainer.py:404-409) ----------------------------------
        for term in LOSS_TERMS:
            losses[f"loss_term/{scale}"] += ps[term] * coefs[term]
            losses[f"loss_term/{term}"] += ps[term]
        losses["loss"] += losses[f"loss_term/{scale}"] / len(cfg.scales)

    return losses
