"""Sparse LiDAR-point depth evaluation metrics.

Capability parity with the reference ``DepthMetrics`` (``tools.py:6-73``) and
``compute_errors`` (``tools.py:269-288``), re-designed for static shapes:

- the reference resizes the disparity map to ground-truth resolution and
  integer-indexes it at LiDAR points (tools.py:41-45); we instead evaluate the
  same bilinear interpolation **at the points only** (mathematically identical,
  since bilinear resize is linear and the reciprocal is applied pointwise
  after interpolation), so ground-truth dims of any size stay out of the
  traced shapes;
- the reference's per-sample python loop (tools.py:27) becomes a ``vmap``;
- masked medians replicate ``torch.median``'s lower-middle-element semantics.

The optional per-mask-label breakdown takes mask values pre-sampled at the
LiDAR points (a host-side integer gather), keeping every traced shape static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEPTH_METRIC_NAMES = ("de:abs_rel", "de:sq_rel", "de:rms", "de:log_rms", "da:a1", "da:a2", "da:a3")


def compute_errors(gt, pred, valid=None):
    """The 7 standard depth metrics over (optionally masked) point sets.

    :param gt, pred: ``(N,)`` depths
    :param valid:    optional ``(N,)`` boolean mask
    :return: (metrics ``(7,)`` in DEPTH_METRIC_NAMES order, count)
    """
    if valid is None:
        valid = jnp.ones_like(gt, dtype=bool)
    v = valid.astype(gt.dtype)
    cnt = jnp.sum(v)
    denom = jnp.maximum(cnt, 1.0)

    def vmean(x):
        return jnp.sum(jnp.where(valid, x, 0.0)) / denom

    safe_pred = jnp.where(valid, pred, 1.0)
    safe_gt = jnp.where(valid, gt, 1.0)

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = vmean((thresh < 1.25).astype(gt.dtype))
    a2 = vmean((thresh < 1.25 ** 2).astype(gt.dtype))
    a3 = vmean((thresh < 1.25 ** 3).astype(gt.dtype))

    rmse = jnp.sqrt(vmean((safe_gt - safe_pred) ** 2))
    rmse_log = jnp.sqrt(vmean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2))
    abs_rel = vmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = vmean((safe_gt - safe_pred) ** 2 / safe_gt)

    return jnp.stack([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3]), cnt


def _masked_median_lower(x, valid):
    """torch.median semantics on a masked vector: lower middle element."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(valid, x, big))
    n = jnp.sum(valid.astype(jnp.int32))
    k = jnp.maximum(n - 1, 0) // 2
    return xs[k]


def _sample_bilinear_at(disp, ys, xs, gt_h, gt_w):
    """Evaluate bilinear-resize(disp -> (gt_h, gt_w), align_corners=False) at
    integer output pixels (ys, xs), without materializing the resized map.

    disp: ``(H, W)``; ys, xs: ``(N,)`` float (floored to ints like the
    reference's ``.long()`` cast at tools.py:41); gt_h/gt_w: scalars.
    """
    H, W = disp.shape
    yi = jnp.floor(ys)
    xi = jnp.floor(xs)
    sy = (yi + 0.5) * (H / gt_h) - 0.5
    sx = (xi + 0.5) * (W / gt_w) - 0.5
    sy = jnp.clip(sy, 0.0, H - 1)
    sx = jnp.clip(sx, 0.0, W - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2)
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2)
    wy = sy - y0
    wx = sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    flat = disp.reshape(-1)

    def g(yy, xx):
        return flat[yy * W + xx]

    top = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
    bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _metrics_single(disp, depth_g, valid_in, gt_dim, img_bound, min_depth, max_depth):
    """Per-sample metric core (vmapped over batch)."""
    gt_h = gt_dim[0].astype(jnp.float32)
    gt_w = gt_dim[1].astype(jnp.float32)
    # int() truncation in the reference == floor for non-negative bounds.
    up = jnp.floor(img_bound[0] * gt_h)
    down = jnp.floor(img_bound[1] * gt_h)
    left = jnp.floor(img_bound[2] * gt_w)
    right = jnp.floor(img_bound[3] * gt_w)

    h_pt, w_pt, z_pt = depth_g[:, 0], depth_g[:, 1], depth_g[:, 2]
    valid = (
        (valid_in > 0)
        & (h_pt >= up) & (h_pt < down)
        & (w_pt >= left) & (w_pt < right)
        & (z_pt > min_depth) & (z_pt < max_depth)
    )

    disp_at = _sample_bilinear_at(disp, h_pt, w_pt, gt_h, gt_w)
    d_pd = 1.0 / jnp.maximum(disp_at, 1e-12)
    d_gt = z_pt

    ratio = _masked_median_lower(d_gt, valid) / _masked_median_lower(d_pd, valid)
    d_pd = jnp.clip(d_pd * ratio, min_depth, max_depth)

    return d_gt, d_pd, valid


@functools.partial(jax.jit, static_argnames=("min_depth", "max_depth", "labels"))
def depth_metrics(
    disp_pred,
    depth_gt,
    depth_valid,
    gt_dim,
    img_bound,
    *,
    min_depth=1e-3,
    max_depth=80.0,
    mask_pts=None,
    labels=None,
    sample_weight=None,
):
    """Batched sparse-point depth metrics.

    :param disp_pred:   ``(B, H, W, 1)`` scaled disparity (1/depth) at scale 0
    :param depth_gt:    ``(B, N, 3)`` padded LiDAR points [h, w, z]
    :param depth_valid: ``(B, N)`` 1 for real points, 0 for padding
    :param gt_dim:      ``(B, 2)`` ground-truth image dims [h, w]
    :param img_bound:   ``(4,)`` [top, bottom, left, right] fractional bounds
    :param mask_pts:    optional ``(B, N)`` integer mask labels sampled at the
                        LiDAR points (host-side gather of the full-res mask)
    :param labels:      tuple of labels for the per-class breakdown
    :return: dict with the 7 batch-mean metrics; when labels are given, also
             ``'<metric>_mask'`` -> {label: (sum(metric*cnt), sum(cnt))}.
    """
    disp = disp_pred[..., 0]
    img_bound = jnp.asarray(img_bound, jnp.float32)

    d_gt, d_pd, valid = jax.vmap(
        lambda d, g, v, dim: _metrics_single(d, g, v, dim, img_bound, min_depth, max_depth)
    )(disp, depth_gt, depth_valid, gt_dim)

    per_sample, _ = jax.vmap(compute_errors)(d_gt, d_pd, valid)  # (B, 7)
    if sample_weight is None:
        sample_weight = jnp.ones((disp.shape[0],), jnp.float32)
    w = sample_weight / jnp.maximum(jnp.sum(sample_weight), 1.0)
    out = {
        name: jnp.sum(per_sample[:, i] * w) for i, name in enumerate(DEPTH_METRIC_NAMES)
    }

    if labels is not None:
        assert mask_pts is not None
        for lbl in labels:
            sel = valid & (mask_pts == lbl) & (sample_weight > 0)[:, None]
            m, cnt = jax.vmap(compute_errors)(d_gt, d_pd, sel)  # (B, 7), (B,)
            for i, name in enumerate(DEPTH_METRIC_NAMES):
                out[f"{name}_mask/{lbl}"] = (jnp.sum(m[:, i] * cnt), jnp.sum(cnt))
    return out
