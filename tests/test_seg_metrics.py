"""On-device PR-sweep counts (ops/seg_metrics.py) vs the reference's naive
per-threshold host loop (eval/motion_segmentation.py:62-73 semantics), and
mesh-sharded equality for the eval metrics path."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.seg_metrics import pr_sweep_counts
from dynamo_depth_tpu.parallel.mesh import batch_sharding, make_mesh

NUM_THRD = 150


def _naive_counts(pred, gt, thrds, weight):
    tp = np.zeros(len(thrds))
    fp = np.zeros(len(thrds))
    fn = np.zeros(len(thrds))
    for b in range(pred.shape[0]):
        if weight[b] == 0:
            continue
        gm = gt[b] == 1
        vm = gt[b] != 3
        pm = pred[b][None] > thrds[:, None, None]
        inter = np.logical_and(gm[None], pm)
        g_sum = gm.sum()
        p_sum = (pm * vm[None]).sum((1, 2))
        t = inter.sum((1, 2))
        tp += t
        fp += p_sum - t
        fn += g_sum - t
    return tp, fp, fn


def test_pr_sweep_counts_match_naive(rng):
    eps = 1 / (NUM_THRD - 1)
    thrds = np.linspace(0 - eps, 1 - eps, NUM_THRD).astype(np.float32)
    B, H, W = 4, 24, 32
    pred = rng.rand(B, H, W).astype(np.float32)
    # include exact threshold values to pin down the > (strict) semantics
    pred[0, 0, :] = thrds[:W]
    gt = rng.randint(1, 4, (B, H, W)).astype(np.int32)
    weight = np.array([1, 1, 1, 0], np.float32)  # last sample is padding

    g_tp, g_fp, g_fn = _naive_counts(pred, gt, thrds, weight)
    tp, fp, fn = pr_sweep_counts(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(thrds), jnp.asarray(weight)
    )
    np.testing.assert_array_equal(np.asarray(tp), g_tp)
    np.testing.assert_array_equal(np.asarray(fp), g_fp)
    np.testing.assert_array_equal(np.asarray(fn), g_fn)


def test_pr_sweep_counts_sharded_equals_single(rng):
    eps = 1 / (NUM_THRD - 1)
    thrds = jnp.asarray(np.linspace(0 - eps, 1 - eps, NUM_THRD).astype(np.float32))
    B, H, W = 8, 16, 20
    pred = rng.rand(B, H, W).astype(np.float32)
    gt = rng.randint(1, 4, (B, H, W)).astype(np.int32)

    single = pr_sweep_counts(jnp.asarray(pred), jnp.asarray(gt), thrds)

    mesh = make_mesh(8)
    shard = batch_sharding(mesh)
    sharded = pr_sweep_counts(
        jax.device_put(pred, shard), jax.device_put(gt, shard), thrds
    )
    for s, g in zip(sharded, single):
        np.testing.assert_allclose(np.asarray(s), np.asarray(g), atol=0)


def test_depth_metrics_sharded_equals_single(rng):
    from dynamo_depth_tpu.ops.metrics import DEPTH_METRIC_NAMES, depth_metrics

    B, H, W, N = 8, 24, 32, 200
    disp = (rng.rand(B, H, W, 1) * 0.2 + 0.02).astype(np.float32)
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.randint(0, 96, (B, N))
    pts[..., 1] = rng.randint(0, 160, (B, N))
    pts[..., 2] = rng.rand(B, N) * 60 + 0.5
    valid = (rng.rand(B, N) > 0.15).astype(np.float32)
    gt_dim = np.tile(np.array([[96, 160]], np.int32), (B, 1))
    bound = np.asarray([0.1, 0.95, 0.05, 0.9], np.float32)

    single = depth_metrics(
        jnp.asarray(disp), jnp.asarray(pts), jnp.asarray(valid),
        jnp.asarray(gt_dim), bound,
    )

    mesh = make_mesh(8)
    shard = batch_sharding(mesh)
    sharded = depth_metrics(
        jax.device_put(disp, shard), jax.device_put(pts, shard),
        jax.device_put(valid, shard), jax.device_put(gt_dim, shard), bound,
    )
    for name in DEPTH_METRIC_NAMES:
        # cross-shard reduction order differs -> float32 associativity noise
        np.testing.assert_allclose(
            float(sharded[name]), float(single[name]), rtol=1e-6, err_msg=name
        )
