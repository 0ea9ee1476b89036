"""Pallas kernels vs their XLA twins (interpret mode on CPU; the same code
compiles under Mosaic on TPU — exercised by bench.py / hardware runs)."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.pallas import grid_sample_pallas, reprojection_loss_fused
from dynamo_depth_tpu.ops.photometric import reprojection_loss


def test_fused_photometric_matches_xla(rng):
    B, H, W, C = 2, 16, 24, 3
    pred = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    target = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    fused = reprojection_loss_fused(pred, target, 0.85)
    ref = reprojection_loss(pred, target, ssim_weight=0.85)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_fused_photometric_gradients_match_xla(rng):
    B, H, W, C = 1, 10, 12, 3
    pred = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    target = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    g1 = jax.grad(lambda p: jnp.sum(reprojection_loss_fused(p, target, 0.85) ** 2))(pred)
    g2 = jax.grad(lambda p: jnp.sum(reprojection_loss(p, target, ssim_weight=0.85) ** 2))(pred)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_pallas_warp_matches_xla(rng):
    from dynamo_depth_tpu.ops.warp import grid_sample

    img = jnp.asarray(rng.rand(2, 9, 13, 3).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 7, 11, 2) * 2.4 - 1.2).astype(np.float32))
    a = grid_sample_pallas(img, grid)
    b = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g1 = jax.grad(lambda im: jnp.sum(grid_sample_pallas(im, grid) ** 2))(img)
    g2 = jax.grad(lambda im: jnp.sum(grid_sample(im, grid) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    # The coordinate gradient must match too — it backpropagates into depth,
    # pose, and flow through the sample coordinates.
    gg1 = jax.grad(lambda gr: jnp.sum(grid_sample_pallas(img, gr) ** 2))(grid)
    gg2 = jax.grad(lambda gr: jnp.sum(grid_sample(img, gr) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2), atol=1e-5)
