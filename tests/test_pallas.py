"""Pallas kernels vs their XLA twins (interpret mode on CPU; the same code
compiles under Mosaic on TPU — exercised by bench.py / hardware runs)."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.pallas import reprojection_loss_fused
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
