"""--image_dtype bfloat16: the loss stack's image operands in bf16.

The warp gather operand and the SSIM/L1 photometric pipeline are the top of
the measured step profile (BENCH.md); bf16 storage halves their HBM traffic.
These tests pin the contract: float32 outputs, sample coordinates exact
(float32), and per-pixel error bounded by the 8-bit source quantization
(1/255 ~ 4e-3). Reference loss being approximated: Trainer.py:281-300.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dynamo_depth_tpu.config import DynamoConfig
from dynamo_depth_tpu.training.losses import _grid_sample, _reprojection_loss


def _cfg(image_dtype):
    return DynamoConfig(dataset="kitti", image_dtype=image_dtype, no_train_vis=True)


@pytest.fixture
def img_grid(rng):
    img = rng.rand(2, 16, 24, 3).astype(np.float32)
    gx = rng.uniform(0, 23, (2, 16, 24)).astype(np.float32)
    gy = rng.uniform(0, 15, (2, 16, 24)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(np.stack([gx, gy], -1))


def test_grid_sample_bf16_operand_close_and_f32_out(img_grid):
    img, grid = img_grid
    o32 = _grid_sample(_cfg("float32"), img, grid)
    o16 = _grid_sample(_cfg("bfloat16"), img, grid)
    assert o16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(o32 - o16))) < 4e-3


def test_image_dtype_auto_thresholds(rng):
    """auto = f32 below 2**19 per-device pixels, bf16 at/above (BENCH.md r4
    A/B: bf16 loses at b3, wins at b8/b16 on the v5e)."""
    from dynamo_depth_tpu.training.losses import _image_dtype

    cfg = _cfg("auto")
    small = jnp.zeros((3, 192, 640, 3), jnp.float32)   # 368k px: below
    large = jnp.zeros((8, 192, 640, 3), jnp.float32)   # 983k px: above
    assert _image_dtype(cfg, small) == jnp.float32
    assert _image_dtype(cfg, large) == jnp.bfloat16
    # explicit modes ignore the shape
    assert _image_dtype(_cfg("float32"), large) == jnp.float32
    assert _image_dtype(_cfg("bfloat16"), small) == jnp.bfloat16
    # auto + bf16-selected operand still yields f32 output within tolerance
    img = jnp.asarray(rng.rand(8, 64, 128, 3).astype(np.float32))  # 65k px
    gx = rng.uniform(0, 127, (8, 64, 128)).astype(np.float32)
    gy = rng.uniform(0, 63, (8, 64, 128)).astype(np.float32)
    grid = jnp.asarray(np.stack([gx, gy], -1))
    o_auto = _grid_sample(cfg, img, grid)
    assert o_auto.dtype == jnp.float32


def test_reprojection_loss_unaffected_by_image_dtype(rng):
    # the photometric pipeline deliberately stays float32 (bf16 SSIM was
    # measured at ~7% relative per-pixel error — see losses.py)
    pred = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    target = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    l32 = _reprojection_loss(_cfg("float32"), pred, target)
    l16 = _reprojection_loss(_cfg("bfloat16"), pred, target)
    assert l16.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
