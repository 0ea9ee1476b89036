"""Fused SSIM+L1 photometric error as a single Pallas TPU kernel.

The XLA reference (``ops/photometric.py``) materializes ~8 intermediate
(B, H, W, C) buffers (5 windowed moments + SSIM numerator/denominator +
L1) between HBM round-trips; this kernel keeps one (H, W, C) image pair in
VMEM per grid step and emits only the final channel-meaned per-pixel error —
one read of each input, one write of the output.

Forward only: the backward pass is delegated to the XLA twin's VJP via
``jax.custom_vjp`` (XLA already fuses the backward well, and this keeps the
kernel small and obviously correct).

Layout: grid over batch; each step processes a full (H, W, C) image. A
KITTI-res fp32 image is 1.5 MB, so pred+target+scratch fit comfortably in
the ~16 MB VMEM. The 3x3 windowed means are computed as 9 statically-shifted
adds over a reflection-padded tile (pure VPU work, no reduce_window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamo_depth_tpu.ops.photometric import reprojection_loss as _xla_reprojection_loss

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _reflect_pad_hw(x):
    """Reflection-pad H and W by 1 using static slices (jnp.pad(mode='reflect')
    equivalent that lowers cleanly in Mosaic)."""
    x = jnp.concatenate([x[1:2], x, x[-2:-1]], axis=0)
    x = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    return x


def _mean3x3(p, H, W):
    """3x3 window mean of a (H+2, W+2, C) padded tile -> (H, W, C)."""
    acc = p[0:H, 0:W]
    for di in range(3):
        for dj in range(3):
            if di == 0 and dj == 0:
                continue
            acc = acc + p[di : di + H, dj : dj + W]
    return acc / 9.0


def _kernel(pred_ref, target_ref, out_ref, *, ssim_weight):
    x = pred_ref[0]
    y = target_ref[0]
    H, W, C = x.shape

    xp = _reflect_pad_hw(x)
    yp = _reflect_pad_hw(y)

    mu_x = _mean3x3(xp, H, W)
    mu_y = _mean3x3(yp, H, W)
    sigma_x = _mean3x3(xp * xp, H, W) - mu_x * mu_x
    sigma_y = _mean3x3(yp * yp, H, W) - mu_y * mu_y
    sigma_xy = _mean3x3(xp * yp, H, W) - mu_x * mu_y

    num = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    ssim = jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)

    l1 = jnp.abs(y - x)
    err = ssim_weight * jnp.mean(ssim, axis=-1, keepdims=True) + (
        1.0 - ssim_weight
    ) * jnp.mean(l1, axis=-1, keepdims=True)
    out_ref[0] = err


def _pallas_forward(pred, target, ssim_weight):
    B, H, W, C = pred.shape
    interpret = jax.default_backend() != "tpu"  # Mosaic is TPU-only
    return pl.pallas_call(
        functools.partial(_kernel, ssim_weight=ssim_weight),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, H, W, 1), pred.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    )(pred, target)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def reprojection_loss_fused(pred, target, ssim_weight=0.85):
    """Drop-in for ``ops.photometric.reprojection_loss`` with a fused Pallas
    forward on TPU. ``(B, H, W, C) x2 -> (B, H, W, 1)``."""
    return _pallas_forward(pred, target, ssim_weight)


def _fwd(pred, target, ssim_weight):
    return _pallas_forward(pred, target, ssim_weight), (pred, target)


def _bwd(ssim_weight, res, g):
    pred, target = res
    _, vjp = jax.vjp(
        lambda p, t: _xla_reprojection_loss(p, t, ssim_weight=ssim_weight), pred, target
    )
    return vjp(g)


reprojection_loss_fused.defvjp(_fwd, _bwd)
