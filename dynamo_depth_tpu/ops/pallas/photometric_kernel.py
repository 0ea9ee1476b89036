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


def _mean3x3_roll(x, H, W, interpret):
    """Separable 3x3 reflect-padded window mean of an (H, W) plane, expressed
    as circular rolls with border fix-ups — every intermediate stays (H, W),
    which Mosaic tiles cleanly (the pad-via-concat formulation produced
    odd-shaped (H+2, W+2) tiles and crashed the Mosaic compiler when several
    were chained)."""
    if interpret:  # pltpu.roll is TPU-only; interpret mode uses jnp.roll
        def roll(v, shift, axis):
            return jnp.roll(v, shift, axis)
    else:
        roll = pltpu.roll

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    up = roll(x, H - 1, 0)  # up[i] = x[i+1]; wraps at i=H-1 -> reflect x[H-2]
    up = jnp.where(rows == H - 1, jnp.broadcast_to(x[H - 2 : H - 1, :], (H, W)), up)
    dn = roll(x, 1, 0)      # dn[i] = x[i-1]; wraps at i=0 -> reflect x[1]
    dn = jnp.where(rows == 0, jnp.broadcast_to(x[1:2, :], (H, W)), dn)
    v = x + up + dn

    lf = roll(v, W - 1, 1)
    lf = jnp.where(cols == W - 1, jnp.broadcast_to(v[:, W - 2 : W - 1], (H, W)), lf)
    rt = roll(v, 1, 1)
    rt = jnp.where(cols == 0, jnp.broadcast_to(v[:, 1:2], (H, W)), rt)
    return (v + lf + rt) / 9.0


def _kernel(pred_ref, target_ref, out_ref, *, interpret):
    """Per-(batch, channel) plane: clipped SSIM distance map. The channel
    mean and the L1 blend happen outside (cheap elementwise, XLA-fused)."""
    x = pred_ref[0]  # (H, W)
    y = target_ref[0]
    H, W = x.shape

    def m3(v):
        return _mean3x3_roll(v, H, W, interpret)

    mu_x = m3(x)
    mu_y = m3(y)
    sigma_x = m3(x * x) - mu_x * mu_x
    sigma_y = m3(y * y) - mu_y * mu_y
    sigma_xy = m3(x * y) - mu_x * mu_y

    num = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    out_ref[0] = jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def _pallas_forward(pred, target, ssim_weight):
    B, H, W, C = pred.shape
    interpret = jax.default_backend() != "tpu"  # Mosaic is TPU-only
    # one grid step per (batch, channel) plane; W rides the 128-lane minor dim
    pred_cf = jnp.transpose(pred, (0, 3, 1, 2)).reshape(B * C, H, W)
    target_cf = jnp.transpose(target, (0, 3, 1, 2)).reshape(B * C, H, W)
    ssim = pl.pallas_call(
        functools.partial(_kernel, interpret=interpret),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B * C, H, W), pred.dtype),
        grid=(B * C,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )(pred_cf, target_cf)
    ssim_mean = jnp.mean(ssim.reshape(B, C, H, W), axis=1)[..., None]
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    return ssim_weight * ssim_mean + (1.0 - ssim_weight) * l1


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
