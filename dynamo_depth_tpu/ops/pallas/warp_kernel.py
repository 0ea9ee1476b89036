"""Bilinear warp (grid_sample) as a Pallas TPU kernel.

Strategy: the source image stays resident in VMEM for the whole grid step
(one batch element per step; a KITTI-res fp32 frame is 1.5 MB), and the four
corner taps are fetched with per-pixel dynamic gathers over the flattened
image. The lerp weights and the border/align_corners coordinate transform
are identical to the XLA twin (``ops/warp.py:grid_sample``), which also
provides the backward pass via ``jax.custom_vjp``.

Mosaic's dynamic-gather support varies by toolchain version; callers should
use :func:`supported` (compiles a probe once) and fall back to the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamo_depth_tpu.ops.warp import grid_sample as _xla_grid_sample


def _kernel(image_ref, grid_ref, out_ref):
    img = image_ref[0]  # (H, W, C)
    g = grid_ref[0]     # (Ho, Wo, 2)
    H, W, C = img.shape
    Ho, Wo = g.shape[0], g.shape[1]

    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = jnp.clip(gx, 0.0, W - 1)
    gy = jnp.clip(gy, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, W - 2)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 2)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(H * W, C)

    def tap(yy, xx):
        idx = (yy * W + xx).reshape(Ho * Wo)
        return jnp.take(flat, idx, axis=0).reshape(Ho, Wo, C)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out_ref[0] = top + (bot - top) * wy


def _pallas_forward(image, grid):
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C), image.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo, 2), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    )(image, grid)


@jax.custom_vjp
def grid_sample_pallas(image, grid):
    """Drop-in for ``ops.warp.grid_sample`` with a Pallas forward."""
    return _pallas_forward(image, grid)


def _fwd(image, grid):
    return _pallas_forward(image, grid), (image, grid)


def _bwd(res, g):
    image, grid = res
    _, vjp = jax.vjp(_xla_grid_sample, image, grid)
    return vjp(g)


grid_sample_pallas.defvjp(_fwd, _bwd)


@functools.lru_cache(maxsize=1)
def supported() -> bool:
    """Probe whether Mosaic compiles the dynamic-gather kernel on this
    backend (always True in interpret mode)."""
    try:
        img = jnp.zeros((1, 8, 128, 3), jnp.float32)
        g = jnp.zeros((1, 8, 128, 2), jnp.float32)
        jax.block_until_ready(_pallas_forward(img, g))
        return True
    except Exception:
        return False
