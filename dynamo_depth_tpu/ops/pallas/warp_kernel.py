"""Bilinear warp (grid_sample) as a Pallas TPU kernel.

Reproduces the reference's hot op ``F.grid_sample(..., padding_mode='border',
align_corners=True)`` (``/root/reference/Trainer.py:281``) — forward only; the
backward (which scatters into the image and needs the coordinate gradient)
reuses the XLA twin's vjp via ``jax.custom_vjp``.

Kernel strategy (shaped by this toolchain's Mosaic gather support — flat 1-D
``jnp.take`` does not compile, but ``take_along_axis`` does on both axes, see
CLAUDE.md):

- the coordinate transform (unnormalize, border clamp, floor/frac split) and
  the channel expansion of the tap indices run OUTSIDE the kernel in XLA —
  they are cheap elementwise work that XLA fuses into the grid producer;
- inside the kernel the source image stays VMEM-resident as ``(H, W*C)`` for
  a whole batch element (KITTI fp32 frame: 1.5 MB) while output pixels are
  tiled into lane-aligned blocks. Per block: two *column* gathers
  ``take_along_axis(axis=1)`` fetch the (x0, x0+1) taps at EVERY source row
  (H-fold VPU redundancy, the price of a 2-D gather on this toolchain), the
  x-lerp folds them, then two cheap *row* gathers ``take_along_axis(axis=0)``
  pick y0/y0+1 and the y-lerp finishes the sample.

Use :func:`supported` (compiles a probe once) and fall back to the XLA twin;
production gating is ``config.pallas_warp`` (``training/losses.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamo_depth_tpu.ops.warp import grid_sample as _xla_grid_sample

# Output pixels per kernel block. 640 keeps every per-block intermediate
# (H, block*C) = (192, 1920) fp32 under 1.5 MB so the working set (image +
# two column gathers + lerp buffer) fits VMEM with headroom at KITTI shapes.
_BLOCK_PIXELS = 640


def _kernel(img_ref, xidx_ref, yidx_ref, wx_ref, wy_ref, out_ref, *, C):
    img = img_ref[0]       # (H, W*C)
    xi = xidx_ref[0]       # (1, P3) int32: x0 * C + channel
    yi = yidx_ref[0]       # (1, P3) int32: y0
    wx = wx_ref[0]         # (1, P3) f32 x-frac
    wy = wy_ref[0]         # (1, P3) f32 y-frac
    H = img.shape[0]
    P3 = xi.shape[-1]

    bc = jnp.broadcast_to(xi, (H, P3))
    c0 = jnp.take_along_axis(img, bc, axis=1)      # x0 tap at every row
    c1 = jnp.take_along_axis(img, bc + C, axis=1)  # x0+1 tap at every row
    cm = c0 + (c1 - c0) * wx                       # x-lerp, still (H, P3)
    r0 = jnp.take_along_axis(cm, yi, axis=0)       # (1, P3)
    r1 = jnp.take_along_axis(cm, yi + 1, axis=0)
    out_ref[0] = r0 + (r1 - r0) * wy


def _pallas_forward(image, grid, block_pixels=_BLOCK_PIXELS):
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    nb = -(-P // block_pixels)
    Ppad = nb * block_pixels

    # Identical coordinate math to ops/warp.py::grid_sample.
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = jnp.clip(gx, 0.0, W - 1)
    gy = jnp.clip(gy, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(gy), 0, max(H - 2, 0))
    wx = (gx - x0).reshape(B, P).astype(image.dtype)
    wy = (gy - y0).reshape(B, P).astype(image.dtype)
    x0i = x0.astype(jnp.int32).reshape(B, P)
    y0i = y0.astype(jnp.int32).reshape(B, P)

    def padp(a):
        return jnp.pad(a, ((0, 0), (0, Ppad - P)))

    x0i, y0i, wx, wy = padp(x0i), padp(y0i), padp(wx), padp(wy)
    P3 = block_pixels * C
    c_iota = jnp.arange(C, dtype=jnp.int32)
    xidx = (x0i[..., None] * C + c_iota).reshape(B, nb, P3)
    yidx = jnp.broadcast_to(y0i[..., None], (B, Ppad, C)).reshape(B, nb, P3)
    wx3 = jnp.broadcast_to(wx[..., None], (B, Ppad, C)).reshape(B, nb, P3)
    wy3 = jnp.broadcast_to(wy[..., None], (B, Ppad, C)).reshape(B, nb, P3)

    img2 = image.reshape(B, H, W * C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, C=C),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, nb, P3), image.dtype),
        grid=(B, nb),
        in_specs=[
            # index_map constant in n -> the image block stays resident
            # across a batch element's whole row of output blocks.
            pl.BlockSpec((1, H, W * C), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P3), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P3), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P3), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P3), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, P3), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
    )(img2, xidx, yidx, wx3, wy3)
    return out.reshape(B, Ppad, C)[:, :P].reshape(B, Ho, Wo, C)


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
    """Probe whether Mosaic compiles the take_along_axis gather kernel on
    this backend (always True in interpret mode)."""
    try:
        img = jnp.zeros((1, 8, 128, 3), jnp.float32)
        g = jnp.zeros((1, 8, 128, 2), jnp.float32)
        jax.block_until_ready(_pallas_forward(img, g, block_pixels=128))
        return True
    except Exception:
        return False
