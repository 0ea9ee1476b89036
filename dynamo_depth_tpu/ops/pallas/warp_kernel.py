"""Bilinear warp (grid_sample) with a Pallas TPU gather kernel.

Reproduces the reference's hot op ``F.grid_sample(..., padding_mode='border',
align_corners=True)`` (``/root/reference/Trainer.py:281``). The round-2
profile showed the XLA lowering of this op's four tap gathers is the single
largest per-op time sink of the train step (~38% of device op time, 24
gather fusions at ``ops/warp.py:52``), so the gather — and ONLY the gather —
is swapped for a hand-tiled Pallas kernel:

TOOLCHAIN VERDICT (probed 2026-08-16, see BENCH.md "Pallas kernels"): the
remote Mosaic compiler only lowers ``take_along_axis`` with a same-shape
index and strictly within one tile of the minor axes — axis=0 gathers need
exactly 8 sublanes, axis=1 gathers exactly 128 lanes; flat 1-D ``jnp.take``
does not lower at all. A general (H, W) warp gather therefore requires a
15-24x tile-decomposed select chain, which cannot beat XLA's native HLO
gather. ``supported()`` returns False on such backends and production falls
back to the XLA twin; this kernel remains correct (values + both gradients
golden-tested in interpret mode, ``tests/test_pallas.py``) and becomes
active automatically on toolchains whose gather support widens.

- the coordinate transform (unnormalize, border clamp, floor/frac) and the
  bilinear lerp stay in XLA, so jax autodiff routes gradients exactly like
  the XLA twin (d_image via the scatter transpose, d_grid via lerp weights
  on the tap values, which are residuals — nothing re-gathers in backward);
- the tap fetch is a four-output Pallas kernel (``_taps_kernel``): the image
  stays VMEM-resident as ``(H, W*C)`` for a whole batch element while output
  pixels are tiled into lane-aligned blocks. Per block: two *column* gathers
  ``take_along_axis(axis=1)`` fetch the x0 / x0+1 taps at EVERY source row
  (H-fold VPU redundancy — the price of a 2-D gather on this toolchain,
  where flat 1-D ``jnp.take`` does not compile but ``take_along_axis``
  does), then four cheap *row* gathers ``take_along_axis(axis=0)`` pick
  y0 / y0+1;
- the kernel's backward w.r.t. the image is the linear transpose of the same
  gather expressed in XLA (``_xla_taps``) — XLA emits the scatter and DCEs
  the unused forward gathers.

Use :func:`supported` (compiles a probe once) and fall back to the XLA twin;
production gating is ``config.pallas_warp`` (``training/losses.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output pixels per kernel block. 640 keeps the per-block column-gather
# intermediates (H, block*C) = (192, 1920) fp32 under 1.5 MB each, so the
# working set (image + 2 column gathers) fits VMEM with headroom at KITTI
# shapes.
_BLOCK_PIXELS = 640


def _taps_kernel(img_ref, xidx_ref, yidx_ref, v00_ref, v01_ref, v10_ref, v11_ref, *, C):
    img = img_ref[0]       # (H, W*C)
    xi = xidx_ref[0, 0]    # (1, P3) int32: x0 * C + channel
    yi = yidx_ref[0, 0]    # (1, P3) int32: y0
    H = img.shape[0]
    P3 = xi.shape[-1]

    bc = jnp.broadcast_to(xi, (H, P3))
    c0 = jnp.take_along_axis(img, bc, axis=1)      # x0 column at every row
    c1 = jnp.take_along_axis(img, bc + C, axis=1)  # x0+1 column at every row
    v00_ref[0, 0] = jnp.take_along_axis(c0, yi, axis=0)
    v01_ref[0, 0] = jnp.take_along_axis(c1, yi, axis=0)
    v10_ref[0, 0] = jnp.take_along_axis(c0, yi + 1, axis=0)
    v11_ref[0, 0] = jnp.take_along_axis(c1, yi + 1, axis=0)


def _pallas_taps(img2, xidx, yidx, C):
    """img2 (B, H, W*C); xidx/yidx (B, nb, P3) -> four (B, nb, P3) taps."""
    B, H, WC = img2.shape
    _, nb, P3 = xidx.shape
    interpret = jax.default_backend() != "tpu"
    # Mosaic block shapes need the trailing two dims to tile (8, 128) or
    # match the array — a singleton axis keeps per-(b, n) blocks legal.
    xidx4 = xidx[:, :, None, :]
    yidx4 = yidx[:, :, None, :]
    blk = lambda b, n: (b, n, 0, 0)  # noqa: E731
    tap_shape = jax.ShapeDtypeStruct((B, nb, 1, P3), img2.dtype)
    tap_spec = pl.BlockSpec((1, 1, 1, P3), blk, memory_space=pltpu.VMEM)
    taps = pl.pallas_call(
        functools.partial(_taps_kernel, C=C),
        interpret=interpret,
        out_shape=(tap_shape,) * 4,
        grid=(B, nb),
        in_specs=[
            # index_map constant in n -> the image block stays resident
            # across a batch element's whole row of output blocks.
            pl.BlockSpec((1, H, WC), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            tap_spec,
            tap_spec,
        ],
        out_specs=(tap_spec,) * 4,
    )(img2, xidx4, yidx4)
    return tuple(t[:, :, 0, :] for t in taps)


def _xla_taps(img2, xidx, yidx, C):
    """The same four-tap gather in plain XLA — linear in img2; its vjp is
    the scatter transpose (forward gathers are DCE'd in the backward)."""
    B, H, WC = img2.shape
    flat = img2.reshape(B, H * WC)

    def tap(dy, dx):
        idx = ((yidx + dy) * WC + (xidx + dx)).reshape(B, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(xidx.shape)

    return tap(0, 0), tap(0, C), tap(1, 0), tap(1, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_taps(img2, xidx, yidx, C):
    return _pallas_taps(img2, xidx, yidx, C)


def _gather_taps_fwd(img2, xidx, yidx, C):
    # img2 rides along only for its shape/dtype — the transpose of a linear
    # gather never reads it (XLA DCEs the primal gathers in the backward).
    return _pallas_taps(img2, xidx, yidx, C), (img2, xidx, yidx)


def _gather_taps_bwd(C, res, g):
    img2, xidx, yidx = res
    _, vjp = jax.vjp(lambda im: _xla_taps(im, xidx, yidx, C), img2)
    (d_img2,) = vjp(g)
    return d_img2, None, None


_gather_taps.defvjp(_gather_taps_fwd, _gather_taps_bwd)


def grid_sample_pallas(image, grid, block_pixels=_BLOCK_PIXELS):
    """Drop-in for ``ops.warp.grid_sample`` with Pallas tap gathers."""
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    nb = -(-P // block_pixels)
    Ppad = nb * block_pixels

    # Identical (and identically differentiable) coordinate math to
    # ops/warp.py::grid_sample.
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = jnp.clip(gx, 0.0, W - 1)
    gy = jnp.clip(gy, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(gy), 0, max(H - 2, 0))
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    x0i = x0.astype(jnp.int32).reshape(B, P)
    y0i = y0.astype(jnp.int32).reshape(B, P)
    pad = ((0, 0), (0, Ppad - P))
    x0i, y0i = jnp.pad(x0i, pad), jnp.pad(y0i, pad)
    P3 = block_pixels * C
    c_iota = jnp.arange(C, dtype=jnp.int32)
    xidx = (x0i[..., None] * C + c_iota).reshape(B, nb, P3)
    yidx = jnp.broadcast_to(y0i[..., None], (B, Ppad, C)).reshape(B, nb, P3)

    img2 = image.reshape(B, H, W * C)
    taps = _gather_taps(img2, xidx, yidx, C)
    v00, v01, v10, v11 = (
        t.reshape(B, Ppad, C)[:, :P].reshape(B, Ho, Wo, C) for t in taps
    )

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


@functools.lru_cache(maxsize=1)
def supported() -> bool:
    """Probe whether Mosaic compiles the take_along_axis tap kernel on this
    backend (always True in interpret mode)."""
    try:
        img = jnp.zeros((1, 8, 128 * 3), jnp.float32)
        xi = jnp.zeros((1, 1, 128 * 3), jnp.int32)
        jax.block_until_ready(_pallas_taps(img, xi, xi, 3))
        return True
    except Exception:
        return False
