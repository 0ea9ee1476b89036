"""Bilinear warping (grid_sample) and image resizing under XLA.

``grid_sample`` reproduces the exact semantics of the reference's hot op
``F.grid_sample(..., padding_mode='border', align_corners=True)``
(``Trainer.py:281``) — including its gradient, which backpropagates through
the sample coordinates into depth, pose, and flow. It is expressed as four
flat gathers + lerp so XLA lowers it to TPU gather ops and fuses the lerp;
``ops/pallas/warp_kernel.py`` provides a hand-tiled kernel alternative.

``resize_bilinear`` / ``resize_nearest`` reproduce ``F.interpolate``
(align_corners=False bilinear, legacy nearest) used throughout the reference
(``utils.py:98-101``, ``networks/layers.py:120``); ``resize_bicubic_aa``
covers the antialiased bicubic pyramid resize (``Trainer.py:729-734``,
``datasets/base_dataset.py:80``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _sample_coords(image, grid):
    """Shared coordinate math: unnormalize (align_corners=True), clamp the
    coordinate itself (border padding semantics), split into integer tap
    origin and fractional lerp weight."""
    B, H, W, C = image.shape
    # Unnormalize (align_corners=True) then clamp the coordinate itself
    # (border padding semantics).
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    gx = jnp.clip(gx, 0.0, W - 1)
    gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(gx), 0, max(W - 2, 0))
    y0 = jnp.clip(jnp.floor(gy), 0, max(H - 2, 0))
    wx = gx - x0  # in [0, 1]; == 1 at the right border
    wy = gy - y0
    return x0, y0, wx, wy


def grid_sample(image, grid):
    """Bilinear sampling with border padding and align_corners=True.

    Reproduces ``F.grid_sample(..., padding_mode='border',
    align_corners=True)`` (``Trainer.py:281``) exactly, values and both
    gradients. Four modes, selected by ``DYNAMO_WARP``.

    NOTE: ``DYNAMO_WARP`` (and ``DYNAMO_RESIZE`` below) are read at TRACE
    time and jit caches are not keyed on env vars — set them before the
    first compilation of a train/eval step; flipping them mid-process
    silently keeps the previously compiled formulation (ADVICE r2).

    - ``auto`` (default): ``tappack`` while the packed operand's
      per-channel bytes fit the measured working set —
      ``B*H*W * itemsize <= 7 * 2**20`` (7 MB: f32 ~1.8M px, bf16 ~3.7M
      px) — ``halo`` above. The round-5 flat gather moved the f32
      crossover up from the round-2 rank-3 bracketing (tappack won b8
      220.5 vs 276.6 ms, lost b16 683.6 vs 569.4): measured on the v5e
      at 192x640 (BENCH.md round 5), flat tappack wins at b9-f32 279.4
      vs halo 369.9 ms (4.42 MB operand), b12-f32 341.5 vs 450.8
      (5.90 MB), and b14-f32 388.0 vs 513.2 (6.88 MB) — a steady ~24%
      margin — then loses at b16-f32 642.2 vs 565.7 (7.86 MB), a steep
      working-set cliff; the knee sits at 7 MB between the b14 win and
      the b16 loss. A bf16 operand halves the bytes and rides the same
      knee — bf16 tappack at batch 16 (3.93 MB) measures 437.3 ms vs
      halo's 570.4 (rounds 4-5).
    - ``tappack``: pack each pixel's OWN edge-clamped 2x2 patch into
      ``(B, H, W, 4C)`` (4 shifted views, one concat), so every bilinear
      sample is ONE pointwise gather touching a single tile row, followed
      by a direct 2x2 lerp — the one-hot window lerp ``halo`` needs costs
      more than its denser-lane reads save. Since round 5 the gather runs
      over the row-major rank-2 ``(H*W, 4C)`` view with a single
      flattened index column (``tappackflat`` is an alias), measured
      faster than the rank-3 two-column form at every batch size on the
      v5e (b3 93.9 vs 95.1 ms, b8 203.4 vs 212.9, b16 437.3 vs 462.2);
      ``tappack3d`` keeps the legacy rank-3 gather, ``tappack16`` a
      16-lane zero-padded variant (measured neutral, BENCH.md round 5).
    - ``halo``: haloed space-to-depth gather — ONE pointwise (1, 1, 16C)
      gather per sample from ``(B, ceil(H/2), ceil(W/2), 16C)`` cells of
      4x4 windows (see ``_halo_pack``), then a 4x4 one-hot row/col lerp.
      First formulation to hit 1 tile read per sample (137.7 -> 114.3 ms
      over ``patch``).
    - ``patch``: one ``lax.gather`` of the contiguous (2, 2, C) bilinear
      patch per sample (4 tile rows at C=3 lanes each) — the earlier
      round-2 winner over four pointwise gathers (22.0 -> 18.6 ms for six
      KITTI frames), kept as the unpacked reference formulation.

    :param image: ``(B, H, W, C)``
    :param grid:  ``(B, Ho, Wo, 2)`` normalized coords in [-1, 1], last dim (x, y)
    :return:      ``(B, Ho, Wo, C)``
    """
    B, H, W = image.shape[0], image.shape[1], image.shape[2]
    mode = os.environ.get("DYNAMO_WARP", "auto")
    if mode == "auto":
        itemsize = jnp.dtype(image.dtype).itemsize
        mode = "tappack" if B * H * W * itemsize <= 7 * 2**20 else "halo"
    if mode == "tappack16" and H >= 2 and W >= 2:
        return _grid_sample_tappack(image, grid, pad16=True)
    if mode == "tappack3d" and H >= 2 and W >= 2:
        return _grid_sample_tappack(image, grid, flat=False)
    if mode in ("tappack", "tappackflat") and H >= 2 and W >= 2:
        return _grid_sample_tappack(image, grid)
    if mode == "halo" and H >= 2 and W >= 2:
        return _grid_sample_halo(image, grid)
    return _grid_sample_patch(image, grid)


def _grid_sample_patch(image, grid):
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    x0, y0, wx, wy = _sample_coords(image, grid)

    starts = jnp.stack(
        [y0.reshape(B, P), x0.reshape(B, P)], axis=-1
    ).astype(jnp.int32)  # (B, P, 2) slice origins (y, x)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    sizes = (min(2, H), min(2, W), C)  # degenerate 1-pixel axes still work

    def one(img, st):
        return jax.lax.gather(img, st, dnums, slice_sizes=sizes)  # (P, 2, 2, C)

    # Lerp in the gather result's own (B, P, 2, 2, C) space: reshaping the
    # raw taps to (B, Ho, Wo, 2, 2, C) first is not layout-preserving and
    # costs a ~1 ms re-tiling copy of the full 2x2xC tap tensor per warp
    # (6x/step); only the C-sized lerp output is reshaped (profiled on v5e,
    # BENCH.md).
    taps = jax.vmap(one)(image, starts)  # (B, P, 2, 2, C)
    v00 = taps[:, :, 0, 0]
    v01 = taps[:, :, 0, -1]
    v10 = taps[:, :, -1, 0]
    v11 = taps[:, :, -1, -1]

    wxf = wx.reshape(B, P, 1)
    wyf = wy.reshape(B, P, 1)
    top = v00 + (v01 - v00) * wxf
    bot = v10 + (v11 - v10) * wxf
    return (top + (bot - top) * wyf).reshape(B, Ho, Wo, C)


def _halo_pack(image):
    """Repack ``(B, H, W, C)`` into ``(B, ceil(H/2), ceil(W/2), 16C)`` cells.

    Cell (i, j) holds the 4x4 pixel window rows ``2i-1 .. 2i+2`` x cols
    ``2j-1 .. 2j+2`` (edge-clamped), flattened minor-to-major as
    ``(row, col, C)``. Every bilinear tap origin (y0, x0) with
    ``y0 <= H-2, x0 <= W-2`` lies fully inside the window of exactly one
    cell: ``(i, j) = ((y0+1)//2, (x0+1)//2)``, at window offset
    ``((y0+1)%2, (x0+1)%2)``. The packed tensor is 4x the image bytes,
    built once per warp with 16 stride-2 slices of the padded image.
    """
    B, H, W, C = image.shape
    Hc, Wc = (H + 1) // 2, (W + 1) // 2
    xp = jnp.pad(image, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
    taps = []
    for r in range(4):
        for c in range(4):
            taps.append(jax.lax.slice(
                xp, (0, r, c, 0), (B, r + 2 * Hc - 1, c + 2 * Wc - 1, C),
                strides=(1, 2, 2, 1),
            ))
    return jnp.concatenate(taps, axis=-1)  # (B, Hc, Wc, 16C)


def _grid_sample_halo(image, grid):
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    x0, y0, wx, wy = _sample_coords(image, grid)

    packed = _halo_pack(image)  # (B, Hc, Wc, 16C)
    Hc, Wc = packed.shape[1], packed.shape[2]

    ty = (y0.reshape(B, P) + 1.0).astype(jnp.int32)
    tx = (x0.reshape(B, P) + 1.0).astype(jnp.int32)
    ci, sy = ty // 2, ty % 2  # cell row, window row offset of the tap origin
    cj, sx = tx // 2, tx % 2

    starts = jnp.stack([ci, cj], axis=-1)  # (B, P, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1),
    )

    def one(img, st):
        return jax.lax.gather(img, st, dnums, slice_sizes=(1, 1, 16 * C))  # (P, 16C)

    cells = jax.vmap(one)(packed, starts).reshape(B, P, 4, 4, C)

    # Window-row/col weights: the bilinear pair (origin s, s+1) with weights
    # (1-w, w) scattered onto the 4 window positions via one-hot compares.
    r4 = jnp.arange(4, dtype=jnp.int32)
    wyf = wy.reshape(B, P, 1)
    wxf = wx.reshape(B, P, 1)
    sy = sy[..., None]
    sx = sx[..., None]
    wrow = jnp.where(r4 == sy, 1.0 - wyf, 0.0) + jnp.where(r4 == sy + 1, wyf, 0.0)
    wcol = jnp.where(r4 == sx, 1.0 - wxf, 0.0) + jnp.where(r4 == sx + 1, wxf, 0.0)

    rows = jnp.sum(cells * wrow[:, :, :, None, None], axis=2)  # (B, P, 4, C)
    out = jnp.sum(rows * wcol[:, :, :, None], axis=2)  # (B, P, C)
    return out.reshape(B, Ho, Wo, C)


def _grid_sample_tappack(image, grid, pad16=False, flat=True):
    """Production formulation below ~1M operand pixels (``auto``): pack
    each pixel's OWN 2x2 edge-clamped patch into ``(B, H, W, 4C)`` (4
    shifted views, one concat), so tap origin (y0, x0) is one pointwise
    (1, 1, 4C) gather at (y0, x0) followed by a direct 2x2 lerp — no
    one-hot window weights. Same packed bytes as ``_halo_pack`` (4x the
    image) but a plain lerp consumer; measured in-step 97.7 vs halo's
    114.3 ms at batch 3, 220.5 vs 276.6 at batch 8 (BENCH.md).

    ``pad16`` (``DYNAMO_WARP=tappack16``): zero-pad C=3 to 4 before packing
    so every gather reads an aligned power-of-two (1, 1, 16) slice instead
    of a 12-lane read that straddles a 128-lane tile boundary for ~9% of x
    positions — an alignment-vs-bytes (+33%) A/B (round-5, BENCH.md).
    ``flat`` (``DYNAMO_WARP=tappackflat``): gather from the row-major
    (H*W, 4C) view with a single flattened index — probes whether the
    rank-2 operand lowers to a better TPU gather than the rank-3 form."""
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    x0, y0, wx, wy = _sample_coords(image, grid)

    if pad16 and C == 3:
        image = jnp.pad(image, ((0, 0), (0, 0), (0, 0), (0, 1)))
        Cp = 4
    else:
        Cp = C
    xp = jnp.pad(image, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [xp[:, r:r + H, c:c + W] for r in (0, 1) for c in (0, 1)], axis=-1
    )  # (B, H, W, 4Cp): [v00, v01, v10, v11] per pixel

    if flat:
        flat_idx = (y0.reshape(B, P) * W + x0.reshape(B, P)).astype(jnp.int32)
        starts = flat_idx[..., None]  # (B, P, 1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,),
        )

        def one(img, st):
            return jax.lax.gather(
                img.reshape(H * W, 4 * Cp), st, dnums,
                slice_sizes=(1, 4 * Cp),
            )  # (P, 4Cp)

    else:
        starts = jnp.stack(
            [y0.reshape(B, P), x0.reshape(B, P)], axis=-1
        ).astype(jnp.int32)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1),
        )

        def one(img, st):
            return jax.lax.gather(img, st, dnums, slice_sizes=(1, 1, 4 * Cp))  # (P, 4Cp)

    taps = jax.vmap(one)(packed, starts).reshape(B, P, 4, Cp)[..., :C]
    v00, v01, v10, v11 = taps[:, :, 0], taps[:, :, 1], taps[:, :, 2], taps[:, :, 3]
    wxf = wx.reshape(B, P, 1)
    wyf = wy.reshape(B, P, 1)
    top = v00 + (v01 - v00) * wxf
    bot = v10 + (v11 - v10) * wxf
    return (top + (bot - top) * wyf).reshape(B, Ho, Wo, C)


def resize_bilinear(x, out_hw):
    """``F.interpolate(mode='bilinear', align_corners=False)`` for NHWC.

    Exact 2x upsamples (every hot call site: the motion-decoder refine
    pyramid and the scale-1 flow/color upsamples in the loss) take a
    static-slice fast path (``_upsample2x_bilinear``) whose backward is
    fused slice-adds instead of the general path's gather + scatter-add
    (profiled at ~1.2 ms/step backward scatter plus a motion-refine
    relayout-copy cluster, BENCH.md post-tappack profile).
    ``DYNAMO_RESIZE=general`` opts back into the one general formulation.
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    mode = os.environ.get("DYNAMO_RESIZE", "auto")
    if mode in ("up2", "both") and (Ho, Wo) == (2 * H, 2 * W) and H >= 2 and W >= 2:
        return _upsample2x_bilinear(x)
    if (
        # "up2" opts *into* the 2x-upsample path; it must not opt *out* of
        # the default-on integer-factor downsample win (ADVICE r2).
        mode in ("auto", "down", "both", "up2")
        and Ho <= H and Wo <= W and H % Ho == 0 and W % Wo == 0
    ):
        return _downsample_int_bilinear(x, Ho, Wo)

    def src_coords(out_n, in_n):
        d = jnp.arange(out_n, dtype=x.dtype)
        s = (d + 0.5) * (in_n / out_n) - 0.5
        s = jnp.clip(s, 0.0, in_n - 1)
        i0 = jnp.clip(jnp.floor(s), 0, max(in_n - 2, 0))
        return i0.astype(jnp.int32), (s - i0)

    y0, wy = src_coords(Ho, H)
    x0, wx = src_coords(Wo, W)

    # Separable: rows then columns.
    rows = x[:, y0, :, :] * (1 - wy)[None, :, None, None] + x[:, y0 + 1, :, :] * wy[None, :, None, None]
    out = rows[:, :, x0, :] * (1 - wx)[None, None, :, None] + rows[:, :, x0 + 1, :] * wx[None, None, :, None]
    return out


def _upsample2x_bilinear(x):
    """Exact 2x ``align_corners=False`` bilinear upsample as static slices.

    With ``s = (d + 0.5) / 2 - 0.5``, even outputs read ``0.75*x[i] +
    0.25*x[i-1]`` and odd outputs ``0.75*x[i] + 0.25*x[i+1]`` (edges clamp
    to ``x[0]``/``x[-1]``, reproducing the general path's coordinate clip),
    interleaved — separable over H then W. Identical to the general
    formulation to float round-off (pinned by
    ``tests/test_warp.py::test_upsample2x_bilinear_matches_general``).
    """

    def up_axis(v, axis):
        lo = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
        hi = jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)
        prv = jnp.concatenate([lo, jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis)
        nxt = jnp.concatenate([jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis), hi], axis)
        even = 0.75 * v + 0.25 * prv
        odd = 0.75 * v + 0.25 * nxt
        out = jnp.stack([even, odd], axis=axis + 1)
        return out.reshape(v.shape[: axis] + (2 * v.shape[axis],) + v.shape[axis + 1 :])

    return up_axis(up_axis(x, 1), 2)


def _downsample_int_bilinear(x, Ho, Wo):
    """Integer-factor ``align_corners=False`` bilinear downsample as static
    taps. For factor ``k``, ``s = (d + 0.5) * k - 0.5`` lands mid-cell: on
    ``x[k*d + (k-1)/2]`` exactly for odd ``k``, and halfway between
    ``x[k*d + k/2 - 1]`` and ``x[k*d + k/2]`` for even ``k`` — one reshape
    plus one or two slices per axis, no gather (and no scatter-add in the
    backward). Pinned to the general path and torch by
    ``tests/test_warp.py::test_resize_int_factor_matches_general``."""

    def down_axis(v, axis, k):
        if k == 1:
            return v
        shp = v.shape[:axis] + (v.shape[axis] // k, k) + v.shape[axis + 1 :]
        v = v.reshape(shp)
        if k % 2:
            return jax.lax.index_in_dim(v, (k - 1) // 2, axis + 1, keepdims=False)
        a = jax.lax.index_in_dim(v, k // 2 - 1, axis + 1, keepdims=False)
        b = jax.lax.index_in_dim(v, k // 2, axis + 1, keepdims=False)
        return 0.5 * (a + b)

    B, H, W, C = x.shape
    return down_axis(down_axis(x, 1, H // Ho), 2, W // Wo)


def resize_nearest(x, out_hw):
    """``F.interpolate(mode='nearest')`` (legacy floor semantics) for NHWC."""
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    ys = jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32)
    return x[:, ys, :, :][:, :, xs, :]


def resize_bicubic_aa(x, out_hw):
    """Antialiased bicubic resize (torchvision Resize BICUBIC, antialias=True).

    Used for the color pyramid (Trainer.py:729-734); values clamped to [0, 1]
    as the reference clamps after its pyramid resize.
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    out = jax.image.resize(x, (B, Ho, Wo, C), method="bicubic", antialias=True)
    return jnp.clip(out, 0.0, 1.0)


def upsample2x_nearest(x):
    """Fast path for the Monodepth2 decoder's x2 nearest upsample."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
