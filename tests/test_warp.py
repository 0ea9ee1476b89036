"""Parity tests for ops/warp.py against torch.nn.functional semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.ops.warp import (
    grid_sample,
    resize_bicubic_aa,
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)


def _to_nchw(x):
    return torch.tensor(np.moveaxis(x, -1, 1))


def test_grid_sample_matches_torch(rng):
    B, H, W, C = 2, 9, 13, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    # grid spanning in and out of bounds
    grid = (rng.rand(B, H, W, 2).astype(np.float32) * 2.6 - 1.3)

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    gold = F.grid_sample(
        _to_nchw(img), torch.tensor(grid), padding_mode="border", align_corners=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=1e-5)


def test_grid_sample_gradients_match_torch(rng):
    """The warp is differentiated through to depth/pose/flow — check both
    d/d(image) and d/d(grid) against torch."""
    B, H, W, C = 1, 5, 7, 2
    img = rng.rand(B, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 4, 6, 2).astype(np.float32) * 2.2 - 1.1)

    def loss_jax(im, gr):
        return jnp.sum(grid_sample(im, gr) ** 2)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    tim = _to_nchw(img).requires_grad_(True)
    tgr = torch.tensor(grid, requires_grad=True)
    out = F.grid_sample(tim, tgr, padding_mode="border", align_corners=True)
    (out ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gi), np.moveaxis(tim.grad.numpy(), 1, -1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tgr.grad.numpy(), atol=1e-4)


@pytest.mark.parametrize(
    "shape",
    [(2, 9, 13, 3, 7, 11), (1, 5, 7, 2, 4, 6), (3, 8, 16, 3, 8, 16),
     (1, 2, 2, 1, 3, 3), (2, 11, 6, 4, 5, 5)],
)
def test_grid_sample_halo_matches_patch_and_torch(rng, monkeypatch, shape):
    """The haloed space-to-depth formulation (DYNAMO_WARP=halo) is pinned to
    the patch-gather formulation AND torch F.grid_sample — values and both
    gradients — so the knob is purely a perf choice (BENCH.md round-2 warp
    formulation study; reference op Trainer.py:281)."""
    B, H, W, C, Ho, Wo = shape
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    grid_np = rng.rand(B, Ho, Wo, 2).astype(np.float32) * 2.6 - 1.3
    grid = jnp.asarray(grid_np)

    def loss(im, gr):
        return jnp.sum(grid_sample(im, gr) ** 2)

    def run(impl):
        monkeypatch.setenv("DYNAMO_WARP", impl)
        y = grid_sample(img, grid)
        gi, gg = jax.grad(loss, argnums=(0, 1))(img, grid)
        return np.asarray(y), np.asarray(gi), np.asarray(gg)

    y_h, gi_h, gg_h = run("halo")
    for alt in ("patch", "tappack", "tappack16", "tappack3d"):
        y_p, gi_p, gg_p = run(alt)
        np.testing.assert_allclose(y_h, y_p, atol=1e-6)
        np.testing.assert_allclose(gi_h, gi_p, atol=1e-5)
        np.testing.assert_allclose(gg_h, gg_p, atol=1e-5)

    tim = _to_nchw(np.asarray(img)).requires_grad_(True)
    tgr = torch.tensor(grid_np, requires_grad=True)
    out = F.grid_sample(tim, tgr, padding_mode="border", align_corners=True)
    (out ** 2).sum().backward()
    np.testing.assert_allclose(y_h, np.moveaxis(out.detach().numpy(), 1, -1), atol=1e-5)
    np.testing.assert_allclose(gi_h, np.moveaxis(tim.grad.numpy(), 1, -1), atol=1e-4)
    np.testing.assert_allclose(gg_h, tgr.grad.numpy(), atol=1e-4)


def _gather_slice_sizes(jaxpr):
    sizes = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "gather":
            sizes.append(tuple(eqn.params["slice_sizes"]))
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                sizes += _gather_slice_sizes(sub.jaxpr)
    return sizes


def test_grid_sample_auto_dispatch(monkeypatch):
    """DYNAMO_WARP=auto routes small packed-operand working sets to tappack
    ((1,1,4C) gather) and larger ones to halo ((1,1,16C) cell gather), with
    the threshold in BYTES (B*H*W*itemsize <= 7*2**20): the round-5 flat-
    gather crossover from BENCH.md — f32 flat tappack wins at batch 9
    (4.42 MB: 279.4 vs 369.9 ms), batch 12 (5.90 MB: 341.5 vs 450.8), and
    batch 14 (6.88 MB: 388.0 vs 513.2), then loses at batch 16 (7.86 MB:
    642.2 vs 565.7) — a steep cliff; a bf16 operand halves the working set
    and keeps tappack winning at batch 16 (3.93 MB: 437.3 vs 570.4 ms).
    Pin the dispatch so defaults can't silently flip."""
    monkeypatch.delenv("DYNAMO_WARP", raising=False)
    C = 3
    small = jnp.zeros((1, 32, 32, C))
    sgrid = jnp.zeros((1, 4, 4, 2))
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(small, sgrid).jaxpr)
    # tappack: the round-5 flat (rank-2 per image) gather — (1, 1, 4C) after
    # vmap batching; the legacy rank-3 form would show (1, 1, 1, 4C)
    assert any(s == (1, 1, 4 * C) for s in sizes), sizes

    # the b14-f32 bracket region (6.55 MB here) sat ABOVE the old 2**22
    # knee and now stays tappack — the measured flat-gather win
    mid = jnp.zeros((25, 256, 256, C))  # 6.55 MB, between 2**22 and 7*2**20
    mgrid = jnp.zeros((25, 4, 4, 2))
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(mid, mgrid).jaxpr)
    assert any(s == (1, 1, 4 * C) for s in sizes), sizes

    big = jnp.zeros((29, 256, 256, C))  # 29*256*256*4B = 7.60 MB > 7*2**20
    bgrid = jnp.zeros((29, 4, 4, 2))
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(big, bgrid).jaxpr)
    assert any(s[-1] == 16 * C for s in sizes), sizes  # halo (1,1,16C)

    # same pixel count in bf16 halves the bytes -> stays tappack
    big16 = jnp.zeros((29, 256, 256, C), jnp.bfloat16)
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(big16, bgrid).jaxpr)
    assert any(s[-1] == 4 * C for s in sizes), sizes  # tappack (1,1,4C)

    # 2x the bf16 pixels crosses the byte threshold -> halo
    big16x2 = jnp.zeros((58, 256, 256, C), jnp.bfloat16)
    bgrid2 = jnp.zeros((58, 4, 4, 2))
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(big16x2, bgrid2).jaxpr)
    assert any(s[-1] == 16 * C for s in sizes), sizes  # halo (1,1,16C)


@pytest.mark.parametrize(
    "batch,dtype,expect_lanes",
    [
        # the exact v5e-measured KITTI 192x640 bracketing shapes (BENCH.md
        # round 5): f32 flat tappack wins through b14 (6.88 MB), halo wins
        # at b16 (7.86 MB); bf16 b16 (3.93 MB) stays tappack
        (12, jnp.float32, 4 * 3),
        (14, jnp.float32, 4 * 3),
        (16, jnp.float32, 16 * 3),
        (16, jnp.bfloat16, 4 * 3),
    ],
)
def test_grid_sample_auto_dispatch_kitti_shapes(monkeypatch, batch, dtype,
                                                expect_lanes):
    """Pin the auto routing at the production 192x640 shapes the knee was
    measured on, so a threshold edit that silently flips a *measured* batch
    config fails loudly (abstract 256x256 shapes alone wouldn't)."""
    monkeypatch.delenv("DYNAMO_WARP", raising=False)
    img = jnp.zeros((batch, 192, 640, 3), dtype)
    grid = jnp.zeros((batch, 4, 4, 2))
    sizes = _gather_slice_sizes(jax.make_jaxpr(grid_sample)(img, grid).jaxpr)
    assert any(s[-1] == expect_lanes for s in sizes), (batch, dtype, sizes)


@pytest.mark.parametrize("out_hw", [(6, 10), (17, 23), (9, 13)])
def test_resize_bilinear_matches_torch(rng, out_hw):
    B, H, W, C = 2, 9, 13, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(img), out_hw)
    gold = F.interpolate(_to_nchw(img), out_hw, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 9, 13, 3), (1, 2, 2, 1), (3, 24, 40, 3)])
def test_upsample2x_bilinear_matches_general(rng, monkeypatch, shape):
    """The static-slice 2x fast path (BENCH.md: replaces the general path's
    gather fwd + scatter-add bwd in the motion refine pyramid and loss
    upsamples) is pinned to the general gather formulation AND torch —
    values and gradients — so DYNAMO_RESIZE is purely a perf knob."""
    B, H, W, C = shape
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    out_hw = (2 * H, 2 * W)

    def loss(im, mode):
        monkeypatch.setenv("DYNAMO_RESIZE", mode)
        return jnp.sum(resize_bilinear(im, out_hw) ** 3)

    monkeypatch.setenv("DYNAMO_RESIZE", "up2")
    y_fast = resize_bilinear(img, out_hw)
    g_fast = jax.grad(lambda im: loss(im, "up2"))(img)
    monkeypatch.setenv("DYNAMO_RESIZE", "general")
    y_gen = resize_bilinear(img, out_hw)
    g_gen = jax.grad(lambda im: loss(im, "general"))(img)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_gen), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_gen), atol=1e-5)

    gold = F.interpolate(_to_nchw(np.asarray(img)), out_hw, mode="bilinear",
                         align_corners=False)
    np.testing.assert_allclose(
        np.asarray(y_fast), np.moveaxis(gold.numpy(), 1, -1), atol=1e-5
    )


@pytest.mark.parametrize("factors", [(2, 2), (4, 4), (3, 3), (2, 4), (6, 1), (5, 2)])
def test_resize_int_factor_matches_general(rng, monkeypatch, factors):
    """The static-tap integer-factor downsample fast path is pinned to the
    general gather formulation AND torch, values and gradients."""
    kh, kw = factors
    B, Ho, Wo, C = 2, 6, 5, 3
    H, W = Ho * kh, Wo * kw
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    def run(mode):
        monkeypatch.setenv("DYNAMO_RESIZE", mode)
        y = resize_bilinear(img, (Ho, Wo))
        g = jax.grad(lambda im: jnp.sum(resize_bilinear(im, (Ho, Wo)) ** 3))(img)
        return np.asarray(y), np.asarray(g)

    y_fast, g_fast = run("auto")
    y_gen, g_gen = run("general")
    np.testing.assert_allclose(y_fast, y_gen, atol=1e-6)
    np.testing.assert_allclose(g_fast, g_gen, atol=1e-5)

    gold = F.interpolate(_to_nchw(np.asarray(img)), (Ho, Wo), mode="bilinear",
                         align_corners=False)
    np.testing.assert_allclose(y_fast, np.moveaxis(gold.numpy(), 1, -1), atol=1e-5)


@pytest.mark.parametrize("out_hw", [(18, 26), (5, 6)])
def test_resize_nearest_matches_torch(rng, out_hw):
    B, H, W, C = 2, 9, 13, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    ours = resize_nearest(jnp.asarray(img), out_hw)
    gold = F.interpolate(_to_nchw(img), out_hw, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=0)


def test_upsample2x_nearest_matches_torch(rng):
    B, H, W, C = 2, 4, 5, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    ours = upsample2x_nearest(jnp.asarray(img))
    gold = F.interpolate(_to_nchw(img), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=0)


@pytest.mark.parametrize("out_hw", [(48, 80), (24, 40), (13, 21)])
def test_resize_bicubic_aa_matches_torch(rng, out_hw):
    """The in-train color pyramid resize is torchvision
    Resize(BICUBIC, antialias=True) (Trainer.py:79); on tensors that is
    torch's antialiased-bicubic interpolate (PIL a=-0.5 kernel), which
    jax.image.resize(method='bicubic', antialias=True) matches to float
    precision."""
    B, H, W, C = 2, 96, 160, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    ours = resize_bicubic_aa(jnp.asarray(img), out_hw)
    gold = F.interpolate(_to_nchw(img), out_hw, mode="bicubic", antialias=True)
    gold = torch.clamp(gold, 0, 1)  # reference clamps after the pyramid resize
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(gold.numpy(), 1, -1), atol=2e-6
    )


def test_bicubic_pyramid_iterated_matches_reference_semantics(rng):
    """Reference apply_img_resize (Trainer.py:729-734) builds scale s from
    scale s-1 (factor-2 chain with a clamp at each level), not from scale 0."""
    B, H, W, C = 1, 64, 96, 3
    img = rng.rand(B, H, W, C).astype(np.float32)

    t = torch.clamp(_to_nchw(img), 0, 1)
    ours = jnp.asarray(img)
    for s in (1, 2):
        h, w = H // 2 ** s, W // 2 ** s
        t = torch.clamp(F.interpolate(t, (h, w), mode="bicubic", antialias=True), 0, 1)
        ours = resize_bicubic_aa(ours, (h, w))
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(t.numpy(), 1, -1), atol=2e-6
        )
