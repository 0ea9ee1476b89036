"""Equivalence tests for the VPU-friendly op formulations in litemono.py.

The depthwise dilated conv and the stem avg-pool have two lowerings each
(grouped-conv / reduce_window vs nine shifted slice-adds, selected by
DYNAMO_DEPTHWISE / DYNAMO_AVGPOOL). These tests pin forward AND gradient
equivalence so the formulation choice is purely a performance knob
(reference ops: ``networks/depth_encoder.py:181-229`` ddwconv,
``depth_encoder.py:341-343`` AvgPool2d(3, 2, 1)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.models.litemono import DepthwiseConv3x3, avg_pool_3x3_s2


@pytest.mark.parametrize("dilation", [1, 2, 3, 6])
def test_depthwise_slices_matches_grouped_conv(rng, monkeypatch, dilation):
    C = 16
    x = jnp.asarray(rng.randn(2, 12, 20, C).astype(np.float32))
    mod = DepthwiseConv3x3(C, dilation=dilation)
    params = mod.init(jax.random.PRNGKey(0), x)

    def run(impl):
        monkeypatch.setenv("DYNAMO_DEPTHWISE", impl)

        def f(p, x):
            return mod.apply(p, x)

        y, vjp = jax.vjp(f, params, x)
        gp, gx = vjp(jnp.ones_like(y) * 0.3)
        return np.asarray(y), np.asarray(gp["params"]["kernel"]), np.asarray(gx)

    y_c, gw_c, gx_c = run("conv")
    y_s, gw_s, gx_s = run("slices")
    np.testing.assert_allclose(y_s, y_c, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(gw_s, gw_c, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(gx_s, gx_c, atol=2e-6, rtol=1e-5)


def test_depthwise_param_pytree_and_init_stable(monkeypatch):
    """Both impls share one (3,3,1,C) 'kernel' param with identical init, so
    checkpoints and the torch converter see the same pytree either way."""
    x = jnp.zeros((1, 8, 8, 4))
    inits = {}
    for impl in ("conv", "slices"):
        monkeypatch.setenv("DYNAMO_DEPTHWISE", impl)
        p = DepthwiseConv3x3(4, dilation=2).init(jax.random.PRNGKey(7), x)
        assert list(p["params"].keys()) == ["kernel"]
        assert p["params"]["kernel"].shape == (3, 3, 1, 4)
        inits[impl] = np.asarray(p["params"]["kernel"])
    np.testing.assert_array_equal(inits["conv"], inits["slices"])


@pytest.mark.parametrize("hw", [(12, 20), (11, 17), (96, 320)])
def test_avgpool_slices_matches_reduce_window(rng, monkeypatch, hw):
    H, W = hw
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))

    def run(impl):
        monkeypatch.setenv("DYNAMO_AVGPOOL", impl)
        y, vjp = jax.vjp(avg_pool_3x3_s2, x)
        (gx,) = vjp(jnp.ones_like(y))
        return np.asarray(y), np.asarray(gx)

    y_r, gx_r = run("reduce_window")
    y_s, gx_s = run("slices")
    assert y_s.shape == ((2, (H + 1) // 2, (W + 1) // 2, 3))
    np.testing.assert_allclose(y_s, y_r, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(gx_s, gx_r, atol=1e-6, rtol=1e-6)


def test_avgpool_matches_torch():
    """Direct golden vs torch AvgPool2d(3, 2, 1) count_include_pad=True."""
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(3).randn(2, 9, 15, 5).astype(np.float32)
    want = (
        torch.nn.AvgPool2d(3, stride=2, padding=1)(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    )
    got = np.asarray(avg_pool_3x3_s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("hw", [(12, 20), (11, 17)])
def test_maxpool_slices_matches_reduce_window(rng, monkeypatch, hw):
    from dynamo_depth_tpu.models.resnet import max_pool_3x3_s2

    H, W = hw
    x = jnp.asarray(rng.randn(2, H, W, 8).astype(np.float32))

    def run(impl):
        monkeypatch.setenv("DYNAMO_MAXPOOL", impl)
        y, vjp = jax.vjp(max_pool_3x3_s2, x)
        (gx,) = vjp(jnp.ones_like(y))
        return np.asarray(y), np.asarray(gx)

    y_r, gx_r = run("reduce_window")
    y_s, gx_s = run("slices")
    np.testing.assert_array_equal(y_s, y_r)
    np.testing.assert_allclose(gx_s, gx_r, atol=1e-6)


def test_maxpool_matches_torch():
    torch = pytest.importorskip("torch")
    from dynamo_depth_tpu.models.resnet import max_pool_3x3_s2

    x = np.random.RandomState(5).randn(2, 9, 15, 4).astype(np.float32)
    want = (
        torch.nn.MaxPool2d(3, stride=2, padding=1)(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    )
    got = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=0)


def test_concat_conv_split_matches_concat(rng, monkeypatch):
    from dynamo_depth_tpu.models.motion_decoder import _ConcatConv

    a = jnp.asarray(rng.randn(2, 10, 14, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 10, 14, 9).astype(np.float32))
    for kernel in (1, 3):
        mod = _ConcatConv(5, kernel=kernel)
        params = mod.init(jax.random.PRNGKey(1), a, b)
        assert params["params"]["kernel"].shape == (kernel, kernel, 10, 5)

        def run(impl):
            monkeypatch.setenv("DYNAMO_SPLIT_CONCAT", impl)

            def f(p, a, b):
                return mod.apply(p, a, b)

            y, vjp = jax.vjp(f, params, a, b)
            gp, ga, gb = vjp(jnp.ones_like(y) * 0.7)
            return (np.asarray(y), np.asarray(gp["params"]["kernel"]),
                    np.asarray(gp["params"]["bias"]), np.asarray(ga), np.asarray(gb))

        outs_c = run("concat")
        outs_s = run("split")
        for got, want in zip(outs_s, outs_c):
            np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
