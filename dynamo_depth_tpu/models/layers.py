"""Shared flax building blocks (reference ``networks/layers.py:85-120``)."""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def reflect_pad(x, pad=1):
    """Reflection-pad H and W of an NHWC tensor (nn.ReflectionPad2d)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def prec(dtype) -> jax.lax.Precision:
    """Matmul/conv precision policy: float32 models run at HIGHEST (full fp32
    accuracy, needed for checkpoint-parity eval); bfloat16 models use the MXU
    native path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


class Conv3x3(nn.Module):
    """Reflection-pad + 3x3 conv (layers.py:100-116)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, 1)
        return nn.Conv(
            self.out_channels, (3, 3), padding="VALID", dtype=self.dtype,
            precision=prec(self.dtype), name="conv"
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (layers.py:85-97)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)
        return nn.elu(x)


def _stem_pad_to() -> int:
    """Trace-time knob for :class:`PadChannelConv` (``DYNAMO_PAD_STEM``).

    ``0`` disables the padding (bit-identical to ``nn.Conv``); any other
    value pads the stem conv's input/kernel channel axis up to that multiple.
    Read at trace time like ``DYNAMO_MAXPOOL``/``DYNAMO_WARP``.
    """
    return int(os.environ.get("DYNAMO_PAD_STEM", "0") or 0)


class PadChannelConv(nn.Module):
    """``nn.Conv(features, (k, k), stride, use_bias=False)`` whose input AND
    kernel channel axes are zero-padded to a multiple of ``DYNAMO_PAD_STEM``
    at call time.

    Motivation (BENCH.md round-4 b8 profile): the 3/6/9-channel first-layer
    convs of the stacked-frame encoders leave XLA's weight-grad ``copy_add``
    re-tilings on oddly-tiled f32[7,7,9,64] accumulators (3.2 ms/step over
    the stem convs) plus ~0.36 ms/step of input relayouts. Padding both
    operands to an 8/16-multiple channel axis keeps every tile fully
    occupied while the *parameter* keeps its logical (k, k, C, features)
    shape — checkpoints, the torch converter, and init are all unchanged,
    and the math is exactly identical (zero input channels meet zero kernel
    rows; the pad VJP slices the padded weight grad back down).
    """

    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, cin = self.kernel, x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, cin, self.features), jnp.float32
        )
        pad_to = _stem_pad_to()
        pad_c = (-cin) % pad_to if pad_to else 0
        if pad_c:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        p = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec(self.dtype),
        )


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample (timm DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


def normalize_image(x):
    """The reference's fixed input normalization (depth_encoder.py:396,
    resnet_encoder.py:126): (x - 0.45) / 0.225."""
    return (x - 0.45) / 0.225
