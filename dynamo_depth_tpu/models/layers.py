"""Shared flax building blocks (reference ``networks/layers.py:85-120``)."""

from __future__ import annotations

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
