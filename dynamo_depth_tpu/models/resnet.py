"""Flax ResNet feature encoder (reference ``networks/resnet_encoder.py``).

Mirrors the torchvision ResNet trunk structurally (conv1/bn1/relu/maxpool +
4 stages of BasicBlock or Bottleneck) so released torch checkpoints convert
1:1, but is NHWC and functional. Returns the 5-level feature pyramid
[relu1 (1/2), layer1 (1/4), layer2 (1/8), layer3 (1/16), layer4 (1/32)]
exactly as resnet_encoder.py:126-135, with the same (x-0.45)/0.225 input
normalization.

``num_input_images > 1`` widens conv1 to stacked RGB frames
(resnet_encoder.py:80-92); the pretrained-weight replication trick lives in
``models/convert.py`` (it is a checkpoint transform, not an architecture
property).

BatchNorm uses per-device batch statistics (no cross-replica sync) to match
the reference's DDP behavior — torch DDP does not sync BN (SURVEY §7).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamo_depth_tpu.models.layers import PadChannelConv, normalize_image, prec

_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
_BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC.

    ``DYNAMO_MAXPOOL`` selects the lowering (default ``reduce_window``;
    ``slices`` = nine strided-slice maxes). Measured in-step on the v5e
    (BENCH.md round-2 formulation study): the slice form was the single
    largest loser — its stride-2 taps and the backward scatter-as-pad ops
    don't fuse, costing +9.7 ms/step across the pose/motion ResNet encoders
    (plus ~3 ms of unattributed backward pads) — so reduce_window stays the
    default, unlike the stride-1 SSIM pool where shifted adds win.
    """
    import os

    if os.environ.get("DYNAMO_MAXPOOL", "reduce_window") != "slices":
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    B, H, W, C = x.shape
    Ho, Wo = (H + 1) // 2, (W + 1) // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)), constant_values=neg)
    out = None
    for i in range(3):
        for j in range(3):
            tap = jax.lax.slice(
                xp, (0, i, j, 0), (B, i + 2 * Ho - 1, j + 2 * Wo - 1, C),
                strides=(1, 2, 2, 1),
            )
            out = tap if out is None else jnp.maximum(out, tap)
    return out


def _bn(dtype, name):
    def apply(x, train):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
        )(x)

    return apply


def _conv(out, kernel, stride=1, name=None, dtype=jnp.float32):
    pad = (kernel - 1) // 2
    return nn.Conv(
        out, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False, dtype=dtype,
        precision=prec(dtype), name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        out = _bn(self.dtype, "bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        out = _bn(self.dtype, "bn2")(out, train)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, "ds_conv", self.dtype)(x)
            identity = _bn(self.dtype, "ds_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = nn.relu(_bn(self.dtype, "bn1")(out, train))
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = nn.relu(_bn(self.dtype, "bn2")(out, train))
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", self.dtype)(out)
        out = _bn(self.dtype, "bn3")(out, train)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, "ds_conv", self.dtype)(x)
            identity = _bn(self.dtype, "ds_bn")(identity, train)
        return nn.relu(out + identity)


class ResnetEncoder(nn.Module):
    """5-level feature pyramid encoder.

    :param num_layers: 18/34/50/101/152
    :param num_input_images: RGB frames stacked on channels (1, 2, or 3)
    """

    num_layers: int = 18
    num_input_images: int = 1
    # Channels per stacked frame: 3 (RGB) or 4 (RGBD, the reference's unused
    # resnet_custom_input variant, resnet_encoder.py:32-61).
    channels_per_image: int = 3
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self) -> np.ndarray:
        ch = np.array([64, 64, 128, 256, 512])
        if self.num_layers > 34:
            ch[1:] *= 4
        return ch

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        assert x.shape[-1] == self.channels_per_image * self.num_input_images
        block_cls = Bottleneck if _BOTTLENECK[self.num_layers] else BasicBlock
        layers = _BLOCKS[self.num_layers]
        expansion = 4 if _BOTTLENECK[self.num_layers] else 1

        x = normalize_image(x).astype(self.dtype)
        # conv1 consumes the 3/6/9-channel stacked-frame input; PadChannelConv
        # optionally (DYNAMO_PAD_STEM) pads its channel axis to a tile-friendly
        # multiple with identical math and an unchanged param shape.
        x = PadChannelConv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = _bn(self.dtype, "bn1")(x, train)
        features = [nn.relu(x)]

        x = max_pool_3x3_s2(features[-1])
        in_planes = 64
        for stage, (planes, n_blocks) in enumerate(zip([64, 128, 256, 512], layers)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                ds = b == 0 and (stride != 1 or in_planes != planes * expansion)
                x = block_cls(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            in_planes = planes * expansion
            features.append(x)

        return features
