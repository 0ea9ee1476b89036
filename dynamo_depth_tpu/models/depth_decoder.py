"""Depth decoders (reference ``networks/depth_decoder.py``).

``DepthDecoder``: the Monodepth2-style 5-level U-Net decoder with skips,
nearest x2 upsampling, and sigmoid disparity heads at scales [0..3]
(depth_decoder.py:10-55). Scale-s output is at 1/2^s of input resolution.

``LiteDepthDecoder``: the Lite-Mono 3-level decoder (channels = encoder/2),
bilinear upsampling, and an extra bilinear x2 upsample before each sigmoid
head (depth_decoder.py:58-115) — so scale-s disparity is at 1/2^s of *full*
resolution despite the encoder pyramid starting at 1/4.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dynamo_depth_tpu.models.layers import Conv3x3, ConvBlock
from dynamo_depth_tpu.ops.warp import resize_bilinear, upsample2x_nearest


def _up2x_bilinear(x):
    B, H, W, C = x.shape
    return resize_bilinear(x, (2 * H, 2 * W))


class DepthDecoder(nn.Module):
    """Monodepth2 decoder. Input: 5-level ResNet pyramid; output
    {('disp', s): (B, H/2^s, W/2^s, 1)} for s in scales."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features) -> Dict[Tuple[str, int], jnp.ndarray]:
        num_ch_dec = [16, 32, 64, 128, 256]
        outputs = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = Conv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = nn.sigmoid(d)
        return outputs


class LiteDepthDecoder(nn.Module):
    """Lite-Mono decoder. Input: 3-level LiteMono pyramid [1/4, 1/8, 1/16];
    output {('disp', s): (B, H/2^s, W/2^s, 1)} for s in scales (note: sigmoid
    applied *after* the final upsample, matching depth_decoder.py:108-110)."""

    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features) -> Dict[Tuple[str, int], jnp.ndarray]:
        num_ch_dec = [c // 2 for c in self.num_ch_enc]
        outputs = {}
        x = features[-1]
        for i in range(2, -1, -1):
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = _up2x_bilinear(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = Conv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = nn.sigmoid(_up2x_bilinear(d))
        return outputs
