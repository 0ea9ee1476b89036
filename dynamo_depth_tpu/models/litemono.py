"""Lite-Mono-8M hybrid CNN/transformer depth encoder in flax.

Capability parity with the reference ``networks/depth_encoder.py:305-431``:
3 stages (dims [64, 128, 224], depths [4, 4, 10]), a 3-conv stride-2 stem
plus a second stem conv over the concat with the avg-pooled input pyramid,
per-stage stacks of dilated-conv (CDC) blocks ending in one LGFI
cross-covariance-attention block, drop-path linspace(0, rate), and the
(x-0.45)/0.225 input normalization. Feature pyramid out: [1/4, 1/8, 1/16].

TPU notes: all NHWC; XCA's attention matrix is (heads, d, d) with d =
C/heads <= 28 — cost is linear in pixel count, so no sequence sharding is
ever needed (SURVEY §5). GELUs are exact (erf), matching torch nn.GELU.
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dynamo_depth_tpu.models.layers import DropPath, normalize_image, prec


def _gelu(x):
    return nn.gelu(x, approximate=False)


def avg_pool_3x3_s2(x):
    """torch AvgPool2d(3, stride=2, padding=1) with count_include_pad=True.

    Two formulations, selected by ``DYNAMO_AVGPOOL`` (default
    ``reduce_window``; ``slices`` opts into nine strided-slice adds).
    Measured in-step on the v5e (BENCH.md round-2 formulation study): unlike
    the stride-1 SSIM 3x3 pool — where shifted adds fuse and win — the
    stride-2 slice taps and their backward pads do NOT fuse on this backend
    and each materializes a full HBM round-trip (+2.1 ms/step across the
    depth encoder with the depthwise-slice form). ``reduce_window`` is the
    measured winner for the strided model pools.
    """
    if os.environ.get("DYNAMO_AVGPOOL", "reduce_window") != "slices":
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return s / 9.0
    B, H, W, C = x.shape
    Ho, Wo = (H + 1) // 2, (W + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    s = None
    for i in range(3):
        for j in range(3):
            tap = jax.lax.slice(
                xp, (0, i, j, 0), (B, i + 2 * Ho - 1, j + 2 * Wo - 1, C),
                strides=(1, 2, 2, 1),
            )
            s = tap if s is None else s + tap
    return s / 9.0


class DepthwiseConv3x3(nn.Module):
    """Depthwise (grouped, groups=C) dilated 3x3 conv, no bias.

    Parameter pytree is identical to
    ``nn.Conv(dim, (3, 3), feature_group_count=dim, use_bias=False)`` —
    one ``kernel`` of shape (3, 3, 1, C) with the same lecun_normal init —
    so checkpoints and the torch converter are unaffected by the
    implementation choice. ``DYNAMO_DEPTHWISE`` selects the lowering
    (default ``conv`` = grouped convolution; ``slices`` = nine shifted
    multiply-adds). Measured in-step on the v5e (BENCH.md round-2
    formulation study): the shifted-multiply-add form loses — its pad and
    slice taps lower as standalone HBM ops instead of fusing with the
    surrounding BatchNorm/GELU, costing ~+1 ms/step over the depth encoder —
    so grouped conv is the default.
    """

    dim: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.dim),
            jnp.float32,
        )
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        d = self.dilation
        if os.environ.get("DYNAMO_DEPTHWISE", "conv") != "slices":
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.dim, precision=prec(self.dtype),
            )
        H, W = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        out = None
        for i in range(3):
            for j in range(3):
                tap = jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(xp, i * d, i * d + H, axis=1),
                    j * d, j * d + W, axis=2,
                ) * w[i, j, 0]
                out = tap if out is None else out + tap
        return out


class ConvBNGELU(nn.Module):
    """Conv + BatchNorm(eps=1e-5) + exact GELU (depth_encoder.py:115-151)."""

    out: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.out, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), use_bias=False, dtype=self.dtype,
            precision=prec(self.dtype), name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn",
        )(x)
        return _gelu(x)


class PositionalEncodingFourier(nn.Module):
    """Sine-cosine positional encoding + 1x1 projection
    (depth_encoder.py:9-44). Returns (B, H, W, dim)."""

    dim: int
    hidden_dim: int = 32
    temperature: float = 10000.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, B, H, W):
        scale = 2 * math.pi
        eps = 1e-6
        y = (jnp.arange(1, H + 1, dtype=jnp.float32) / (H + eps) * scale)[None, :, None]
        x = (jnp.arange(1, W + 1, dtype=jnp.float32) / (W + eps) * scale)[None, None, :]
        y = jnp.broadcast_to(y, (B, H, W))
        x = jnp.broadcast_to(x, (B, H, W))

        i = jnp.arange(self.hidden_dim, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * jnp.floor(i / 2) / self.hidden_dim)  # (hd,)

        def enc(v):
            p = v[..., None] / dim_t  # (B, H, W, hd)
            sin = jnp.sin(p[..., 0::2])
            cos = jnp.cos(p[..., 1::2])
            return jnp.stack([sin, cos], axis=-1).reshape(B, H, W, self.hidden_dim)

        pos = jnp.concatenate([enc(y), enc(x)], axis=-1)  # (B, H, W, 2*hd)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, precision=prec(self.dtype), name="token_projection")(pos)


class XCA(nn.Module):
    """Cross-covariance attention over channels (depth_encoder.py:47-87):
    attention matrix is d_h x d_h, linear in token count."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        p = prec(self.dtype)
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, precision=p, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 4, 1)  # (3, B, h, d, N)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # L2-normalize along tokens (torch F.normalize(dim=-1) with eps=1e-12).
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        temperature = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        attn = jnp.einsum("bhdn,bhen->bhde", q, k, precision=p) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v, precision=p)  # (B, h, d, N)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, precision=p, name="proj")(out)


class DilatedConvBlock(nn.Module):
    """CDC block (depth_encoder.py:181-229): depthwise dilated 3x3 conv + BN,
    then a channels-last pointwise MLP (dim -> 6*dim -> dim) with layer-scale
    gamma, and a drop-path residual."""

    dim: int
    dilation: int = 1
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    expan_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x
        x = DepthwiseConv3x3(
            self.dim, dilation=self.dilation, dtype=self.dtype, name="ddwconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1",
        )(x)
        x = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype, precision=prec(self.dtype), name="pwconv1")(x)
        x = _gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, precision=prec(self.dtype), name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
        )
        x = gamma * x
        return inp + DropPath(self.drop_path, name="drop_path")(x, train)


class LGFI(nn.Module):
    """Local-Global Features Interaction block (depth_encoder.py:232-287):
    optional Fourier pos-encoding, XCA with layer-scale residual, then a
    pointwise MLP whose output (not residual-added to its own input) is
    drop-path-added to the block input."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    expan_ratio: int = 6
    use_pos_emb: bool = True
    num_heads: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        inp = x
        t = x.reshape(B, H * W, C)
        if self.use_pos_emb:
            pos = PositionalEncodingFourier(dim=self.dim, dtype=self.dtype, name="pos_embd")(B, H, W)
            t = t + pos.reshape(B, H * W, C)
        gamma_xca = self.param(
            "gamma_xca", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
        )
        t = t + gamma_xca * XCA(self.dim, num_heads=self.num_heads, dtype=self.dtype, name="xca")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_xca")(t)
        )
        t = t.reshape(B, H, W, C)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(t)
        t = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype, precision=prec(self.dtype), name="pwconv1")(t)
        t = _gelu(t)
        t = nn.Dense(self.dim, dtype=self.dtype, precision=prec(self.dtype), name="pwconv2")(t)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
        )
        t = gamma * t
        return inp + DropPath(self.drop_path, name="drop_path")(t, train)


class LiteMono(nn.Module):
    """Lite-Mono-8M encoder: returns [f_1/4 (64), f_1/8 (128), f_1/16 (224)]."""

    dims: Sequence[int] = (64, 128, 224)
    depths: Sequence[int] = (4, 4, 10)
    drop_path_rate: float = 0.4  # model.py:25 passes 0.4 for lite-mono-8m
    heads: Sequence[int] = (8, 8, 8)
    use_pos_embd_xca: Sequence[bool] = (True, False, False)
    dtype: Any = jnp.float32

    # dilation schedule per stage (depth_encoder.py:310)
    _dilation = ((1, 2, 3), (1, 2, 3), (1, 2, 3, 1, 2, 3, 2, 4, 6))

    @property
    def num_ch_enc(self) -> np.ndarray:
        return np.array(self.dims)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = normalize_image(x).astype(self.dtype)

        # avg-pooled input pyramid at 1/2, 1/4, 1/8 (depth_encoder.py:341-343)
        x_down = []
        cur = x
        for _ in range(3):
            cur = avg_pool_3x3_s2(cur)
            x_down.append(cur)

        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))

        # stem1: 3 convs (stride 2, 1, 1) with BN+GELU (depth_encoder.py:316-321)
        h = ConvBNGELU(self.dims[0], 3, 2, dtype=self.dtype, name="stem1_0")(x, train)
        h = ConvBNGELU(self.dims[0], 3, 1, dtype=self.dtype, name="stem1_1")(h, train)
        h = ConvBNGELU(self.dims[0], 3, 1, dtype=self.dtype, name="stem1_2")(h, train)

        # stem2: plain conv stride 2 over concat with 1/2 input (.py:323-325)
        h = jnp.concatenate([h, x_down[0]], axis=-1)
        h = nn.Conv(
            self.dims[0], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, precision=prec(self.dtype), name="stem2",
        )(h)

        features = []
        cur_block = 0
        stage_in = h  # tensor that entered the stage (pre-blocks)
        for i in range(3):
            for j in range(self.depths[i]):
                rate = float(dp_rates[cur_block + j])
                if j == self.depths[i] - 1:  # one LGFI closes each stage
                    h = LGFI(
                        dim=self.dims[i], drop_path=rate,
                        use_pos_emb=self.use_pos_embd_xca[i], num_heads=self.heads[i],
                        dtype=self.dtype, name=f"stage{i}_block{j}",
                    )(h, train)
                else:
                    h = DilatedConvBlock(
                        dim=self.dims[i], dilation=self._dilation[i][j], drop_path=rate,
                        dtype=self.dtype, name=f"stage{i}_block{j}",
                    )(h, train)
            cur_block += self.depths[i]
            features.append(h)

            if i < 2:
                # downsample: concat [stage input, stage output, pooled input]
                # then stride-2 conv (depth_encoder.py:345-366)
                cat = jnp.concatenate([stage_in, h, x_down[i + 1]], axis=-1)
                h = nn.Conv(
                    self.dims[i + 1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, precision=prec(self.dtype),
                    name=f"downsample{i + 1}",
                )(cat)
                stage_in = h

        return features
