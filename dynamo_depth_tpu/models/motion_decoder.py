"""Motion decoder (reference ``networks/motion_decoder.py``).

Coarse-to-fine refinement of a motion field seeded from the (detached)
ego-motion vector: a 1x1 conv maps ``100 * ego_motion`` (6-vector) to the
output dim, then per pyramid level (coarsest -> finest, ending at the raw
input image) the field is bilinearly upsampled, concatenated with the
encoder feature, passed through two 3x3 convs, reduced by a 1x1 conv over
the concat of both conv outputs, and added residually
(motion_decoder.py:36-62). Heads emit ``0.01 * field`` as either a 3-channel
complete flow or a 1-channel motion logit + sigmoid mask per scale
(motion_decoder.py:78-90).

Instantiated twice by the model container with a shared motion encoder:
out_dim=3 (complete flow) and out_dim=1 (motion mask), model.py:34-35.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamo_depth_tpu.models.layers import prec
from dynamo_depth_tpu.ops.warp import resize_bilinear


class _ConcatConv(nn.Module):
    """``nn.Conv(out, k)(concat([a, b], -1))`` evaluated without the concat.

    The refinement pyramid concatenates small-channel full-resolution
    tensors only to feed them to a conv; on TPU that concat is a pure
    HBM/layout cost (~1.6 ms/step at the finest level, profiled on v5e).
    In-step the split form measures roughly neutral (-0.1 ms/step across
    motion_dec+motion_mask, BENCH.md round-2 formulation study): XLA re-emits
    comparable elementwise adds for conv_a+conv_b, but the materialized
    concat buffer is gone, so it is kept as the default.
    Since conv is linear in its input channels,
    ``conv(cat(a, b)) == conv_a(a) + conv_b(b)`` with the kernel split along
    the input-channel axis — the parameter pytree ('kernel' of shape
    (k, k, Ca+Cb, out) + 'bias') and its init are identical to the nn.Conv
    form, so checkpoints/converter are unaffected.
    ``DYNAMO_SPLIT_CONCAT=concat`` opts back into the materialized concat.
    """

    out: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        p = prec(self.dtype)
        pad = (self.kernel - 1) // 2
        cin = a.shape[-1] + b.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.out), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.out,), jnp.float32)
        w = w.astype(self.dtype)
        ca = a.shape[-1]

        def conv(x, wk):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), wk, window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=p,
            )

        if os.environ.get("DYNAMO_SPLIT_CONCAT") == "concat":
            x = jnp.concatenate([a, b], axis=-1)
            return conv(x, w) + bias.astype(self.dtype)
        return conv(a, w[:, :, :ca]) + conv(b, w[:, :, ca:]) + bias.astype(self.dtype)


class MotionDecoder(nn.Module):
    num_ch_enc: Sequence[int]  # encoder channels, e.g. [64, 64, 128, 256, 512]
    scales: Sequence[int] = (0, 1, 2)
    num_input_images: int = 3
    out_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, ego_motion) -> Dict[Tuple[str, int], jnp.ndarray]:
        """
        :param pyramid: [input_image (B,H,W,3*num_input_images),
                         feat_1/2, feat_1/4, feat_1/8, feat_1/16, feat_1/32]
        :param ego_motion: (B, 6) detached ego-motion conditioning vector
        :return: {('complete_flow', s): (B, h_s, w_s, 3)} or
                 {('motion_prob'|'motion_mask', s): (B, h_s, w_s, 1)}
        """
        num_levels = len(self.num_ch_enc) + 1  # encoder levels + raw input

        # Seed: (B, 1, 1, out_dim) from 100x the ego-motion 6-vector.
        p = prec(self.dtype)
        seed = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, precision=p, name="residual_translation")(
            (100.0 * ego_motion)[:, None, None, :]
        )

        field = seed
        per_level = {}
        for ii in range(num_levels):
            feat = pyramid[-1 - ii]
            h, w = feat.shape[1], feat.shape[2]
            up = resize_bilinear(field, (h, w))
            c1 = _ConcatConv(
                feat.shape[-1], kernel=3, dtype=self.dtype, name=f"refine_conv{ii}_0",
            )(up, feat)
            c2 = nn.Conv(
                feat.shape[-1], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                precision=p, name=f"refine_conv{ii}_1",
            )(c1)
            red = _ConcatConv(
                self.out_dim, kernel=1, dtype=self.dtype, name=f"refine_redu{ii}",
            )(c1, c2)
            field = red + up
            per_level[ii] = field

        outputs = {}
        for scale in self.scales:
            m_raw = 0.01 * per_level[num_levels - 1 - scale]
            if self.out_dim == 1:
                outputs[("motion_prob", scale)] = m_raw
                outputs[("motion_mask", scale)] = nn.sigmoid(m_raw)
            elif self.out_dim == 3:
                outputs[("complete_flow", scale)] = m_raw
            else:
                raise ValueError(f"out_dim={self.out_dim} not supported")
        return outputs
