"""Pose decoder (reference ``networks/pose_decoder.py``).

1x1 squeeze to 256ch + ReLU, two 3x3 convs + ReLU, a 1x1 head to
6*num_frames, global spatial mean, and the 0.01 output scaling
(pose_decoder.py:16-44). Consumes the last feature of the pose encoder.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dynamo_depth_tpu.models.layers import prec


class PoseDecoder(nn.Module):
    num_frames_to_predict_for: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_feature) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """last_feature: (B, h, w, C) -> (axisangle, translation), each
        (B, num_frames, 3)."""
        p = prec(self.dtype)
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, precision=p, name="squeeze")(last_feature))
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=p, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=p, name="pose_1")(x))
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype, precision=p, name="pose_2")(x)

        x = 0.01 * jnp.mean(x, axis=(1, 2))  # (B, 6*F)
        x = x.reshape(x.shape[0], self.num_frames_to_predict_for, 6)
        return x[..., :3], x[..., 3:]
