"""Model container bundling the seven sub-modules (reference
``networks/model.py:15-230``).

Logical networks -> modules (model.py:36-41), with the motion encoder shared
between the complete-flow and motion-mask decoders:

    Depth   : depth_enc, depth_dec
    Pose    : pose_enc,  pose_dec
    CmpFlow : motion_enc, motion_dec
    MotMask : motion_enc, motion_mask

Forward wiring reproduced (SURVEY §2.1 facts):
- depth is predicted per frame for all frame_ids (model.py:69-74) — here all
  frames are **stacked into one 3B batch** so the encoder runs once per step
  at full MXU utilization instead of the reference's per-frame python loop;
- pose input is cat([frame_f, frame_0]) with the target last, output
  transformation inverted (model.py:85,95) — both source frames are batched
  into one 2B encoder call;
- motion input is cat([frame_-g, frame_0, frame_+g]) (9 channels) per gap g
  (model.py:104-113); the ego-motion conditioning vector is the *detached*
  antisymmetric mean of the two pose predictions, translation first
  (model.py:131-133); complete-flow outputs are signed +-1 per temporal
  direction while mask outputs are shared (model.py:140-149).

``bool_CmpFlow`` / ``bool_MotMask`` are static call arguments: each curriculum
phase jit-specializes its own forward with dead branches traced out (the
TPU-native replacement for DDP's find_unused_parameters, SURVEY §2.5).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynamo_depth_tpu.models.depth_decoder import DepthDecoder, LiteDepthDecoder
from dynamo_depth_tpu.models.litemono import LiteMono
from dynamo_depth_tpu.models.motion_decoder import MotionDecoder
from dynamo_depth_tpu.models.pose_decoder import PoseDecoder
from dynamo_depth_tpu.models.resnet import ResnetEncoder
from dynamo_depth_tpu.ops.geometry import transformation_from_parameters

# Logical network -> module names (model.py:36-41).
NETWORK2MODULES = {
    "Depth": ["depth_enc", "depth_dec"],
    "Pose": ["pose_enc", "pose_dec"],
    "CmpFlow": ["motion_enc", "motion_dec"],
    "MotMask": ["motion_enc", "motion_mask"],
}

MODULE_NAMES = sorted({m for mods in NETWORK2MODULES.values() for m in mods})

ModelOutputs = Dict[Tuple, jnp.ndarray]


def modules_for_networks(network_names: Sequence[str]) -> list:
    """Union of module names for the given logical networks
    (model.py:157-164)."""
    return sorted({m for n in network_names for m in NETWORK2MODULES[n]})


class DynamoModel(nn.Module):
    depth_model: str = "litemono"
    encoder_num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2)
    frame_ids: Sequence[int] = (0, -1, 1)
    dtype: Any = jnp.float32

    def setup(self):
        if self.depth_model == "monodepthv2":
            self.depth_enc = ResnetEncoder(
                num_layers=self.encoder_num_layers, num_input_images=1, dtype=self.dtype
            )
            self.depth_dec = DepthDecoder(
                num_ch_enc=tuple(self.depth_enc.num_ch_enc), scales=tuple(self.scales),
                dtype=self.dtype,
            )
        elif self.depth_model == "litemono":
            self.depth_enc = LiteMono(dtype=self.dtype)
            self.depth_dec = LiteDepthDecoder(
                num_ch_enc=tuple(self.depth_enc.num_ch_enc), scales=tuple(self.scales),
                dtype=self.dtype,
            )
        else:
            raise ValueError(f"depth_model {self.depth_model} not recognized")

        self.pose_enc = ResnetEncoder(
            num_layers=self.encoder_num_layers, num_input_images=2, dtype=self.dtype
        )
        self.pose_dec = PoseDecoder(num_frames_to_predict_for=2, dtype=self.dtype)
        self.motion_enc = ResnetEncoder(
            num_layers=self.encoder_num_layers, num_input_images=3, dtype=self.dtype
        )
        # Both motion decoders refine against the *pose-encoder channel spec*
        # (the reference passes pose_enc.num_ch_enc at model.py:34-35; the
        # motion encoder shares that spec).
        self.motion_dec = MotionDecoder(
            num_ch_enc=tuple(self.pose_enc.num_ch_enc), scales=tuple(self.scales),
            num_input_images=3, out_dim=3, dtype=self.dtype,
        )
        self.motion_mask = MotionDecoder(
            num_ch_enc=tuple(self.pose_enc.num_ch_enc), scales=tuple(self.scales),
            num_input_images=3, out_dim=1, dtype=self.dtype,
        )

    # ---- prediction stages ---------------------------------------------

    def predict_depths(self, inputs, outputs, train: bool):
        frames = list(self.frame_ids)
        B = inputs[("color_aug", 0, 0)].shape[0]
        stacked = jnp.concatenate([inputs[("color_aug", f, 0)] for f in frames], axis=0)
        feats = self.depth_enc(stacked, train=train)
        disp = self.depth_dec(feats)
        for (name, s), v in disp.items():
            parts = jnp.split(v, len(frames), axis=0)
            for f, p in zip(frames, parts):
                outputs[(name, f, s)] = p
        return outputs

    def predict_poses(self, inputs, outputs, train: bool):
        sources = list(self.frame_ids[1:])
        if not sources:  # single-frame eval (eval/depth.py overrides frame_ids=[0])
            return outputs
        target = inputs[("color_aug", 0, 0)]
        B = target.shape[0]
        # One 2B-batch encoder call over all (source, target) channel pairs.
        pairs = jnp.concatenate(
            [jnp.concatenate([inputs[("color_aug", f, 0)], target], axis=-1) for f in sources],
            axis=0,
        )
        feats = self.pose_enc(pairs, train=train)
        axisangle, translation = self.pose_dec(feats[-1])  # (len(sources)*B, 2, 3)
        axisangle, translation = axisangle[:, 0], translation[:, 0]
        for i, f in enumerate(sources):
            aa = axisangle[i * B : (i + 1) * B]
            tr = translation[i * B : (i + 1) * B]
            outputs[("axisangle", 0, f)] = aa
            outputs[("translation", 0, f)] = tr
            outputs[("cam_T_cam", 0, f)] = transformation_from_parameters(
                aa.astype(jnp.float32), tr.astype(jnp.float32), invert=True
            )
        return outputs

    def predict_motions(self, inputs, outputs, train: bool, bool_CmpFlow: bool, bool_MotMask: bool):
        if not bool_CmpFlow and not bool_MotMask:
            return outputs

        gaps = sorted({abs(f) for f in self.frame_ids[1:]})
        for g in gaps:
            motion_input = jnp.concatenate(
                [
                    inputs[("color_aug", -g, 0)],
                    inputs[("color_aug", 0, 0)],
                    inputs[("color_aug", g, 0)],
                ],
                axis=-1,
            )
            feats = self.motion_enc(motion_input, train=train)
            pyramid = [motion_input] + list(feats)

            # Detached antisymmetric mean, translation first (model.py:131-133).
            ego_t = jnp.asarray(
                (outputs[("translation", 0, -g)] - outputs[("translation", 0, g)]) / 2
            )
            ego_aa = jnp.asarray(
                (outputs[("axisangle", 0, -g)] - outputs[("axisangle", 0, g)]) / 2
            )
            ego = jax.lax.stop_gradient(jnp.concatenate([ego_t, ego_aa], axis=-1))

            if bool_CmpFlow:
                flow = self.motion_dec(pyramid, ego)
                for (name, s), v in flow.items():
                    outputs[(name, -g, s)] = -v
                    outputs[(name, g, s)] = v
            if bool_MotMask:
                prob = self.motion_mask(pyramid, ego)
                for (name, s), v in prob.items():
                    outputs[(name, -g, s)] = v
                    outputs[(name, g, s)] = v
        return outputs

    def __call__(
        self,
        inputs: Dict,
        train: bool = False,
        bool_CmpFlow: bool = True,
        bool_MotMask: bool = True,
    ) -> ModelOutputs:
        outputs: ModelOutputs = {}
        self.predict_depths(inputs, outputs, train)
        self.predict_poses(inputs, outputs, train)
        self.predict_motions(inputs, outputs, train, bool_CmpFlow, bool_MotMask)
        return outputs
