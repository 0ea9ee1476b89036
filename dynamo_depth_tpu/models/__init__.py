"""Flax network zoo (reference L3, ``/root/reference/networks/``).

Seven sub-modules bundled by :class:`~dynamo_depth_tpu.models.model.DynamoModel`:
depth encoder (LiteMono or ResNet), depth decoder (LiteDepthDecoder or
Monodepth2 DepthDecoder), pose encoder+decoder, shared motion encoder, and two
motion decoders (complete 3D flow, motion mask). All modules are NHWC and
accept a ``train`` flag (BatchNorm/DropPath behavior).
"""

from dynamo_depth_tpu.models.model import DynamoModel, ModelOutputs  # noqa: F401
from dynamo_depth_tpu.models.resnet import ResnetEncoder  # noqa: F401
from dynamo_depth_tpu.models.litemono import LiteMono  # noqa: F401
from dynamo_depth_tpu.models.depth_decoder import DepthDecoder, LiteDepthDecoder  # noqa: F401
from dynamo_depth_tpu.models.pose_decoder import PoseDecoder  # noqa: F401
from dynamo_depth_tpu.models.motion_decoder import MotionDecoder  # noqa: F401
