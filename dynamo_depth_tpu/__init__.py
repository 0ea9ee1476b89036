"""dynamo_depth_tpu — a TPU-native rebuild of Dynamo-Depth (NeurIPS 2023).

Self-supervised monocular depth, ego-motion, complete 3D scene flow, and binary
motion-mask estimation from unlabeled monocular video, re-designed for TPU:

- flax networks compiled under XLA (NHWC layout, bf16-friendly),
- the view-synthesis hot path (backproject -> flow -> project -> bilinear warp
  -> SSIM+L1) as fused XLA/Pallas ops,
- a four-phase curriculum trainer with per-phase jitted train steps,
- data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
  gradient reduction over ICI (replacing the reference's DDP/NCCL).

Capability reference: https://github.com/YihongSun/Dynamo-Depth
(mounted read-only at /root/reference; cited throughout as file:line).
"""

__version__ = "0.1.0"

from dynamo_depth_tpu.config import DynamoConfig  # noqa: F401
