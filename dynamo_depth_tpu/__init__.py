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

import os as _os

# Persistent compilation cache: first compiles of the curriculum phases are
# expensive; every entry point benefits.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if _os.environ.get("DYNAMO_FORCE_PLATFORM"):
    # Escape hatch for CPU-mesh testing: the axon TPU plugin prepends itself
    # to jax_platforms, so the JAX_PLATFORMS env var alone is unreliable.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DYNAMO_FORCE_PLATFORM"])

from dynamo_depth_tpu.config import DynamoConfig  # noqa: F401
