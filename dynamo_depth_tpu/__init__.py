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

import jax as _jax

# Persistent compilation cache: first compiles of the curriculum phases are
# expensive; every entry point benefits. Env vars alone do NOT work here —
# the axon sitecustomize imports jax's config at interpreter startup, so
# JAX_COMPILATION_CACHE_DIR set from user code is read too late and
# ``config.compilation_cache_dir`` stays None (measured round 3: /tmp/jax_cache
# stayed empty through rounds 1-2). Explicit config.update is authoritative.
_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
# Default gate (1.0 s) skips the many small sub-second compiles; cache all.
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if _os.environ.get("DYNAMO_FORCE_PLATFORM"):
    # Escape hatch for CPU-mesh testing: the axon TPU plugin prepends itself
    # to jax_platforms, so the JAX_PLATFORMS env var alone is unreliable.
    _jax.config.update("jax_platforms", _os.environ["DYNAMO_FORCE_PLATFORM"])

from dynamo_depth_tpu.config import DynamoConfig  # noqa: F401
