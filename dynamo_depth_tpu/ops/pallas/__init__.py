"""Hand-written Pallas TPU kernels for the view-synthesis hot path.

Every kernel has a pure-XLA twin in ``dynamo_depth_tpu.ops`` that serves as
its correctness reference (and its backward pass, via ``jax.custom_vjp``).
Kernels self-disable on platforms where Mosaic is unavailable (CPU tests run
the XLA twin).
"""

from dynamo_depth_tpu.ops.pallas.photometric_kernel import (  # noqa: F401
    reprojection_loss_fused,
)
from dynamo_depth_tpu.ops.pallas.warp_kernel import grid_sample_pallas  # noqa: F401
