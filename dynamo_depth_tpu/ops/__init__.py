"""Geometry / loss ops — the compute surface of the framework (reference L4).

All ops are pure jnp functions over NHWC tensors with static shapes, designed
to trace cleanly under jit and fuse under XLA. The Pallas sub-package holds
hand-written TPU kernels for the hot view-synthesis path; every Pallas kernel
has a pure-XLA twin here that serves as its correctness reference.
"""

from dynamo_depth_tpu.ops.geometry import (  # noqa: F401
    backproject,
    depth_to_disp,
    disp_to_depth,
    pixel_grid,
    project,
    rot_from_axisangle,
    transformation_from_parameters,
    translation_matrix,
)
from dynamo_depth_tpu.ops.photometric import (  # noqa: F401
    reprojection_loss,
    smooth_loss,
    ssim,
)
from dynamo_depth_tpu.ops.warp import grid_sample, resize_bilinear, resize_nearest  # noqa: F401
from dynamo_depth_tpu.ops.ground_plane import ground_plane_fit  # noqa: F401
from dynamo_depth_tpu.ops.metrics import compute_errors, depth_metrics  # noqa: F401
