"""Host-side input pipeline (reference L2, ``/root/reference/datasets/``).

Numpy/PIL triplet loading with flip + shared ColorJitter augmentation, the
intrinsics pyramid, padded LiDAR point lists, and motion-mask rasterization —
feeding a sharded, prefetching batch iterator that lands data directly on the
device mesh (the TPU-world replacement for DataLoader + DistributedSampler).
"""

from dynamo_depth_tpu.data.base import BaseDataset  # noqa: F401
from dynamo_depth_tpu.data.kitti import KITTIDataset  # noqa: F401
from dynamo_depth_tpu.data.waymo import WaymoDataset  # noqa: F401
from dynamo_depth_tpu.data.nuscenes import nuScenesDataset  # noqa: F401
from dynamo_depth_tpu.data.loader import BatchLoader, make_dataset  # noqa: F401
from dynamo_depth_tpu.data.splits import read_split, splits_dir  # noqa: F401

DATASETS = {
    "kitti": KITTIDataset,
    "waymo": WaymoDataset,
    "nuscenes": nuScenesDataset,
}
