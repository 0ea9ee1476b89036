"""Device mesh + distributed process utilities (reference L7 equivalent).

The reference scales with single-node DDP over NCCL (train.py:6-33,
Trainer.py:44); here parallelism is a 1-D ``data`` mesh over ICI with the
train step ``shard_map``-ped across it: batch sharded, params/optimizer
replicated, gradients ``psum``-averaged — DDP semantics (including
per-device BatchNorm statistics) expressed as XLA collectives.
"""

from dynamo_depth_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    is_main_process,
    make_mesh,
    replicate_to_mesh,
    replicated_sharding,
)
