"""Training entry point (reference ``train.py``).

Single host:      python train.py -d kitti -n my_model
Multi-host pods:  set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
                  JAX_PROCESS_ID (or rely on the TPU runtime's automatic
                  configuration) — ``jax.distributed.initialize`` replaces the
                  reference's torch.distributed NCCL process-group setup
                  (train.py:6-10); the mesh then spans all processes and the
                  data loader shards per host.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


import jax

# The axon TPU plugin prepends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var; DYNAMO_FORCE_PLATFORM=cpu forces a platform for
# CPU-mesh testing.
if os.environ.get("DYNAMO_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DYNAMO_FORCE_PLATFORM"])

from dynamo_depth_tpu.config import parse_config
from dynamo_depth_tpu.parallel.mesh import maybe_init_distributed
from dynamo_depth_tpu.training.trainer import Trainer


if __name__ == "__main__":
    maybe_init_distributed()
    cfg = parse_config()
    cfg.local_world_size = jax.process_count()
    trainer = Trainer(cfg)
    trainer.train()
