"""Trainer runtime (reference L5): curriculum phases, jitted train steps,
loss assembly, checkpointing, logging."""

from dynamo_depth_tpu.training.trainer import Trainer  # noqa: F401
from dynamo_depth_tpu.training.losses import view_synthesis, compute_losses  # noqa: F401
