"""1-D data-parallel mesh construction and sharding helpers.

Multi-host note (SURVEY §2.5): under ``jax.distributed.initialize`` the same
mesh spans all processes and DCN transfers are inserted transparently by
XLA; ``is_main_process`` replaces the reference's rank-0 ``is_main`` gating
(Trainer.py:736-739).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """Build a 1-D ``data`` mesh over the first ``num_devices`` devices
    (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    return jax.process_index() == 0
