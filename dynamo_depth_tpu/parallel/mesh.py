"""1-D data-parallel mesh construction and sharding helpers.

Multi-host note (SURVEY §2.5): under ``jax.distributed.initialize`` the same
mesh spans all processes and DCN transfers are inserted transparently by
XLA; ``is_main_process`` replaces the reference's rank-0 ``is_main`` gating
(Trainer.py:736-739).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed() -> None:
    """Join the jax.distributed cluster when launched multi-process.

    Replaces the reference's torch.distributed NCCL process-group setup
    (train.py:6-10). Configured via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (torchrun-style env contract); used
    by train.py AND the eval CLIs, which the reference also runs under
    DistributedSampler (Trainer.py:546-551).

    jax.distributed.initialize() only reads JAX_COORDINATOR_ADDRESS from the
    environment itself — num_processes/process_id come from cluster
    auto-detection (SLURM etc.) or explicit args, so the torchrun-style env
    contract must be forwarded explicitly (caught live by
    scripts/two_process_drive.py's eval leg: "Number of processes must be
    defined")."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if addr or (nproc and int(nproc) > 1):
        # NOTE: must not touch jax.process_count()/devices() here — any
        # backend query initializes XLA and initialize() then refuses to run.
        kwargs = {}
        if addr:
            kwargs["coordinator_address"] = addr
        if nproc:
            kwargs["num_processes"] = int(nproc)
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            if "once" not in str(e) and "already" not in str(e):
                raise  # already-initialized (e.g. train.py called us first) is fine


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


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a host-local pytree fully replicated over ``mesh``.

    Single process this is a plain ``device_put``. Multi-process,
    ``device_put(x, replicated)`` runs jax's internal ``assert_equal`` — a
    full-tree ``process_allgather`` over gloo/DCN whose ~30 s context-init
    deadline flakes under host skew (caught live by
    scripts/two_process_drive.py's eval leg) and ships every parameter
    across hosts just to compare them. Model/optimizer state is
    deterministic per host (same seed or same checkpoint), so build the
    replicated global array collective-free from local data instead."""
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def is_main_process() -> bool:
    return jax.process_index() == 0
