"""1-D data-parallel mesh construction and sharding helpers.

Multi-host note (SURVEY §2.5): under ``jax.distributed.initialize`` the same
mesh spans all processes and DCN transfers are inserted transparently by
XLA; ``is_main_process`` replaces the reference's rank-0 ``is_main`` gating
(Trainer.py:736-739).
"""

from __future__ import annotations

import hashlib
import itertools
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_barrier_ids = itertools.count()


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
    pid = os.environ.get("JAX_PROCESS_ID")
    if (addr or pid or (nproc and int(nproc) > 1)) and not (addr and nproc and pid):
        # A partial triple (e.g. a stale JAX_PROCESS_ID) would otherwise
        # surface as jax's confusing "Number of processes must be defined" or
        # be silently ignored — fail naming the missing variable instead.
        missing = [n for n, v in [("JAX_COORDINATOR_ADDRESS", addr),
                                  ("JAX_NUM_PROCESSES", nproc),
                                  ("JAX_PROCESS_ID", pid)] if not v]
        raise RuntimeError(
            f"multi-process launch env is incomplete: {missing} unset while "
            f"{[n for n, v in [('JAX_COORDINATOR_ADDRESS', addr), ('JAX_NUM_PROCESSES', nproc), ('JAX_PROCESS_ID', pid)] if v]} "
            "is set — export all three (torchrun-style contract) or none")
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


def coord_barrier(name: str, timeout_s: float = 600.0) -> None:
    """Block until every process reaches this barrier (coordination-service
    RPC, NOT a device collective — usable before any computation runs).
    No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def tree_fingerprint(tree) -> np.ndarray:
    """64-bit content hash of a pytree's leaves as 4 exactly-representable
    float32 uint16 components (so it can ride a device collective)."""
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        a = np.asarray(leaf)
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    words = np.frombuffer(h.digest()[:8], np.uint16)
    return words.astype(np.float32)


def replicate_to_mesh(tree, mesh: Mesh, check: bool = True):
    """Place a host-local pytree fully replicated over ``mesh``.

    Single process this is a plain ``device_put``. Multi-process,
    ``device_put(x, replicated)`` runs jax's internal ``assert_equal`` — a
    full-tree ``process_allgather`` over gloo/DCN whose ~30 s context-init
    deadline flakes under host skew (caught live by
    scripts/two_process_drive.py's eval leg) and ships every parameter
    across hosts just to compare them. Model/optimizer state is
    deterministic per host (same seed or same checkpoint), so build the
    replicated global array collective-free from local data — then verify
    that determinism with an 8-byte-per-host fingerprint reduce instead of
    an every-parameter allgather (the reference is immune by construction:
    DDP broadcasts rank-0 weights, torch DistributedDataParallel docs).

    The fingerprint reduce doubles as the cluster's collective warm-up: it
    is a tiny program both processes compile in lockstep right after a
    coordination-service barrier, so the gloo/DCN communicator context is
    established while skew is milliseconds — later big-program executions
    (whose *compile* skew on a shared host can exceed gloo's hardcoded 30 s
    context-init deadline) reuse it. This is what un-flaked the 2-process
    eval CLI leg of scripts/two_process_drive.py (round-3 failure log:
    "Gloo context initialization failed: DEADLINE_EXCEEDED").
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    out = jax.tree.map(put, tree)

    if check:
        # Align processes first so the tiny fingerprint program is compiled
        # and dispatched near-simultaneously everywhere.
        coord_barrier(f"dynamo_replicate_{next(_barrier_ids)}")
        fp = tree_fingerprint(tree)  # (4,) float32
        local = np.broadcast_to(fp, (len(mesh.local_devices), 4))
        global_fp = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(DATA_AXIS)), np.ascontiguousarray(local)
        )
        lo, hi = jax.jit(
            lambda a: (a.min(axis=0), a.max(axis=0)),
            out_shardings=(sh, sh),
        )(global_fp)
        if not np.array_equal(np.asarray(lo), np.asarray(hi)):
            raise RuntimeError(
                "replicate_to_mesh: host-local pytrees DIFFER across "
                "processes (fingerprint min/max mismatch) — every host must "
                "hold identical state (same seed/checkpoint/pretrained "
                "weights). A common cause: the imagenet-pretrained load "
                "failed on a subset of hosts, leaving random init there."
            )

    return out


def is_main_process() -> bool:
    return jax.process_index() == 0
