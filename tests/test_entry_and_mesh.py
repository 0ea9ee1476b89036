"""Driver-entry rc honesty + multi-process launch-contract guards.

- ``dryrun_multichip`` must propagate a REAL flagship-arm failure (nonzero
  subprocess rc) while keeping a budget timeout a clean skip (round-3
  VERDICT item 5: MULTICHIP_r*.json ok must not read true over a broken
  flagship step, reference DDP step /root/reference/Trainer.py:44).
- ``maybe_init_distributed`` must reject a partial torchrun-style env
  triple with an error naming the missing variable (advisor round-3 low).
- ``tree_fingerprint`` must be order/content-sensitive and
  shape/dtype-discriminating (it guards replicated-init equality across
  hosts, replacing DDP's rank-0 broadcast).
"""

import subprocess
import sys

import numpy as np
import pytest

import __graft_entry__ as ge
from dynamo_depth_tpu.parallel import mesh as pmesh


class _FakeProc:
    def __init__(self, rc):
        self.returncode = rc
        self.stdout = f"fake flagship arm output rc={rc}\n"


def _quick_monodepth_arm(monkeypatch):
    """Shrink the always-run in-process arm to nothing: pretend the first
    arm already consumed some budget by stubbing _dryrun_step."""
    monkeypatch.setattr(ge, "_dryrun_step", lambda *a, **k: None)
    monkeypatch.setattr(ge, "_ensure_devices", lambda n: None)


def test_dryrun_propagates_real_flagship_failure(monkeypatch):
    _quick_monodepth_arm(monkeypatch)
    monkeypatch.setattr(ge, "_run_flagship_subprocess",
                        lambda n, timeout: _FakeProc(1))
    with pytest.raises(RuntimeError, match="flagship arm FAILED"):
        ge.dryrun_multichip(8)


def test_dryrun_budget_timeout_is_a_skip(monkeypatch, capsys):
    _quick_monodepth_arm(monkeypatch)

    def raise_timeout(n, timeout):
        raise subprocess.TimeoutExpired(cmd=[sys.executable], timeout=timeout)

    monkeypatch.setattr(ge, "_run_flagship_subprocess", raise_timeout)
    ge.dryrun_multichip(8)  # must return normally
    assert "skipped" in capsys.readouterr().out


def test_dryrun_success_reports_both_arms(monkeypatch, capsys):
    _quick_monodepth_arm(monkeypatch)
    monkeypatch.setattr(ge, "_run_flagship_subprocess",
                        lambda n, timeout: _FakeProc(0))
    ge.dryrun_multichip(8)
    assert "both arms completed" in capsys.readouterr().out


def test_partial_launch_env_rejected(monkeypatch):
    for present in (["JAX_PROCESS_ID"],
                    ["JAX_COORDINATOR_ADDRESS"],
                    ["JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES"]):
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        values = {"JAX_COORDINATOR_ADDRESS": "127.0.0.1:1234",
                  "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"}
        for var in present:
            monkeypatch.setenv(var, values[var])
        with pytest.raises(RuntimeError, match="incomplete"):
            pmesh.maybe_init_distributed()


def test_single_process_env_is_fine(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    pmesh.maybe_init_distributed()  # no env set: no-op
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    pmesh.maybe_init_distributed()  # declared single-process: no-op


def test_tree_fingerprint_discriminates():
    t1 = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(4)}
    fp1 = pmesh.tree_fingerprint(t1)
    assert fp1.shape == (4,) and fp1.dtype == np.float32
    # exact uint16 components -> collective-safe in f32
    assert np.array_equal(fp1, fp1.astype(np.uint16).astype(np.float32))
    # deterministic
    assert np.array_equal(fp1, pmesh.tree_fingerprint(
        {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(4)}))
    # content change
    t2 = {"a": t1["a"].copy(), "b": np.ones(4)}
    t2["a"][0, 0] += 1e-7
    assert not np.array_equal(fp1, pmesh.tree_fingerprint(t2))
    # shape change with identical bytes
    t3 = {"a": t1["a"].reshape(3, 2), "b": np.ones(4)}
    assert not np.array_equal(fp1, pmesh.tree_fingerprint(t3))
    # dtype change with identical values
    t4 = {"a": t1["a"].astype(np.float64), "b": np.ones(4)}
    assert not np.array_equal(fp1, pmesh.tree_fingerprint(t4))


def test_replicate_to_mesh_single_process_unchanged():
    import jax

    m = pmesh.make_mesh(2)
    tree = {"w": np.arange(8, dtype=np.float32)}
    out = pmesh.replicate_to_mesh(tree, m)
    assert isinstance(out["w"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
