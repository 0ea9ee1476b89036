"""Guard for the REAL 2-process `jax.distributed` contract.

Runs scripts/two_process_drive.py end-to-end (train 1x2 vs 2x1, val, and the
eval/depth.py CLI under both topologies) and requires its ALL PASS. This is
the only coverage of `jax.process_count() > 1` semantics — the 8-device
virtual mesh used by the rest of the suite is still one process — and it is
what caught the round-3 gloo context-init deadline in the eval CLI leg
(fixed by replicate_to_mesh's barrier + fingerprint warm-up,
parallel/mesh.py). Reference semantics: DistributedSampler train/eval,
/root/reference/Trainer.py:44,546-551.

~6-10 min with a warm /tmp/jax_cache; deselect with -m "not slow".
"""

import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_two_process_drive(tmp_path):
    env = os.environ.copy()
    # The drive's workers force the CPU platform themselves; just make sure
    # a prior test process' TPU selection doesn't leak through.
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "two_process_drive.py"),
         "--out", str(tmp_path / "two_proc")],
        cwd=REPO, env=env, timeout=2400,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"drive rc={proc.returncode}\n{tail}"
    assert "ALL PASS" in proc.stdout, tail
