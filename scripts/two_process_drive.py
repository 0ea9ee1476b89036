"""2-process ``jax.distributed`` drive (round-2 VERDICT item 5).

The multi-process code paths — ``Trainer.put_batch``'s
``make_array_from_process_local_data`` assembly, ``Trainer.val``'s
shard-order pairing (trainer.py:488-496), and the eval CLI's metric
aggregation — can only be validated by a REAL ``jax.process_count() == 2``
run: the 8-device virtual CPU mesh used by the test suite is still one
process. This script runs the same tiny synthetic-KITTI curriculum phase
and depth eval twice on the CPU backend (gloo collectives):

  single: 1 process x 2 virtual devices
  multi:  2 processes x 1 virtual device each (same 2-device global mesh)

and asserts that val losses, per-step train losses, host-averaged val depth
metrics, and the eval CLI's OVERALL row all match across the two
topologies. Mirrors the reference's DistributedSampler eval semantics
(/root/reference/Trainer.py:546-551) under torchrun-style multi-process.

Usage:  python scripts/two_process_drive.py [--out /tmp/two_proc]
Exit 0 = all comparisons passed.
"""

import argparse
import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

H, W = 64, 96          # verify-skill geometry: fastest compiling config
STEPS = 4              # disp_init steps (epoch_size)
VAL_EVERY = 2          # log_frequency -> val at steps 0 and 2
RTOL = 2e-4            # fp reorder tolerance: multi assembles the global
                       # batch host-strided, a permutation of single's order


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# --------------------------------------------------------------- worker side

def run_worker(args):
    import jax

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.training.trainer import Trainer

    os.environ["DYNAMO_SPLITS_DIR"] = osp.join(args.out, "data", "splits")
    cfg = DynamoConfig(
        dataset="kitti", split="synth", data_path=osp.join(args.out, "data") + "/",
        depth_model="monodepthv2", scales=[0, 1], height=H, width=W,
        batch_size=1, num_devices=0, epoch_size=STEPS,
        epoch_schedules=[1, 0, 0, 0], log_frequency=VAL_EVERY,
        no_train_vis=True, num_workers=2, seed=0,
        log_dir=osp.join(args.out, "logs"), model_name=args.name,
    )

    class RecordingTrainer(Trainer):
        def __init__(self, cfg):
            super().__init__(cfg)
            self.records = {"train": [], "val": []}

        def setup_logging(self):
            self._wandb = None

        def log_scalars(self, mode, losses):
            self.records[mode].append(
                {k: float(v) for k, v in losses.items() if np.ndim(v) == 0}
            )

        def log_vis(self, *a, **k):
            pass

    trainer = RecordingTrainer(cfg)
    trainer.train()
    path = osp.join(args.out, f"{args.name}_p{args.process_id}.json")
    with open(path, "w") as f:
        json.dump(trainer.records, f, indent=1)
    print(f"[worker {args.name} p{args.process_id}] wrote {path}", flush=True)


# ----------------------------------------------------------- orchestrator

def _env(n_local_devices):
    env = os.environ.copy()
    env["DYNAMO_FORCE_PLATFORM"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_local_devices}"]
    )
    return env

def _spawn_workers(args, name, n_proc):
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        cmd = [sys.executable, osp.abspath(__file__), "--worker",
               "--out", args.out, "--name", name,
               "--num_processes", str(n_proc), "--process_id", str(pid),
               "--coordinator", f"127.0.0.1:{port}"]
        log = open(osp.join(args.out, f"{name}_p{pid}.log"), "w")
        procs.append((subprocess.Popen(cmd, env=_env(2 // n_proc),
                                       stdout=log, stderr=subprocess.STDOUT), log))
    rcs = []
    for p, log in procs:
        rcs.append(p.wait(timeout=3600))
        log.close()
    return rcs


def _run_eval(args, name, ckpt, n_proc):
    """Drive the real eval/depth.py CLI under the given process topology."""
    port = _free_port()
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    procs = []
    for pid in range(n_proc):
        env = _env(2 // n_proc)
        env["DYNAMO_SPLITS_DIR"] = osp.join(args.out, "data", "splits")
        if n_proc > 1:
            env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       JAX_NUM_PROCESSES=str(n_proc), JAX_PROCESS_ID=str(pid))
        cmd = [sys.executable, osp.join(repo, "eval", "depth.py"),
               "-d", "kitti", "-l", ckpt,
               "--data_path", osp.join(args.out, "data") + "/",
               "--split", "synth", "--height", str(H), "--width", str(W),
               "--depth_model", "monodepthv2", "--scales", "0", "1",
               "--batch_size", "2", "--eval_dir", osp.join(args.out, f"eval_{name}"),
               "--eval_img_type", "downsample", "--eval_img_ext", ".jpg"]
        log = open(osp.join(args.out, f"eval_{name}_p{pid}.log"), "w")
        procs.append((subprocess.Popen(cmd, env=env, stdout=log,
                                       stderr=subprocess.STDOUT), log))
    rcs = []
    for p, log in procs:
        rcs.append(p.wait(timeout=3600))
        log.close()
    return rcs


def _load_records(args, name, n_proc):
    recs = []
    for pid in range(n_proc):
        with open(osp.join(args.out, f"{name}_p{pid}.json")) as f:
            recs.append(json.load(f))
    return recs


def _overall_row(args, name, ckpt):
    model = osp.basename(osp.dirname(osp.dirname(ckpt)))
    path = osp.join(args.out, f"eval_{name}", f"{model}_kitti", "depth",
                    osp.basename(ckpt) + ".txt")
    with open(path) as f:
        for line in f:
            if line.strip().startswith("OVERALL"):
                return [float(t) for t in line.replace("&", " ").split()[1:]]
    raise AssertionError(f"no OVERALL row in {path}")


def _close(tag, a, b, rtol=RTOL):
    ok = np.allclose(a, b, rtol=rtol, atol=1e-6)
    print(f"{'PASS' if ok else 'FAIL'}  {tag}:\n    single {a}\n    multi  {b}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/two_proc")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--name", default="")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--skip_training", action="store_true",
                    help="reuse an earlier run's training records/checkpoint "
                         "and only re-drive the eval CLI comparison")
    args = ap.parse_args()

    if args.worker:
        run_worker(args)
        return

    os.makedirs(args.out, exist_ok=True)
    from scripts.bf16_convergence import render_scene

    splits = render_scene(osp.join(args.out, "data"), W0=320, H0=96,
                          dz=0.75, n_frames=16)
    # the eval CLI reads <split>/test_files.txt; reuse the val frames
    synth = osp.join(splits, "synth")
    with open(osp.join(synth, "val_files.txt")) as f:
        val_lines = f.read()
    with open(osp.join(synth, "test_files.txt"), "w") as f:
        f.write(val_lines)

    if not args.skip_training:
        print("== training: 1 process x 2 devices ==", flush=True)
        rcs = _spawn_workers(args, "single", 1)
        assert rcs == [0], f"single-process training failed rc={rcs}"
        print("== training: 2 processes x 1 device ==", flush=True)
        rcs = _spawn_workers(args, "multi", 2)
        assert rcs == [0, 0], f"2-process training failed rc={rcs}"

    single = _load_records(args, "single", 1)[0]
    multi = _load_records(args, "multi", 2)

    ok = True
    # per-logged-step train loss: global batch content identical (strided
    # host sharding is a permutation), grads pmean'd -> same update.
    s_tr = [r["loss"] for r in single["train"]]
    m_tr = [r["loss"] for r in multi[0]["train"]]
    ok &= _close("train loss per logged step", s_tr, m_tr)
    ok &= _close("train loss rank0 == rank1 (replicated step)",
                 m_tr, [r["loss"] for r in multi[1]["train"]])

    # val loss is psum'd across the global batch -> identical on every host.
    s_val = [r["loss"] for r in single["val"]]
    ok &= _close("val loss", s_val, [r["loss"] for r in multi[0]["val"]])

    # val depth metrics are GLOBAL-batch means (gt rows are assembled onto
    # the prediction's shard placement inside depth_metrics), so every host
    # logs the same value and it equals the single-process one.
    mkeys = [k for k in single["val"][0] if k.startswith(("de:", "da:"))]
    for k in mkeys:
        s = [r[k] for r in single["val"]]
        ok &= _close(f"val metric {k}", s, [r[k] for r in multi[0]["val"]])
        ok &= _close(f"val metric {k} rank0 == rank1",
                     [r[k] for r in multi[0]["val"]],
                     [r[k] for r in multi[1]["val"]])

    ckpt = osp.join(args.out, "logs", "single", "models", "disp_init_00")
    print("== eval/depth.py: 1 process x 2 devices ==", flush=True)
    rcs = _run_eval(args, "single", ckpt, 1)
    assert rcs == [0], f"single-process eval failed rc={rcs}"
    print("== eval/depth.py: 2 processes x 1 device ==", flush=True)
    rcs = _run_eval(args, "multi", ckpt, 2)
    assert rcs == [0, 0], f"2-process eval failed rc={rcs}"
    ok &= _close("eval OVERALL row", _overall_row(args, "single", ckpt),
                 _overall_row(args, "multi", ckpt))

    print("ALL PASS" if ok else "COMPARISONS FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
