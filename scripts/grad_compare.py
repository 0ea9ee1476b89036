"""One-step CPU-vs-TPU train-step comparison (round-4 TPU convergence triage).

Both TPU convergence arms (fp32 AND bf16) plateau on the synthetic corridor
scene while both CPU arms dive to abs_rel ~0.075 in fine_tune — a
deterministic backend divergence, not a dtype one (BENCH.md round-4). This
script isolates one step: identical params (seed 0), identical synthetic
batch, one `fine_tune` (or `--phase disp_init`) step on a chosen backend,
dumping the loss scalars and the per-module param-update norms to JSON.

Run it once per backend and diff:

  python scripts/grad_compare.py --platform cpu --out /tmp/gc_cpu.json
  python scripts/grad_compare.py --platform tpu --out /tmp/gc_tpu.json
  python scripts/grad_compare.py --diff /tmp/gc_cpu.json /tmp/gc_tpu.json

Near-equal update norms => the backends agree locally and the trajectory
split is basin sensitivity; a module with a wildly different/zero norm on
one backend => a broken lowering on that path.
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def run(args):
    if args.platform == "cpu":
        os.environ["DYNAMO_FORCE_PLATFORM"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.training.trainer import Trainer, partition_params
    from __graft_entry__ import _synthetic_batch

    kwargs = {}
    if args.data_path:
        # Real rendered-scene batch (scripts/bf16_convergence.py layout):
        # deterministic first-train-filenames collate, no augmentation jitter
        # beyond the dataset's deterministic pipeline.
        os.environ["DYNAMO_SPLITS_DIR"] = osp.join(args.data_path, "splits")
        kwargs = dict(dataset="kitti", split="synth",
                      data_path=args.data_path + "/")
    else:
        kwargs = dict(dataset="kitti")
    cfg = DynamoConfig(
        depth_model=args.depth_model, height=args.height,
        width=args.width, batch_size=args.batch_size,
        compute_dtype=args.compute_dtype, no_train_vis=True, num_devices=1,
        seed=0, **kwargs,
    )
    trainer = Trainer(cfg)
    built = trainer._build_phase(args.phase, steps_per_epoch=100)
    t_params, f_params = partition_params(
        trainer.variables["params"], built["trainable_modules"]
    )
    batch_stats = trainer.variables.get("batch_stats", {})
    opt_state = built["tx"].init(t_params)
    if args.data_path:
        from dynamo_depth_tpu.data.loader import collate
        from dynamo_depth_tpu.data.splits import read_split

        filenames = read_split(cfg.split, "train")[: cfg.batch_size]
        ds = trainer.get_dataset(filenames, is_train=False)  # deterministic
        raw = collate([ds.get_item(i) for i in range(len(filenames))])
        raw = trainer._train_keys_only(raw)
        batch = trainer.put_batch(raw)
    else:
        batch = trainer.put_batch(
            _synthetic_batch(cfg, trainer.global_B, cfg.height, cfg.width)
        )

    before = jax.tree.map(jnp.array, t_params)  # step donates buffers
    new_t, _, _, losses = built["step_fn"](
        t_params, f_params, batch_stats, opt_state, batch,
        jax.random.PRNGKey(123), jnp.int32(args.step_in_phase),
    )

    def module_norms(a, b):
        out = {}
        for mod in a:
            sq = [
                float(jnp.sum((x - y) ** 2))
                for x, y in zip(jax.tree.leaves(a[mod]), jax.tree.leaves(b[mod]))
            ]
            out[mod] = float(np.sqrt(sum(sq)))
        return out

    rec = {
        "platform": jax.devices()[0].platform,
        "phase": args.phase,
        "losses": {k: float(v) for k, v in losses.items() if np.ndim(v) == 0},
        "update_norms": module_norms(before, new_t),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps(rec["update_norms"], indent=1, sort_keys=True))
    print("loss:", rec["losses"].get("loss"))
    print("wrote", args.out)


def diff(paths):
    a, b = (json.load(open(p)) for p in paths)
    print(f"{'key':38s} {a['platform']:>12s} {b['platform']:>12s}  rel_diff")
    keys = sorted(set(a["losses"]) | set(b["losses"]))
    for k in keys:
        x, y = a["losses"].get(k, float("nan")), b["losses"].get(k, float("nan"))
        rel = abs(x - y) / max(abs(x), abs(y), 1e-12)
        print(f"loss/{k:33s} {x:12.6f} {y:12.6f}  {rel:8.1%}")
    for k in sorted(set(a["update_norms"]) | set(b["update_norms"])):
        x = a["update_norms"].get(k, float("nan"))
        y = b["update_norms"].get(k, float("nan"))
        rel = abs(x - y) / max(abs(x), abs(y), 1e-12)
        print(f"upd/{k:34s} {x:12.6f} {y:12.6f}  {rel:8.1%}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--phase", default="fine_tune")
    ap.add_argument("--depth_model", default="litemono")
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--batch_size", type=int, default=6)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--step_in_phase", type=int, default=50)
    ap.add_argument("--data_path", default=None,
                    help="rendered-scene root (bf16_convergence --out/data); "
                         "loads a real deterministic batch instead of noise")
    ap.add_argument("--out", default="/tmp/grad_compare.json")
    ap.add_argument("--diff", nargs=2, default=None)
    args = ap.parse_args()
    if args.diff:
        diff(args.diff)
    else:
        run(args)


if __name__ == "__main__":
    main()
