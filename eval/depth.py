"""Depth evaluation CLI (reference ``eval/depth.py``).

Part 1: overall depth metrics on <split>/test_files.txt.
Part 2 (waymo/nuscenes): per-motion-class metrics on test_mask_files.txt.
Writes ``<eval_dir>/<model>_<dataset>/depth/<ckpt>.txt`` in the reference's
table format. Usage: ``python eval/depth.py -l CKPT -d DATASET``.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from dynamo_depth_tpu.config import parse_config
from dynamo_depth_tpu.data.loader import padded_eval_batches
from dynamo_depth_tpu.data.splits import read_split
from dynamo_depth_tpu.ops.geometry import disp_to_depth
from dynamo_depth_tpu.ops.metrics import DEPTH_METRIC_NAMES
from dynamo_depth_tpu.parallel.mesh import is_main_process, maybe_init_distributed
from dynamo_depth_tpu.training.trainer import Trainer
from dynamo_depth_tpu.utils.io import get_model_ckpt_name, join_dir, write_to_file


def display_str(l):
    return "".join(["{:^15s}".format(m) for m in l])


def sample_mask_at_points(mot_mask, depth_gt):
    """Host-side integer gather of mask labels at LiDAR point coords
    (tools.py:56 semantics: mask[h.long(), w.long()])."""
    B, N, _ = depth_gt.shape
    out = np.zeros((B, N), np.int32)
    for b in range(B):
        h = np.clip(depth_gt[b, :, 0].astype(np.int64), 0, mot_mask.shape[1] - 1)
        w = np.clip(depth_gt[b, :, 1].astype(np.int64), 0, mot_mask.shape[2] - 1)
        out[b] = mot_mask[b][h, w]
    return out


def main():
    import jax

    maybe_init_distributed()
    cfg = parse_config()
    cfg.print_opt = False
    cfg.frame_ids = [0]  # only the target frame is needed (eval/depth.py:28)
    cfg.img_ext = cfg.eval_img_ext
    # Multi-process eval: each host loads a contiguous row-slice of every
    # global batch and the metrics come back as global-batch means (identical
    # on every host) — DistributedSampler eval, reference Trainer.py:546-551.
    shard = (jax.process_index(), jax.process_count())

    model_name, ckpt_name = get_model_ckpt_name(cfg.load_ckpt)
    outdir = join_dir(cfg.eval_dir, f"{model_name}_{cfg.dataset}", "depth")
    out_path = osp.join(outdir, f"{ckpt_name}.txt")
    out = []

    trainer = Trainer(cfg)
    # Global eval batch, rounded up to a mesh-divisible size: predict and
    # depth_metrics shard the batch dim over the data mesh, so the loader's
    # static batch must split evenly across devices (the reference treats
    # eval batch_size as global on one GPU, eval/depth.py:52-56).
    eval_bs = -(-cfg.batch_size // trainer.n_dev) * trainer.n_dev
    metric_names = list(DEPTH_METRIC_NAMES)
    header = display_str(["Split"] + metric_names)
    out.append(f"====== Model Path - {cfg.load_ckpt} ======\n")

    # --- Part 1: overall ---------------------------------------------------
    out.append("====== Depth Eval on Overall Test Set ======\n")
    filenames = read_split(cfg.split, "test")
    assert len(filenames) > 0
    dataset = trainer.get_dataset(filenames, is_train=False, load_depth=True,
                                  img_type=cfg.eval_img_type)
    out.append(f"=== len={len(dataset)} ===")
    out.append(header)

    local = eval_bs // shard[1]
    lo = shard[0] * local

    totals = {m: 0.0 for m in metric_names}
    total_num = 0
    for bi, (batch, real_idxs) in enumerate(
        padded_eval_batches(dataset, eval_bs, cfg.num_workers, shard=shard)
    ):
        real = len(real_idxs)
        outputs = dict(trainer.predict(batch))
        outputs[("disp_scaled", 0, 0)], _ = disp_to_depth(
            outputs[("disp", 0, 0)], cfg.min_depth, cfg.max_depth
        )
        weight = np.zeros((eval_bs,), np.float32)
        weight[:real] = 1.0
        met = trainer.depth_metrics(batch, outputs,
                                    sample_weight=weight[lo:lo + local])
        for m in metric_names:
            totals[m] += float(met[m]) * real
        total_num += real
        if bi % 50 == 0 and is_main_process():
            print(f"(1/2) depth eval {bi * eval_bs}/{len(dataset)}", flush=True)

    out.append(display_str(["OVERALL"] + ["& {:.3f}".format(totals[m] / total_num) for m in metric_names]))
    out.append("\n")

    # --- Part 2: mask-conditioned ------------------------------------------
    out.append("====== Depth Eval on Test Set with Segmentation Annotations ======\n")
    if cfg.dataset == "kitti":
        out.append("Mask Split Evaluation Skipped for KITTI.")
    else:
        filenames = read_split(cfg.split, "test_mask")
        assert len(filenames) > 0
        dataset = trainer.get_dataset(filenames, is_train=False, load_depth=True,
                                      load_mask=True, img_type=cfg.eval_img_type)
        out.append(f"=== len={len(dataset)} ===")
        out.append(header)

        labels = {"bg": 0, "static": 2, "mot": 1}
        agg = {split: {m: [0.0, 0.0] for m in metric_names} for split in labels}
        for bi, (batch, real_idxs) in enumerate(
            padded_eval_batches(dataset, eval_bs, cfg.num_workers, shard=shard)
        ):
            real = len(real_idxs)
            outputs = dict(trainer.predict(batch))
            outputs[("disp_scaled", 0, 0)], _ = disp_to_depth(
                outputs[("disp", 0, 0)], cfg.min_depth, cfg.max_depth
            )
            weight = np.zeros((eval_bs,), np.float32)
            weight[:real] = 1.0
            mask_pts = sample_mask_at_points(batch["mot_mask"], batch["depth_gt"])
            met = trainer.depth_metrics(
                batch, outputs, mask_pts=mask_pts, labels=tuple(labels.values()),
                sample_weight=weight[lo:lo + local],
            )
            for split, lbl in labels.items():
                for m in metric_names:
                    s, c = met[f"{m}_mask/{lbl}"]
                    agg[split][m][0] += float(s)
                    agg[split][m][1] += float(c)
            if bi % 50 == 0 and is_main_process():
                print(f"(2/2) mask depth eval {bi * eval_bs}/{len(dataset)}", flush=True)

        for split in labels:
            out.append(display_str(
                [split.upper()]
                + ["& {:.3f}".format(agg[split][m][0] / max(agg[split][m][1], 1)) for m in metric_names]
            ))
        out.append("\n")

    if is_main_process():
        for s in out:
            print(s)
        write_to_file(out, out_path)


if __name__ == "__main__":
    main()
