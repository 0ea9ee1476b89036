"""Binary motion segmentation evaluation CLI
(reference ``eval/motion_segmentation.py``).

Pass 1: sweep 150 thresholds over the predicted motion mask (frame -1,
scale 0, upsampled to full resolution), accumulating tp/fp/fn against the
ground-truth motion labels (1=moving, 2=static, 3=unlabeled). Saves a PR
curve pdf + npz record. Pass 2 (waymo only): tally false positives by
semantic class at the best-F1 threshold into a bar chart.

Usage: ``python eval/motion_segmentation.py -l CKPT -d DATASET``.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax.numpy as jnp

from dynamo_depth_tpu.config import parse_config
from dynamo_depth_tpu.data.loader import padded_eval_batches
from dynamo_depth_tpu.data.splits import read_split
from dynamo_depth_tpu.ops.seg_metrics import pr_sweep_counts
from dynamo_depth_tpu.ops.warp import resize_bilinear
from dynamo_depth_tpu.training.trainer import Trainer
from dynamo_depth_tpu.utils.io import get_model_ckpt_name, is_edge, join_dir

NUM_THRD = 150


def main():
    cfg = parse_config()
    cfg.frame_ids = [0, -1, 1]
    cfg.print_opt = False

    model_name, ckpt_name = get_model_ckpt_name(cfg.load_ckpt)
    outdir = join_dir(cfg.eval_dir, f"{model_name}_{cfg.dataset}", "mot_seg")
    pr_curve_path = osp.join(outdir, f"pr_curve_{ckpt_name}.pdf")
    pr_record_path = osp.join(outdir, f"pr_record_{ckpt_name}.npz")
    fp_tally_path = osp.join(outdir, f"fp_tally_{ckpt_name}.pdf")

    trainer = Trainer(cfg)
    # Mesh-divisible global eval batch (see eval/depth.py).
    eval_bs = -(-cfg.batch_size // trainer.n_dev) * trainer.n_dev

    filenames = read_split(cfg.split, "test_mask")
    filenames = [f for f in filenames if not is_edge(f, cfg)]
    assert len(filenames) > 0
    dataset = trainer.get_dataset(filenames, is_train=False, load_mask=True,
                                  img_type=cfg.eval_img_type)
    full_w, full_h = dataset.FULL_RES
    print(f"=== len={len(dataset)} ===")

    eps = 1 / (NUM_THRD - 1)
    thrds = np.linspace(0 - eps, 1 - eps, NUM_THRD).astype(np.float32)
    motion_pred = [None] * len(dataset)
    record = {v: np.zeros(NUM_THRD, np.float64) for v in ["tp", "fp", "fn"]}

    # On-device sweep (ops/seg_metrics.py): all 150 thresholds in one
    # bucketize+histogram, batch-sharded over the trainer mesh; only the
    # (T,) counts come back to the host. Results are exactly equal to the
    # reference's per-threshold host loop.
    thrds_dev = jnp.asarray(thrds)
    need_pred_host = cfg.dataset == "waymo"  # pass 2 reuses per-image preds

    for bi, (batch, real_idxs) in enumerate(padded_eval_batches(dataset, eval_bs, cfg.num_workers)):
        outputs = trainer.predict(batch, bool_CmpFlow=True, bool_MotMask=True)
        pred = resize_bilinear(outputs[("motion_mask", -1, 0)], (full_h, full_w))[..., 0]
        gt = trainer.put_batch({"mot_mask": batch["mot_mask"]})["mot_mask"]
        weight = np.zeros((eval_bs,), np.float32)
        weight[: len(real_idxs)] = 1.0
        tp, fp, fn = pr_sweep_counts(pred, gt, thrds_dev, jnp.asarray(weight))
        record["tp"] += np.asarray(tp, np.float64)
        record["fp"] += np.asarray(fp, np.float64)
        record["fn"] += np.asarray(fn, np.float64)

        if need_pred_host:
            pred_host = np.asarray(pred)
            for ii, ind in enumerate(real_idxs):
                motion_pred[ind] = pred_host[ii]
        if bi % 20 == 0:
            print(f"(1/2) thresholds {bi * eval_bs}/{len(dataset)}", flush=True)

    precision = record["tp"] / (record["tp"] + record["fp"] + 1e-10)
    recall = record["tp"] / (record["tp"] + record["fn"] + 1e-10)
    f1 = 2 * (precision * recall) / (precision + recall + 1e-10)

    from matplotlib import pyplot as plt

    fig = plt.figure()
    plt.axhline(y=precision[0], linestyle=":")
    plt.plot(recall[recall > 0], precision[recall > 0])
    plt.xlim(0, 1)
    plt.ylim(0, 1)
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("Motion Segmentation PR Curve")
    fig.savefig(pr_curve_path)
    plt.clf()
    out_npz = {
        "precision": precision, "recall": recall, "f1": f1,
        "thrds": thrds.reshape(1, NUM_THRD, 1, 1),
    }
    np.savez(pr_record_path, **out_npz)
    print(f"PR curve saved to `{pr_curve_path}`.")
    print(f"PR record saved to `{pr_record_path}`.")

    if cfg.dataset == "waymo":  # waymo has semantic labels, nuscenes does not
        best_f1_thrd = float(thrds[int(np.argmax(f1))])
        fp_tally = {"total": 0}
        for bi, (batch, real_idxs) in enumerate(padded_eval_batches(dataset, eval_bs, cfg.num_workers)):
            for ii, ind in enumerate(real_idxs):
                gt_b = batch["mot_mask"][ii] == 1
                valid_b = batch["mot_mask"][ii] != 3
                sem = batch["sem_mask"][ii]
                pm = motion_pred[ind] > best_f1_thrd
                fp_b = np.logical_and(pm > gt_b, valid_b)
                for label, count in zip(*np.unique(sem[fp_b], return_counts=True)):
                    fp_tally[label] = fp_tally.get(label, 0) + count
                    fp_tally["total"] += count
            if bi % 20 == 0:
                print(f"(2/2) fp tally {bi * eval_bs}/{len(dataset)}", flush=True)

        from dynamo_depth_tpu.data.categories import WAYMO_CATEGORIES

        fig = plt.figure()
        fig.set_size_inches(20, 10)
        cats, cnts = [], []
        for c_idx, cnt in fp_tally.items():
            if c_idx != "total":
                cats.append(WAYMO_CATEGORIES[int(c_idx)])
                cnts.append(cnt / fp_tally["total"])
        order = np.argsort(cnts)[::-1]
        plt.bar(np.array(cats)[order], np.array(cnts)[order])
        plt.tick_params(axis="x", labelrotation=60)
        plt.ylim([0, 1])
        plt.ylabel("False Positive Rate")
        plt.title(
            "Motion Segmentation False Positive Tally - Thrd {:.2f} - Macro F1 {:.3f}".format(
                best_f1_thrd, float(np.max(f1))
            )
        )
        fig.savefig(fp_tally_path)
        print(f"FP tally saved to `{fp_tally_path}`.")


if __name__ == "__main__":
    main()
