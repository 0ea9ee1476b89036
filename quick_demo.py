"""Quick demo (reference ``quick-demo.ipynb`` as a script).

Runs checkpoint inference on the tiny nuScenes assets and writes the
[img | disp | ego_flow | ind_flow | mask] visualization grid to PNG files.

    python quick_demo.py --load_ckpt ckpt/N_Dynamo-Depth \
        [--data_path ./assets/tiny_nuscenes/] [--out demo_out]
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from dynamo_depth_tpu.config import parse_config
from dynamo_depth_tpu.data.loader import collate
from dynamo_depth_tpu.training.trainer import Trainer
from dynamo_depth_tpu.utils.io import join_dir
from eval.visualize import combine_vis, get_vis

DEFAULT_FILENAMES = ["scenes/scene-0099 85", "scenes/scene-0104 2"]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out_dir = "demo_out"
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--dataset" not in argv and "-d" not in argv:
        argv = ["--dataset", "nuscenes"] + argv

    cfg = parse_config(argv)
    cfg.num_workers = 1
    cfg.batch_size = 1
    cfg.print_opt = False
    if cfg.data_path == f"data_dir/{cfg.dataset}/":
        cfg.data_path = "./assets/tiny_nuscenes/"

    trainer = Trainer(cfg)
    dataset = trainer.get_dataset(DEFAULT_FILENAMES, is_train=False,
                                  img_type=cfg.eval_img_type)

    arrangement = [["img", "disp", "ego_flow", "ind_flow", "mask"]]
    vis_list = []
    for i in range(len(dataset)):
        batch = collate([dataset.get_item(i)])
        vis_list.append(
            get_vis(cfg, trainer, batch, ref_frame_id=cfg.frame_ids[1],
                    scale=0, items=arrangement[0])
        )

    frames = combine_vis(vis_list, arrangement)
    join_dir(out_dir)
    from PIL import Image

    for i, frame in enumerate(frames):
        path = osp.join(out_dir, f"demo_{i}.png")
        Image.fromarray(frame).save(path)
        print(f"saved {path}")


if __name__ == "__main__":
    main()
