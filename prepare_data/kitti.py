"""KITTI raw -> processed layout ETL (reference ``prepare_data/kitti.py``).

Usage: python prepare_data/kitti.py <raw_kitti_dir> <out_dir>

Produces, per drive and camera:
    <out>/<date>/<drive>/image_0{2,3}/rgb/{original,downsample}/*.{png,jpg}
    <out>/<date>/<drive>/image_0{2,3}/depth/*.npy   (N, 3) rows [h, w, z]
with calib txts symlinked at the drive level — byte-compatible with the
reference's layout (verify against assets/tiny_kitti via compare_datasets.py).
"""

import os
import os.path as osp
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from kitti_util import generate_depth_map  # noqa: E402

CAM_NAMES = ["image_02", "image_03"]
DOWNSAMPLE_H, DOWNSAMPLE_W = 192, 640


def process_drive(raw_date_dir, t_name, out_date_dir):
    t_dir = osp.join(raw_date_dir, t_name)
    t_out = osp.join(out_date_dir, t_name)
    os.makedirs(t_out, exist_ok=True)

    for txt in [f for f in os.listdir(raw_date_dir) if f.endswith(".txt")]:
        dst = osp.join(t_out, txt)
        if not osp.exists(dst):
            os.symlink(osp.realpath(osp.join(raw_date_dir, txt)), dst)

    for cam in CAM_NAMES:
        img_src = osp.join(t_dir, cam, "data")
        depth_src = osp.join(t_dir, "velodyne_points", "data")
        org_out = osp.join(t_out, cam, "rgb", "original")
        down_out = osp.join(t_out, cam, "rgb", "downsample")
        depth_out = osp.join(t_out, cam, "depth")
        for d in (org_out, down_out, depth_out):
            os.makedirs(d, exist_ok=True)

        names = [f.split(".")[0] for f in os.listdir(img_src) if f.endswith(".png")]
        for name in names:
            src = osp.join(img_src, f"{name}.png")
            org = osp.join(org_out, f"{name}.png")
            down = osp.join(down_out, f"{name}.jpg")
            if not osp.exists(org):
                os.symlink(osp.realpath(src), org)
            if not osp.exists(down):
                Image.open(src).resize((DOWNSAMPLE_W, DOWNSAMPLE_H)).save(down)

        for name in names:
            bin_path = osp.join(depth_src, f"{name}.bin")
            npy_path = osp.join(depth_out, f"{name}.npy")
            if not osp.exists(bin_path):
                print(f"Depth Data {bin_path} Not Found - Skipped")
                continue
            if osp.exists(npy_path):
                continue
            dmap = generate_depth_map(raw_date_dir, bin_path, cam=int(cam[-1]), vel_depth=True)
            h_ind, w_ind = np.where(dmap > 0)
            pts = np.stack([h_ind, w_ind, dmap[h_ind, w_ind]]).transpose((1, 0))
            np.save(npy_path, pts)


def main():
    raw_dataset, out_dataset = sys.argv[1], sys.argv[2]
    os.makedirs(out_dataset, exist_ok=True)
    for t_date in sorted(f for f in os.listdir(raw_dataset) if f.startswith("2011")):
        date_dir = osp.join(raw_dataset, t_date)
        out_date = osp.join(out_dataset, t_date)
        os.makedirs(out_date, exist_ok=True)
        for t_name in sorted(f for f in os.listdir(date_dir) if f.startswith(t_date)):
            print(f"Processing {t_date}/{t_name}")
            process_drive(date_dir, t_name, out_date)


if __name__ == "__main__":
    main()
