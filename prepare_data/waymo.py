"""Waymo Open tfrecords -> processed layout ETL
(reference ``prepare_data/waymo.py``).

Usage:
    python prepare_data/waymo.py <record_dir> <out_dir> [<thread_idx> <num_threads>]

Per segment and camera, produces:
    <out>/<split>/<segment>/<cam>/rgb/{original,downsample}/NNNNNN.jpg + cam.json
    <out>/<split>/<segment>/<cam>/depth/NNNNNN.npy      (N, 3) rows [u, v, z]
    <out>/<split>/<segment>/<cam>/mask/NNNNNN.{npz,pickle}
    <out>/<split>/<segment>/<cam>/odometry.txt

Requires tensorflow + waymo-open-dataset (external SDKs, not shipped in this
image); fails at import time with instructions otherwise. The optional
[thread_idx num_threads] argv pair shards segments for parallel runs.
"""

import json
import os
import os.path as osp
import pickle
import sys

import numpy as np

try:
    import cv2
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2 as open_dataset
    from waymo_open_dataset.utils import box_utils, camera_segmentation_utils, frame_utils
except ImportError as e:  # pragma: no cover - SDK not in the base image
    if __name__ == "__main__":
        raise SystemExit(
            f"waymo ETL requires tensorflow + waymo-open-dataset ({e}). "
            "Install them in a separate environment; the output layout is "
            "consumed by dynamo_depth_tpu.data.WaymoDataset."
        )
    raise

CAM_NAMES = ["FRONT"]
SPLITS = ["train", "val"]
DOWNSAMPLE_FACTOR = 4
ORG_HEIGHT, ORG_WIDTH = 1280, 1920

# Semantic classes whose instances can move (waymo taxonomy).
MOVEABLE_CATEGORIES = {2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16, 27}


# Pure-array helpers live in etl_common.py (SDK-free, unit-tested).
from etl_common import box_point_fraction, instance_masks, undistort  # noqa: E402
from etl_common import lidar_index_map, project_points_to_camera  # noqa: E402


def project_lidar_to_camera(points_all, cam_cal):
    """Vehicle-frame LiDAR points -> (N, 3) [u, v, z] in-camera points."""
    return project_points_to_camera(
        points_all, list(cam_cal.intrinsic)[:4],
        np.array(cam_cal.extrinsic.transform), cam_cal.width, cam_cal.height,
    )


def match_mask_to_box(frame, pcloud_mask):
    """Find the laser box containing the largest fraction of the mask's
    points; return its motion metadata."""
    best = {"speed": [None] * 3, "accel": [None] * 3, "center": [None] * 3,
            "dim": [None] * 3, "heading": None, "box_label": None, "match": 0}
    for lbl in frame.laser_labels:
        box = lbl.camera_synced_box
        corners = box_utils.get_upright_3d_box_corners(
            np.array([[box.center_x, box.center_y, box.center_z,
                       box.length, box.width, box.height, box.heading]])
        )[0].numpy()
        frac = box_point_fraction(pcloud_mask, corners)
        if frac > best["match"]:
            meta = lbl.metadata
            best = {
                "speed": [meta.speed_x, meta.speed_y, meta.speed_z],
                "accel": [meta.accel_x, meta.accel_y, meta.accel_z],
                "center": [box.center_x, box.center_y, box.center_z],
                "dim": [box.length, box.width, box.height],
                "heading": box.heading,
                "box_label": lbl.type,
                "match": frac,
            }
    return best


def process_segment(traversal_path, traversal_name, dataset_dir):
    traversal_dir = osp.join(dataset_dir, traversal_name)
    for cam_name in CAM_NAMES:
        for sub in ("rgb/original", "rgb/downsample", "depth", "mask"):
            os.makedirs(osp.join(traversal_dir, cam_name, sub), exist_ok=True)

    frame = open_dataset.Frame()
    poses = {cam: [] for cam in CAM_NAMES}
    num_frames = 0

    for data in tf.data.TFRecordDataset(traversal_path, compression_type=""):
        frame.ParseFromString(bytearray(data.numpy()))

        cam_images = {open_dataset.CameraName.Name.Name(img.name): img for img in frame.images}
        cam_infos = {
            open_dataset.CameraName.Name.Name(cal.name): (cal, cal.name)
            for cal in frame.context.camera_calibrations
        }
        cam_masks = {
            open_dataset.CameraName.Name.Name(img.name): img.camera_segmentation_label
            for img in frame.images
        }
        has_mask = bool(frame.images[0].camera_segmentation_label.panoptic_label)

        rimg, cproj, _, rtop = frame_utils.parse_range_image_and_camera_projection(frame)
        points, cp_points = frame_utils.convert_range_image_to_point_cloud(frame, rimg, cproj, rtop)
        points_all = np.concatenate(points, axis=0)
        cp_points_all = np.concatenate(cp_points, axis=0)

        for cam_name in CAM_NAMES:
            cam_img = cam_images[cam_name]
            cam_cal, cam_code = cam_infos[cam_name]
            cam_dir = osp.join(traversal_dir, cam_name)

            # RGB
            rgb_distorted = cv2.cvtColor(tf.image.decode_jpeg(cam_img.image).numpy(), cv2.COLOR_BGR2RGB)
            rgb, int_mat = undistort(rgb_distorted, list(cam_cal.intrinsic),
                                     [cam_cal.height, cam_cal.width])
            if num_frames == 0:
                with open(osp.join(cam_dir, "rgb", "cam.json"), "w") as fh:
                    json.dump({
                        "intrinsic": list(cam_cal.intrinsic),
                        "dim": [cam_cal.height, cam_cal.width],
                        "extrinsic": list(cam_cal.extrinsic.transform),
                        "intrinsic_mat": int_mat,
                    }, fh)
            cv2.imwrite(osp.join(cam_dir, "rgb", "original", f"{num_frames:06}.jpg"), rgb)
            down = cv2.resize(
                rgb, (rgb.shape[1] // DOWNSAMPLE_FACTOR, rgb.shape[0] // DOWNSAMPLE_FACTOR),
                interpolation=cv2.INTER_AREA,
            )
            cv2.imwrite(osp.join(cam_dir, "rgb", "downsample", f"{num_frames:06}.jpg"), down)

            # depth
            depth_points = project_lidar_to_camera(points_all, cam_cal)
            np.save(osp.join(cam_dir, "depth", f"{num_frames:06}.npy"), depth_points)

            # masks
            if has_mask:
                cam_mask = cam_masks[cam_name]
                panoptic = camera_segmentation_utils.decode_single_panoptic_label_from_proto(cam_mask)
                semantic, instance = (
                    camera_segmentation_utils.decode_semantic_and_instance_labels_from_panoptic_label(
                        panoptic, cam_mask.panoptic_label_divisor
                    )
                )
                if semantic.max() < 256:
                    semantic = semantic.astype(np.uint8)
                if instance.max() < 256:
                    instance = instance.astype(np.uint8)
                np.savez_compressed(
                    osp.join(cam_dir, "mask", f"{num_frames:06}.npz"),
                    semantic=semantic, instance=instance,
                )

                visible = points_all[cp_points_all[:, 0] == cam_code]
                ind_map = lidar_index_map(
                    cp_points_all[cp_points_all[:, 0] == cam_code][:, 1:3],
                    ORG_HEIGHT, ORG_WIDTH,
                )

                masks, labels = instance_masks(semantic, instance, sorted(MOVEABLE_CATEGORIES))
                objects = []
                for mask, m_lbl in zip(masks, labels):
                    lidar_ind = ind_map[(mask > 0) & (ind_map >= 0)]
                    best = match_mask_to_box(frame, visible[lidar_ind])
                    contours, _ = cv2.findContours(
                        (mask[..., 0] * 255).astype(np.uint8),
                        cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE,
                    )
                    objects.append({
                        "mask": contours, "mask_label": m_lbl,
                        "speed": best["speed"], "accel": best["accel"],
                        "center": best["center"], "dim": best["dim"],
                        "heading": best["heading"], "box_label": best["box_label"],
                        "match": best["match"],
                    })
                with open(osp.join(cam_dir, "mask", f"{num_frames:06}.pickle"), "wb") as fh:
                    pickle.dump(objects, fh)

            poses[cam_name].append(" ".join(str(x) for x in cam_img.pose.transform))

        num_frames += 1

    for cam_name in CAM_NAMES:
        with open(osp.join(traversal_dir, cam_name, "odometry.txt"), "w") as fh:
            fh.write("\n".join(poses[cam_name]) + "\n")
    return num_frames


def main():
    record_root, out_root = sys.argv[1], sys.argv[2]
    split_idx, split_num = (int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 3 else (0, 1)
    os.makedirs(out_root, exist_ok=True)

    for split in SPLITS:
        record_dir = osp.join(record_root, split)
        dataset_dir = osp.join(out_root, split)
        if not osp.exists(record_dir):
            raise FileNotFoundError(record_dir)
        traversals = sorted(
            (osp.join(record_dir, f), f[: f.index("_with")])
            for f in os.listdir(record_dir) if f.endswith(".tfrecord")
        )
        lo = len(traversals) * split_idx // split_num
        hi = len(traversals) * (split_idx + 1) // split_num
        for path, name in traversals[lo:hi]:
            print(f"[{split}] processing {name}")
            n = process_segment(path, name, dataset_dir)
            print(f"[{split}] {name}: {n} frames")


if __name__ == "__main__":
    main()
