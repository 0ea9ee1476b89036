"""nuScenes -> processed layout ETL (reference ``prepare_data/nuScenes.py``).

Usage: python prepare_data/nuScenes.py <nuscenes_data_root>

Per scene, produces under ``<root>/scenes/<scene>/FRONT/``:
    rgb/{original,downsample}/NNNNNN.jpg + rgb/cam.json + rgb/ts.json
    depth/NNNNNN.npy       (N, 3) rows [u, v, z]
    mask/NNNNNN.npz        panoptic + per-point motion labels (key frames)
    odometry.txt           flattened 4x4 ego poses per frame

Motion labels: 0=background (not movable), 1=in motion (box carries a
'moving' attribute), 2=static movable, 3=unlabeled/no box match.

Requires nuscenes-devkit + pyquaternion (external SDKs); fails at import with
instructions otherwise.
"""

import json
import os
import os.path as osp
import sys

import numpy as np

try:
    import cv2
    from pyquaternion import Quaternion
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils.data_io import load_bin_file
    from nuscenes.utils.data_classes import LidarPointCloud
    from nuscenes.utils.geometry_utils import transform_matrix, view_points
except ImportError as e:  # pragma: no cover - SDK not in the base image
    if __name__ == "__main__":
        raise SystemExit(
            f"nuScenes ETL requires nuscenes-devkit + pyquaternion ({e}). "
            "Install them in a separate environment; the output layout is "
            "consumed by dynamo_depth_tpu.data.nuScenesDataset."
        )
    raise

CAM_CHANNEL = "CAM_FRONT"
LIDAR_CHANNEL = "LIDAR_TOP"
DOWNSAMPLE_FACTOR = 3.125


def join_dir(*items):
    d = osp.join(*items)
    os.makedirs(d, exist_ok=True)
    return d


def linked_list(nusc, first_item, table_name):
    arr = [first_item]
    while arr[-1]["next"] != "":
        new_item = nusc.get(table_name, arr[-1]["next"])
        assert new_item["prev"] == arr[-1]["token"]
        arr.append(new_item)
    return arr


# Shared with the waymo ETL; SDK-free and unit-tested in etl_common.py.
from etl_common import box_point_fraction  # noqa: E402


def lidar_to_camera(nusc, data_root, lidar, cam):
    """5-transform chain: lidar frame -> global -> cam ego -> camera -> pixels.
    Returns (depth_points (N, 3) [u, v, z], global_points (N, 3))."""
    pc = LidarPointCloud.from_file(osp.join(data_root, lidar["filename"]))

    cs = nusc.get("calibrated_sensor", lidar["calibrated_sensor_token"])
    pc.rotate(Quaternion(cs["rotation"]).rotation_matrix)
    pc.translate(np.array(cs["translation"]))

    pose = nusc.get("ego_pose", lidar["ego_pose_token"])
    pc.rotate(Quaternion(pose["rotation"]).rotation_matrix)
    pc.translate(np.array(pose["translation"]))

    global_points = pc.points.T[:, :3].copy()

    pose = nusc.get("ego_pose", cam["ego_pose_token"])
    pc.translate(-np.array(pose["translation"]))
    pc.rotate(Quaternion(pose["rotation"]).rotation_matrix.T)

    cs = nusc.get("calibrated_sensor", cam["calibrated_sensor_token"])
    pc.translate(-np.array(cs["translation"]))
    pc.rotate(Quaternion(cs["rotation"]).rotation_matrix.T)

    depths = pc.points[2, :]
    points = view_points(pc.points[:3, :], np.array(cs["camera_intrinsic"]), normalize=True)

    org_h, org_w = cam["height"], cam["width"]
    keep = (depths > 1.0)
    keep &= (points[0, :] > 1) & (points[0, :] < org_w - 1)
    keep &= (points[1, :] > 1) & (points[1, :] < org_h - 1)

    coords = points[:, keep].T[:, :2]
    depth_points = np.hstack((coords, depths[keep][:, np.newaxis]))
    return depth_points, global_points[keep], keep


def motion_labels(nusc, data_root, lidar, sample_token, keep, lidar_points,
                  cat2idx, movable_cat_ind, moving_attr_tokens):
    """Per-LiDAR-point motion labels via panoptic + best-fit 3D box."""
    pan_file = osp.join(data_root, nusc.get("panoptic", lidar["token"])["filename"])
    panoptic = load_bin_file(pan_file, type="panoptic")[keep]

    boxes = nusc.get_boxes(lidar["token"])
    token2cat = {b.token: cat2idx[b.name] for b in boxes}
    token2box = {b.token: b.corners().T for b in boxes}
    token2attr = {
        nusc.get("sample_annotation", ann)["token"]: nusc.get("sample_annotation", ann)["attribute_tokens"]
        for ann in nusc.get("sample", sample_token)["anns"]
    }

    motion = np.ones_like(panoptic) * 3
    panoptic2ann = {}
    for unique_label in np.unique(panoptic):
        cat = unique_label // 1000
        sel = panoptic == unique_label
        if cat not in movable_cat_ind:
            motion[sel] = 0
            continue
        btoken, bfit = None, 0
        for ann_token, ann_cat in token2cat.items():
            if ann_cat != cat:
                continue
            frac = box_point_fraction(lidar_points[sel], token2box[ann_token])
            if frac > bfit:
                bfit, btoken = frac, ann_token
        if btoken is None:
            motion[sel] = 3
        elif any(at in moving_attr_tokens for at in token2attr[btoken]):
            motion[sel] = 1
        else:
            motion[sel] = 2
        panoptic2ann[unique_label] = {"token": btoken, "fit": bfit}
    return panoptic, panoptic2ann, motion


def process_scene(nusc, data_root, sc, cat2idx, movable_cat_ind, moving_attr_tokens):
    scene_name = sc["name"]
    cam_name = CAM_CHANNEL[4:]

    first_sample = nusc.get("sample", sc["first_sample_token"])
    samples = linked_list(nusc, first_sample, "sample")

    first_cam = nusc.get("sample_data", first_sample["data"][CAM_CHANNEL])
    cams = linked_list(nusc, first_cam, "sample_data")
    sample_cams = [c for c in cams if c["is_key_frame"]]

    first_lidar = nusc.get("sample_data", first_sample["data"][LIDAR_CHANNEL])
    unmapped = linked_list(nusc, first_lidar, "sample_data")
    # nearest-timestamp lidar per camera frame; key frames use the sample lidar
    nearest = np.array(
        [[abs(l["timestamp"] - cam["timestamp"]) for l in unmapped] for cam in cams]
    ).argmin(1)
    lidars = [unmapped[i] for i in nearest]
    for ii, cam in enumerate(cams):
        if cam["is_key_frame"]:
            lidars[ii] = nusc.get(
                "sample_data", nusc.get("sample", cam["sample_token"])["data"][LIDAR_CHANNEL]
            )

    assert len(samples) == len(sample_cams) == sc["nbr_samples"]

    org_rgb_d = join_dir(data_root, "scenes", scene_name, cam_name, "rgb", "original")
    dwn_rgb_d = join_dir(data_root, "scenes", scene_name, cam_name, "rgb", "downsample")
    depth_d = join_dir(data_root, "scenes", scene_name, cam_name, "depth")
    mask_d = join_dir(data_root, "scenes", scene_name, cam_name, "mask")
    cam_json = osp.join(data_root, "scenes", scene_name, cam_name, "rgb", "cam.json")

    poses = []
    for ii, cam in enumerate(cams):
        org_h, org_w = cam["height"], cam["width"]
        org_path = osp.join(org_rgb_d, f"{ii:06}.jpg")
        dwn_path = osp.join(dwn_rgb_d, f"{ii:06}.jpg")
        depth_path = osp.join(depth_d, f"{ii:06}.npy")
        mask_path = osp.join(mask_d, f"{ii:06}.npz")

        fpath = osp.join(data_root, cam["filename"])
        if not osp.exists(org_path):
            os.symlink(osp.realpath(fpath), org_path)
        if not osp.exists(dwn_path):
            dwn_h, dwn_w = int(org_h / DOWNSAMPLE_FACTOR), int(org_w / DOWNSAMPLE_FACTOR)
            cv2.imwrite(dwn_path, cv2.resize(cv2.imread(fpath), (dwn_w, dwn_h),
                                             interpolation=cv2.INTER_AREA))

        lidar = lidars[ii]
        depth_points, lidar_points, keep = lidar_to_camera(nusc, data_root, lidar, cam)

        if not osp.exists(depth_path):
            np.save(depth_path, depth_points)

        if cam["is_key_frame"] and not osp.exists(mask_path):
            panoptic, panoptic2ann, motion = motion_labels(
                nusc, data_root, lidar, cam["sample_token"], keep, lidar_points,
                cat2idx, movable_cat_ind, moving_attr_tokens,
            )
            np.savez_compressed(
                mask_path, panoptic_label=panoptic, panoptic2ann=panoptic2ann,
                motion_label=motion.astype(np.uint8),
            )

        if not osp.exists(cam_json):
            cs = nusc.get("calibrated_sensor", cam["calibrated_sensor_token"])
            K = np.array(cs["camera_intrinsic"], dtype=np.float64)
            K[0] /= org_w
            K[1] /= org_h
            with open(cam_json, "w") as fh:
                json.dump({
                    "camera_intrinsic": cs["camera_intrinsic"],
                    "translation": cs["translation"],
                    "rotation": cs["rotation"],
                    "dim": [org_h, org_w],
                    "intrinsic_mat": K.tolist(),
                }, fh)

        ego = nusc.get("ego_pose", cam["ego_pose_token"])
        pose_car = transform_matrix(ego["translation"], Quaternion(ego["rotation"]))
        poses.append(" ".join(str(x) for x in pose_car.flatten()))

    with open(osp.join(data_root, "scenes", scene_name, cam_name, "odometry.txt"), "w") as fh:
        for line in poses:
            fh.write(line + "\n")

    ts = np.array(
        [np.rint((c2["timestamp"] - c1["timestamp"]) / 1000) for c1, c2 in zip(cams[:-1], cams[1:])]
    ).astype(np.uint8).tolist()  # milliseconds
    with open(osp.join(data_root, "scenes", scene_name, cam_name, "rgb", "ts.json"), "w") as fh:
        json.dump(ts, fh)


def main():
    data_root = sys.argv[1]
    nusc = NuScenes(version="v1.0-trainval", dataroot=data_root, verbose=True)

    cat2idx = {c["name"]: c["index"] for c in nusc.category}
    moving_attr_tokens = {a["token"] for a in nusc.attribute if "moving" in a["name"]}
    movable_cat_ind = {
        c["index"] for c in nusc.category
        if "animal" in c["name"] or "human" in c["name"] or "vehicle" in c["name"]
    }
    movable_cat_ind.discard(31)  # vehicle.ego: camera-mounted, never "moving"

    for s_idx, sc in enumerate(nusc.scene):
        print(f"[{s_idx + 1}/{len(nusc.scene)}] {sc['name']}")
        process_scene(nusc, data_root, sc, cat2idx, movable_cat_ind, moving_attr_tokens)


if __name__ == "__main__":
    main()
