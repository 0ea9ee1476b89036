"""Dataset/loader tests against the reference's tiny golden assets
(SURVEY §4: assets/tiny_* are the de-facto test fixtures)."""

import os.path as osp

import numpy as np
import pytest

from dynamo_depth_tpu.data import nuScenesDataset
from dynamo_depth_tpu.data.augment import ColorJitter
from dynamo_depth_tpu.data.base import MAX_LIDAR_NUM
from dynamo_depth_tpu.data.loader import BatchLoader, collate, sample_epoch_filenames

TINY_NUSC = "/root/reference/assets/tiny_nuscenes/"

needs_assets = pytest.mark.skipif(
    not osp.isdir(TINY_NUSC), reason="tiny_nuscenes assets not available"
)


def make_nusc(filenames, **kw):
    kw.setdefault("is_train", False)
    kw.setdefault("load_depth", False)
    kw.setdefault("load_mask", False)
    return nuScenesDataset(
        data_path=TINY_NUSC, filenames=filenames, height=288, width=512,
        cam_name="FRONT", img_type="downsample", frame_idxs=[0, -1, 1],
        num_scales=3, img_ext=".jpg", **kw,
    )


@needs_assets
def test_nuscenes_item_keys_and_shapes():
    ds = make_nusc(["scenes/scene-0001 1"], load_depth=False)
    item = ds[0]
    for f in (0, -1, 1):
        assert item[("color", f, 0)].shape == (288, 512, 3)
        assert item[("color_aug", f, 0)].shape == (288, 512, 3)
        assert 0.0 <= item[("color", f, 0)].min() and item[("color", f, 0)].max() <= 1.0
    for s in range(3):
        K = item[("K", s)]
        assert K.shape == (4, 4)
        # intrinsics scaled per scale
        assert K[0, 0] == pytest.approx(item[("K", 0)][0, 0] / (2 ** s), rel=1e-5)
        np.testing.assert_allclose(
            item[("inv_K", s)], np.linalg.pinv(K), atol=1e-5
        )
    assert tuple(item["gt_dim"]) == (900, 1600)
    # nuScenes variable timesteps: ts(0)=sum of 0 entries = 0 semantics don't
    # apply to frame 0; neighbors must be positive and finite
    assert item[("ts", 1)] > 0 and item[("ts", -1)] > 0
    assert item[("ts", 0)] == 0


@needs_assets
def test_nuscenes_depth_points_padded():
    # depth exists only for key frames (000000); avoid the missing -1
    # neighbor by restricting the frame window
    ds = make_nusc(["scenes/scene-0001 0"], load_depth=True)
    ds.frame_idxs = [0, 1]
    item = ds[0]
    assert item["depth_gt"].shape == (MAX_LIDAR_NUM, 3)
    assert item["depth_valid"].shape == (MAX_LIDAR_NUM,)
    n = int(item["depth_valid"].sum())
    assert 0 < n < MAX_LIDAR_NUM
    pts = item["depth_gt"][:n]
    # [h, w, z] layout with coords inside the full-res frame
    assert pts[:, 0].max() < 900 and pts[:, 1].max() < 1600
    assert pts[:, 2].min() > 0


@needs_assets
def test_nuscenes_mask_reconstruction():
    ds = make_nusc(["scenes/scene-0001 0"], load_mask=True)
    ds.frame_idxs = [0, 1]
    item = ds[0]
    assert item["mot_mask"].shape == (900, 1600)
    labels = set(np.unique(item["mot_mask"]).tolist())
    assert labels <= {0, 1, 2, 3}


@needs_assets
def test_flip_consistency_between_color_and_depth():
    ds_train = make_nusc(["scenes/scene-0001 0"], load_depth=True)
    ds_train.frame_idxs = [0, 1]
    ds_train.is_train = True
    rng_flip = np.random.RandomState(123)
    item = ds_train.get_item(0, rng=rng_flip)
    assert item[("color", 0, 0)].shape == (288, 512, 3)


@needs_assets
def test_batch_loader_collates_and_is_deterministic():
    files = ["scenes/scene-0001 1"] * 4  # only frames 0..2 exist in the tiny assets
    ds = make_nusc(files)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=3)
    batches1 = [b for b in loader]
    batches2 = [b for b in loader]
    assert len(batches1) == 2
    assert batches1[0][("color", 0, 0)].shape == (2, 288, 512, 3)
    np.testing.assert_array_equal(
        batches1[0][("color", 0, 0)], batches2[0][("color", 0, 0)]
    )


def test_epoch_resampling_matches_reference_semantics():
    files = [f"seg {i}" for i in range(100)]
    out = sample_epoch_filenames(files, epoch_size=10, global_batch=4, seed=0)
    assert len(out) == 40
    out2 = sample_epoch_filenames(files, epoch_size=10, global_batch=4, seed=0)
    assert out == out2  # same seed -> same epoch sample on every host
    # with replacement only when pool is too small
    out3 = sample_epoch_filenames(files[:5], epoch_size=10, global_batch=4, seed=1)
    assert len(out3) == 40


def test_color_jitter_ranges(rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    jit = ColorJitter()
    for seed in range(5):
        f = jit.sample(np.random.RandomState(seed))
        out = f(img)
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, img)  # something changed


def test_shard_strided_batches():
    ds_files = [f"seg {i}" for i in range(16)]

    class FakeDS:
        def __len__(self):
            return 16

        def get_item(self, i, rng=None):
            return {"x": np.array([i])}

    l0 = BatchLoader(FakeDS(), 2, shard=(0, 2))
    l1 = BatchLoader(FakeDS(), 2, shard=(1, 2))
    b0 = [b["x"][:, 0].tolist() for b in l0]
    b1 = [b["x"][:, 0].tolist() for b in l1]
    assert len(b0) == len(b1) == 4
    flat = sorted(sum(b0 + b1, []))
    assert flat == list(range(16))  # disjoint cover


def test_native_dataplane_matches_pil(tmp_path, rng):
    from PIL import Image as PILImage

    from dynamo_depth_tpu.data import native

    if not native.available():
        pytest.skip("native data plane not built")

    img = (rng.rand(100, 150, 3) * 255).astype("uint8")
    p = str(tmp_path / "img.png")
    PILImage.fromarray(img).save(p)

    for flip in (False, True):
        src = PILImage.open(p)
        if flip:
            src = src.transpose(PILImage.FLIP_LEFT_RIGHT)
        gold = np.asarray(src.resize((96, 64), PILImage.BICUBIC), np.float32) / 255
        ours = native.decode_resize_batch([p], 64, 96, [flip])[0]
        assert np.abs(gold - ours).max() <= 1.01 / 255


@needs_assets
def test_native_and_pil_dataset_paths_agree():
    import dynamo_depth_tpu.data.native as native

    if not native.available():
        pytest.skip("native data plane not built")
    ds = make_nusc(["scenes/scene-0001 1"])
    item_native = ds.get_item(0, rng=np.random.RandomState(0))

    import os

    os.environ["DYNAMO_NO_NATIVE"] = "1"
    old_lib, native._lib, native._build_failed = native._lib, None, True
    try:
        item_pil = ds.get_item(0, rng=np.random.RandomState(0))
    finally:
        native._lib, native._build_failed = old_lib, False
        del os.environ["DYNAMO_NO_NATIVE"]

    d = np.abs(item_native[("color", 0, 0)] - item_pil[("color", 0, 0)])
    assert d.max() <= 1.01 / 255


def test_padded_eval_batches_order_and_padding():
    from dynamo_depth_tpu.data.loader import padded_eval_batches

    class FakeDS:
        def __len__(self):
            return 7

        def get_item(self, i, rng=None):
            return {"x": np.array([i])}

    out = list(padded_eval_batches(FakeDS(), batch_size=3, num_workers=2))
    assert len(out) == 3
    batches = [b["x"][:, 0].tolist() for b, _ in out]
    reals = [r for _, r in out]
    assert batches == [[0, 1, 2], [3, 4, 5], [6, 6, 6]]  # padded by repeat
    assert reals == [[0, 1, 2], [3, 4, 5], [6]]
