"""Config surface parity with the reference's DynamoOptions
(options.py:4-303): same flag names, defaults, and dataset-conditional
resolution."""

import pytest

from dynamo_depth_tpu.config import DynamoConfig, parse_config


def test_dataset_conditional_defaults():
    k = DynamoConfig(dataset="kitti")
    assert (k.split, k.height, k.width) == ("eigen_zhou", 192, 640)
    assert k.cam_name == "image_02"
    assert k.eval_max_depth == 80
    assert k.eval_img_type == "original" and k.eval_img_ext == ".png"
    assert k.eval_img_bound == pytest.approx([0.40810811, 0.99189189, 0.03594771, 0.96405229])

    w = DynamoConfig(dataset="waymo")
    assert (w.split, w.height, w.width) == ("waymo", 320, 480)
    assert w.eval_max_depth == 75 and w.eval_img_bound == [0, 1, 0, 1]

    n = DynamoConfig(dataset="nuscenes")
    assert (n.height, n.width) == (288, 512)


def test_model_conditional_scales():
    assert DynamoConfig(dataset="kitti", depth_model="monodepthv2").scales == [0, 1, 2, 3]
    assert DynamoConfig(dataset="kitti", depth_model="litemono").scales == [0, 1, 2]
    assert DynamoConfig(dataset="kitti", scales=[0, 1]).scales == [0, 1]


def test_core_hyperparameter_defaults():
    c = DynamoConfig(dataset="kitti")
    assert c.epoch_schedules == [1, 1, 5, 20]
    assert c.epoch_size == 8000
    assert c.batch_size == 3
    assert c.learning_rate == 1e-4
    assert c.scheduler_step_size == 10
    assert c.frame_ids == [0, -1, 1]
    assert (c.min_depth, c.max_depth) == (0.1, 100.0)
    assert c.ssim_weight == 0.85
    assert (c.g_d_smooth, c.g_d_ground) == (1e-3, 0.1)
    assert (c.g_c_smooth, c.g_c_consistency) == (1e-3, 5.0)
    assert (c.g_m_sparsity, c.g_m_smooth) == (0.04, 0.1)
    assert c.weight_ramp == ["g_c_smooth", "g_c_consistency", "g_m_sparsity", "g_m_smooth"]
    assert c.ramp_red == 3
    assert (c.gp_prior, c.gp_tol, c.gp_max_it, c.gp_np_per_it) == (0.4, 0.005, 100, 5)
    assert c.mask_disp_thrd == 0.03


def test_cli_parses_reference_invocations():
    # README invocations must work verbatim
    c = parse_config(["-d", "kitti", "-n", "my_model", "-b", "2", "-l", "ckpt/K_Dynamo-Depth"])
    assert c.dataset == "kitti" and c.model_name == "my_model"
    assert c.batch_size == 2 and c.load_ckpt == "ckpt/K_Dynamo-Depth"

    c = parse_config(["--dataset", "waymo", "--depth_model", "monodepthv2",
                      "--epoch-size", "100"])
    assert c.epoch_size == 100 and c.scales == [0, 1, 2, 3]


def test_validate_rejects_bad_configs():
    with pytest.raises(AssertionError):
        DynamoConfig(dataset="kitti", height=100).validate()
    with pytest.raises(AssertionError):
        DynamoConfig(dataset="kitti", frame_ids=[1, 0]).validate()
    with pytest.raises(AssertionError):
        DynamoConfig(dataset="kitti", epoch_schedules=[1, 1, 1]).validate()


def test_roundtrip_dict():
    c = DynamoConfig(dataset="kitti", batch_size=7)
    c2 = DynamoConfig.from_dict(c.to_dict())
    assert c2.batch_size == 7 and c2.split == "eigen_zhou"
