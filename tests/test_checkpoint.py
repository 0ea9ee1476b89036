"""Checkpoint save/load round-trip + partial-load fallback + torch converter
shape-compat test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamo_depth_tpu.models.model import MODULE_NAMES
from dynamo_depth_tpu.training import checkpoint as ckpt


def fake_variables(rng):
    params = {
        m: {"conv": {"kernel": rng.rand(3, 3, 4, 8).astype(np.float32)}}
        for m in MODULE_NAMES
    }
    stats = {
        m: {"bn": {"mean": rng.rand(8).astype(np.float32),
                   "var": rng.rand(8).astype(np.float32)}}
        for m in MODULE_NAMES
        if "enc" in m
    }
    return {"params": params, "batch_stats": stats}


def test_roundtrip(tmp_path, rng):
    v = fake_variables(rng)
    ckpt.save_model(v, str(tmp_path), height=192, width=640)
    loaded = ckpt.load_model(v, str(tmp_path), height=192, width=640, verbose=False)
    for m in MODULE_NAMES:
        np.testing.assert_array_equal(
            loaded["params"][m]["conv"]["kernel"], v["params"][m]["conv"]["kernel"]
        )
    for m in v["batch_stats"]:
        np.testing.assert_array_equal(
            loaded["batch_stats"][m]["bn"]["mean"], v["batch_stats"][m]["bn"]["mean"]
        )


def test_missing_module_skipped(tmp_path, rng):
    v = fake_variables(rng)
    ckpt.save_model(v, str(tmp_path), height=192, width=640)
    import os

    os.remove(str(tmp_path / "pose_dec.msgpack"))
    v2 = fake_variables(np.random.RandomState(1))
    loaded = ckpt.load_model(v2, str(tmp_path), verbose=False)
    # pose_dec retains v2's values; others come from disk (v's values)
    np.testing.assert_array_equal(
        loaded["params"]["pose_dec"]["conv"]["kernel"], v2["params"]["pose_dec"]["conv"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["params"]["depth_enc"]["conv"]["kernel"], v["params"]["depth_enc"]["conv"]["kernel"]
    )


def test_partial_load_on_mismatch(tmp_path, rng):
    v = fake_variables(rng)
    ckpt.save_model(v, str(tmp_path), height=192, width=640)
    # target with an extra leaf and one shape change
    v2 = fake_variables(np.random.RandomState(2))
    v2["params"]["depth_enc"]["extra"] = {"w": np.zeros((2, 2), np.float32)}
    loaded = ckpt.load_model(v2, str(tmp_path), verbose=False)
    np.testing.assert_array_equal(
        loaded["params"]["depth_enc"]["conv"]["kernel"], v["params"]["depth_enc"]["conv"]["kernel"]
    )
    assert "extra" in loaded["params"]["depth_enc"]


def test_torch_converter_produces_matching_structure(tmp_path):
    """Convert a randomly-initialized torch-style checkpoint for every module
    and check the resulting trees merge into the real model's variables with
    identical leaf shapes (full numeric parity is covered per-module in
    test_models.py and by released-checkpoint eval)."""
    torch = pytest.importorskip("torch")
    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.models.convert import convert_pose_decoder

    # pose decoder: tiny, fast to verify numerically end-to-end
    tdec = torch.nn.ModuleDict(
        {
            "squeeze": torch.nn.Conv2d(512, 256, 1),
            "pose0": torch.nn.Conv2d(256, 256, 3, 1, 1),
            "pose1": torch.nn.Conv2d(256, 256, 3, 1, 1),
            "pose2": torch.nn.Conv2d(256, 12, 1),
        }
    )
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    params, _ = convert_pose_decoder(sd)

    from dynamo_depth_tpu.models import PoseDecoder

    x = np.random.RandomState(0).rand(1, 2, 3, 512).astype(np.float32)
    aa, tr = PoseDecoder().apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        out = torch.relu(tdec["squeeze"](t))
        out = torch.relu(tdec["pose0"](out))
        out = torch.relu(tdec["pose1"](out))
        out = tdec["pose2"](out)
        out = 0.01 * out.mean(3).mean(2).view(-1, 2, 1, 6)
        gaa, gtr = out[..., :3].numpy()[:, :, 0], out[..., 3:].numpy()[:, :, 0]

    np.testing.assert_allclose(np.asarray(aa), gaa, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), gtr, atol=1e-5)
