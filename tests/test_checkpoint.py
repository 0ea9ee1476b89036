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


def _litemono_torch_sd(rng):
    """Synthetic state dict with the reference LiteMono key names
    (depth_encoder.py:305-392) and lite-mono-8m shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def dense(name, o, i):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.05

    def ln(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1

    dims, depths, heads = [64, 128, 224], [4, 4, 10], [8, 8, 8]
    conv("downsample_layers.0.0.conv", 64, 3, 3)
    bn("downsample_layers.0.0.bn_gelu.bn", 64)
    conv("downsample_layers.0.1.conv", 64, 64, 3)
    bn("downsample_layers.0.1.bn_gelu.bn", 64)
    conv("downsample_layers.0.2.conv", 64, 64, 3)
    bn("downsample_layers.0.2.bn_gelu.bn", 64)
    conv("stem2.0.conv", 64, 67, 3)
    conv("downsample_layers.1.0.conv", 128, 131, 3)
    conv("downsample_layers.2.0.conv", 224, 259, 3)

    for i in range(3):
        d = dims[i]
        for j in range(depths[i]):
            tp = f"stages.{i}.{j}"
            if j == depths[i] - 1:  # LGFI
                if i == 0:
                    conv(f"{tp}.pos_embd.token_projection", d, 64, 1)
                    sd[f"{tp}.pos_embd.token_projection.bias"] = rng.randn(d).astype(np.float32) * 0.1
                ln(f"{tp}.norm_xca", d)
                sd[f"{tp}.gamma_xca"] = rng.rand(d).astype(np.float32) * 1e-3
                sd[f"{tp}.xca.temperature"] = rng.rand(heads[i], 1, 1).astype(np.float32) + 0.5
                dense(f"{tp}.xca.qkv", 3 * d, d)
                dense(f"{tp}.xca.proj", d, d)
                ln(f"{tp}.norm", d)
                dense(f"{tp}.pwconv1", 6 * d, d)
                dense(f"{tp}.pwconv2", d, 6 * d)
                sd[f"{tp}.gamma"] = rng.rand(d).astype(np.float32) * 1e-3
            else:
                sd[f"{tp}.ddwconv.conv.weight"] = rng.randn(d, 1, 3, 3).astype(np.float32) * 0.05
                bn(f"{tp}.bn1", d)
                ln(f"{tp}.norm", d)  # unused in forward, present in ckpt
                dense(f"{tp}.pwconv1", 6 * d, d)
                dense(f"{tp}.pwconv2", d, 6 * d)
                sd[f"{tp}.gamma"] = rng.rand(d).astype(np.float32) * 1e-3
    return sd


def test_litemono_converter_covers_all_params(rng):
    """convert_litemono output must drop into the flax LiteMono unchanged:
    every converted leaf replaces an init leaf of identical shape, and the
    model runs with the converted weights."""
    import jax
    from dynamo_depth_tpu.models import LiteMono
    from dynamo_depth_tpu.models.convert import convert_litemono
    from flax import traverse_util

    params, stats = convert_litemono(_litemono_torch_sd(rng))

    enc = LiteMono()
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    init = enc.init({"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}, x)

    init_flat = traverse_util.flatten_dict(dict(init["params"]))
    conv_flat = traverse_util.flatten_dict(params)
    assert set(conv_flat) == set(init_flat), (
        sorted(set(init_flat) - set(conv_flat))[:5],
        sorted(set(conv_flat) - set(init_flat))[:5],
    )
    for k in conv_flat:
        assert np.shape(conv_flat[k]) == np.shape(init_flat[k]), k

    init_stats = traverse_util.flatten_dict(dict(init["batch_stats"]))
    conv_stats = traverse_util.flatten_dict(stats)
    assert set(conv_stats) == set(init_stats)

    out = enc.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert all(np.isfinite(np.asarray(f)).all() for f in out)


def test_motion_and_lite_decoder_converters_cover_all_params(rng):
    import jax
    from dynamo_depth_tpu.models import LiteDepthDecoder, MotionDecoder
    from dynamo_depth_tpu.models.convert import (
        convert_lite_depth_decoder,
        convert_motion_decoder,
    )
    from flax import traverse_util

    # --- motion decoder: reference names refine_motion_conv{ii}.{0,1} etc.
    sd = {}
    num_inp = [512, 256, 128, 64, 64, 9]
    out_dim = 3
    sd["_residual_translation.weight"] = rng.randn(out_dim, 6, 1, 1).astype(np.float32)
    sd["_residual_translation.bias"] = rng.randn(out_dim).astype(np.float32)
    for ii, c in enumerate(num_inp):
        sd[f"refine_motion_conv{ii}.0.weight"] = rng.randn(c, c + out_dim, 3, 3).astype(np.float32) * 0.03
        sd[f"refine_motion_conv{ii}.0.bias"] = rng.randn(c).astype(np.float32) * 0.03
        sd[f"refine_motion_conv{ii}.1.weight"] = rng.randn(c, c, 3, 3).astype(np.float32) * 0.03
        sd[f"refine_motion_conv{ii}.1.bias"] = rng.randn(c).astype(np.float32) * 0.03
        sd[f"refine_motion_redu{ii}.weight"] = rng.randn(out_dim, 2 * c, 1, 1).astype(np.float32) * 0.03
        sd[f"refine_motion_redu{ii}.bias"] = rng.randn(out_dim).astype(np.float32) * 0.03
    params, _ = convert_motion_decoder(sd)

    dec = MotionDecoder(num_ch_enc=(64, 64, 128, 256, 512), scales=(0, 1, 2), out_dim=3)
    H, W = 32, 48
    pyramid = [jnp.zeros((1, H, W, 9))] + [
        jnp.zeros((1, H // 2 ** (i + 1), W // 2 ** (i + 1), c))
        for i, c in enumerate([64, 64, 128, 256, 512])
    ]
    init = dec.init(jax.random.PRNGKey(0), pyramid, jnp.zeros((1, 6)))
    assert set(traverse_util.flatten_dict(dict(init["params"]))) == set(
        traverse_util.flatten_dict(params)
    )
    out = dec.apply({"params": params}, pyramid, jnp.zeros((1, 6)))
    assert np.isfinite(np.asarray(out[("complete_flow", 0)])).all()

    # --- lite depth decoder: ordered ModuleList names decoder.N...
    enc_ch = (64, 128, 224)
    dec_ch = [c // 2 for c in enc_ch]
    sd = {}
    idx = 0
    for i in range(2, -1, -1):
        cin = enc_ch[-1] if i == 2 else dec_ch[i + 1]
        sd[f"decoder.{idx}.conv.conv.weight"] = rng.randn(dec_ch[i], cin, 3, 3).astype(np.float32) * 0.03
        sd[f"decoder.{idx}.conv.conv.bias"] = rng.randn(dec_ch[i]).astype(np.float32) * 0.03
        idx += 1
        cin2 = dec_ch[i] + (enc_ch[i - 1] if i > 0 else 0)
        sd[f"decoder.{idx}.conv.conv.weight"] = rng.randn(dec_ch[i], cin2, 3, 3).astype(np.float32) * 0.03
        sd[f"decoder.{idx}.conv.conv.bias"] = rng.randn(dec_ch[i]).astype(np.float32) * 0.03
        idx += 1
    for s in (0, 1, 2):
        sd[f"decoder.{idx}.conv.weight"] = rng.randn(1, dec_ch[s], 3, 3).astype(np.float32) * 0.03
        sd[f"decoder.{idx}.conv.bias"] = rng.randn(1).astype(np.float32) * 0.03
        idx += 1
    params, _ = convert_lite_depth_decoder(sd, (0, 1, 2))

    ldec = LiteDepthDecoder(num_ch_enc=enc_ch, scales=(0, 1, 2))
    feats = [jnp.zeros((1, 16 // 2 ** i, 24 // 2 ** i, c)) for i, c in enumerate(enc_ch)]
    init = ldec.init(jax.random.PRNGKey(0), feats)
    assert set(traverse_util.flatten_dict(dict(init["params"]))) == set(
        traverse_util.flatten_dict(params)
    )


def test_convert_torch_checkpoint_end_to_end(tmp_path, rng):
    """Full released-checkpoint conversion path: write per-module .pth files
    in the reference's save format (model.py:163-172, incl. height/width
    stamping on encoders), run convert_torch_checkpoint, and forward the
    model with the converted weights."""
    torch = pytest.importorskip("torch")
    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.models import DynamoModel
    from dynamo_depth_tpu.models.convert import convert_torch_checkpoint
    from flax import traverse_util

    cfg = DynamoConfig(dataset="kitti", height=64, width=96,
                       depth_model="litemono", scales=[0, 1, 2])

    def resnet_sd(num_images):
        m = torch.nn.Module()
        # build a torchvision-shaped trunk via the test golden class
        from tests.test_models import _TorchResnet18

        t = _TorchResnet18()
        return {f"encoder.{k}": v for k, v in t.state_dict().items()}

    def conv_sd(shapes):
        return {k: torch.randn(*s) * 0.02 for k, s in shapes.items()}

    # pose/motion decoders + litemono + lite decoder state dicts
    pose_sd = {
        "squeeze.weight": torch.randn(256, 512, 1, 1) * 0.02,
        "squeeze.bias": torch.randn(256) * 0.02,
        "pose0.weight": torch.randn(256, 256, 3, 3) * 0.02,
        "pose0.bias": torch.randn(256) * 0.02,
        "pose1.weight": torch.randn(256, 256, 3, 3) * 0.02,
        "pose1.bias": torch.randn(256) * 0.02,
        "pose2.weight": torch.randn(12, 256, 1, 1) * 0.02,
        "pose2.bias": torch.randn(12) * 0.02,
    }

    def motion_sd(out_dim):
        sd = {"_residual_translation.weight": torch.randn(out_dim, 6, 1, 1) * 0.02,
              "_residual_translation.bias": torch.randn(out_dim) * 0.02}
        for ii, c in enumerate([512, 256, 128, 64, 64, 9]):
            sd[f"refine_motion_conv{ii}.0.weight"] = torch.randn(c, c + out_dim, 3, 3) * 0.02
            sd[f"refine_motion_conv{ii}.0.bias"] = torch.randn(c) * 0.02
            sd[f"refine_motion_conv{ii}.1.weight"] = torch.randn(c, c, 3, 3) * 0.02
            sd[f"refine_motion_conv{ii}.1.bias"] = torch.randn(c) * 0.02
            sd[f"refine_motion_redu{ii}.weight"] = torch.randn(out_dim, 2 * c, 1, 1) * 0.02
            sd[f"refine_motion_redu{ii}.bias"] = torch.randn(out_dim) * 0.02
        return sd

    lm_sd = {k: torch.tensor(v) for k, v in _litemono_torch_sd(rng).items()}

    dec_ch = [32, 64, 112]
    enc_ch = [64, 128, 224]
    lite_dec_sd = {}
    idx = 0
    for i in range(2, -1, -1):
        cin = enc_ch[-1] if i == 2 else dec_ch[i + 1]
        lite_dec_sd[f"decoder.{idx}.conv.conv.weight"] = torch.randn(dec_ch[i], cin, 3, 3) * 0.02
        lite_dec_sd[f"decoder.{idx}.conv.conv.bias"] = torch.randn(dec_ch[i]) * 0.02
        idx += 1
        cin2 = dec_ch[i] + (enc_ch[i - 1] if i > 0 else 0)
        lite_dec_sd[f"decoder.{idx}.conv.conv.weight"] = torch.randn(dec_ch[i], cin2, 3, 3) * 0.02
        lite_dec_sd[f"decoder.{idx}.conv.conv.bias"] = torch.randn(dec_ch[i]) * 0.02
        idx += 1
    for s in (0, 1, 2):
        lite_dec_sd[f"decoder.{idx}.conv.weight"] = torch.randn(1, dec_ch[s], 3, 3) * 0.02
        lite_dec_sd[f"decoder.{idx}.conv.bias"] = torch.randn(1) * 0.02
        idx += 1

    module_sds = {
        "depth_enc": lm_sd,
        "depth_dec": lite_dec_sd,
        "pose_enc": resnet_sd(2),
        "pose_dec": pose_sd,
        "motion_enc": resnet_sd(3),
        "motion_dec": motion_sd(3),
        "motion_mask": motion_sd(1),
    }
    for name, sd in module_sds.items():
        if "enc" in name:  # the reference stamps height/width on encoders
            sd = dict(sd)
            sd["height"], sd["width"] = cfg.height, cfg.width
        torch.save(sd, str(tmp_path / f"{name}.pth"))

    # NOTE: pose/motion encoders in the real released ckpts have widened
    # conv1 (6/9 input channels). The torchvision-shaped 3-channel trunk here
    # exercises the conversion path; widen conv1 manually for shape match.
    model = DynamoModel(depth_model="litemono", scales=(0, 1, 2), frame_ids=(0, -1, 1))
    dummy = {("color_aug", f, 0): jnp.zeros((1, 64, 96, 3)) for f in (0, -1, 1)}
    init = model.init({"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
                      dummy, train=False)
    variables = {"params": dict(init["params"]), "batch_stats": dict(init["batch_stats"])}

    converted = convert_torch_checkpoint(str(tmp_path), variables, cfg, verbose=False)

    # conv1 of pose/motion encoders converted from 3ch; widen to match
    from dynamo_depth_tpu.models.convert import widen_conv1

    r = np.random.RandomState(0)
    for mod, n in (("pose_enc", 2), ("motion_enc", 3)):
        converted["params"][mod]["conv1"]["kernel"] = widen_conv1(
            converted["params"][mod]["conv1"]["kernel"], n, r
        )

    # every leaf must exactly match the model's init structure
    for col in ("params", "batch_stats"):
        a = traverse_util.flatten_dict(dict(init[col]))
        b = traverse_util.flatten_dict(converted[col])
        assert set(a) == set(b), (col, sorted(set(a) ^ set(b))[:5])
        for k in a:
            assert np.shape(a[k]) == np.shape(b[k]), (col, k)

    out = model.apply(converted, dummy, train=False,
                      bool_CmpFlow=True, bool_MotMask=True)
    assert np.isfinite(np.asarray(out[("disp", 0, 0)])).all()
    assert np.isfinite(np.asarray(out[("motion_mask", 1, 0)])).all()
