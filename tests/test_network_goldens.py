"""Full-forward numeric goldens: reference networks executed as goldens.

Round-1 VERDICT item 1: the converter was only *structurally* tested for
LiteMono, MotionDecoder, and both depth decoders. Here we load the reference
modules directly by path (the ``test_reference_parity.py`` pattern — the
reference code is *executed*, never copied), randomize their weights, round
the state_dicts through ``models/convert.py``, and require the flax forward
to match the torch forward numerically:

- ``depth_encoder.py`` (LiteMono) needs only a tiny ``timm`` DropPath stub
  (identity in eval mode);
- ``motion_decoder.py`` is torch-only;
- ``depth_decoder.py`` uses ``from .layers import ...`` + timm
  ``trunc_normal_``, so it is loaded inside a synthetic ``refnets`` package;
- a composite test wires all converted modules through the whole
  ``DynamoModel.forward`` and compares the full output dict against the
  reference ``model.py:58-149`` wiring expressed in torch.
"""

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not osp.isdir(osp.join(REF, "networks")), reason="reference checkout not mounted"
)

import torch
import torch.nn as tnn


def _install_timm_stub():
    """Minimal timm surface the reference networks import: DropPath (identity
    in eval; we only run eval-mode goldens) and trunc_normal_ (init-time
    only — values are irrelevant because weights are randomized afterwards).
    """
    if "timm.models.layers" in sys.modules:
        return

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.empty(shape, dtype=x.dtype).bernoulli_(keep)
            return x / keep * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def _load_ref(name):
    """Load /root/reference/networks/<name>.py as refnets.<name> so its
    relative imports (from .layers import ...) resolve."""
    _install_timm_stub()
    if "refnets" not in sys.modules:
        pkg = types.ModuleType("refnets")
        pkg.__path__ = [osp.join(REF, "networks")]
        sys.modules["refnets"] = pkg
    full = f"refnets.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, osp.join(REF, "networks", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(module, rng, scale=0.05):
    """Fill every param/buffer with random values so goldens exercise real
    weights (including BN running stats), not init constants."""
    gen = torch.Generator().manual_seed(int(rng.randint(0, 2**31)))
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * scale)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=gen) + 0.5)
        # keep BN scale / LN scale / XCA temperature positive-ish
        for name, p in module.named_parameters():
            if name.endswith("temperature"):
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)
            elif ("bn" in name or "norm" in name) and name.endswith("weight") and p.ndim == 1:
                p.copy_(torch.rand(p.shape, generator=gen) + 0.5)


def _np_sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


def _nchw(x):
    return torch.tensor(np.moveaxis(np.asarray(x), -1, 1))


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------------------
# LiteMono encoder


def test_litemono_full_forward_golden(rng):
    ref_enc_mod = _load_ref("depth_encoder")
    tenc = ref_enc_mod.LiteMono(model="lite-mono-8m", drop_path_rate=0.4,
                                pretrained=False).eval()
    _randomize(tenc, rng)

    from dynamo_depth_tpu.models import LiteMono
    from dynamo_depth_tpu.models.convert import convert_litemono

    params, stats = convert_litemono(_np_sd(tenc))

    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        golds = tenc(_nchw(x))

    ours = LiteMono().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )

    assert len(ours) == len(golds) == 3
    for i, (f, g) in enumerate(zip(ours, golds)):
        np.testing.assert_allclose(
            np.asarray(f), _nhwc(g), atol=1e-4, rtol=1e-4,
            err_msg=f"LiteMono feature {i}",
        )


# ---------------------------------------------------------------------------
# Motion decoder (both out_dims)


@pytest.mark.parametrize("out_dim", [3, 1])
def test_motion_decoder_full_forward_golden(rng, out_dim):
    ref_mod = _load_ref("motion_decoder")
    num_ch_enc = np.array([64, 64, 128, 256, 512])
    tdec = ref_mod.MotionDecoder(
        num_inp_feat=num_ch_enc, scales=[0, 1, 2], num_input_images=3,
        inp_disp=False, out_dim=out_dim,
    ).eval()
    _randomize(tdec, rng)

    from dynamo_depth_tpu.models import MotionDecoder
    from dynamo_depth_tpu.models.convert import convert_motion_decoder

    params, _ = convert_motion_decoder(_np_sd(tdec))

    B, H, W = 2, 32, 48
    pyramid_np = [rng.rand(B, H, W, 9).astype(np.float32)] + [
        rng.rand(B, H // 2 ** (i + 1), W // 2 ** (i + 1), int(c)).astype(np.float32)
        for i, c in enumerate(num_ch_enc)
    ]
    ego = rng.randn(B, 6).astype(np.float32) * 0.05

    with torch.no_grad():
        tego = torch.tensor(ego)[:, :, None, None]  # (B, 6, 1, 1)
        gold = tdec([_nchw(p) for p in pyramid_np], tego)

    dec = MotionDecoder(num_ch_enc=tuple(num_ch_enc), scales=(0, 1, 2), out_dim=out_dim)
    ours = dec.apply({"params": params}, [jnp.asarray(p) for p in pyramid_np],
                     jnp.asarray(ego))

    names = ("complete_flow",) if out_dim == 3 else ("motion_prob", "motion_mask")
    for name in names:
        for s in (0, 1, 2):
            np.testing.assert_allclose(
                np.asarray(ours[(name, s)]), _nhwc(gold[(name, s)]),
                atol=1e-5, rtol=1e-4, err_msg=f"{name} scale {s}",
            )


# ---------------------------------------------------------------------------
# Depth decoders


def test_depth_decoder_full_forward_golden(rng):
    ref_mod = _load_ref("depth_decoder")
    num_ch_enc = np.array([64, 64, 128, 256, 512])
    tdec = ref_mod.DepthDecoder(num_ch_enc, scales=range(4)).eval()
    _randomize(tdec, rng)

    from dynamo_depth_tpu.models import DepthDecoder
    from dynamo_depth_tpu.models.convert import convert_depth_decoder

    params, _ = convert_depth_decoder(_np_sd(tdec))

    H, W = 64, 96  # full res; encoder features at 1/2 .. 1/32
    feats_np = [
        rng.rand(1, H // 2 ** (i + 1), W // 2 ** (i + 1), int(c)).astype(np.float32)
        for i, c in enumerate(num_ch_enc)
    ]
    with torch.no_grad():
        gold = tdec([_nchw(f) for f in feats_np])

    dec = DepthDecoder(num_ch_enc=tuple(num_ch_enc), scales=(0, 1, 2, 3))
    ours = dec.apply({"params": params}, [jnp.asarray(f) for f in feats_np])
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(ours[("disp", s)]), _nhwc(gold[("disp", s)]),
            atol=1e-5, rtol=1e-4, err_msg=f"disp scale {s}",
        )


def test_lite_depth_decoder_full_forward_golden(rng):
    ref_mod = _load_ref("depth_decoder")
    num_ch_enc = np.array([64, 128, 224])
    tdec = ref_mod.LiteDepthDecoder(num_ch_enc, scales=range(3)).eval()
    _randomize(tdec, rng)

    from dynamo_depth_tpu.models import LiteDepthDecoder
    from dynamo_depth_tpu.models.convert import convert_lite_depth_decoder

    params, _ = convert_lite_depth_decoder(_np_sd(tdec), (0, 1, 2))

    H, W = 64, 96  # full res; litemono features at 1/4, 1/8, 1/16
    feats_np = [
        rng.rand(1, H // 2 ** (i + 2), W // 2 ** (i + 2), int(c)).astype(np.float32)
        for i, c in enumerate(num_ch_enc)
    ]
    with torch.no_grad():
        gold = tdec([_nchw(f) for f in feats_np])

    dec = LiteDepthDecoder(num_ch_enc=tuple(num_ch_enc), scales=(0, 1, 2))
    ours = dec.apply({"params": params}, [jnp.asarray(f) for f in feats_np])
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(ours[("disp", s)]), _nhwc(gold[("disp", s)]),
            atol=1e-5, rtol=1e-4, err_msg=f"disp scale {s}",
        )


# ---------------------------------------------------------------------------
# Composite: whole converted DynamoModel.forward vs reference wiring


def _torch_resnet18(in_ch, rng):
    """torchvision-layout ResNet18 trunk golden with a widened conv1
    (mirrors resnet_multiimage_input, resnet_encoder.py:64-92; torchvision
    itself is absent in this image)."""
    from tests.test_models import _TorchResnet18

    m = _TorchResnet18()
    if in_ch != 3:
        m.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
    _randomize(m, rng)
    return m.eval()


def _torch_resnet_features(m, x):
    """Reference ResnetEncoder.forward (resnet_encoder.py:124-135)."""
    x = (x - 0.45) / 0.225
    feats = [m.relu(m.bn1(m.conv1(x)))]
    feats.append(m.layer1(m.maxpool(feats[-1])))
    feats.append(m.layer2(feats[-1]))
    feats.append(m.layer3(feats[-1]))
    feats.append(m.layer4(feats[-1]))
    return feats


def test_composite_converted_model_forward_golden(rng):
    """Build reference-format state_dicts for every module of a litemono
    model, convert them all, and compare the full DynamoModel.forward output
    dict against the reference model.py:58-149 wiring executed in torch."""
    ref_enc_mod = _load_ref("depth_encoder")
    ref_dec_mod = _load_ref("depth_decoder")
    ref_motion_mod = _load_ref("motion_decoder")
    ref_pose_mod = _load_ref("pose_decoder")
    ref_layers = _load_ref("layers")

    # --- torch modules with reference constructor args (model.py:20-35)
    t_depth_enc = ref_enc_mod.LiteMono(model="lite-mono-8m", drop_path_rate=0.4,
                                       pretrained=False).eval()
    t_depth_dec = ref_dec_mod.LiteDepthDecoder(np.array([64, 128, 224]),
                                               scales=range(3)).eval()
    t_pose_enc = _torch_resnet18(6, rng)
    t_pose_dec = ref_pose_mod.PoseDecoder(
        np.array([64, 64, 128, 256, 512]), num_input_features=1,
        num_frames_to_predict_for=2,
    ).eval()
    t_motion_enc = _torch_resnet18(9, rng)
    t_motion_dec = ref_motion_mod.MotionDecoder(
        np.array([64, 64, 128, 256, 512]), scales=[0, 1, 2],
        num_input_images=3, inp_disp=False, out_dim=3,
    ).eval()
    t_motion_mask = ref_motion_mod.MotionDecoder(
        np.array([64, 64, 128, 256, 512]), scales=[0, 1, 2],
        num_input_images=3, inp_disp=False, out_dim=1,
    ).eval()
    for m in (t_depth_enc, t_depth_dec, t_pose_dec, t_motion_dec, t_motion_mask):
        _randomize(m, rng)

    # --- convert every module
    from dynamo_depth_tpu.models import DynamoModel
    from dynamo_depth_tpu.models.convert import (
        convert_lite_depth_decoder,
        convert_litemono,
        convert_motion_decoder,
        convert_pose_decoder,
        convert_resnet_encoder,
    )

    params, stats = {}, {}
    params["depth_enc"], stats["depth_enc"] = convert_litemono(_np_sd(t_depth_enc))
    params["depth_dec"], _ = convert_lite_depth_decoder(_np_sd(t_depth_dec), (0, 1, 2))
    params["pose_enc"], stats["pose_enc"] = convert_resnet_encoder(
        {f"encoder.{k}": v for k, v in _np_sd(t_pose_enc).items()}
    )
    params["pose_dec"], _ = convert_pose_decoder(_np_sd(t_pose_dec))
    params["motion_enc"], stats["motion_enc"] = convert_resnet_encoder(
        {f"encoder.{k}": v for k, v in _np_sd(t_motion_enc).items()}
    )
    params["motion_dec"], _ = convert_motion_decoder(_np_sd(t_motion_dec))
    params["motion_mask"], _ = convert_motion_decoder(_np_sd(t_motion_mask))

    # --- inputs
    B, H, W = 1, 64, 96
    frames = (0, -1, 1)
    inputs_np = {("color_aug", f, 0): rng.rand(B, H, W, 3).astype(np.float32)
                 for f in frames}

    # --- torch golden: reference Model.forward wiring (model.py:58-149)
    gold = {}
    with torch.no_grad():
        t_in = {f: _nchw(inputs_np[("color_aug", f, 0)]) for f in frames}
        # predict_depths (model.py:69-74)
        for f in frames:
            disp = t_depth_dec(t_depth_enc(t_in[f]))
            for (name, s), v in disp.items():
                gold[(name, f, s)] = v
        # predict_poses (model.py:76-96): target last, invert=True
        pose_feats = {}
        for f in frames[1:]:
            pin = torch.cat([t_in[f], t_in[0]], 1)
            feats = _torch_resnet_features(t_pose_enc, pin)
            aa, tr = t_pose_dec([feats])
            aa, tr = aa[:, 0], tr[:, 0]
            gold[("axisangle", 0, f)] = aa
            gold[("translation", 0, f)] = tr
            gold[("cam_T_cam", 0, f)] = ref_layers.transformation_from_parameters(
                aa, tr, invert=True
            )
        # predict_motions (model.py:116-149)
        for g in sorted({abs(f) for f in frames[1:]}):
            min_ = torch.cat([t_in[-g], t_in[0], t_in[g]], 1)
            mfeats = _torch_resnet_features(t_motion_enc, min_)
            pyramid = [min_] + mfeats
            ego_t = (gold[("translation", 0, -g)] - gold[("translation", 0, g)]) / 2
            ego_aa = (gold[("axisangle", 0, -g)] - gold[("axisangle", 0, g)]) / 2
            ego = torch.cat((ego_t, ego_aa), -1).permute(0, 2, 1).unsqueeze(3)
            flow = t_motion_dec(pyramid, ego)
            for (name, s), v in flow.items():
                gold[(name, -g, s)] = -1 * v
                gold[(name, g, s)] = v
            prob = t_motion_mask(pyramid, ego)
            for (name, s), v in prob.items():
                gold[(name, -g, s)] = v
                gold[(name, g, s)] = v

    # --- ours
    model = DynamoModel(depth_model="litemono", scales=(0, 1, 2), frame_ids=frames)
    ours = model.apply(
        {"params": params, "batch_stats": stats},
        {k: jnp.asarray(v) for k, v in inputs_np.items()},
        train=False, bool_CmpFlow=True, bool_MotMask=True,
    )

    assert set(ours) == set(gold), sorted(set(ours) ^ set(gold))[:8]
    for key in sorted(gold, key=str):
        g = gold[key].numpy()
        o = np.asarray(ours[key])
        if key[0] in ("axisangle", "translation"):
            g = g.reshape(o.shape)  # reference keeps a (B, 1, 3) singleton axis
        elif g.ndim == 4 and key[0] != "cam_T_cam":
            g = np.moveaxis(g, 1, -1)
        # atol covers float accumulation noise on the ~1e2-magnitude
        # activations produced by the synthetic random weights (~1e-5 rel).
        np.testing.assert_allclose(o, g, atol=1e-3, rtol=1e-3, err_msg=str(key))
