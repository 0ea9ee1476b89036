"""Torch checkpoint -> flax variables conversion.

Converts the reference's released per-module ``.pth`` checkpoints
(``networks/model.py:163-222`` save format) and the pretrained backbone zoos
(torchvision ResNet, Lite-Mono-8M imagenet) into this framework's variable
trees, so the eval CLIs reproduce the published tables without retraining
(BASELINE.md north star).

Conventions:
- torch conv (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
- torch linear (O, I)       -> flax kernel (I, O)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var
  (batch_stats collection); LayerNorm weight/bias -> scale/bias.

Requires torch only when actually invoked (kept out of the hot path).
"""

from __future__ import annotations

import os.path as osp
import re
from typing import Dict, Tuple

import numpy as np

from dynamo_depth_tpu.models.model import MODULE_NAMES


# --------------------------------------------------------------------------
# low-level tensor converters


def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _dense_w(t):
    return np.transpose(np.asarray(t), (1, 0))


def _arr(t):
    return np.asarray(t)


class _TreeBuilder:
    """Accumulates (path, leaf) pairs into nested params/batch_stats dicts."""

    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _put(self, root, path, value):
        d = root
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    def conv(self, path, sd, key, bias=True):
        self._put(self.params, path + ("kernel",), _conv_w(sd[key + ".weight"]))
        if bias and key + ".bias" in sd:
            self._put(self.params, path + ("bias",), _arr(sd[key + ".bias"]))

    def dense(self, path, sd, key):
        self._put(self.params, path + ("kernel",), _dense_w(sd[key + ".weight"]))
        if key + ".bias" in sd:
            self._put(self.params, path + ("bias",), _arr(sd[key + ".bias"]))

    def bn(self, path, sd, key):
        self._put(self.params, path + ("scale",), _arr(sd[key + ".weight"]))
        self._put(self.params, path + ("bias",), _arr(sd[key + ".bias"]))
        self._put(self.stats, path + ("mean",), _arr(sd[key + ".running_mean"]))
        self._put(self.stats, path + ("var",), _arr(sd[key + ".running_var"]))

    def ln(self, path, sd, key):
        self._put(self.params, path + ("scale",), _arr(sd[key + ".weight"]))
        self._put(self.params, path + ("bias",), _arr(sd[key + ".bias"]))

    def raw(self, path, value):
        self._put(self.params, path, _arr(value))


# --------------------------------------------------------------------------
# per-module converters (torch state_dict -> (params, batch_stats))


def convert_resnet_encoder(sd: Dict, num_layers: int = 18) -> Tuple[Dict, Dict]:
    """torchvision-style ResNet trunk under the 'encoder.' prefix
    (resnet_encoder.py:100-135)."""
    b = _TreeBuilder()
    b.conv(("conv1",), sd, "encoder.conv1", bias=False)
    b.bn(("bn1",), sd, "encoder.bn1")

    block_keys = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            for m in [re.match(r"encoder\.layer(\d+)\.(\d+)\.", k)]
            if m
        }
    )
    for layer, blk in block_keys:
        prefix = f"encoder.layer{layer}.{blk}"
        path = (f"layer{layer}_{blk}",)
        for conv_i in (1, 2, 3):
            if f"{prefix}.conv{conv_i}.weight" in sd:
                b.conv(path + (f"conv{conv_i}",), sd, f"{prefix}.conv{conv_i}", bias=False)
                b.bn(path + (f"bn{conv_i}",), sd, f"{prefix}.bn{conv_i}")
        if f"{prefix}.downsample.0.weight" in sd:
            b.conv(path + ("ds_conv",), sd, f"{prefix}.downsample.0", bias=False)
            b.bn(path + ("ds_bn",), sd, f"{prefix}.downsample.1")
    return b.params, b.stats


def convert_depth_decoder(sd: Dict) -> Tuple[Dict, Dict]:
    """Monodepth2 DepthDecoder (depth_decoder.py:10-55): named children
    upconv_i_j / dispconv_s, each a ConvBlock/Conv3x3 with nested .conv."""
    b = _TreeBuilder()
    for k in sd:
        m = re.match(r"(upconv_\d+_\d+)\.conv\.conv\.weight", k)
        if m:
            b.conv((m.group(1), "conv", "conv"), sd, k[: -len(".weight")])
        m = re.match(r"(dispconv_\d+)\.conv\.weight", k)
        if m:
            b.conv((m.group(1), "conv"), sd, k[: -len(".weight")])
    return b.params, b.stats


def convert_lite_depth_decoder(sd: Dict, scales=(0, 1, 2)) -> Tuple[Dict, Dict]:
    """LiteDepthDecoder (depth_decoder.py:58-115): modules live in an ordered
    ModuleList named 'decoder' — index order is upconv(2,0), (2,1), (1,0),
    (1,1), (0,0), (0,1), then dispconv per scale."""
    order = []
    for i in range(2, -1, -1):
        order.append(("upconv", i, 0))
        order.append(("upconv", i, 1))
    for s in scales:
        order.append(("dispconv", s))

    b = _TreeBuilder()
    for idx, entry in enumerate(order):
        if entry[0] == "upconv":
            _, i, j = entry
            b.conv((f"upconv_{i}_{j}", "conv", "conv"), sd, f"decoder.{idx}.conv.conv")
        else:
            _, s = entry
            b.conv((f"dispconv_{s}", "conv"), sd, f"decoder.{idx}.conv")
    return b.params, b.stats


def convert_pose_decoder(sd: Dict) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    b.conv(("squeeze",), sd, "squeeze")
    for i in range(3):
        b.conv((f"pose_{i}",), sd, f"pose{i}")
    return b.params, b.stats


def convert_motion_decoder(sd: Dict) -> Tuple[Dict, Dict]:
    b = _TreeBuilder()
    b.conv(("residual_translation",), sd, "_residual_translation")
    levels = sorted(
        {int(m.group(1)) for k in sd for m in [re.match(r"refine_motion_conv(\d+)\.", k)] if m}
    )
    for ii in levels:
        b.conv((f"refine_conv{ii}_0",), sd, f"refine_motion_conv{ii}.0")
        b.conv((f"refine_conv{ii}_1",), sd, f"refine_motion_conv{ii}.1")
        b.conv((f"refine_redu{ii}",), sd, f"refine_motion_redu{ii}")
    return b.params, b.stats


def convert_litemono(sd: Dict, depths=(4, 4, 10)) -> Tuple[Dict, Dict]:
    """LiteMono encoder (depth_encoder.py:305-431)."""
    b = _TreeBuilder()
    # stem1: downsample_layers.0.{0,1,2} (Conv with bn_gelu)
    for i in range(3):
        b.conv((f"stem1_{i}", "conv"), sd, f"downsample_layers.0.{i}.conv", bias=False)
        b.bn((f"stem1_{i}", "bn"), sd, f"downsample_layers.0.{i}.bn_gelu.bn")
    b.conv(("stem2",), sd, "stem2.0.conv", bias=False)
    for i in (1, 2):
        b.conv((f"downsample{i}",), sd, f"downsample_layers.{i}.0.conv", bias=False)

    for i in range(3):
        for j in range(depths[i]):
            tp = f"stages.{i}.{j}"
            path = (f"stage{i}_block{j}",)
            if j == depths[i] - 1:  # LGFI
                if f"{tp}.pos_embd.token_projection.weight" in sd:
                    b.conv(path + ("pos_embd", "token_projection"), sd,
                           f"{tp}.pos_embd.token_projection")
                b.ln(path + ("norm_xca",), sd, f"{tp}.norm_xca")
                b.raw(path + ("gamma_xca",), sd[f"{tp}.gamma_xca"])
                b.raw(path + ("xca", "temperature"), sd[f"{tp}.xca.temperature"])
                b.dense(path + ("xca", "qkv"), sd, f"{tp}.xca.qkv")
                b.dense(path + ("xca", "proj"), sd, f"{tp}.xca.proj")
                b.ln(path + ("norm",), sd, f"{tp}.norm")
                b.dense(path + ("pwconv1",), sd, f"{tp}.pwconv1")
                b.dense(path + ("pwconv2",), sd, f"{tp}.pwconv2")
                b.raw(path + ("gamma",), sd[f"{tp}.gamma"])
            else:  # DilatedConv (its `.norm` LayerNorm is unused in forward)
                b.conv(path + ("ddwconv",), sd, f"{tp}.ddwconv.conv", bias=False)
                b.bn(path + ("bn1",), sd, f"{tp}.bn1")
                b.dense(path + ("pwconv1",), sd, f"{tp}.pwconv1")
                b.dense(path + ("pwconv2",), sd, f"{tp}.pwconv2")
                b.raw(path + ("gamma",), sd[f"{tp}.gamma"])
    return b.params, b.stats


_MODULE_CONVERTERS = {
    "pose_enc": convert_resnet_encoder,
    "motion_enc": convert_resnet_encoder,
    "pose_dec": convert_pose_decoder,
    "motion_dec": convert_motion_decoder,
    "motion_mask": convert_motion_decoder,
}


def convert_module(module_name: str, sd: Dict, cfg) -> Tuple[Dict, Dict]:
    if module_name == "depth_enc":
        if cfg.depth_model == "litemono":
            return convert_litemono(sd)
        return convert_resnet_encoder(sd, cfg.encoder_num_layers)
    if module_name == "depth_dec":
        if cfg.depth_model == "litemono":
            return convert_lite_depth_decoder(sd, tuple(cfg.scales))
        return convert_depth_decoder(sd)
    return _MODULE_CONVERTERS[module_name](sd)


def widen_conv1(conv1_kernel: np.ndarray, num_input_images: int,
                rng: np.random.RandomState) -> np.ndarray:
    """Replicate a 3-channel pretrained conv1 across stacked frames, scaled by
    1/num_images, with kaiming-normal filler (resnet_encoder.py:85-92)."""
    kh, kw, _, out = conv1_kernel.shape
    fan_out = kh * kw * out
    w = rng.randn(kh, kw, 3 * num_input_images, out).astype(np.float32) * np.sqrt(2.0 / fan_out)
    for i in range(num_input_images):
        w[:, :, 3 * i : 3 * i + 3, :] = conv1_kernel / num_input_images
    return w


def convert_torch_checkpoint(folder: str, variables: Dict, cfg, verbose=True) -> Dict:
    """Load every <module>.pth in ``folder`` (reference save format) and merge
    into a variables tree."""
    import torch

    new_vars = {
        "params": dict(variables.get("params", {})),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    for module in MODULE_NAMES:
        path = osp.join(folder, f"{module}.pth")
        if not osp.exists(path):
            if verbose:
                print(f"|- Converting {module}... SKIPPED (no {path})")
            continue
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v for k, v in sd.items() if k not in ("height", "width")}
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params, stats = convert_module(module, sd, cfg)
        if verbose:
            print(f"|- Converting {module}... OK")
        new_vars["params"][module] = params
        if stats:
            new_vars["batch_stats"][module] = stats
    if not new_vars["batch_stats"]:
        new_vars.pop("batch_stats")
    return new_vars


# --------------------------------------------------------------------------
# pretrained backbone initialization (weights_init='pretrained')

# Released checkpoint zoo (model.py:49-56): folder name -> google drive id.
MODEL_ZOO = {
    "ckpt/K_Dynamo-Depth_MD2": "1SLQcCQplfAtqeWUD4TQc42aGpevViTGX",
    "ckpt/K_Dynamo-Depth": "1b1kwxqUquFbSMU9WLAr6_pIbj1HxoWLJ",
    "ckpt/N_Dynamo-Depth_MD2": "1t0Z_2hD0raAi4vDK_VZFXIcwcTFx0elU",
    "ckpt/N_Dynamo-Depth": "1oqQVFyGxo_SxclpinrBlwGSE1gEfVAZY",
    "ckpt/W_Dynamo-Depth_MD2": None,  # Waymo license: request access (README)
    "ckpt/W_Dynamo-Depth": None,
}

# Imagenet backbone checkpoints the reference auto-downloads
# (resnet_encoder.py:46-49, depth_encoder.py:313).
BACKBONE_FILES = {
    "resnet18": "resnet18-f37072fd.pth",
    "resnet50": "resnet50-0676ba61.pth",
    "litemono": "lite-mono-8m-pretrain.pth",
}


def load_pretrained_backbones(variables, cfg, ckpt_dir="./ckpt", verbose=True,
                              seed=0):
    """Initialize encoders from downloaded imagenet checkpoints, replicating
    the reference's pretrained init:

    - depth encoder: torchvision resnet (monodepthv2) or Lite-Mono-8M imagenet
      weights with the final-norm keys dropped (depth_encoder.py:380-392);
    - pose (2-frame) and motion (3-frame) encoders: torchvision resnet with
      conv1 replicated across frames and scaled by 1/num_images
      (resnet_encoder.py:85-92).

    Missing files are skipped with a warning (zero-egress environments train
    from scratch); place the files listed in BACKBONE_FILES under ckpt_dir.
    """
    import torch

    new_vars = {
        "params": dict(variables.get("params", {})),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    rng = np.random.RandomState(seed)
    resnet_file = osp.join(ckpt_dir, BACKBONE_FILES[f"resnet{cfg.encoder_num_layers}"]) \
        if cfg.encoder_num_layers in (18, 50) else None

    resnet_sd = None
    if resnet_file and osp.exists(resnet_file):
        raw = torch.load(resnet_file, map_location="cpu", weights_only=False)
        resnet_sd = {f"encoder.{k}": v.numpy() for k, v in raw.items()
                     if not k.startswith("fc.")}
    elif verbose:
        print(f"|- pretrained resnet weights not found under {ckpt_dir} - "
              "encoders keep random init")

    def resnet_into(module_name, num_images):
        if resnet_sd is None:
            return
        params, stats = convert_resnet_encoder(resnet_sd, cfg.encoder_num_layers)
        if num_images > 1:
            params["conv1"]["kernel"] = widen_conv1(
                params["conv1"]["kernel"], num_images, rng
            )
        new_vars["params"][module_name] = params
        new_vars["batch_stats"][module_name] = stats
        if verbose:
            print(f"|- pretrained {module_name} ({num_images} frame(s)) loaded")

    resnet_into("pose_enc", 2)
    resnet_into("motion_enc", 3)

    if cfg.depth_model == "monodepthv2":
        resnet_into("depth_enc", 1)
    else:
        lm_file = osp.join(ckpt_dir, BACKBONE_FILES["litemono"])
        if osp.exists(lm_file):
            raw = torch.load(lm_file, map_location="cpu", weights_only=False)["model"]
            # the reference drops the classifier-head 'norm.*' keys
            # (depth_encoder.py:390); convert_litemono only reads known keys.
            sd = {k: v.numpy() for k, v in raw.items() if not k.startswith("norm")}
            params, stats = convert_litemono(sd)
            new_vars["params"]["depth_enc"] = params
            new_vars["batch_stats"]["depth_enc"] = stats
            if verbose:
                print("|- pretrained lite-mono-8m depth encoder loaded")
        elif verbose:
            print(f"|- {lm_file} not found - litemono depth encoder keeps random init")

    return new_vars


def widen_conv1_rgbd(conv1_kernel: np.ndarray, num_inp_channels: int,
                     rng: np.random.RandomState) -> np.ndarray:
    """RGBD variant of the conv1 widening (resnet_encoder.py:50-59): kaiming
    filler, each 4-channel slice's RGB part copies the pretrained kernel, all
    scaled by 1/(num_channels//4)."""
    assert num_inp_channels % 4 == 0
    kh, kw, _, out = conv1_kernel.shape
    fan_out = kh * kw * out
    w = rng.randn(kh, kw, num_inp_channels, out).astype(np.float32) * np.sqrt(2.0 / fan_out)
    groups = num_inp_channels // 4
    for l in range(groups):
        w[:, :, 4 * l : 4 * l + 3, :] = conv1_kernel
    return w / groups
