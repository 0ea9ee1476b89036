"""Module-keyed checkpointing (reference ``networks/model.py:163-230``).

Per-module files under ``logs/<name>/models/<phase>_<epoch:02>/`` keeping the
reference's ``-l`` CLI contract: one file per module name (depth_enc,
depth_dec, pose_enc, pose_dec, motion_enc, motion_dec, motion_mask) with
encoder files stamped with height/width (verified and warned on mismatch at
load, model.py:170-171,192-197), partial-load fallback on key/shape mismatch
(model.py:198-208), and the optimizer state saved alongside as ``adam``
(Trainer.py:706-707).

Format: msgpack via flax.serialization (+ a small json sidecar for the
height/width stamp). A converter for released torch ``.pth`` checkpoints
lives in ``models/convert.py``.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util

from dynamo_depth_tpu.models.model import MODULE_NAMES
from dynamo_depth_tpu.utils.io import join_dir


def _module_tree(variables: Dict, module: str) -> Dict:
    out = {}
    for col in ("params", "batch_stats"):
        if col in variables and module in variables[col]:
            out[col] = variables[col][module]
    return out


def _atomic_write(path: str, data: bytes) -> None:
    """Write via tmp + rename so a crash mid-save never corrupts an existing
    checkpoint (the reference has no such protection)."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_model(variables: Dict, folder: str, *, height: int, width: int, verbose=False) -> None:
    """Write one <module>.msgpack per sub-module + meta.json (atomically)."""
    join_dir(folder)
    np_vars = jax.tree.map(np.asarray, variables)
    for module in MODULE_NAMES:
        tree = _module_tree(np_vars, module)
        _atomic_write(osp.join(folder, f"{module}.msgpack"), serialization.to_bytes(tree))
    _atomic_write(
        osp.join(folder, "meta.json"),
        json.dumps({"height": height, "width": width, "modules": MODULE_NAMES}).encode(),
    )
    if verbose:
        print(f"Saved model to {folder}")


def save_opt_state(opt_state: Any, folder: str) -> None:
    _atomic_write(
        osp.join(folder, "adam.msgpack"),
        serialization.to_bytes(jax.tree.map(np.asarray, opt_state)),
    )


def load_opt_state(template: Any, folder: str) -> Optional[Any]:
    path = osp.join(folder, "adam.msgpack")
    if not osp.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _partial_update(target: Dict, loaded: Dict, module: str, verbose: bool) -> Dict:
    """Merge loaded leaves into target where path+shape match
    (model.py:198-208 fallback semantics)."""
    tflat = traverse_util.flatten_dict(target)
    lflat = traverse_util.flatten_dict(loaded)
    matched, skipped = 0, 0
    for k, v in lflat.items():
        if k in tflat and tuple(np.shape(v)) == tuple(np.shape(tflat[k])):
            tflat[k] = v
            matched += 1
        else:
            skipped += 1
    if verbose and skipped:
        print(
            f"|- Loading {module} weights... PARTIAL :: {matched} matched, {skipped} skipped"
        )
    return traverse_util.unflatten_dict(tflat)


def load_model(variables: Dict, folder: str, *, height=None, width=None, verbose=True) -> Dict:
    """Load per-module files into a variables tree (missing modules are
    skipped with a warning, mismatched leaves partially loaded)."""
    meta_path = osp.join(folder, "meta.json")
    if osp.exists(meta_path) and height is not None:
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("height"), meta.get("width")) != (height, width) and verbose:
            print(
                f"|- === WARNING: opt ({height},{width}) != loaded "
                f"({meta.get('height')},{meta.get('width')})"
            )

    variables = jax.tree.map(np.asarray, variables)
    new_vars = {col: dict(variables.get(col, {})) for col in ("params", "batch_stats")}

    for module in MODULE_NAMES:
        path = osp.join(folder, f"{module}.msgpack")
        if not osp.exists(path):
            if verbose:
                print(f"|- Loading {module} weights... FAILED :: Path {path} not found")
            continue
        template = _module_tree(variables, module)
        with open(path, "rb") as f:
            data = f.read()
        try:
            loaded = serialization.from_bytes(template, data)
            if verbose:
                print(f"|- Loading {module} weights...")
            for col in loaded:
                new_vars[col][module] = loaded[col]
        except Exception:
            # structure mismatch: decode raw and merge what matches
            raw = serialization.msgpack_restore(data)
            if verbose:
                print(f"|- Loading {module} weights... FAILED :: mismatch - loading matched parameters.")
            for col in template:
                if col in raw:
                    new_vars[col][module] = _partial_update(template[col], raw[col], module, verbose)

    return {k: v for k, v in new_vars.items() if v}
