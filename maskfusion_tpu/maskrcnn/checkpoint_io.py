"""Tiny checkpoint format for Mask R-CNN params.

The reference consumes a trained matterport .h5 (MaskRCNN.py.in:40-68);
our native artifact is a flat float16 .npz of the flax param tree — small
enough to version alongside the code so tests and `-method maskfusion`
runs load a TRAINED network instead of random weights (convert.py handles
the matterport import path)."""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten(params, prefix=""):
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def save_params(path: str, params, meta: dict | None = None):
    flat = _flatten(jax.device_get(params))
    arrays = {k: v.astype(np.float16) for k, v in flat.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_params(path: str):
    """Returns (nested f32 param dict, meta dict)."""
    data = np.load(path)
    meta = {}
    tree: dict = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k]).decode())
            continue
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[k].astype(np.float32)
    return tree, meta
