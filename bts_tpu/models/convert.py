"""Torch-checkpoint -> flax param conversion.

The reference's model zoo is PyTorch: checkpoints are torch.save dicts with a
DDP-prefixed state dict under 'model' (pytorch/bts_main.py:500-503), whose
encoder keys follow torchvision naming (pytorch/bts.py:273-301) and decoder
keys follow the reference decoder module names (pytorch/bts.py:148-194).

This module maps any such state dict onto our flax param/batch_stats trees so
zoo weights (and ImageNet warm-starts, the TF-side feature at
tensorflow/bts_main.py:95-123,228-232) can drive the TPU model without torch
at inference time.

Tensor layout: torch conv weight (O, I/g, kh, kw) -> flax kernel
(kh, kw, I/g, O); BN weight/bias/running_mean/running_var ->
scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


_LEAF_RENAME = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}

# Decoder convs wrapped in torch Sequential(conv, activation) -> index 0.
_SEQ_CONVS = {
    "conv5",
    "conv4",
    "conv3",
    "conv2",
    "conv1",
    "daspp_conv",
    "get_depth",
    "final",
}


def _torch_key(path: Tuple[str, ...], leaf_shape) -> str:
    """Translate a flax param path to the reference torch state_dict key.

    Every leaf lives under a Conv/BatchNorm shim whose inner module is named
    'conv'/'bn' (path[-2]); the torch module path is everything above it.
    """
    leaf = _LEAF_RENAME[path[-1]]
    parts = list(path[:-2])
    scope, rest = parts[0], parts[1:]

    if scope == "encoder":
        return "encoder.base_model." + _encoder_torch_key(rest, leaf, leaf_shape)
    if scope == "decoder":
        return "decoder." + _decoder_torch_key(rest, leaf, leaf_shape)
    raise KeyError(f"unknown scope for {path}")


def _encoder_torch_key(parts, leaf, leaf_shape) -> str:
    out = []
    for p in parts:
        m = re.fullmatch(r"layer(\d+)_(\d+)", p)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
        elif p == "downsample_conv":
            out.append("downsample.0")
        elif p == "downsample_bn":
            out.append("downsample.1")
        else:
            out.append(p)
    key = ".".join(out)
    return key + "." + leaf


def _decoder_torch_key(parts, leaf, leaf_shape) -> str:
    head = parts[0]
    # upconvN.conv -> 'upconvN.conv'
    if head.startswith("upconv"):
        return f"{head}.conv.{leaf}"
    if head.startswith("bn"):
        return f"{head}.{leaf}"
    if head.startswith("daspp_") and head != "daspp_conv":
        sub = parts[1]
        mapping = {
            "first_bn": "atrous_conv.first_bn",
            "conv1": "atrous_conv.aconv_sequence.1",
            "bn2": "atrous_conv.aconv_sequence.2",
            "conv2": "atrous_conv.aconv_sequence.4",
        }
        return f"{head}.{mapping[sub]}.{leaf}"
    if head.startswith("reduc"):
        sub = parts[1]
        if sub == "plane_params":
            return f"{head}.reduc.plane_params.{leaf}"
        if sub == "final":
            return f"{head}.reduc.final.0.{leaf}"
        # inter_k: torch name is inter_{in}_{out} from the kernel shape.
        cin, cout = int(leaf_shape[2]), int(leaf_shape[3])
        return f"{head}.reduc.inter_{cin}_{cout}.0.{leaf}"
    if head in _SEQ_CONVS:
        return f"{head}.0.{leaf}"
    raise KeyError(f"unknown decoder module: {parts}")


def _full_mobilenet_key(path: Tuple[str, ...], leaf_shape) -> str:
    """MobileNetV2 key mapping (torchvision features naming).

    path forms (wrapper levels 'conv'/'bn' are the Conv/BatchNorm shims):
      (encoder, features_0,  conv, conv, kernel)          -> 0.0.weight
      (encoder, features_0,  bn,   bn,   scale)           -> 0.1.weight
      (encoder, features_1,  depthwise, conv, conv, kernel) -> 1.conv.0.0.weight
      (encoder, features_2,  expand,    bn,   bn, scale)  -> 2.conv.0.1.weight
      (encoder, features_2,  project,   conv, kernel)     -> 2.conv.2.weight
      (encoder, features_2,  project_bn, bn,  scale)      -> 2.conv.3.weight
      (encoder, features_18, conv, conv, kernel)          -> 18.0.weight
    """
    leaf = _LEAF_RENAME[path[-1]]
    feat = path[1]
    idx = int(feat.split("_")[1])
    sub = path[2]
    if sub in ("conv", "bn"):  # stem / head ConvBNReLU6
        return f"encoder.base_model.{idx}.{0 if sub == 'conv' else 1}.{leaf}"
    has_expand = idx >= 2  # features_1 is the only expand_ratio==1 block
    wrapper = path[3]  # 'conv' or 'bn' shim under the named submodule
    if has_expand:
        table = {
            ("expand", "conv"): "conv.0.0",
            ("expand", "bn"): "conv.0.1",
            ("depthwise", "conv"): "conv.1.0",
            ("depthwise", "bn"): "conv.1.1",
            ("project", "conv"): "conv.2",
            ("project_bn", "bn"): "conv.3",
        }
    else:
        table = {
            ("depthwise", "conv"): "conv.0.0",
            ("depthwise", "bn"): "conv.0.1",
            ("project", "conv"): "conv.1",
            ("project_bn", "bn"): "conv.2",
        }
    return f"encoder.base_model.{idx}.{table[(sub, wrapper)]}.{leaf}"


def flax_path_to_torch_key(path: Tuple[str, ...], leaf_shape) -> str:
    if len(path) > 1 and path[1].startswith("features_"):
        return _full_mobilenet_key(path, leaf_shape)
    return _torch_key(path, leaf_shape)


def convert_state_dict(
    torch_state: Dict[str, np.ndarray],
    params_template,
    batch_stats_template,
    strict: bool = True,
):
    """Fill (params, batch_stats) templates from a torch state dict.

    Accepts 'module.'-prefixed (DDP) keys (pytorch/bts_main.py:352).
    Returns (params, batch_stats). With strict=True, raises on any missing
    key; otherwise missing leaves keep template values (partial warm-start,
    the tensor-name-intersection behavior of tensorflow/bts_main.py:95-123).
    """
    state = {}
    for k, v in torch_state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        state[k] = np.asarray(v)

    def fill(flat, is_stats):
        out = {}
        for path, leaf in flat.items():
            shape = np.shape(leaf)
            try:
                key = flax_path_to_torch_key(path, shape)
            except KeyError:
                if strict:
                    raise
                out[path] = leaf
                continue
            if key not in state:
                if strict:
                    raise KeyError(f"{key} (for {'/'.join(path)}) not in state dict")
                out[path] = leaf
                continue
            val = state[key]
            if path[-1] == "kernel":
                val = np.transpose(val, (2, 3, 1, 0))
            if val.shape != tuple(shape):
                raise ValueError(
                    f"shape mismatch for {key}: torch {val.shape} vs flax {shape}"
                )
            out[path] = val.astype(np.asarray(leaf).dtype)
        return out

    params = _unflatten(fill(_flatten(params_template), False))
    stats = _unflatten(fill(_flatten(batch_stats_template), True))
    return params, stats


def load_torch_checkpoint(path: str, return_meta: bool = False):
    """Read a reference checkpoint file (torch.save dict with 'model' key,
    pytorch/bts_main.py:500-503) or a bare state dict -> numpy dict.

    With return_meta=True also returns the non-weight training metadata the
    reference trainer saves alongside (pytorch/bts_main.py:500-503,532-539):
    {'global_step': int, 'best': {best_eval_measures_*, best_eval_steps}},
    each key present only when the checkpoint carries it (zoo releases and
    bare state dicts don't)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    tensors = {k: v.detach().numpy() for k, v in state.items()}
    if not return_meta:
        return tensors
    meta: Dict[str, Any] = {}
    if isinstance(ckpt, dict):
        if "global_step" in ckpt:
            meta["global_step"] = int(ckpt["global_step"])
        best_keys = (
            "best_eval_measures_lower_better",
            "best_eval_measures_higher_better",
            "best_eval_steps",
        )
        if all(k in ckpt for k in best_keys):
            meta["best"] = {
                k: np.asarray(
                    ckpt[k].cpu() if hasattr(ckpt[k], "cpu") else ckpt[k]
                )
                for k in best_keys
            }
    return tensors, meta
