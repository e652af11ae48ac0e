"""TF-checkpoint -> flax param conversion (ImageNet warm start).

The reference's TF training warm-starts from an ImageNet-pretrained slim
DenseNet checkpoint by tensor-name intersection
(tensorflow/bts_main.py:95-123,228-232; args files point --pretrained_model
at models/densenet161_imagenet/model). The checkpoint variable names follow
the reference's own graph scopes (tensorflow/bts.py:408-430 build_densenet*
-> :177-235 densenet/dense_block/denseconv_block/transition_block), which are
deterministic — every variable_scope contains exactly one slim Conv and at
most one BatchNorm, so there is no slim auto-numbering ambiguity:

    model/encoder/densenet161/conv1/weights
    model/encoder/densenet161/BatchNorm/{gamma,beta,moving_mean,moving_variance}
    model/encoder/densenet161/dense_blockK/conv_blockJ/x1/{BatchNorm,Conv}/...
    model/encoder/densenet161/dense_blockK/conv_blockJ/x2/{BatchNorm,Conv}/...
    model/encoder/densenet161/transition_blockK/blk/{BatchNorm,Conv}/...
    model/encoder/densenet161/final_block/BatchNorm/...

This module reads such checkpoints (TF V1 or V2 format, via
tf.train.load_checkpoint — tensorflow is an optional dependency, only
imported here) and maps the encoder variables onto our flax param /
batch_stats trees. Name-intersection semantics match the reference: every
checkpoint variable either loads or is reported as unmatched (the reference
prints "<name> is in pretrained model but not in current training model");
model leaves without a checkpoint match keep their initialized values (the
decoder trains from scratch, as in the reference warm start).

Layouts: slim conv weights are HWIO — identical to flax, no transpose. BN:
gamma->scale, beta->bias, moving_mean->mean, moving_variance->var.

Scope note: full TF-zoo ingestion (trained BTS checkpoints incl. the
decoder) is NOT offered: the reference decoder's slim scopes are
auto-numbered ('Conv', 'Conv_1', ... in call order, tensorflow/bts.py:70-80,
237-345) and tf.contrib.slim cannot run on this host's TF2 to produce
ground-truth names, so any hand-reconstructed decoder mapping would be
unverifiable. The PT zoo (models/convert.py) covers every released
accuracy-parity checkpoint. See PARITY.md.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

from bts_tpu.models.convert import _flatten, _unflatten

# Encoders the TF reference can warm-start (tensorflow/bts.py:398-430).
_TF_ARCHS = ("densenet121", "densenet161")

_BN_LEAVES = {
    "scale": "gamma",
    "bias": "beta",
    "mean": "moving_mean",
    "var": "moving_variance",
}


def load_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read every tensor from a TF checkpoint (same enumeration as the
    reference's get_tensors_in_checkpoint_file, tensorflow/bts_main.py:95-107).
    """
    import tensorflow as tf  # optional dep, import-gated

    reader = tf.train.load_checkpoint(path)
    out = {}
    for name in sorted(reader.get_variable_to_shape_map()):
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def is_tf_checkpoint(path: str) -> bool:
    """Cheap format sniff: TF checkpoints are '<prefix>.index' +
    '<prefix>.data-*' pairs (or a directory with a 'checkpoint' file)."""
    import os

    return os.path.isfile(path + ".index") or os.path.isfile(
        os.path.join(path, "checkpoint")
    )


def tf_latest_checkpoint(path: str):
    try:
        import tensorflow as tf
    except ImportError:
        return None
    return tf.train.latest_checkpoint(path)


def _tf_encoder_name(parts: Tuple[str, ...], leaf: str) -> str:
    """flax encoder path (below 'encoder/') -> reference TF variable name
    (below the '<arch>/' scope). Raises KeyError for paths with no TF
    counterpart (e.g. resnet/mobilenet encoders, decoder params)."""
    head = parts[0]
    if head == "conv0":  # conv0/conv/kernel
        return "conv1/weights"
    if head == "norm0":  # stem BN: bare slim.batch_norm scope
        return f"BatchNorm/{_BN_LEAVES[leaf]}"
    if head == "norm5":
        return f"final_block/BatchNorm/{_BN_LEAVES[leaf]}"
    m = re.fullmatch(r"denseblock(\d+)", head)
    if m:
        j = re.fullmatch(r"denselayer(\d+)", parts[1]).group(1)
        sub = parts[2]  # norm1 | conv1 | norm2 | conv2
        x = "x1" if sub.endswith("1") else "x2"
        if sub.startswith("norm"):
            return (
                f"dense_block{m.group(1)}/conv_block{j}/{x}/BatchNorm/"
                f"{_BN_LEAVES[leaf]}"
            )
        return f"dense_block{m.group(1)}/conv_block{j}/{x}/Conv/weights"
    m = re.fullmatch(r"transition(\d+)", head)
    if m:
        if parts[1] == "norm":
            return f"transition_block{m.group(1)}/blk/BatchNorm/{_BN_LEAVES[leaf]}"
        return f"transition_block{m.group(1)}/blk/Conv/weights"
    raise KeyError(f"no TF name for encoder path {parts}")


def _find_root(tf_names, encoder_name: str) -> str:
    """Locate the scope prefix above '<arch>/conv1/weights'. The reference
    graph roots at 'model/encoder/<arch>/' (tensorflow/bts.py:421-430); we
    also accept re-exported checkpoints with shallower roots."""
    arch = encoder_name.replace("_bts", "")
    if arch not in _TF_ARCHS:
        raise ValueError(
            f"TF warm start supports {_TF_ARCHS} (tensorflow/bts.py:398-430); "
            f"got encoder '{encoder_name}'"
        )
    suffix = f"{arch}/conv1/weights"
    roots = [n[: -len(suffix)] for n in tf_names if n.endswith(suffix)]
    if not roots:
        raise KeyError(
            f"checkpoint has no '{suffix}' variable — not a reference-style "
            f"{arch} checkpoint"
        )
    return sorted(roots, key=len)[0] + arch + "/"


def warm_start_from_tf(
    tf_vars: Dict[str, np.ndarray],
    params,
    batch_stats,
    encoder_name: str,
) -> Tuple[Any, Any, Dict[str, List[str]]]:
    """Name-intersection warm start: load every TF encoder variable whose
    name maps onto our tree; leave everything else initialized.

    Returns (params, batch_stats, report) where report['loaded'] /
    report['unmatched_checkpoint'] / report['unmatched_model'] mirror the
    reference's console accounting (tensorflow/bts_main.py:110-123).
    """
    root = _find_root(tf_vars.keys(), encoder_name)

    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    loaded, unmatched_model = [], []
    consumed = set()

    def _try(flat, path):
        if path[0] != "encoder":
            unmatched_model.append("/".join(path))
            return
        # Drop the Conv/BatchNorm shim level ('conv'/'bn', path[-2]).
        try:
            name = root + _tf_encoder_name(path[1:-2], path[-1])
        except (KeyError, AttributeError):
            unmatched_model.append("/".join(path))
            return
        if name not in tf_vars:
            unmatched_model.append("/".join(path))
            return
        want = flat[path]
        got = tf_vars[name]
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(
                f"shape mismatch for {name}: checkpoint {got.shape} vs "
                f"model {want.shape}"
            )
        flat[path] = got.astype(np.asarray(want).dtype)
        consumed.add(name)
        loaded.append(name)

    for path in list(flat_p):
        _try(flat_p, path)
    for path in list(flat_s):
        _try(flat_s, path)

    unmatched_ckpt = [n for n in sorted(tf_vars) if n not in consumed]
    report = {
        "loaded": loaded,
        "unmatched_checkpoint": unmatched_ckpt,
        "unmatched_model": unmatched_model,
    }
    return _unflatten(flat_p), _unflatten(flat_s), report
