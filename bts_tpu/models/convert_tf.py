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

Full TF-zoo ingestion (trained BTS checkpoints incl. the decoder —
bts_nyu_v2/bts_eigen_v2, tensorflow/README.md:89,198) is offered by
convert_full_tf: the reference decoder's slim scopes are auto-numbered
('Conv', 'Conv_1', ... in graph-build order, tensorflow/bts.py:70-80), so
tf_decoder_name_map reproduces slim's numbering by walking the decoder
build sequence (tensorflow/bts.py:237-345). The walk is validated by
100%-coverage assertions in BOTH directions at conversion time: every
model leaf must find a checkpoint variable of the right shape AND every
'model/' checkpoint variable must be consumed — a numbering error anywhere
desynchronizes the whole tail and fails loudly. Run the converted model
with flavor='tf' (models/bts.py) so the graph semantics (biases, theta
pi/6, atrous ELU, align-corners guidance downsample) match the weights.
See PARITY.md.
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


def tf_decoder_name_map(num_features: int):
    """flax decoder path-string -> TF variable-name suffix under 'decoder/'.

    Reproduces slim's auto-numbered scopes (Conv, Conv_1, ...; BatchNorm,
    BatchNorm_1, ...) by walking the TF graph build order
    (tensorflow/bts.py:237-345). slim.conv2d in the decoder arg scope keeps
    the default biases_initializer, so every conv has weights AND biases
    (tensorflow/bts.py:346-349,404-405 set only activation_fn).
    """
    counters = {"Conv": -1, "BatchNorm": -1}
    out = {}

    def _next(kind):
        counters[kind] += 1
        return kind if counters[kind] == 0 else f"{kind}_{counters[kind]}"

    def conv(flax_head):
        s = _next("Conv")
        out[f"{flax_head}/conv/kernel"] = f"{s}/weights"
        out[f"{flax_head}/conv/bias"] = f"{s}/biases"

    def bn(flax_head):
        s = _next("BatchNorm")
        for leaf, tf_leaf in _BN_LEAVES.items():
            out[f"{flax_head}/bn/{leaf}"] = f"{s}/{tf_leaf}"

    def atrous(name, bn_first=True):
        # tensorflow/bts.py:84-100: [BN] -> relu -> 1x1 conv -> BN -> relu
        # -> 3x3 rate conv.
        if bn_first:
            bn(f"{name}/first_bn")
        conv(f"{name}/conv1")
        bn(f"{name}/bn2")
        conv(f"{name}/conv2")

    def reduc(name, start, is_final=False):
        # tensorflow/bts.py:145-166 — the same channel-halving loop as
        # models/decoder.py::Reduction1x1.
        n, i = start, 0
        while n >= 4:
            if n < 8:
                conv(f"{name}/final" if is_final else f"{name}/plane_params")
                break
            conv(f"{name}/inter_{i}")
            n //= 2
            i += 1

    nf = num_features
    conv("upconv5")
    bn("bn5")
    conv("conv5")
    conv("upconv4")
    bn("bn4")
    conv("conv4")
    bn("bn4_2")
    atrous("daspp_3", bn_first=False)
    for rate in (6, 12, 18, 24):
        atrous(f"daspp_{rate}")
    conv("daspp_conv")
    reduc("reduc8x8", nf // 4)
    conv("upconv3")
    bn("bn3")
    conv("conv3")
    reduc("reduc4x4", nf // 8)
    conv("upconv2")
    bn("bn2")
    conv("conv2")
    reduc("reduc2x2", nf // 16)
    conv("upconv1")
    # TF passes the CURRENT width (nf//16) into the final reduction
    # (tensorflow/bts.py:316), one halving stage more than PT's nf//32.
    reduc("reduc1x1", nf // 16, is_final=True)
    conv("conv1")
    conv("get_depth")
    return out


def is_full_tf_bts_checkpoint(path: str) -> bool:
    """True when the TF checkpoint at `path` carries decoder variables
    (a trained BTS model, not just an ImageNet encoder warm start)."""
    try:
        import tensorflow as tf
    except ImportError:
        return False
    try:
        reader = tf.train.load_checkpoint(path)
    except Exception:
        return False
    return any(
        "decoder/Conv/" in name
        for name in reader.get_variable_to_shape_map()
    )


def _decoder_root(tf_names) -> str:
    suffix = "decoder/Conv/weights"
    roots = [n[: -len(suffix)] for n in tf_names if n.endswith(suffix)]
    if not roots:
        raise KeyError(
            "checkpoint has no 'decoder/Conv/weights' variable — not a "
            "full reference-style TF BTS checkpoint"
        )
    return sorted(roots, key=len)[0] + "decoder/"


def convert_full_tf(
    tf_vars: Dict[str, np.ndarray],
    params,
    batch_stats,
    encoder_name: str,
    num_features: int,
) -> Tuple[Any, Any, Dict[str, List[str]]]:
    """Convert a complete reference TF BTS checkpoint (encoder + decoder).

    Unlike the name-intersection warm start, this is STRICT both ways:
    every model leaf must load from the checkpoint and every 'model/'
    checkpoint variable must be consumed (non-model bookkeeping variables —
    global_step, Adam slots, EMA copies — are reported, not errors). The
    target model must be built with flavor='tf' so the decoder declares
    the conv bias leaves this mapping fills.
    """
    enc_root = _find_root(tf_vars.keys(), encoder_name)
    dec_root = _decoder_root(tf_vars.keys())
    dec_map = tf_decoder_name_map(num_features)

    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    consumed = set()
    missing = []

    def _tf_name(path):
        joined = "/".join(path)
        if path[0] == "encoder":
            return enc_root + _tf_encoder_name(path[1:-2], path[-1])
        if path[0] == "decoder":
            suffix = dec_map.get(joined[len("decoder/") :])
            if suffix is None:
                raise KeyError(f"no TF mapping for decoder path {joined}")
            return dec_root + suffix
        raise KeyError(f"unknown scope for {joined}")

    def fill(flat):
        out = {}
        for path, leaf in flat.items():
            name = _tf_name(path)
            if name not in tf_vars:
                missing.append(f"{'/'.join(path)} -> {name}")
                out[path] = leaf
                continue
            got = tf_vars[name]
            want_shape = tuple(np.shape(leaf))
            if tuple(got.shape) != want_shape:
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint {got.shape} vs "
                    f"model {want_shape} (at {'/'.join(path)})"
                )
            out[path] = got.astype(np.asarray(leaf).dtype)
            consumed.add(name)
        return out

    new_p = _unflatten(fill(flat_p))
    new_s = _unflatten(fill(flat_s))
    if missing:
        raise KeyError(
            f"{len(missing)} model leaves not found in the TF checkpoint "
            f"(was the model built with flavor='tf'?): {missing[:5]}..."
            if len(missing) > 5
            else f"model leaves not found in the TF checkpoint: {missing}"
        )
    # Every model/* variable must be consumed — slim numbering errors
    # desynchronize the tail and show up here. Optimizer slot variables
    # live UNDER a model variable's name ('<var>/Adam', '<var>/Adam_1',
    # tf.train.AdamOptimizer slots) — those are bookkeeping, not leaves.
    leftover_model = [
        n
        for n in sorted(tf_vars)
        if n not in consumed
        and (n.startswith(enc_root) or n.startswith(dec_root))
        and n.rsplit("/", 1)[0] not in consumed
    ]
    if leftover_model:
        raise KeyError(
            f"{len(leftover_model)} model variables in the checkpoint have "
            f"no model leaf: {leftover_model[:5]}"
        )
    report = {
        "loaded": sorted(consumed),
        "skipped_non_model": [n for n in sorted(tf_vars) if n not in consumed],
    }
    return new_p, new_s, report


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
