"""TF-checkpoint warm start (reference: tensorflow/bts_main.py:95-123,228-232).

The expected checkpoint variable names are enumerated here INDEPENDENTLY of
models/convert_tf.py (explicit loops mirroring the reference graph builder,
tensorflow/bts.py:177-235,414-419) so a transcription error in either the
module's path translation or this enumeration fails the test.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

from bts_tpu.models import convert_tf
from bts_tpu.models.bts import BTSModel, init_model
from bts_tpu.models.convert import _flatten

_BN = ("gamma", "beta", "moving_mean", "moving_variance")


def reference_tf_names(arch="densenet121"):
    """Every (name, shape) the reference graph creates for the densenet
    encoder, in the reference's own scopes (tensorflow/bts.py:204-233:
    conv1, bare stem BatchNorm, dense_blockK/conv_blockJ/{x1,x2},
    transition_blockK/blk, final_block)."""
    blocks, growth, init = (
        ((6, 12, 24, 16), 32, 64)
        if arch == "densenet121"
        else ((6, 12, 36, 24), 48, 96)
    )
    root = f"model/encoder/{arch}/"
    out = [(root + "conv1/weights", (7, 7, 3, init))]
    out += [(root + f"BatchNorm/{l}", (init,)) for l in _BN]
    c = init
    for k, num_layers in enumerate(blocks, start=1):
        for j in range(1, num_layers + 1):
            cb = root + f"dense_block{k}/conv_block{j}/"
            out += [(cb + f"x1/BatchNorm/{l}", (c,)) for l in _BN]
            out += [(cb + "x1/Conv/weights", (1, 1, c, 4 * growth))]
            out += [(cb + f"x2/BatchNorm/{l}", (4 * growth,)) for l in _BN]
            out += [(cb + "x2/Conv/weights", (3, 3, 4 * growth, growth))]
            c += growth
        if k < len(blocks):
            tb = root + f"transition_block{k}/blk/"
            out += [(tb + f"BatchNorm/{l}", (c,)) for l in _BN]
            out += [(tb + "Conv/weights", (1, 1, c, c // 2))]
            c //= 2
    out += [(root + f"final_block/BatchNorm/{l}", (c,)) for l in _BN]
    return out


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tfck")
    prefix = str(d / "model")
    rng = np.random.default_rng(7)
    names, tensors = [], []
    for name, shape in reference_tf_names():
        names.append(name)
        tensors.append(rng.normal(size=shape).astype(np.float32))
    # Non-model variables a real checkpoint carries: must be REPORTED, not
    # loaded (reference prints them, tensorflow/bts_main.py:119).
    names.append("global_step")
    tensors.append(np.int64(12345))
    tf.raw_ops.SaveV2(
        prefix=prefix,
        tensor_names=names,
        shape_and_slices=[""] * len(names),
        tensors=[tf.constant(t) for t in tensors],
    )
    return prefix, dict(zip(names, tensors))


def test_is_tf_checkpoint(synthetic_ckpt, tmp_path):
    prefix, _ = synthetic_ckpt
    assert convert_tf.is_tf_checkpoint(prefix)
    not_tf = tmp_path / "model.pth"
    not_tf.write_bytes(b"\x00")
    assert not convert_tf.is_tf_checkpoint(str(not_tf))


def test_tf_warm_start_full_encoder_coverage(synthetic_ckpt):
    prefix, truth = synthetic_ckpt
    model = BTSModel(encoder_name="densenet121_bts", max_depth=10.0)
    params, stats = init_model(model, jax.random.key(0), (1, 64, 96, 3))

    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    assert set(tf_vars) == set(truth)

    new_p, new_s, report = convert_tf.warm_start_from_tf(
        tf_vars, params, stats, "densenet121_bts"
    )

    # Every encoder leaf loads; every model-tree encoder leaf is covered.
    n_enc_leaves = sum(
        1
        for path in list(_flatten(params)) + list(_flatten(stats))
        if path[0] == "encoder"
    )
    assert len(report["loaded"]) == n_enc_leaves
    # Every model variable the checkpoint lacks is a decoder leaf.
    assert report["unmatched_model"]
    assert all(p.startswith("decoder/") for p in report["unmatched_model"])
    # The only leftover checkpoint variable is the non-model one.
    assert report["unmatched_checkpoint"] == ["global_step"]

    # Value routing: spot-check the stem conv, a deep dense layer's BN
    # stats, a transition conv, and norm5.
    root = "model/encoder/densenet121/"
    np.testing.assert_array_equal(
        new_p["encoder"]["conv0"]["conv"]["kernel"],
        truth[root + "conv1/weights"],
    )
    np.testing.assert_array_equal(
        new_s["encoder"]["denseblock3"]["denselayer24"]["norm2"]["bn"]["var"],
        truth[root + "dense_block3/conv_block24/x2/BatchNorm/moving_variance"],
    )
    np.testing.assert_array_equal(
        new_p["encoder"]["transition2"]["conv"]["conv"]["kernel"],
        truth[root + "transition_block2/blk/Conv/weights"],
    )
    np.testing.assert_array_equal(
        new_p["encoder"]["norm5"]["bn"]["scale"],
        truth[root + "final_block/BatchNorm/gamma"],
    )
    # Decoder params untouched.
    np.testing.assert_array_equal(
        jax.tree.leaves(new_p["decoder"])[0],
        jax.tree.leaves(params["decoder"])[0],
    )


def test_tf_warm_start_rejects_unknown_encoder(synthetic_ckpt):
    prefix, _ = synthetic_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    with pytest.raises(ValueError, match="supports"):
        convert_tf.warm_start_from_tf(tf_vars, {}, {}, "mobilenetv2_bts")
    with pytest.raises(KeyError, match="densenet161"):
        convert_tf.warm_start_from_tf(tf_vars, {}, {}, "densenet161_bts")
