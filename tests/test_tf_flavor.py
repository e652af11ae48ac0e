"""TF-flavor model + full TF-zoo checkpoint ingestion.

The reference ships two trained TF checkpoints with quoted numbers
(tensorflow/README.md:89,198) built from the TF graph
(tensorflow/bts.py:237-345), which differs from the PT twin in: decoder
convs carry biases (slim default under the arg scope at :346-349), the
atrous 1x1 gets the arg-scope ELU, theta_max = pi/6 (:152), the final
reduc1x1 chain starts at the full current width (:316), guidance maps are
downsampled on the align_corners grid (:66-73), and encoder BNs use
eps=1.1e-5 (:189-193). flavor='tf' (models/bts.py) reproduces that graph;
models/convert_tf.convert_full_tf maps the checkpoint onto it with strict
two-way 100% coverage.

The slim auto-numbering (Conv, Conv_1, ...) cannot be ground-truthed here
(tf.contrib.slim does not run on TF2), so the walk in tf_decoder_name_map
is pinned by (a) hand-derived landmark indices from reading the TF build
order, (b) shape-checked strict round-trips through real model trees at
two widths, and (c) desync detection tests.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from bts_tpu.config import Config
from bts_tpu.models import convert_tf
from bts_tpu.models.bts import BTSModel, init_model
from bts_tpu.models.convert import _flatten


# --------------------------- unit pieces ---------------------------


def test_decode_plane_eq_theta_max():
    from bts_tpu.ops.lpg import decode_plane_eq

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
    for theta_max in (np.pi / 3, np.pi / 6):
        out = np.asarray(decode_plane_eq(raw, 10.0, float(theta_max)))
        sig = 1.0 / (1.0 + np.exp(-np.asarray(raw)))
        theta = sig[..., 0] * theta_max
        phi = sig[..., 1] * 2 * np.pi
        dist = sig[..., 2] * 10.0
        np.testing.assert_allclose(out[..., 0], np.sin(theta) * np.cos(phi), rtol=1e-5)
        np.testing.assert_allclose(out[..., 1], np.sin(theta) * np.sin(phi), rtol=1e-5)
        np.testing.assert_allclose(out[..., 2], np.cos(theta), rtol=1e-5)
        np.testing.assert_allclose(out[..., 3], dist, rtol=1e-5)
    # pi/6 caps theta lower: n3 = cos(theta) stays above cos(pi/6).
    out6 = np.asarray(decode_plane_eq(raw, 10.0, float(np.pi / 6)))
    assert out6[..., 2].min() >= np.cos(np.pi / 6) - 1e-6


def test_downsample_ac_matches_tf_resize():
    """downsample_nearest_ac == the TF graph's
    tf.image.resize_nearest_neighbor(align_corners=True) downsample
    (tensorflow/bts.py:66-73)."""
    from bts_tpu.models.layers import downsample_nearest_ac

    rng = np.random.default_rng(1)
    for (h, w, r) in ((16, 24, 4), (32, 40, 2), (8, 8, 4)):
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        ours = np.asarray(downsample_nearest_ac(jnp.asarray(x), r))
        theirs = tf.compat.v1.image.resize_nearest_neighbor(
            tf.constant(x), [h // r, w // r], align_corners=True
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_upsample2x_equals_align_corners_resize():
    """For exact 2x, align_corners nearest == plain repeat — so
    layers.upsample_nearest serves BOTH flavors (the TF upconv's
    resize at tensorflow/bts.py:63-67 needs no twin)."""
    from bts_tpu.models.layers import upsample_nearest

    rng = np.random.default_rng(2)
    for (h, w) in ((5, 7), (16, 24), (1, 3)):
        x = rng.normal(size=(1, h, w, 2)).astype(np.float32)
        ours = np.asarray(upsample_nearest(jnp.asarray(x), 2))
        theirs = tf.compat.v1.image.resize_nearest_neighbor(
            tf.constant(x), [2 * h, 2 * w], align_corners=True
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_decoder_name_map_landmarks():
    """Hand-derived slim auto-numbering landmarks (from reading the build
    order in tensorflow/bts.py:237-345) at both zoo widths."""
    m512 = convert_tf.tf_decoder_name_map(512)
    assert m512["upconv5/conv/kernel"] == "Conv/weights"
    assert m512["upconv5/conv/bias"] == "Conv/biases"
    assert m512["bn5/bn/scale"] == "BatchNorm/gamma"
    assert m512["daspp_3/conv1/conv/kernel"] == "Conv_4/weights"
    assert m512["daspp_3/bn2/bn/mean"] == "BatchNorm_3/moving_mean"
    assert m512["daspp_24/conv2/conv/kernel"] == "Conv_13/weights"
    assert m512["daspp_conv/conv/kernel"] == "Conv_14/weights"
    # reduc8x8 starts at 512//4=128: inter_0..4 then the plane head.
    assert m512["reduc8x8/inter_0/conv/kernel"] == "Conv_15/weights"
    assert m512["reduc8x8/plane_params/conv/kernel"] == "Conv_20/weights"
    assert m512["bn2/bn/var"] == "BatchNorm_13/moving_variance"
    # Final reduc starts at nf//16 (TF passes the full width, :316).
    assert m512["reduc1x1/inter_0/conv/kernel"] == "Conv_35/weights"
    assert m512["reduc1x1/final/conv/kernel"] == "Conv_38/weights"
    assert m512["conv1/conv/kernel"] == "Conv_39/weights"
    assert m512["get_depth/conv/kernel"] == "Conv_40/weights"

    m256 = convert_tf.tf_decoder_name_map(256)
    assert m256["reduc8x8/inter_0/conv/kernel"] == "Conv_15/weights"
    assert m256["reduc8x8/plane_params/conv/kernel"] == "Conv_19/weights"
    assert m256["get_depth/conv/kernel"] == "Conv_36/weights"
    # 14 BatchNorms in every width (bn5, bn4, bn4_2, bn3, bn2 + 9 atrous).
    for m in (m512, m256):
        bns = {v.split("/")[0] for k, v in m.items() if "BatchNorm" in v}
        assert len(bns) == 14


# ------------------- synthetic full checkpoint -> model -------------------

ENC = "densenet121_bts"
NF = 256  # TF builds densenet121 decoders at num_filters=256 (bts.py:404)
H, W = 64, 96


def _model_tf_names(params, stats):
    """Every (tf_name, shape) for a flavor='tf' model tree, using the
    module's own mapping (the mapping itself is pinned by the landmark
    test above and by test_convert_tf's independent encoder enumeration).
    """
    dec_map = convert_tf.tf_decoder_name_map(NF)
    out = {}
    for flat in (params, stats):
        for path, leaf in _flatten(flat).items():
            if path[0] == "encoder":
                name = "model/encoder/densenet121/" + convert_tf._tf_encoder_name(
                    path[1:-2], path[-1]
                )
            else:
                name = "model/decoder/" + dec_map["/".join(path[1:])]
            out[name] = np.shape(leaf)
    return out


@pytest.fixture(scope="module")
def tf_model_and_ckpt(tmp_path_factory):
    model = BTSModel(
        encoder_name=ENC, max_depth=10.0, bts_size=NF, flavor="tf"
    )
    params, stats = init_model(model, jax.random.key(0), (1, H, W, 3))

    rng = np.random.default_rng(3)
    names, tensors = [], []
    for name, shape in sorted(_model_tf_names(params, stats).items()):
        names.append(name)
        if name.endswith("moving_variance"):
            t = rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
        else:
            t = (rng.normal(size=shape) * 0.05).astype(np.float32)
        tensors.append(t)
    # Non-model bookkeeping a real training checkpoint carries.
    names += ["global_step", "model/decoder/Conv/weights/Adam"]
    tensors += [np.int64(777), np.zeros((3, 3, 2208 if NF == 512 else 1024, NF), np.float32)]

    d = tmp_path_factory.mktemp("tffull")
    prefix = str(d / "model")
    tf.raw_ops.SaveV2(
        prefix=prefix,
        tensor_names=names,
        shape_and_slices=[""] * len(names),
        tensors=[tf.constant(t) for t in tensors],
    )
    return model, params, stats, prefix, dict(zip(names, tensors))


def test_convert_full_tf_roundtrip(tf_model_and_ckpt):
    model, params, stats, prefix, truth = tf_model_and_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    new_p, new_s, report = convert_tf.convert_full_tf(
        tf_vars, params, stats, ENC, NF
    )
    # 100% coverage: every model leaf loaded, only bookkeeping skipped.
    n_leaves = len(_flatten(params)) + len(_flatten(stats))
    assert len(report["loaded"]) == n_leaves
    assert report["skipped_non_model"] == [
        "global_step", "model/decoder/Conv/weights/Adam",
    ]
    # Exhaustive value routing via the same mapping.
    dec_map = convert_tf.tf_decoder_name_map(NF)
    for flat in (_flatten(new_p), _flatten(new_s)):
        for path, leaf in flat.items():
            if path[0] == "encoder":
                name = (
                    "model/encoder/densenet121/"
                    + convert_tf._tf_encoder_name(path[1:-2], path[-1])
                )
            else:
                name = "model/decoder/" + dec_map["/".join(path[1:])]
            np.testing.assert_array_equal(
                np.asarray(leaf), truth[name], err_msg="/".join(path)
            )
    # Decoder biases exist in the flavor='tf' tree and were loaded.
    assert ("decoder", "get_depth", "conv", "bias") in _flatten(new_p)


def test_convert_full_tf_desync_detection(tf_model_and_ckpt):
    model, params, stats, prefix, truth = tf_model_and_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    # A missing decoder variable fails loudly.
    broken = dict(tf_vars)
    del broken["model/decoder/Conv_10/weights"]
    with pytest.raises(KeyError, match="not found"):
        convert_tf.convert_full_tf(broken, params, stats, ENC, NF)
    # An unconsumed model variable (numbering desync) fails loudly.
    extra = dict(tf_vars)
    extra["model/decoder/Conv_99/weights"] = np.zeros((1, 1, 4, 4), np.float32)
    with pytest.raises(KeyError, match="no model leaf"):
        convert_tf.convert_full_tf(extra, params, stats, ENC, NF)
    # Wrong width (wrong bts_size) shows up as a shape/name error.
    with pytest.raises((KeyError, ValueError)):
        convert_tf.convert_full_tf(tf_vars, params, stats, ENC, 512)


def test_tf_flavor_forward_runs(tf_model_and_ckpt):
    model, params, stats, prefix, _ = tf_model_and_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    new_p, new_s, _ = convert_tf.convert_full_tf(tf_vars, params, stats, ENC, NF)
    img = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, H, W, 3)).astype(np.float32)
    )
    focal = jnp.asarray([518.8579], jnp.float32)
    outs = model.apply(
        {"params": new_p, "batch_stats": new_s}, img, focal, train=False
    )
    assert [o.shape for o in outs] == [(1, H, W, 1)] * 5
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    # theta_max=pi/6 is live: the decoded depth is positive and bounded.
    assert 0.0 <= float(outs[4].min()) and float(outs[4].max()) <= 10.0


def test_resolved_flavor_and_normalization_sniff(tf_model_and_ckpt, tmp_path):
    _, _, _, prefix, _ = tf_model_and_ckpt
    cfg = Config(encoder=ENC, bts_size=NF, checkpoint_path=prefix)
    assert cfg.resolved_flavor == "tf"
    # The TF pipeline normalizes caffe-style; densenet gets the x0.017.
    assert cfg.resolved_normalization == "caffe"
    assert Config(encoder=ENC).resolved_flavor == "pt"
    # Explicit override wins.
    assert cfg.replace(model_flavor="pt").resolved_flavor == "pt"
    # An encoder-only TF warm start keeps the PT graph.
    enc_only = tmp_path / "enc"
    enc_only.mkdir()
    assert (
        Config(encoder=ENC, pretrained_model=str(enc_only)).resolved_flavor
        == "pt"
    )


def test_load_any_checkpoint_routes_tf(tf_model_and_ckpt):
    from bts_tpu.training.checkpoint import load_any_checkpoint

    model, params, stats, prefix, truth = tf_model_and_ckpt
    cfg = Config(encoder=ENC, bts_size=NF)
    p, s = load_any_checkpoint(prefix, params, stats, cfg=cfg)
    np.testing.assert_array_equal(
        p["decoder"]["get_depth"]["conv"]["bias"],
        truth[
            "model/decoder/"
            + convert_tf.tf_decoder_name_map(NF)["get_depth/conv/bias"]
        ],
    )


def test_tf_flavor_rejects_non_densenet():
    with pytest.raises(ValueError, match="densenet"):
        model = BTSModel(
            encoder_name="resnet50_bts", max_depth=10.0, flavor="tf"
        )
        init_model(model, jax.random.key(0), (1, 32, 64, 3))


@pytest.mark.medium
def test_tf_checkpoint_end_to_end_cli(tf_model_and_ckpt, tmp_path):
    """Full inference chain on a TF checkpoint through the CLI surface:
    Config auto-resolves flavor='tf' + caffe normalization from the
    checkpoint prefix, run_predictions builds/loads/converts and dumps
    uint16 depth pngs — the user-facing path for the reference TF zoo
    (tensorflow/README.md:60-89)."""
    from PIL import Image

    _, _, _, prefix, _ = tf_model_and_ckpt

    root = tmp_path / "data"
    scene = root / "kitchen_0001"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(9)
    lines = []
    for i in range(2):
        rgb = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        lines.append(f"kitchen_0001/rgb_{i:05d}.jpg None 518.8579")
    manifest = root / "files.txt"
    manifest.write_text("\n".join(lines) + "\n")

    cfg = Config(
        model_name="tfzoo",
        encoder=ENC,
        bts_size=NF,
        dataset="nyu",
        max_depth=10.0,
        input_height=H,
        input_width=W,
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(manifest),
        checkpoint_path=prefix,
        eval_batch_size=2,
    )
    assert cfg.resolved_flavor == "tf"
    assert cfg.resolved_normalization == "caffe"

    from bts_tpu.apps.predict import run_predictions

    out_dir = run_predictions(cfg, out_dir=str(tmp_path / "preds"))
    import os

    raws = sorted(os.listdir(os.path.join(out_dir, "raw")))
    assert len(raws) == 2
    img = np.asarray(Image.open(os.path.join(out_dir, "raw", raws[0])))
    assert img.dtype == np.uint16 and img.shape == (H, W)
    assert img.max() > 0  # real depths, x1000 NYU encoding


# ------------- TF-graph border semantics (tf.nn as the oracle) -------------
#
# The two flavor-'tf' graph properties that torch-style padding gets WRONG
# at borders: (a) atrous_conv pads BEFORE the first BN (tensorflow/bts.py:
# 85-88), so the pad band reaches the dilated conv as nonzero values;
# (b) the slim stem uses 'SAME' padding, asymmetric for k7/s2 and k3/s2 on
# even inputs. Modern tf.nn ops implement the identical padding semantics
# slim lowered to, so they serve as a numerical oracle without contrib.


def _bn_tf(x, scale, bias, mean, var, eps):
    return tf.nn.batch_normalization(
        x,
        tf.constant(np.asarray(mean)),
        tf.constant(np.asarray(var)),
        tf.constant(np.asarray(bias)),
        tf.constant(np.asarray(scale)),
        eps,
    )


def _randomize_tree(tree, rng):
    """Random values for every leaf (positive for variances)."""
    import jax.tree_util as jtu

    def rnd(path, leaf):
        shape = np.shape(leaf)
        if any(getattr(p, "key", None) == "var" for p in path):
            return jnp.asarray(rng.uniform(0.5, 1.5, shape).astype(np.float32))
        return jnp.asarray((rng.normal(size=shape) * 0.3).astype(np.float32))

    return jtu.tree_map_with_path(rnd, tree)


@pytest.mark.parametrize("apply_bn_first,rate", [(True, 6), (False, 3)])
def test_atrous_tf_variant_matches_tf_graph(apply_bn_first, rate):
    """flavor-'tf' AtrousConv == the reference TF graph structure
    (tensorflow/bts.py:84-100) rebuilt with tf.nn ops: pad(pk+rate-1) ->
    [BN] -> relu -> conv1x1+bias -> ELU -> BN -> relu -> dilated VALID."""
    from bts_tpu.models.decoder import DECODER_BN_EPS, AtrousConv

    rng = np.random.default_rng(11)
    mod = AtrousConv(
        features=8, dilation=rate, apply_bn_first=apply_bn_first,
        tf_variant=True,
    )
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 6)).astype(np.float32))
    variables = mod.init(jax.random.key(0), x, train=False)
    variables = _randomize_tree(
        jax.tree_util.tree_map(np.asarray, variables), rng
    )
    ours = np.asarray(
        mod.apply(variables, x, train=False)
    )

    p_, s_ = variables["params"], variables["batch_stats"]
    pad = 1 + (rate - 1)
    out = tf.pad(
        tf.constant(np.asarray(x)), [[0, 0], [pad, pad], [pad, pad], [0, 0]]
    )
    if apply_bn_first:
        bn = p_["first_bn"]["bn"], s_["first_bn"]["bn"]
        out = _bn_tf(
            out, bn[0]["scale"], bn[0]["bias"], bn[1]["mean"], bn[1]["var"],
            DECODER_BN_EPS,
        )
    out = tf.nn.relu(out)
    out = (
        tf.nn.conv2d(out, tf.constant(np.asarray(p_["conv1"]["conv"]["kernel"])), 1, "VALID")
        + np.asarray(p_["conv1"]["conv"]["bias"])
    )
    out = tf.nn.elu(out)
    bn2 = p_["bn2"]["bn"], s_["bn2"]["bn"]
    out = _bn_tf(
        out, bn2[0]["scale"], bn2[0]["bias"], bn2[1]["mean"], bn2[1]["var"],
        DECODER_BN_EPS,
    )
    out = tf.nn.relu(out)
    out = (
        tf.nn.conv2d(
            out,
            tf.constant(np.asarray(p_["conv2"]["conv"]["kernel"])),
            1,
            "VALID",
            dilations=rate,
        )
        + np.asarray(p_["conv2"]["conv"]["bias"])
    )
    theirs = out.numpy()
    assert ours.shape == theirs.shape == (2, 10, 14, 8)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("hw", [(32, 48), (30, 42)])
def test_tf_stem_matches_tf_nn_same(hw):
    """flavor-'tf' stem (slim SAME conv7/s2 + maxpool3/s2,
    tensorflow/bts.py:204-210) == tf.nn.conv2d/max_pool2d with 'SAME',
    checked through the real encoder module (skips[0]/skips[1])."""
    from bts_tpu.models.encoders.densenet import DenseNetEncoder

    h, w = hw
    rng = np.random.default_rng(12)
    enc = DenseNetEncoder(
        block_config=(1, 1, 1, 1),
        growth_rate=8,
        num_init_features=16,
        bn_eps=1.1e-5,
        tf_stem=True,
    )
    x = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    variables = enc.init(jax.random.key(1), x, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # Randomize norm0 so the BN affine is non-trivial.
    s0 = variables["batch_stats"]["norm0"]["bn"]
    p0 = variables["params"]["norm0"]["bn"]
    s0["mean"] = rng.normal(size=s0["mean"].shape).astype(np.float32) * 0.2
    s0["var"] = rng.uniform(0.5, 1.5, s0["var"].shape).astype(np.float32)
    p0["scale"] = rng.uniform(0.5, 1.5, p0["scale"].shape).astype(np.float32)
    p0["bias"] = rng.normal(size=p0["bias"].shape).astype(np.float32) * 0.2

    skips = enc.apply(variables, x, train=False)

    k = variables["params"]["conv0"]["conv"]["kernel"]
    conv = tf.nn.conv2d(tf.constant(np.asarray(x)), tf.constant(k), 2, "SAME")
    bn = _bn_tf(conv, p0["scale"], p0["bias"], s0["mean"], s0["var"], 1.1e-5)
    relu0 = tf.nn.relu(bn)
    np.testing.assert_allclose(
        np.asarray(skips[0]), relu0.numpy(), atol=2e-5
    )
    pool0 = tf.nn.max_pool2d(relu0, 3, 2, "SAME")
    np.testing.assert_allclose(
        np.asarray(skips[1]), pool0.numpy(), atol=2e-5
    )
    # The asymmetric case is live on even inputs (and for the pool, on
    # inputs whose half is also even — every /32-divisible model input).
    if h % 2 == 0:
        from bts_tpu.models.encoders.densenet import _same_pads

        assert _same_pads(h, 7, 2) == (2, 3)
    if h % 4 == 0:
        assert _same_pads(h // 2, 3, 2) == (0, 1)


def test_same_pads_matches_tf_conv_shapes():
    """_same_pads reproduces tf.nn SAME output values for a spread of
    sizes/kernels/strides (impulse inputs make grid shifts visible)."""
    from bts_tpu.models.encoders.densenet import _same_pads

    rng = np.random.default_rng(13)
    for size, k, s in [(20, 7, 2), (21, 7, 2), (13, 3, 2), (16, 3, 2), (9, 3, 1)]:
        x = np.zeros((1, size, size, 1), np.float32)
        x[0, size // 2, size // 3, 0] = 1.0
        x[0, 1, 1, 0] = -0.5
        kern = rng.normal(size=(k, k, 1, 1)).astype(np.float32)
        theirs = tf.nn.conv2d(tf.constant(x), tf.constant(kern), s, "SAME").numpy()
        ph, pw = _same_pads(size, k, s), _same_pads(size, k, s)
        xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
        ours = np.asarray(
            jax.lax.conv_general_dilated(
                jnp.asarray(xp),
                jnp.asarray(kern),
                (s, s),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_train_resume_from_tf_checkpoint(tf_model_and_ckpt, tmp_path):
    """--checkpoint_path at a reference TF checkpoint resumes training:
    weights + global_step carry over (the TF reference's Saver.restore,
    tensorflow/bts_main.py:234-246; optax state starts fresh), and a bogus
    path raises instead of silently training from scratch."""
    from bts_tpu.training import checkpoint as ckpt_lib
    from bts_tpu.training.loop import restore_training_start
    from bts_tpu.training.optim import create_optimizer
    from bts_tpu.training.state import create_train_state

    model, params, stats, prefix, truth = tf_model_and_ckpt
    cfg = Config(
        encoder=ENC,
        bts_size=NF,
        checkpoint_path=prefix,
        batch_size=2,
        input_height=H,
        input_width=W,
    )
    assert cfg.resolved_flavor == "tf"
    tx, _ = create_optimizer(cfg, params, num_total_steps=10)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.array, params),
        jax.tree_util.tree_map(jnp.array, stats),
        tx,
    )
    best = ckpt_lib.BestTracker()
    state2, _ = restore_training_start(cfg, state, best, is_primary=True)
    assert int(state2.step) == 777  # the checkpoint's global_step
    # The APPLIED poly LR must continue from the restored step (both
    # references key it on global_step): the optax schedule counts advance
    # with the step while Adam's bias-correction counts stay 0 for the
    # fresh moments.
    import optax

    sched = [
        int(leaf.count)
        for leaf in jax.tree_util.tree_leaves(
            state2.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        )
        if isinstance(leaf, optax.ScaleByScheduleState)
    ]
    adam = [
        int(leaf.count)
        for leaf in jax.tree_util.tree_leaves(
            state2.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        )
        if isinstance(leaf, optax.ScaleByAdamState)
    ]
    assert sched and all(c == 777 for c in sched), sched
    assert adam and all(c == 0 for c in adam), adam
    # --retrain restarts from step zero INCLUDING the LR schedule
    # (pytorch/bts_main.py:399-400: decay restarts at base_lr).
    state3, _ = restore_training_start(
        cfg.replace(retrain=True),
        create_train_state(
            jax.tree_util.tree_map(jnp.array, params),
            jax.tree_util.tree_map(jnp.array, stats),
            tx,
        ),
        ckpt_lib.BestTracker(),
        is_primary=True,
    )
    assert int(state3.step) == 0
    sched3 = [
        int(leaf.count)
        for leaf in jax.tree_util.tree_leaves(
            state3.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        )
        if isinstance(leaf, optax.ScaleByScheduleState)
    ]
    assert sched3 and all(c == 0 for c in sched3), sched3
    np.testing.assert_array_equal(
        np.asarray(state2.params["decoder"]["get_depth"]["conv"]["bias"]),
        truth[
            "model/decoder/"
            + convert_tf.tf_decoder_name_map(NF)["get_depth/conv/bias"]
        ],
    )
    with pytest.raises(FileNotFoundError):
        restore_training_start(
            cfg.replace(checkpoint_path=str(tmp_path / "nope")),
            state,
            best,
            True,
        )


def test_resolved_flavor_sniffs_tf_flavor_orbax_dir(
    tf_model_and_ckpt, tmp_path
):
    """An orbax checkpoint saved from a flavor='tf' run resolves back to
    'tf' (so resume/serve on a tf-flavor run dir rebuilds the right graph
    without an explicit --model_flavor); a PT-shaped tree stays 'pt'."""
    from bts_tpu.models.convert import _flatten as fl
    from bts_tpu.models.convert import _unflatten
    from bts_tpu.training.checkpoint import save_params_only

    _, params, stats, _, _ = tf_model_and_ckpt
    tf_dir = str(tmp_path / "tf_run")
    save_params_only(tf_dir, params, stats)
    assert Config(encoder=ENC, bts_size=NF, checkpoint_path=tf_dir
                  ).resolved_flavor == "tf"

    # Same tree with the decoder biases dropped == a PT-flavor save.
    pt_params = _unflatten(
        {
            p: v
            for p, v in fl(params).items()
            if not (p[0] == "decoder" and p[-1] == "bias")
        }
    )
    pt_dir = str(tmp_path / "pt_run")
    save_params_only(pt_dir, pt_params, stats)
    assert Config(encoder=ENC, bts_size=NF, checkpoint_path=pt_dir
                  ).resolved_flavor == "pt"


@pytest.mark.medium
def test_tf_flavor_fine_tune_step(tf_model_and_ckpt):
    """A TF-zoo checkpoint can be FINE-TUNED: an optimizer step on the
    flavor='tf' model (converted weights) runs the full training machinery
    — silog loss, frozen-BN predicate, AdamW groups — on the tf tree,
    which carries decoder conv biases the PT tree doesn't. The reference
    offers the same continuation via tensorflow/bts_main.py
    --checkpoint_path restore (:222-246)."""
    from bts_tpu.parallel.mesh import make_mesh, shard_batch
    from bts_tpu.training.optim import create_optimizer, frozen_predicate
    from bts_tpu.training.state import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    model, params, stats, prefix, _ = tf_model_and_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    params, stats, _ = convert_tf.convert_full_tf(tf_vars, params, stats, ENC, NF)

    cfg = Config(
        encoder=ENC,
        bts_size=NF,
        model_flavor="tf",
        dataset="nyu",
        max_depth=10.0,
        batch_size=2,
        input_height=H,
        input_width=W,
        learning_rate=1e-4,
    )
    tx, _ = create_optimizer(cfg, params, num_total_steps=10)
    mesh = make_mesh(1)
    state = create_train_state(params, stats, tx, mesh=mesh)
    step_fn = jit_train_step(make_train_step(model, tx, cfg), mesh)

    rng = np.random.default_rng(5)
    batch = shard_batch(
        {
            "image": rng.normal(size=(2, H, W, 3)).astype(np.float32),
            "depth": rng.uniform(0.5, 9.5, size=(2, H, W, 1)).astype(np.float32),
            "focal": np.full((2,), 518.8579, np.float32),
        },
        mesh,
    )
    before = jax.tree_util.tree_map(np.asarray, params)
    stats_before = jax.tree_util.tree_map(np.asarray, stats)
    state2, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss"]) > 0

    # TF-twin BN semantics: the TF reference trains with EVERY BN frozen
    # (encoder is_training=False tensorflow/bts.py:188-192, decoder
    # bn_training=False bts_main.py:167-168), so a fine-tune step must
    # normalize by — and not touch — the checkpoint's moving stats.
    for path, leaf in _flatten(
        jax.tree_util.tree_map(np.asarray, state2.batch_stats)
    ).items():
        np.testing.assert_array_equal(
            leaf, _flatten(stats_before)[path], err_msg="/".join(path)
        )

    pred = frozen_predicate(cfg)
    flat_before = _flatten(before)
    flat_after = _flatten(jax.tree_util.tree_map(np.asarray, state2.params))
    moved_bias = 0
    for path, b in flat_before.items():
        a = flat_after[path]
        path_str = "/".join(path)
        if pred(path_str):
            np.testing.assert_array_equal(a, b, err_msg=path_str)
        elif path[-1] == "bias" and path[0] == "decoder" and (a != b).any():
            moved_bias += 1
    # The tf-only decoder conv biases are trainable and received updates.
    assert moved_bias > 10


# ---------------- full-model tf.nn oracle for flavor='tf' ----------------
#
# Strongest TF-parity evidence available without the real zoo checkpoints:
# rebuild the ENTIRE reference graph (tensorflow/bts.py:177-345 — densenet
# encoder, BTS decoder, custom LPG op) with modern tf.nn ops, pulling
# weights from the synthetic checkpoint by TF variable name with an
# INDEPENDENT slim auto-numbering walk (counters incremented in graph-build
# order, exactly as slim names variables). Any error in our converter's
# name map, any padding/BN/activation/concat-order discrepancy in the
# flavor='tf' modules, or any plane-decode/LPG drift shows up as a numeric
# mismatch in one of the five outputs.


def _lpg_reference(plane_eq: np.ndarray, upratio: int) -> np.ndarray:
    """The custom TF op's forward math (tensorflow/custom_layer/
    local_planar_guidance.cc:79-117), re-derived: per output pixel,
    u/v are the sub-cell offsets centered on the cell, and
    depth = n4 / (n1*u + n2*v + n3). `focal` is read but unused there."""
    r = upratio
    pe = plane_eq.repeat(r, axis=1).repeat(r, axis=2)
    H, W = pe.shape[1], pe.shape[2]
    v = (((np.arange(H) % r) - (r - 1) / 2.0) / r).astype(np.float32)
    u = (((np.arange(W) % r) - (r - 1) / 2.0) / r).astype(np.float32)
    denom = (
        pe[..., 0] * u[None, None, :]
        + pe[..., 1] * v[None, :, None]
        + pe[..., 2]
    )
    return pe[..., 3] / denom


def _tf_graph_oracle(truth, image_np, max_depth, nf):
    """Forward the reference TF graph (densenet121_bts, mode 'test',
    dataset 'nyu') on tf.nn ops, reading weights from `truth` by name.
    Returns (lpg8x8, lpg4x4, lpg2x2, reduc1x1, depth_est) as numpy."""
    enc = "model/encoder/densenet121/"
    dec = "model/decoder/"

    def V(name):
        return tf.constant(truth[name])

    def bn_named(x, name):
        # slim.batch_norm(is_training=False), eps=1.1e-5 everywhere
        # (tensorflow/bts.py:188-192 encoder, :239-243 decoder).
        return tf.nn.batch_normalization(
            x,
            V(name + "/moving_mean"),
            V(name + "/moving_variance"),
            V(name + "/beta"),
            V(name + "/gamma"),
            1.1e-5,
        )

    # ---- encoder (tensorflow/bts.py:177-235): slim convs are SAME,
    # bias-free, activation-free; denseconv = BN -> relu -> conv ----
    def denseconv(x, scope, rate=1):
        x = bn_named(x, enc + scope + "/BatchNorm")
        x = tf.nn.relu(x)
        return tf.nn.conv2d(
            x, V(enc + scope + "/Conv/weights"), 1, "SAME", dilations=rate
        )

    net = tf.nn.conv2d(tf.constant(image_np), V(enc + "conv1/weights"), 2, "SAME")
    net = bn_named(net, enc + "BatchNorm")
    net = tf.nn.relu(net)
    skips = [net]
    net = tf.nn.max_pool2d(net, 3, 2, "SAME")
    skips.append(net)
    num_layers = [6, 12, 24, 16]
    for i in range(4):
        for j in range(num_layers[i]):
            blk = f"dense_block{i + 1}/conv_block{j + 1}"
            out = denseconv(net, blk + "/x1")
            out = denseconv(out, blk + "/x2", rate=1)
            net = tf.concat([net, out], 3)
        if i < 3:
            net = denseconv(net, f"transition_block{i + 1}/blk")
            # slim.avg_pool2d(out, 2): stride=kernel, VALID (slim default).
            net = tf.nn.avg_pool2d(net, 2, 2, "VALID")
            if i < 2:
                skips.append(net)
    net = bn_named(net, enc + "final_block/BatchNorm")
    dense_features = tf.nn.relu(net)

    # ---- decoder (tensorflow/bts.py:237-345): independent slim counters,
    # incremented in graph-build order ----
    counters = {"Conv": -1, "BatchNorm": -1}

    def nxt(kind):
        counters[kind] += 1
        n = counters[kind]
        return dec + (kind if n == 0 else f"{kind}_{n}")

    def slim_conv(x, rate=1, act="elu"):
        s = nxt("Conv")
        out = (
            tf.nn.conv2d(x, V(s + "/weights"), 1, "VALID", dilations=rate)
            + V(s + "/biases")
        )
        if act == "elu":
            return tf.nn.elu(out)
        if act == "sigmoid":
            return tf.nn.sigmoid(out)
        return out

    def slim_bn(x):
        return bn_named(x, nxt("BatchNorm"))

    def conv(x, k, act="elu"):
        p = (k - 1) // 2
        x = tf.pad(x, [[0, 0], [p, p], [p, p], [0, 0]])
        return slim_conv(x, act=act)

    def resize_nn(x, h, w):
        return tf.compat.v1.image.resize_nearest_neighbor(
            x, [h, w], align_corners=True
        )

    def upconv(x):
        h, w = int(x.shape[1]), int(x.shape[2])
        return conv(resize_nn(x, 2 * h, 2 * w), 3)

    def atrous(x, rate, bn_first=True):
        p = 1 + (rate - 1)  # pk + pr, tensorflow/bts.py:83-86
        out = tf.pad(x, [[0, 0], [p, p], [p, p], [0, 0]])
        if bn_first:
            out = slim_bn(out)
        out = tf.nn.relu(out)
        out = slim_conv(out)  # 1x1 2C, arg-scope ELU + bias
        out = slim_bn(out)
        out = tf.nn.relu(out)
        return slim_conv(out, rate=rate, act=None)  # 3x3 dilated VALID

    def reduction_1x1(net, num_filters, is_final=False):
        # tensorflow/bts.py:145-166 (reference pi constant kept verbatim).
        while num_filters >= 4:
            if num_filters < 8:
                if is_final:
                    net = conv(net, 1, act="sigmoid")
                else:
                    net = conv(net, 1, act=None)
                    theta = tf.nn.sigmoid(net[..., 0]) * 3.1415926535 / 6
                    phi = tf.nn.sigmoid(net[..., 1]) * 3.1415926535 * 2
                    dist = tf.nn.sigmoid(net[..., 2]) * max_depth
                    net = tf.stack(
                        [
                            tf.math.sin(theta) * tf.math.cos(phi),
                            tf.math.sin(theta) * tf.math.sin(phi),
                            tf.math.cos(theta),
                            dist,
                        ],
                        axis=3,
                    )
                break
            net = conv(net, 1)
            num_filters //= 2
        return net

    def plane_head(feat, width, upratio):
        pe = reduction_1x1(feat, width)
        normal = tf.nn.l2_normalize(pe[..., 0:3], axis=3)
        pe = tf.concat([normal, pe[..., 3:4]], 3)
        depth = _lpg_reference(pe.numpy(), upratio)
        return tf.constant(depth[..., None] / max_depth)

    upconv5 = upconv(dense_features)  # H/16
    upconv5 = slim_bn(upconv5)
    concat5 = tf.concat([upconv5, skips[3]], 3)
    iconv5 = conv(concat5, 3)

    upconv4 = upconv(iconv5)  # H/8
    upconv4 = slim_bn(upconv4)
    concat4 = tf.concat([upconv4, skips[2]], 3)
    iconv4 = conv(concat4, 3)
    iconv4 = slim_bn(iconv4)

    daspp_3 = atrous(iconv4, 3, bn_first=False)
    concat4_2 = tf.concat([concat4, daspp_3], 3)
    daspp_6 = atrous(concat4_2, 6)
    concat4_3 = tf.concat([concat4_2, daspp_6], 3)
    daspp_12 = atrous(concat4_3, 12)
    concat4_4 = tf.concat([concat4_3, daspp_12], 3)
    daspp_18 = atrous(concat4_4, 18)
    concat4_5 = tf.concat([concat4_4, daspp_18], 3)
    daspp_24 = atrous(concat4_5, 24)
    concat4_daspp = tf.concat(
        [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], 3
    )
    daspp_feat = conv(concat4_daspp, 3)

    depth_8x8_scaled = plane_head(daspp_feat, nf // 4, 8)
    h, w = int(depth_8x8_scaled.shape[1]), int(depth_8x8_scaled.shape[2])
    depth_8x8_scaled_ds = resize_nn(depth_8x8_scaled, h // 4, w // 4)

    upconv3 = upconv(daspp_feat)  # H/4
    upconv3 = slim_bn(upconv3)
    concat3 = tf.concat([upconv3, skips[1], depth_8x8_scaled_ds], 3)
    iconv3 = conv(concat3, 3)

    depth_4x4_scaled = plane_head(iconv3, nf // 8, 4)
    depth_4x4_scaled_ds = resize_nn(depth_4x4_scaled, h // 2, w // 2)

    upconv2 = upconv(iconv3)  # H/2
    upconv2 = slim_bn(upconv2)
    concat2 = tf.concat([upconv2, skips[0], depth_4x4_scaled_ds], 3)
    iconv2 = conv(concat2, 3)

    depth_2x2_scaled = plane_head(iconv2, nf // 16, 2)

    upconv1 = upconv(iconv2)  # H
    # TF passes the CURRENT width into the final reduc (bts.py:316).
    reduc1x1 = reduction_1x1(upconv1, nf // 16, is_final=True)
    concat1 = tf.concat(
        [upconv1, reduc1x1, depth_2x2_scaled, depth_4x4_scaled,
         depth_8x8_scaled], 3
    )
    iconv1 = conv(concat1, 3)
    depth_est = max_depth * conv(iconv1, 3, act="sigmoid")  # nyu: no focal

    return tuple(
        t.numpy()
        for t in (
            depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled,
            reduc1x1, depth_est,
        )
    )


@pytest.mark.medium
def test_full_model_matches_tf_graph_oracle(tf_model_and_ckpt):
    """flavor='tf' forward on converted weights == the complete reference
    TF graph rebuilt on tf.nn ops, for all five outputs. The oracle's slim
    numbering is independent of tf_decoder_name_map: a desync anywhere
    routes weights into the wrong layer and fails numerically."""
    model, params, stats, prefix, truth = tf_model_and_ckpt
    tf_vars = convert_tf.load_tf_checkpoint(prefix)
    new_p, new_s, _ = convert_tf.convert_full_tf(tf_vars, params, stats, ENC, NF)

    rng = np.random.default_rng(21)
    image = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    focal = jnp.asarray([518.8579, 518.8579], jnp.float32)

    ours = model.apply(
        {"params": new_p, "batch_stats": new_s},
        jnp.asarray(image),
        focal,
        train=False,
    )
    theirs = _tf_graph_oracle(truth, image, model.max_depth, NF)

    names = ["lpg8x8", "lpg4x4", "lpg2x2", "reduc1x1", "depth_est"]
    for name, a, b in zip(names, ours, theirs):
        a = np.asarray(a)
        assert a.shape == b.shape == (2, H, W, 1), name
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3, err_msg=name)


def test_resolved_flavor_sniff_is_cached(tf_model_and_ckpt, monkeypatch):
    """The 'auto' flavor sniff opens the checkpoint once per Config
    instance, not on every resolved_flavor/resolved_normalization access."""
    from bts_tpu.models import convert_tf as ct

    _, _, _, prefix, _ = tf_model_and_ckpt
    calls = {"n": 0}
    real = ct.is_tf_checkpoint

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(ct, "is_tf_checkpoint", counting)
    cfg = Config(encoder=ENC, bts_size=NF, checkpoint_path=prefix)
    assert cfg.resolved_flavor == "tf"
    assert cfg.resolved_flavor == "tf"
    assert cfg.resolved_normalization == "caffe"
    assert calls["n"] == 1
    # replace() re-resolves (fresh instance, fields may have changed).
    assert cfg.replace(checkpoint_path="").resolved_flavor == "pt"
