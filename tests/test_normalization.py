"""Normalization-style plumbing (--normalization {auto,imagenet,caffe})
and model-config validation.

Reference behaviors covered:
  * TF pipeline normalizes x255 - caffe_mean, x0.017
    (tensorflow/bts_dataloader.py:148-153) and its ImageNet warm start
    assumes those statistics (tensorflow/bts_main.py:228-232);
  * PT pipeline uses torchvision ImageNet stats
    (pytorch/bts_dataloader.py:244).
"""

import numpy as np
import pytest
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data import transforms


def test_normalization_default_is_imagenet():
    assert Config().resolved_normalization == "imagenet"
    assert Config(normalization="imagenet").resolved_normalization == "imagenet"
    assert Config(normalization="caffe").resolved_normalization == "caffe"
    with pytest.raises(ValueError):
        _ = Config(normalization="nope").resolved_normalization


def test_caffe_scale_is_densenet_only():
    # TF reference: x0.017 applies ONLY to densenet encoders
    # (tensorflow/bts_dataloader.py:151-153); other encoders get mean
    # subtraction alone.
    for enc in ("densenet161_bts", "densenet121_bts"):
        assert (
            Config(encoder=enc, normalization="caffe").resolved_normalization
            == "caffe"
        )
    for enc in ("resnet50_bts", "resnet101_bts", "mobilenetv2_bts"):
        assert (
            Config(encoder=enc, normalization="caffe").resolved_normalization
            == "caffe_unscaled"
        )


def test_resolved_normalization_round_trips():
    """Every resolved value must be a valid INPUT: snapshot_run pins the
    resolved normalization into arguments.txt for replay (snapshot.py:39),
    so a non-densenet caffe run's 'caffe_unscaled' must parse back instead
    of raising on the first loader access of the replayed config."""
    for cfg in (
        Config(encoder="resnet50_bts", normalization="caffe"),
        Config(normalization="caffe"),
        Config(),
    ):
        resolved = cfg.resolved_normalization
        replayed = Config(encoder=cfg.encoder, normalization=resolved)
        assert replayed.resolved_normalization == resolved


def test_normalization_auto_selects_caffe_for_tf_checkpoint(tmp_path):
    # A TF checkpoint is '<prefix>.index' + data files (convert_tf sniff).
    prefix = tmp_path / "model"
    (tmp_path / "model.index").write_bytes(b"\x00")
    cfg = Config(pretrained_model=str(prefix))
    assert cfg.resolved_normalization == "caffe"
    # Explicit flag overrides the sniff.
    assert (
        cfg.replace(normalization="imagenet").resolved_normalization
        == "imagenet"
    )
    # Non-TF paths keep imagenet.
    assert (
        Config(pretrained_model=str(tmp_path / "zoo.pth")).resolved_normalization
        == "imagenet"
    )


def test_normalize_image_styles_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(4, 6, 3)).astype(np.float32)
    for style in ("imagenet", "caffe", "caffe_unscaled"):
        normed = transforms.normalize_image(img, style)
        back = transforms.denormalize_image(normed, style)
        np.testing.assert_allclose(back, img, atol=1e-5)
    # caffe matches the reference formula exactly.
    np.testing.assert_allclose(
        transforms.normalize_image(img, "caffe"),
        (img * 255.0 - transforms.CAFFE_MEAN) * transforms.CAFFE_SCALE,
    )
    # caffe_unscaled is mean subtraction only (the non-densenet TF path).
    np.testing.assert_allclose(
        transforms.normalize_image(img, "caffe_unscaled"),
        img * 255.0 - transforms.CAFFE_MEAN,
    )


def _write_pair(root, h=64, w=96):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    depth = rng.integers(500, 9000, size=(h, w), dtype=np.uint16)
    Image.fromarray(rgb).save(root / "rgb.jpg")
    Image.fromarray(depth).save(root / "depth.png")
    return str(root / "rgb.jpg"), str(root / "depth.png")


def test_load_eval_sample_caffe_style(tmp_path):
    img_path, depth_path = _write_pair(tmp_path)
    im_i, _ = transforms.load_eval_sample(img_path, depth_path, "nyu")
    im_c, _ = transforms.load_eval_sample(
        img_path, depth_path, "nyu", normalization="caffe"
    )
    raw = np.asarray(Image.open(img_path), np.float32) / 255.0
    np.testing.assert_allclose(
        im_c, (raw * 255.0 - transforms.CAFFE_MEAN) * transforms.CAFFE_SCALE,
        atol=1e-5,
    )
    assert not np.allclose(im_i, im_c)


def test_load_train_sample_caffe_style(tmp_path):
    img_path, depth_path = _write_pair(tmp_path, h=80, w=112)
    # Same rng seed -> identical geometry/photometric draws; only the final
    # normalization differs.
    im_i, _ = transforms.load_train_sample(
        img_path, depth_path, "nyu", 64, 96, np.random.default_rng(7)
    )
    im_c, _ = transforms.load_train_sample(
        img_path,
        depth_path,
        "nyu",
        64,
        96,
        np.random.default_rng(7),
        normalization="caffe",
    )
    un_i = transforms.denormalize_image(im_i, "imagenet")
    un_c = transforms.denormalize_image(im_c, "caffe")
    np.testing.assert_allclose(un_i, un_c, atol=1e-4)


def test_train_loader_uses_cfg_normalization(tmp_path):
    from bts_tpu.data.loader import TrainLoader

    img_path, depth_path = _write_pair(tmp_path, h=80, w=112)
    manifest = tmp_path / "train.txt"
    manifest.write_text("rgb.jpg depth.png 518.8579\n")
    kw = dict(
        dataset="nyu",
        data_path=str(tmp_path),
        gt_path=str(tmp_path),
        filenames_file=str(manifest),
        input_height=64,
        input_width=96,
        batch_size=1,
    )
    b_i = next(TrainLoader(Config(**kw)).epoch(0))
    b_c = next(TrainLoader(Config(**kw, normalization="caffe")).epoch(0))
    un_i = transforms.denormalize_image(b_i["image"][0], "imagenet")
    un_c = transforms.denormalize_image(b_c["image"][0], "caffe")
    np.testing.assert_allclose(un_i, un_c, atol=1e-4)
    assert not np.allclose(b_i["image"], b_c["image"])


def test_device_augment_caffe_matches_host():
    import jax
    import jax.numpy as jnp

    from bts_tpu.data.device_augment import augment_batch

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, size=(2, 48, 64, 3)).astype(np.float32)
    deps = rng.uniform(0.5, 9, size=(2, 48, 64, 1)).astype(np.float32)
    key = jax.random.key(0)
    im_i, _ = augment_batch(
        key, jnp.asarray(imgs), jnp.asarray(deps), 32, 48,
        do_random_rotate=False,
    )
    im_c, _ = augment_batch(
        key, jnp.asarray(imgs), jnp.asarray(deps), 32, 48,
        do_random_rotate=False, normalization="caffe",
    )
    un_i = transforms.denormalize_image(np.asarray(im_i), "imagenet")
    un_c = transforms.denormalize_image(np.asarray(im_c), "caffe")
    np.testing.assert_allclose(un_i, un_c, atol=1e-4)


def test_create_model_validates_bts_size_and_encoder():
    from bts_tpu.models.bts import create_model

    with pytest.raises(ValueError, match="bts_size"):
        create_model(Config(bts_size=64))
    with pytest.raises(ValueError, match="bts_size"):
        create_model(Config(bts_size=127, fast_tail=False))
    with pytest.raises(ValueError, match="encoder"):
        create_model(Config(encoder="vgg16_bts"))
    # 128 is the documented minimum and must build.
    create_model(Config(bts_size=128))
