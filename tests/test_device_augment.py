"""On-device augmentation: semantics vs the host (reference) pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from bts_tpu.data import transforms
from bts_tpu.data.device_augment import (
    AugmentParams,
    apply_augment,
    augment_batch,
    rotate_image,
)

pytestmark = pytest.mark.medium  # round-end canary tier (see pyproject markers)


def _params(**kw):
    base = dict(
        angle_deg=jnp.float32(0.0),
        crop_y=jnp.int32(0),
        crop_x=jnp.int32(0),
        do_flip=jnp.bool_(False),
        do_photo=jnp.bool_(False),
        gamma=jnp.float32(1.0),
        brightness=jnp.float32(1.0),
        colors=jnp.ones(3, jnp.float32),
    )
    base.update({k: jnp.asarray(v) for k, v in kw.items()})
    return AugmentParams(**base)


def test_crop_flip_photometric_match_host(rng):
    img = rng.uniform(0, 1, size=(30, 40, 3)).astype(np.float32)
    dep = rng.uniform(0.5, 9, size=(30, 40, 1)).astype(np.float32)

    p = _params(
        crop_y=3,
        crop_x=5,
        do_flip=True,
        do_photo=True,
        gamma=1.05,
        brightness=1.1,
        colors=np.array([0.95, 1.0, 1.05], np.float32),
    )
    got_img, got_dep = apply_augment(
        jnp.asarray(img), jnp.asarray(dep), p, 16, 20, skip_rotate=True
    )

    # Host reference: crop -> flip -> photometric -> normalize.
    hi = img[3:19, 5:25][:, ::-1]
    hd = dep[3:19, 5:25][:, ::-1]
    aug = np.clip(
        (hi**1.05) * 1.1 * np.array([0.95, 1.0, 1.05], np.float32), 0, 1
    )
    want = transforms.normalize_image(aug)
    np.testing.assert_allclose(np.asarray(got_img), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dep), hd, rtol=1e-6)


def test_rotation_matches_pil_interior(rng):
    img = rng.uniform(0, 1, size=(40, 50, 3)).astype(np.float32)
    angle = 3.0
    got = np.asarray(rotate_image(jnp.asarray(img), jnp.float32(angle), order=1))
    pil = Image.fromarray((img * 255).astype(np.uint8)).rotate(
        angle, resample=Image.BILINEAR
    )
    want = np.asarray(pil, np.float32) / 255.0
    # Compare the interior (PIL and map_coordinates differ at borders and
    # by uint8 quantization).
    np.testing.assert_allclose(
        got[8:-8, 8:-8], want[8:-8, 8:-8], atol=0.03
    )


def test_rotation_zero_angle_identity(rng):
    img = rng.uniform(0, 1, size=(12, 14, 1)).astype(np.float32)
    got = np.asarray(rotate_image(jnp.asarray(img), jnp.float32(0.0), order=0))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_augment_batch_shapes_and_determinism(rng):
    imgs = rng.uniform(0, 1, size=(4, 30, 40, 3)).astype(np.float32)
    deps = rng.uniform(0.5, 9, size=(4, 30, 40, 1)).astype(np.float32)
    key = jax.random.key(7)
    i1, d1 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(deps), 16, 20)
    assert i1.shape == (4, 16, 20, 3) and d1.shape == (4, 16, 20, 1)
    i2, d2 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(deps), 16, 20)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # Different key -> different augmentation.
    i3, _ = augment_batch(jax.random.key(8), jnp.asarray(imgs), jnp.asarray(deps), 16, 20)
    assert not np.array_equal(np.asarray(i1), np.asarray(i3))
    # Per-sample independence: samples get different params.
    assert not np.array_equal(np.asarray(i1[0]), np.asarray(i1[1]))


def test_device_augment_train_step(rng, tmp_path):
    """Full train step with device_augment on an 8-device mesh."""
    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.parallel.mesh import make_mesh, shard_batch
    from bts_tpu.training.optim import create_optimizer
    from bts_tpu.training.state import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    # Small model/res: each of the 8 in-process parties must finish its step
    # well inside XLA:CPU's 40s all-reduce rendezvous watchdog on this
    # 1-core host (see CLAUDE.md).
    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="nyu",
        max_depth=10.0,
        batch_size=8,
        input_height=32,
        input_width=64,
        bts_size=128,
        device_augment=True,
        do_random_rotate=True,
        degree=2.5,
    )
    model = create_model(cfg)
    params, stats = init_model(model, jax.random.key(0), (8, 32, 64, 3))
    tx, _ = create_optimizer(cfg, params, 100)
    mesh = make_mesh(8)
    state = create_train_state(params, stats, tx, mesh=mesh)
    step = jit_train_step(make_train_step(model, tx, cfg), mesh)
    batch = shard_batch(
        {
            # raw (pre-crop) images, larger than the train crop
            "image": rng.uniform(0, 1, size=(8, 48, 96, 3)).astype(np.float32),
            "depth": rng.uniform(0.5, 9, size=(8, 48, 96, 1)).astype(np.float32),
            "focal": np.full((8,), 518.8579, np.float32),
        },
        mesh,
    )
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
