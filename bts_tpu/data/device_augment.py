"""On-device (jit-fused) training augmentation.

TPU-native alternative to the host augmentation chain
(pytorch/bts_dataloader.py:122-235): the host only decodes and applies the
static crops (kb-crop / NYU border crop); rotation, random crop, flip,
photometric jitter and normalization run as ONE fused jit program on the
accelerator, folded into the training step (zero host augment cost, and the
augmented batch never exists in host memory).

Semantics match the reference:
  * rotation: angle ~ U(-degree, degree), bilinear for image / nearest for
    depth, zero fill, same output size (PIL .rotate semantics; implemented
    with jax.scipy.ndimage.map_coordinates — boundary interpolation may
    differ from PIL by a pixel at the edges);
  * random crop to (input_height, input_width) (:191-200);
  * horizontal flip with p=0.5 (:202-207);
  * photometric with p=0.5: gamma U(0.9,1.1), brightness U(0.75,1.25) NYU /
    U(0.9,1.1) KITTI, per-channel color U(0.9,1.1), clip [0,1] (:216-235);
  * ImageNet normalization (:241-291).

All randomness flows from a single key; per-sample keys are split inside,
so results are reproducible given (seed, step).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)
# TF caffe-style stats (tensorflow/bts_dataloader.py:148-153).
CAFFE_MEAN = jnp.array([123.68, 116.78, 103.94], jnp.float32)
CAFFE_SCALE = 0.017


class AugmentParams(NamedTuple):
    angle_deg: jax.Array  # scalar f32
    crop_y: jax.Array  # scalar i32
    crop_x: jax.Array  # scalar i32
    do_flip: jax.Array  # scalar bool
    do_photo: jax.Array  # scalar bool
    gamma: jax.Array
    brightness: jax.Array
    colors: jax.Array  # (3,)


def sample_params(
    key: jax.Array,
    src_h: int,
    src_w: int,
    out_h: int,
    out_w: int,
    degree: float,
    dataset: str,
    do_random_rotate: bool,
) -> AugmentParams:
    ks = jax.random.split(key, 8)
    angle = jnp.where(
        do_random_rotate,
        (jax.random.uniform(ks[0]) - 0.5) * 2.0 * degree,
        0.0,
    )
    crop_y = jax.random.randint(ks[1], (), 0, src_h - out_h + 1)
    crop_x = jax.random.randint(ks[2], (), 0, src_w - out_w + 1)
    do_flip = jax.random.uniform(ks[3]) > 0.5
    do_photo = jax.random.uniform(ks[4]) > 0.5
    gamma = jax.random.uniform(ks[5], minval=0.9, maxval=1.1)
    b_lo, b_hi = (0.75, 1.25) if dataset == "nyu" else (0.9, 1.1)
    brightness = jax.random.uniform(ks[6], minval=b_lo, maxval=b_hi)
    colors = jax.random.uniform(ks[7], (3,), minval=0.9, maxval=1.1)
    return AugmentParams(
        angle, crop_y, crop_x, do_flip, do_photo, gamma, brightness, colors
    )


def rotate_image(img: jax.Array, angle_deg: jax.Array, order: int) -> jax.Array:
    """Rotate (H, W, C) counterclockwise about the center, zero fill.

    Matches PIL Image.rotate geometry: output (x, y) samples input at the
    inverse rotation around the image center (w/2, h/2).
    """
    h, w, _ = img.shape
    # PIL rotates counterclockwise in image coords (y down); the inverse
    # source-sampling map therefore uses +angle here.
    theta = angle_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    x0 = xx - cx
    y0 = yy - cy
    src_x = cos * x0 - sin * y0 + cx
    src_y = sin * x0 + cos * y0 + cy

    def chan(c):
        return jax.scipy.ndimage.map_coordinates(
            c, [src_y, src_x], order=order, mode="constant", cval=0.0
        )

    return jnp.stack([chan(img[..., c]) for c in range(img.shape[-1])], -1)


def apply_augment(
    image: jax.Array,
    depth: jax.Array,
    params: AugmentParams,
    out_h: int,
    out_w: int,
    skip_rotate: bool = False,
    normalization: str = "imagenet",
):
    """Deterministic augmentation of one (H, W, C) sample given params."""
    if not skip_rotate:
        image = rotate_image(image, params.angle_deg, order=1)
        depth = rotate_image(depth, params.angle_deg, order=0)
    image = jax.lax.dynamic_slice(
        image, (params.crop_y, params.crop_x, 0), (out_h, out_w, image.shape[-1])
    )
    depth = jax.lax.dynamic_slice(
        depth, (params.crop_y, params.crop_x, 0), (out_h, out_w, depth.shape[-1])
    )
    image = jnp.where(params.do_flip, image[:, ::-1, :], image)
    depth = jnp.where(params.do_flip, depth[:, ::-1, :], depth)

    aug = image ** params.gamma
    aug = aug * params.brightness
    aug = aug * params.colors[None, None, :]
    aug = jnp.clip(aug, 0.0, 1.0)
    image = jnp.where(params.do_photo, aug, image)

    if normalization == "caffe":
        image = (image * 255.0 - CAFFE_MEAN) * CAFFE_SCALE
    elif normalization == "caffe_unscaled":
        # x0.017 is densenet-only in the TF reference
        # (tensorflow/bts_dataloader.py:151-153).
        image = image * 255.0 - CAFFE_MEAN
    else:
        image = (image - IMAGENET_MEAN) / IMAGENET_STD
    return image, depth


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_h",
        "out_w",
        "degree",
        "dataset",
        "do_random_rotate",
        "normalization",
    ),
)
def augment_batch(
    key: jax.Array,
    images: jax.Array,
    depths: jax.Array,
    out_h: int,
    out_w: int,
    degree: float = 2.5,
    dataset: str = "nyu",
    do_random_rotate: bool = True,
    normalization: str = "imagenet",
):
    """Fused batch augmentation: (B, H, W, 3) raw [0,1] images + (B, H, W, 1)
    depths -> cropped/augmented/normalized (B, out_h, out_w, *)."""
    b, src_h, src_w, _ = images.shape
    keys = jax.random.split(key, b)

    def one(k, img, dep):
        p = sample_params(
            k, src_h, src_w, out_h, out_w, degree, dataset, do_random_rotate
        )
        return apply_augment(
            img,
            dep,
            p,
            out_h,
            out_w,
            skip_rotate=not do_random_rotate,
            normalization=normalization,
        )

    return jax.vmap(one)(keys, images, depths)
