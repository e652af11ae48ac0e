"""Directory-of-images batch inference — the bts_sequence equivalent.

Reference: tensorflow/bts_sequence.py:59-187 — glob '*.png'/'*.jpg' from a
directory, fixed per-dataset focal (NYU 518.8579 / KITTI 718.856 / --focal
for custom), run the model, dump depth + all LPG scales as colormapped pngs.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data.transforms import normalize_image
from bts_tpu.utils.colorize import colorize

DEFAULT_FOCALS = {"nyu": 518.8579, "kitti": 718.856}


def sequence_focal(cfg: Config) -> float:
    if cfg.focal > 0:
        return cfg.focal
    return DEFAULT_FOCALS.get(cfg.dataset, 518.8579)


def _pad_to_multiple(img: np.ndarray, mult: int = 32):
    """Pad H,W up to a multiple of 32 so the encoder strides divide evenly;
    returns (padded, (H, W)) for cropping the outputs back."""
    h, w = img.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return img, (h, w)


def run_sequence(
    cfg: Config,
    image_dir: str,
    out_dir: Optional[str] = None,
    model=None,
    variables=None,
) -> int:
    """Process every image in image_dir; returns the number processed."""
    import jax

    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.training.checkpoint import load_any_checkpoint

    if model is None:
        model = create_model(cfg)
    if variables is None:
        params, stats = init_model(model, jax.random.key(cfg.seed), (1, 64, 96, 3))
        if cfg.checkpoint_path:
            params, stats = load_any_checkpoint(
                cfg.checkpoint_path, params, stats, cfg=cfg
            )
        variables = {"params": params, "batch_stats": stats}

    out_dir = out_dir or os.path.join(image_dir, "out")
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(
        glob.glob(os.path.join(image_dir, "*.png"))
        + glob.glob(os.path.join(image_dir, "*.jpg"))
    )
    focal = sequence_focal(cfg)
    normalization = cfg.resolved_normalization  # resolved once
    cache: dict = {}

    def forward(image, f):
        key = image.shape
        if key not in cache:
            cache[key] = jax.jit(
                lambda v, im, fo: model.apply(v, im, fo, train=False)
            )
        return cache[key](variables, image, f)

    n = 0
    for path in files:
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        img = normalize_image(img, normalization)
        img, (h, w) = _pad_to_multiple(img)
        outs = forward(img[None], np.array([focal], np.float32))
        lpg8, lpg4, lpg2, _, depth = [np.asarray(o)[0, :h, :w, 0] for o in outs]
        base = os.path.splitext(os.path.basename(path))[0]
        for name, arr in (
            ("depth", depth),
            ("lpg8x8", lpg8 * cfg.max_depth),
            ("lpg4x4", lpg4 * cfg.max_depth),
            ("lpg2x2", lpg2 * cfg.max_depth),
        ):
            c = colorize(np.maximum(arr, 1e-6), cmap="Greys")
            Image.fromarray(c.transpose(1, 2, 0)).save(
                os.path.join(out_dir, f"{base}_{name}.png")
            )
        n += 1
    return n
