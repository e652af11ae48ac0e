"""Prediction dumper — the bts_test equivalent.

Reference: pytorch/bts_test.py:84-216 — run inference over a manifest,
write 'result_<model>/raw/*.png' uint16 depth maps (x1000 NYU / x256 KITTI),
plus optional --save_lpg colormap/rgb/gt visualizations, with per-dataset
filename mangling (KITTI drive prefix / NYU scene prefix).

TPU-native: batched jitted forward (vs the reference's batch-1 eager loop).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data.loader import EvalLoader
from bts_tpu.utils.colorize import colorize


def output_name(image_path: str, dataset: str) -> str:
    """Filename mangling (pytorch/bts_test.py:146-160)."""
    parts = image_path.split("/")
    if dataset == "kitti":
        # '<date>/<drive>/image_02/data/<file>' -> '<drive>_<file>'
        drive = parts[-4] if len(parts) >= 4 else parts[0]
        return f"{drive}_{parts[-1]}"
    # NYU: '<scene>/rgb_<idx>.jpg' -> '<scene>_rgb_<idx>'
    return "_".join(parts[-2:]) if len(parts) >= 2 else parts[-1]


def save_depth_png(path: str, depth: np.ndarray, dataset: str):
    """uint16 png at the reference scaling (pytorch/bts_test.py:163-173)."""
    if dataset == "kitti":
        scaled = depth * 256.0
    else:
        scaled = depth * 1000.0
    img = scaled.astype(np.uint16)
    Image.fromarray(img).save(path)


def run_predictions(
    cfg: Config,
    model=None,
    variables=None,
    out_dir: Optional[str] = None,
) -> str:
    """Dump predictions for cfg.filenames_file. Returns the output dir."""
    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.training.checkpoint import load_any_checkpoint
    import jax

    if model is None:
        model = create_model(cfg)
    if variables is None:
        params, stats = init_model(
            model,
            jax.random.key(cfg.seed),
            (1, cfg.input_height, cfg.input_width, 3),
        )
        if cfg.checkpoint_path:
            params, stats = load_any_checkpoint(
                cfg.checkpoint_path, params, stats, cfg=cfg
            )
        variables = {"params": params, "batch_stats": stats}

    loader = EvalLoader(cfg, "test")
    forward_cache: dict = {}

    def full_forward(image, focal):
        h, w = image.shape[1:3]
        ph, pw = (-h) % 32, (-w) % 32
        if ph or pw:
            image = np.pad(
                np.asarray(image), ((0, 0), (0, ph), (0, pw), (0, 0)),
                mode="edge",
            )
        key = image.shape
        if key not in forward_cache:
            forward_cache[key] = jax.jit(
                lambda v, im, f: model.apply(v, im, f, train=False)
            )
        outs = forward_cache[key](variables, image, focal)
        return [o[:, :h, :w] for o in outs]

    out_dir = out_dir or f"result_{cfg.model_name}"
    for sub in ("raw", "cmap", "rgb", "gt"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    normalization = cfg.resolved_normalization  # resolved once

    t0 = time.time()
    n = 0
    for batch in loader.batches():
        lpg8, lpg4, lpg2, reduc1, depth = [
            np.asarray(o) for o in full_forward(batch["image"], batch["focal"])
        ]
        for i, w in enumerate(batch["weight"]):
            if w == 0:
                continue
            entry = batch["entries"][i]
            name = output_name(entry.image_path, cfg.dataset)
            base = os.path.splitext(name)[0] + ".png"
            d = depth[i, :, :, 0]
            save_depth_png(os.path.join(out_dir, "raw", base), d, cfg.dataset)
            if cfg.save_lpg:
                # Colormapped dumps with a 10px border crop
                # (pytorch/bts_test.py:176-214).
                def cmap_save(arr, prefix):
                    c = colorize(
                        np.maximum(arr[10:-10, 10:-10], 1e-6), cmap="Greys"
                    )
                    Image.fromarray(c.transpose(1, 2, 0)).save(
                        os.path.join(out_dir, "cmap", f"{prefix}_{base}")
                    )

                cmap_save(d, "depth")
                cmap_save(lpg8[i, :, :, 0] * cfg.max_depth, "lpg8x8")
                cmap_save(lpg4[i, :, :, 0] * cfg.max_depth, "lpg4x4")
                cmap_save(lpg2[i, :, :, 0] * cfg.max_depth, "lpg2x2")
                cmap_save(
                    np.maximum(reduc1[i, :, :, 0] * cfg.max_depth, 1e-6),
                    "reduc1x1",
                )
                # Denormalized input + (where present) gt visualization
                # (reference rgb/gt dirs, pytorch/bts_test.py:176-214).
                from bts_tpu.data.transforms import denormalize_image

                rgb = np.clip(
                    denormalize_image(
                        np.asarray(batch["image"][i]), normalization
                    ),
                    0,
                    1,
                )
                rgb = rgb[10:-10, 10:-10]
                Image.fromarray((rgb * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, "rgb", base)
                )
                # NYU gt visualization — the reference loads gt straight
                # from the manifest even in test mode (visualization only):
                # /1000, zeros -> max, 10px border crop, log10 + Greys
                # (pytorch/bts_test.py:169-171,190).
                if cfg.dataset == "nyu" and entry.gt_path:
                    gt_file = os.path.join(cfg.data_path, entry.gt_path)
                    if os.path.exists(gt_file):
                        gt = (
                            np.asarray(Image.open(gt_file), dtype=np.float32)
                            / 1000.0
                        )
                        gt[gt == 0] = np.amax(gt)
                        c = colorize(gt[10:-10, 10:-10], cmap="Greys")
                        Image.fromarray(c.transpose(1, 2, 0)).save(
                            os.path.join(out_dir, "gt", base)
                        )
            n += 1
    elapsed = time.time() - t0
    print(
        f"Saved {n} predictions to {out_dir} in {elapsed:.1f}s "
        f"({n / max(elapsed, 1e-9):.1f} img/s)"
    )
    return out_dir
