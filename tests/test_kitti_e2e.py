"""KITTI-path end-to-end: predict -> png dump -> gt reconstruction -> eval.

The NYU twin lives in tests/test_eval_apps.py; this pins the
KITTI-specific behaviors on one synthetic Eigen-style tree:
  * x256 uint16 depth png scaling (pytorch/bts_test.py:163-168),
  * '<drive>_<file>' output mangling (pytorch/bts_test.py:146-153),
  * gt path reconstruction via 'proj_depth/groundtruth/image_02'
    (utils/eval_with_pngs.py:93-110),
  * garg crop + 0-80m clamp protocol,
  * focal scaling x focal/715.0873 (pytorch/bts.py:263-264),
  * --use_right right-camera swap in the train loader
    (pytorch/bts_dataloader.py:99-101).
Images are tiny (64x96, no kb_crop — the kb geometry is unit-tested in
tests/test_data.py / test_loss_metrics.py) so this runs on the CPU mesh.
"""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.models.bts import create_model, init_model

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e

H, W = 64, 96
DRIVE = "2011_09_26_drive_0002_sync"
DATE = "2011_09_26"


@pytest.fixture(scope="module")
def kitti_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("kittidata")
    root = tmp_path / "data"
    img_dir = root / DATE / DRIVE / "image_02" / "data"
    gt_dir = root / DATE / DRIVE / "proj_depth" / "groundtruth" / "image_02"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(11)
    lines = []
    for i in range(4):
        rgb = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        # 2..70 m at the KITTI /256 scaling.
        depth = rng.integers(512, 18000, size=(H, W), dtype=np.uint16)
        Image.fromarray(rgb).save(img_dir / f"{i:010d}.png")
        Image.fromarray(depth).save(gt_dir / f"{i:010d}.png")
        rel_img = f"{DATE}/{DRIVE}/image_02/data/{i:010d}.png"
        rel_gt = f"{DATE}/{DRIVE}/proj_depth/groundtruth/image_02/{i:010d}.png"
        lines.append(f"{rel_img} {rel_gt} 721.5377")
    manifest = root / "files.txt"
    manifest.write_text("\n".join(lines) + "\n")

    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="kitti",
        max_depth=80.0,
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(manifest),
        data_path_eval=str(root),
        gt_path_eval=str(root),
        filenames_file_eval=str(manifest),
        min_depth_eval=1e-3,
        max_depth_eval=80.0,
        garg_crop=True,
        eval_batch_size=2,
        input_height=H,
        input_width=W,
        model_name="tiny_kitti_model",
    )
    model = create_model(cfg)
    params, stats = init_model(model, jax.random.key(0), (1, H, W, 3))
    return cfg, model, {"params": params, "batch_stats": stats}, root, tmp_path


def test_kitti_predict_png_eval_roundtrip(kitti_setup):
    from bts_tpu.apps.predict import run_predictions
    from bts_tpu.evaluation.online import run_online_eval
    from bts_tpu.evaluation.png_eval import eval_pngs

    cfg, model, variables, root, tmp_path = kitti_setup
    out_dir = run_predictions(
        cfg, model, variables, out_dir=str(tmp_path / "preds")
    )
    pngs = sorted(os.listdir(os.path.join(out_dir, "raw")))
    # '<drive>_<file>' mangling.
    assert pngs == [f"{DRIVE}_{i:010d}.png" for i in range(4)]

    # x256 scaling: the png decodes back to the focal-scaled model depth.
    raw0 = np.asarray(
        Image.open(os.path.join(out_dir, "raw", pngs[0])), np.float32
    )
    assert raw0.dtype == np.float32 and raw0.max() > 0
    assert (raw0 / 256.0).max() <= cfg.max_depth + 1e-3

    # gt reconstruction from filenames alone (no explicit gt list).
    cfg_png = cfg.replace(pred_path=os.path.join(out_dir, "raw"))
    measures_png, count = eval_pngs(cfg_png, verbose=False)
    assert count == 4
    measures_online = run_online_eval(model, variables, cfg, verbose=False)
    np.testing.assert_allclose(
        measures_png, measures_online, rtol=2e-2, atol=2e-3
    )
    # Device and host metric paths agree on KITTI + garg crop too.
    measures_host = run_online_eval(
        model, variables, cfg.replace(device_eval=False), verbose=False
    )
    np.testing.assert_allclose(
        measures_online, measures_host, rtol=1e-4, atol=1e-5
    )


def test_kitti_focal_scaling_flows_to_output(kitti_setup):
    """Doubling the focal must double the depth (x focal/715.0873)."""
    cfg, model, variables, _, _ = kitti_setup
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    d1 = model.apply(
        variables, img, np.array([715.0873], np.float32), train=False
    )[4]
    d2 = model.apply(
        variables, img, np.array([1430.1746], np.float32), train=False
    )[4]
    np.testing.assert_allclose(
        np.asarray(d2), 2.0 * np.asarray(d1), rtol=1e-5
    )


def test_use_right_swaps_half_the_samples(kitti_setup):
    """--use_right picks the right-camera pair ~p=0.5 per sample draw
    (pytorch/bts_dataloader.py:99-101)."""
    from bts_tpu.data.loader import TrainLoader

    cfg, _, _, root, tmp_path = kitti_setup
    # Right-camera twins: image_03 with a constant-value image so the
    # loaded pixels reveal which side was chosen.
    img3_dir = root / DATE / DRIVE / "image_03" / "data"
    gt3_dir = root / DATE / DRIVE / "proj_depth" / "groundtruth" / "image_03"
    img3_dir.mkdir(parents=True, exist_ok=True)
    gt3_dir.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(4):
        Image.fromarray(
            np.full((H, W, 3), 255, np.uint8)
        ).save(img3_dir / f"{i:010d}.png")
        Image.fromarray(
            np.full((H, W), 5000, np.uint16)
        ).save(gt3_dir / f"{i:010d}.png")
        rel = f"{DATE}/{DRIVE}"
        lines.append(
            f"{rel}/image_02/data/{i:010d}.png "
            f"{rel}/proj_depth/groundtruth/image_02/{i:010d}.png "
            f"721.5377 "
            f"{rel}/image_03/data/{i:010d}.png "
            f"{rel}/proj_depth/groundtruth/image_03/{i:010d}.png"
        )
    manifest = tmp_path / "right.txt"
    manifest.write_text("\n".join(lines) + "\n")

    cfg_r = cfg.replace(
        filenames_file=str(manifest),
        use_right=True,
        batch_size=1,
        input_height=32,
        input_width=64,
        num_epochs=1,
    )
    loader = TrainLoader(cfg_r)
    # Across several epochs the per-(seed,epoch,index) draws must select
    # BOTH cameras at least once. A right-camera image is all-255 -> after
    # photometric augment + normalization every pixel is identical.
    sides = set()
    for epoch in range(6):
        for batch in loader.epoch(epoch):
            img = batch["image"][0]
            uniform = np.allclose(img, img.reshape(-1, 3)[0], atol=1e-5)
            sides.add("right" if uniform else "left")
    assert sides == {"left", "right"}
