"""Integration tests: online eval, prediction dump, PNG eval, offline
ledger/watcher, sequence runner, live3d numeric pipeline."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.models.bts import create_model, init_model

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e

H, W = 64, 96  # tiny eval resolution (stride-32 divisible)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Synthetic NYU-style eval dataset + a tiny initialized model."""
    tmp_path = tmp_path_factory.mktemp("evaldata")
    root = tmp_path / "data"
    scene = root / "kitchen_0001"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(5)
    lines = []
    for i in range(5):
        rgb = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        depth = rng.integers(500, 9000, size=(H, W), dtype=np.uint16)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(depth).save(scene / f"sync_depth_{i:05d}.png")
        lines.append(
            f"kitchen_0001/rgb_{i:05d}.jpg kitchen_0001/sync_depth_{i:05d}.png 518.8579"
        )
    manifest = root / "files.txt"
    manifest.write_text("\n".join(lines) + "\n")

    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="nyu",
        max_depth=10.0,
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(manifest),
        data_path_eval=str(root),
        gt_path_eval=str(root),
        filenames_file_eval=str(manifest),
        min_depth_eval=1e-3,
        max_depth_eval=10.0,
        eval_batch_size=2,
        input_height=H,
        input_width=W,
        model_name="tiny_eval_model",
    )
    model = create_model(cfg)
    params, stats = init_model(model, jax.random.key(0), (1, H, W, 3))
    variables = {"params": params, "batch_stats": stats}
    return cfg, model, variables, root, tmp_path


def test_online_eval(tiny_setup):
    from bts_tpu.evaluation.online import run_online_eval

    cfg, model, variables, _, _ = tiny_setup
    measures = run_online_eval(model, variables, cfg, verbose=False)
    assert measures is not None and measures.shape == (9,)
    assert np.all(np.isfinite(measures))
    # d-metrics in [0,1]; rms positive for a random model.
    assert 0 <= measures[6] <= 1 and measures[3] > 0


def test_device_eval_matches_numpy_protocol(tiny_setup):
    """The on-device batched metric path (device_eval.py) reproduces the
    per-sample numpy protocol path (VERDICT r2 #4: identical metrics)."""
    from bts_tpu.evaluation.online import run_online_eval

    cfg, model, variables, _, _ = tiny_setup
    dev = run_online_eval(
        model, variables, cfg.replace(device_eval=True), verbose=False
    )
    host = run_online_eval(
        model, variables, cfg.replace(device_eval=False), verbose=False
    )
    # Device math is f32 (the collective payload dtype); numpy is f64.
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)

    # Same check under the eigen crop (exercises the static crop mask).
    cfg_crop = cfg.replace(eigen_crop=True)
    dev = run_online_eval(
        model, variables, cfg_crop.replace(device_eval=True), verbose=False
    )
    host = run_online_eval(
        model, variables, cfg_crop.replace(device_eval=False), verbose=False
    )
    if host is not None and dev is not None and np.all(np.isfinite(host)):
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_predict_and_png_eval_roundtrip(tiny_setup):
    from bts_tpu.apps.predict import run_predictions
    from bts_tpu.evaluation.online import run_online_eval
    from bts_tpu.evaluation.png_eval import eval_pngs

    cfg, model, variables, root, tmp_path = tiny_setup
    out_dir = run_predictions(
        cfg.replace(save_lpg=True), model, variables,
        out_dir=str(tmp_path / "preds"),
    )
    pngs = sorted(os.listdir(os.path.join(out_dir, "raw")))
    assert len(pngs) == 5
    assert pngs[0].startswith("kitchen_0001_rgb_")
    # --save_lpg on NYU populates the gt/ visualization dir from the
    # manifest even in test mode (pytorch/bts_test.py:169-171,190).
    assert sorted(os.listdir(os.path.join(out_dir, "gt"))) == pngs
    assert len(os.listdir(os.path.join(out_dir, "rgb"))) == 5

    # PNG eval over the dumped predictions must match online eval closely
    # (only uint16 quantization differs).
    pred_files = [os.path.join(out_dir, "raw", p) for p in pngs]
    gt_files = [
        os.path.join(root, "kitchen_0001", f"sync_depth_{i:05d}.png")
        for i in range(5)
    ]
    cfg_png = cfg.replace(pred_path=os.path.join(out_dir, "raw"))
    measures_png, count = eval_pngs(
        cfg_png, pred_files, gt_files, verbose=False
    )
    assert count == 5
    measures_online = run_online_eval(model, variables, cfg, verbose=False)
    np.testing.assert_allclose(measures_png, measures_online, rtol=2e-2, atol=2e-3)


def test_png_eval_gt_path_reconstruction(tiny_setup):
    from bts_tpu.evaluation.png_eval import gt_path_for_pred

    cfg, *_ = tiny_setup
    p = gt_path_for_pred("/x/kitchen_0001_rgb_00003.png", cfg)
    assert p == os.path.join(
        cfg.gt_path, "kitchen_0001", "sync_depth_00003.png"
    )


def test_offline_ledger_and_watcher(tiny_setup):
    from bts_tpu.evaluation.offline import (
        append_ledger,
        evaluate_pending,
        pending_checkpoints,
        read_ledger,
    )
    from bts_tpu.training.checkpoint import save_params_only

    cfg, model, variables, root, tmp_path = tiny_setup
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_params_only(
        os.path.join(ckpt_dir, "model-100"),
        variables["params"],
        variables["batch_stats"],
    )
    save_params_only(
        os.path.join(ckpt_dir, "model-200"),
        variables["params"],
        variables["batch_stats"],
    )
    # Maturity guard: fresh checkpoints are skipped with a 60s guard
    # (tensorflow/bts_eval.py:143-150 behavior).
    assert pending_checkpoints(ckpt_dir, maturity_secs=3600) == {}
    pend = pending_checkpoints(ckpt_dir, maturity_secs=0.0)
    assert sorted(pend) == [100, 200]

    append_ledger(ckpt_dir, 100)
    pend = pending_checkpoints(ckpt_dir, maturity_secs=0.0)
    assert sorted(pend) == [200]
    assert read_ledger(ckpt_dir) == [100]

    results = evaluate_pending(cfg, ckpt_dir, maturity_secs=0.0)
    assert sorted(results) == [200]
    assert read_ledger(ckpt_dir) == [100, 200]
    # Idempotent: nothing pending now.
    assert evaluate_pending(cfg, ckpt_dir, maturity_secs=0.0) == {}


def test_sequence_runner(tiny_setup, tmp_path):
    from bts_tpu.apps.sequence import run_sequence, sequence_focal

    cfg, model, variables, root, _ = tiny_setup
    assert sequence_focal(cfg.replace(dataset="kitti")) == 718.856
    assert sequence_focal(cfg.replace(focal=300.0)) == 300.0

    img_dir = tmp_path / "seq"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    # Non-multiple-of-32 size exercises the padding path.
    Image.fromarray(
        rng.integers(0, 255, size=(70, 100, 3), dtype=np.uint8)
    ).save(img_dir / "frame0.png")
    n = run_sequence(cfg, str(img_dir), model=model, variables=variables)
    assert n == 1
    outs = os.listdir(img_dir / "out")
    assert {f.split("_", 1)[1] for f in outs} == {
        "depth.png", "lpg8x8.png", "lpg4x4.png", "lpg2x2.png"
    }


def test_live3d_numeric_pipeline(tiny_setup):
    from bts_tpu.apps.live3d import (
        frame_to_cloud,
        make_depth_fn,
        pixel_rays,
        sobel_edge_mask,
        unproject,
    )

    cfg, model, variables, *_ = tiny_setup
    rays = pixel_rays(4, 6, focal=100.0)
    assert rays.shape == (4, 6, 3)
    np.testing.assert_allclose(rays[..., 2], 1.0)
    # Unprojection scales rays by depth.
    depth = np.full((4, 6), 2.0, np.float32)
    pts = unproject(depth, rays)
    np.testing.assert_allclose(pts[..., 2], 2.0)

    # Edge mask: a step discontinuity is masked out, flat regions kept.
    d = np.ones((8, 8), np.float32)
    d[:, 4:] = 5.0
    mask = sobel_edge_mask(d, threshold=0.3)
    assert mask[0, 0] and mask[7, 7]
    assert not mask[4, 4]  # at the step

    depth_fn = make_depth_fn(cfg, model, variables)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(H + 5, W + 7, 3), dtype=np.uint8)
    points, colors = frame_to_cloud(frame, depth_fn)
    assert points.shape[1] == 3 and colors.shape[1] == 3
    assert len(points) == len(colors) > 0


def test_snapshot_roundtrip(tmp_path):
    from bts_tpu.training.snapshot import snapshot_run, use_snapshot

    cfg = Config(log_directory=str(tmp_path), model_name="snap_test")
    run_dir = snapshot_run(cfg)
    assert os.path.exists(os.path.join(run_dir, "arguments.txt"))
    assert os.path.exists(
        os.path.join(run_dir, "bts_tpu", "ops", "lpg.py")
    )
    use_snapshot(run_dir)
    import sys

    assert run_dir in sys.path
    sys.path.remove(run_dir)


def test_reproduce_runbook_metric_check():
    """scripts/reproduce_reference.py gate logic: published-number lookup,
    tolerance comparison, and the miss path."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reproduce_reference",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "reproduce_reference.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Synthesize a measured vector that matches the published densenet161
    # NYU row exactly -> PASS.
    measures = np.zeros(9)
    measures[mod.METRIC_INDEX["d1"]] = 0.885
    measures[mod.METRIC_INDEX["abs_rel"]] = 0.110
    ok, lines = mod.check_metrics(measures, "densenet161_bts", "nyu", "pt", 0.002)
    assert ok and len(lines) == 2
    # Off by more than the tolerance -> FAIL.
    measures[mod.METRIC_INDEX["d1"]] = 0.880
    ok, _ = mod.check_metrics(measures, "densenet161_bts", "nyu", "pt", 0.002)
    assert not ok
    # Within tolerance -> PASS.
    measures[mod.METRIC_INDEX["d1"]] = 0.8845
    ok, _ = mod.check_metrics(measures, "densenet161_bts", "nyu", "pt", 0.002)
    assert ok
    # TF zoo rows exist for both datasets.
    measures[mod.METRIC_INDEX["d1"]] = 0.886
    ok, _ = mod.check_metrics(measures, "densenet161_bts", "nyu", "tf", 0.002)
    assert ok
    # Unknown row reports, does not crash.
    ok, lines = mod.check_metrics(measures, "mobilenetv2_bts", "nyu", "pt", 0.002)
    assert not ok and "no published number" in lines[0]
