"""Heterogeneous-shape eval: every sample scored exactly once.

Reference semantics: the uneven distributed sampler guarantees each eval
sample is seen exactly once (distributed_sampler_no_evenly_divisible.py:
30-40); nothing may be silently dropped. These tests pin:
  * EvalLoader groups mixed-size images into per-shape batches instead of
    crashing np.stack;
  * the device metric path warns + hands shape-mismatched gt back for
    per-sample host scoring instead of silently zero-weighting it;
  * run_online_eval counts every sample once either way.
"""

import numpy as np
import pytest
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data.loader import EvalLoader
from bts_tpu.evaluation.device_eval import pack_gt_batch
from bts_tpu.evaluation.online import run_online_eval


def _make_dataset(root, sizes):
    """Write rgb/depth pairs of the given (h, w) sizes + manifest."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, (h, w) in enumerate(sizes):
        rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        depth = rng.integers(2000, 9000, size=(h, w), dtype=np.uint16)
        Image.fromarray(rgb).save(root / f"rgb_{i:05d}.jpg")
        Image.fromarray(depth).save(root / f"depth_{i:05d}.png")
        lines.append(f"rgb_{i:05d}.jpg depth_{i:05d}.png 518.8579")
    (root / "eval.txt").write_text("\n".join(lines) + "\n")


def _cfg(root, **kw):
    base = dict(
        dataset="nyu",
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(root / "eval.txt"),
        min_depth_eval=1e-3,
        max_depth_eval=10.0,
        eval_batch_size=2,
    )
    base.update(kw)
    return Config(**base)


def test_eval_loader_groups_mixed_shapes(tmp_path):
    # 3 samples at 32x64, 2 at 64x32 — np.stack used to crash on these.
    sizes = [(32, 64), (64, 32), (32, 64), (32, 64), (64, 32)]
    _make_dataset(tmp_path, sizes)
    loader = EvalLoader(_cfg(tmp_path), "online_eval")
    batches = list(loader.batches())
    # Per-shape grouping: every batch is internally homogeneous.
    for b in batches:
        assert b["image"].ndim == 4
    # Every sample appears exactly once across all batches.
    seen = [e.image_path for b in batches for e in b["entries"]]
    assert sorted(seen) == sorted(f"rgb_{i:05d}.jpg" for i in range(5))
    # Real (weight>0) count is exact.
    total = sum(int(b["weight"].sum()) for b in batches)
    assert total == 5


def test_pack_gt_batch_warns_on_mismatch():
    good = np.full((8, 12, 1), 3.0, np.float32)
    bad = np.full((6, 10, 1), 3.0, np.float32)
    with pytest.warns(UserWarning, match="cannot ride the batched"):
        raw, eff, mismatched = pack_gt_batch(
            [good, bad, good], [1.0, 1.0, 1.0], "nyu", pred_shape=(8, 12)
        )
    assert raw.shape == (3, 8, 12)
    np.testing.assert_array_equal(eff, [1.0, 0.0, 1.0])
    assert mismatched == [1]
    # Homogeneous batch: no warning, nothing mismatched.
    raw, eff, mismatched = pack_gt_batch(
        [good, None, good], [1.0, 1.0, 1.0], "nyu", pred_shape=(8, 12)
    )
    assert mismatched == [] and list(eff) == [1.0, 0.0, 1.0]


@pytest.mark.parametrize("device_eval", [True, False])
def test_online_eval_exact_count_mixed_sizes(tmp_path, device_eval):
    # Mixed resolutions: the forward is faked (pred = 3.0 everywhere) so
    # this runs in the quick tier; both metric paths must score all 5
    # samples exactly once and agree on the result.
    sizes = [(32, 64), (64, 32), (32, 64), (32, 64), (64, 32)]
    _make_dataset(tmp_path, sizes)
    cfg = _cfg(tmp_path, device_eval=device_eval)

    def fake_forward(variables, image, focal):
        return np.full(image.shape[:3], 3.0, np.float32)

    measures = run_online_eval(
        None, None, cfg, forward=fake_forward, verbose=False
    )
    assert measures is not None and np.all(np.isfinite(measures))
    # d1/d2/d3 in [0,1]; rms > 0 for random gt vs constant pred.
    assert 0.0 <= measures[6] <= 1.0
    assert measures[3] > 0


@pytest.mark.parametrize("device_eval", [True, False])
def test_online_eval_gt_size_mismatch_warns_not_crashes(
    tmp_path, device_eval
):
    """A sample whose GT png size differs from its image has no defined
    scoring protocol (only the kb re-embed bridges shapes); it must be
    excluded with a LOUD warning — and the other samples' count stays
    exact — rather than crashing the whole eval (which during training
    would kill the run)."""
    _make_dataset(tmp_path, [(32, 64)] * 4)
    # Corrupt sample 2's gt: different resolution from its image.
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(2000, 9000, size=(16, 32), dtype=np.uint16)
    ).save(tmp_path / "depth_00002.png")
    cfg = _cfg(tmp_path, device_eval=device_eval)

    def fake_forward(variables, image, focal):
        return np.full(image.shape[:3], 3.0, np.float32)

    with pytest.warns(UserWarning):
        measures = run_online_eval(
            None, None, cfg, forward=fake_forward, verbose=True
        )
    assert measures is not None and np.all(np.isfinite(measures))
    # 3 scoreable samples, identical result on both metric paths.
    ref_cfg = _cfg(tmp_path, device_eval=not device_eval)
    with pytest.warns(UserWarning):
        ref = run_online_eval(
            None, None, ref_cfg, forward=fake_forward, verbose=False
        )
    np.testing.assert_allclose(measures, ref, rtol=1e-5)


def test_online_eval_all_missing_gt_batch_skips_device_kernel(tmp_path):
    """A batch with no usable gt must not run the device kernel (and must
    not crash): metrics come out of the remaining batches only."""
    _make_dataset(tmp_path, [(32, 64)] * 4)
    # Remove gt for the first batch entirely (samples 0 and 1).
    (tmp_path / "depth_00000.png").unlink()
    (tmp_path / "depth_00001.png").unlink()
    cfg = _cfg(tmp_path, device_eval=True)

    def fake_forward(variables, image, focal):
        return np.full(image.shape[:3], 3.0, np.float32)

    measures = run_online_eval(
        None, None, cfg, forward=fake_forward, verbose=False
    )
    assert measures is not None and np.all(np.isfinite(measures))


def test_online_eval_device_matches_numpy_mixed(tmp_path):
    sizes = [(32, 64), (64, 32), (32, 64), (32, 64), (64, 32)]
    _make_dataset(tmp_path, sizes)

    def fake_forward(variables, image, focal):
        return np.full(image.shape[:3], 3.0, np.float32)

    res = {}
    for device_eval in (True, False):
        cfg = _cfg(tmp_path, device_eval=device_eval)
        res[device_eval] = run_online_eval(
            None, None, cfg, forward=fake_forward, verbose=False
        )
    np.testing.assert_allclose(res[True], res[False], rtol=1e-5)
