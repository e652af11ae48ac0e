"""Data pipeline tests on a synthetic on-disk dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data import transforms
from bts_tpu.data.loader import EvalLoader, TrainLoader
from bts_tpu.data.manifest import load_manifest, parse_manifest_line


@pytest.fixture
def nyu_dataset(tmp_path):
    """Tiny synthetic NYU-style tree: rgb jpgs + uint16 sync_depth pngs."""
    root = tmp_path / "nyu"
    scene = root / "kitchen_0001"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(7)
    lines = []
    for i in range(6):
        rgb = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        depth = rng.integers(500, 9000, size=(480, 640), dtype=np.uint16)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(depth).save(scene / f"sync_depth_{i:05d}.png")
        lines.append(
            f"kitchen_0001/rgb_{i:05d}.jpg kitchen_0001/sync_depth_{i:05d}.png 518.8579"
        )
    manifest = root / "train_files.txt"
    manifest.write_text("\n".join(lines) + "\n")
    return root, manifest


def _nyu_cfg(root, manifest, **kw):
    return Config(
        dataset="nyu",
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(manifest),
        input_height=128,
        input_width=160,
        batch_size=2,
        do_random_rotate=True,
        degree=2.5,
        **kw,
    )


def test_manifest_parsing():
    e = parse_manifest_line("a/rgb.jpg a/d.png 518.8579")
    assert e.image_path == "a/rgb.jpg" and e.focal == pytest.approx(518.8579)
    e2 = parse_manifest_line(
        "d/im2/0.png d/gt2/0.png 721.5377 d/im3/0.png d/gt3/0.png"
    )
    assert e2.right_image_path == "d/im3/0.png"
    e3 = parse_manifest_line("img.png None 518.8579")
    assert e3.gt_path is None


def test_vendored_official_manifests():
    # The four official split lists are vendored verbatim (data files;
    # reference train_test_inputs/ consumed at pytorch/bts_dataloader.py:99-101).
    # Entry counts as the reference's readlines() sees them (the files have
    # no trailing newline, so `wc -l` undercounts by one for three of them):
    # NYU test = 654 — the reference README's "654 images"
    # (tensorflow/README.md:72) — and Eigen test = 697, the canonical KITTI
    # Eigen split size (652 of which carry gt).
    root = os.path.join(os.path.dirname(__file__), "..", "train_test_inputs")
    expected = {
        "nyudepthv2_train_files_with_gt.txt": 24231,
        "nyudepthv2_test_files_with_gt.txt": 654,
        "eigen_train_files_with_gt.txt": 23158,
        "eigen_test_files_with_gt.txt": 697,
    }
    for name, count in expected.items():
        entries = load_manifest(os.path.join(root, name))
        assert len(entries) == count, name
        assert all(np.isfinite(e.focal) and e.focal > 0 for e in entries)
    # 45 eigen test frames have no gt (literal 'None') — parser maps to None.
    eigen_test = load_manifest(os.path.join(root, "eigen_test_files_with_gt.txt"))
    assert sum(e.gt_path is None for e in eigen_test) == 45
    # Every NYU train line uses the shared NYU focal.
    nyu_train = load_manifest(
        os.path.join(root, "nyudepthv2_train_files_with_gt.txt")
    )
    assert all(e.focal == pytest.approx(518.8579) for e in nyu_train)


def test_train_loader_shapes_and_determinism(nyu_dataset):
    root, manifest = nyu_dataset
    cfg = _nyu_cfg(root, manifest)
    loader = TrainLoader(cfg)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (2, 128, 160, 3)
    assert b["depth"].shape == (2, 128, 160, 1)
    assert b["focal"].shape == (2,)
    # Depth decoded to meters (uint16/1000 for NYU).
    assert 0.4 < b["depth"].max() <= 9.1
    # Deterministic: same seed + epoch -> identical batches.
    batches2 = list(TrainLoader(cfg).epoch(0))
    np.testing.assert_array_equal(b["image"], batches2[0]["image"])
    # Different epoch -> different order/augment.
    batches3 = list(TrainLoader(cfg).epoch(1))
    assert not np.array_equal(b["image"], batches3[0]["image"])


def test_train_loader_sharding_partitions(nyu_dataset):
    root, manifest = nyu_dataset
    cfg = _nyu_cfg(root, manifest)
    l0 = TrainLoader(cfg, num_shards=2, shard_index=0)
    l1 = TrainLoader(cfg, num_shards=2, shard_index=1)
    i0 = set(l0._shard_indices(0).tolist())
    i1 = set(l1._shard_indices(0).tolist())
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(6))


def test_eval_loader_exact_count_sharding(nyu_dataset):
    root, manifest = nyu_dataset
    cfg = _nyu_cfg(root, manifest)
    cfg = cfg.replace(filenames_file_eval=str(manifest), eval_batch_size=4)
    # 6 samples over 4 shards: ranks get 2,2,1,1 — exact, no padding
    # (distributed_sampler_no_evenly_divisible.py semantics).
    counts = [
        len(EvalLoader(cfg, num_shards=4, shard_index=r)) for r in range(4)
    ]
    assert counts == [2, 2, 1, 1]
    loader = EvalLoader(cfg)
    batches = list(loader.batches())
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 480, 640, 3)
    np.testing.assert_array_equal(batches[0]["weight"], [1, 1, 1, 1])
    np.testing.assert_array_equal(batches[1]["weight"], [1, 1, 0, 0])
    assert batches[1]["depths"][0].shape == (480, 640, 1)


def test_normalize_roundtrip(rng):
    img = rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32)
    for style in ("imagenet", "caffe"):
        normed = transforms.normalize_image(img, style)
        back = transforms.denormalize_image(normed, style)
        np.testing.assert_allclose(back, img, rtol=1e-4, atol=1e-5)


def test_kb_crop_geometry():
    box = transforms.kb_crop_box(375, 1242)
    assert box == (13, 23, 13 + 1216, 23 + 352)
    arr = np.zeros((375, 1242, 3), dtype=np.float32)
    assert transforms.apply_kb_crop_array(arr).shape == (352, 1216, 3)


def test_augment_image_bounds(rng):
    img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    out = transforms.augment_image(img, "nyu", np.random.default_rng(0))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_random_crop_bounds(rng):
    img = rng.uniform(0, 1, size=(20, 30, 3)).astype(np.float32)
    depth = rng.uniform(0, 1, size=(20, 30, 1)).astype(np.float32)
    ic, dc = transforms.random_crop(img, depth, 10, 12, np.random.default_rng(1))
    assert ic.shape == (10, 12, 3) and dc.shape == (10, 12, 1)


def test_depth_decode():
    raw = np.array([[1000.0]], dtype=np.float32)
    assert transforms.decode_depth_png(raw, "nyu")[0, 0] == 1.0
    assert transforms.decode_depth_png(np.array([[256.0]]), "kitti")[0, 0] == 1.0
