"""Fixture tests for the dataset tooling (SURVEY.md D5/D6/L1).

Synthetic trees stand in for the real datasets (data-gated environment):
a 2-frame v7.3-style .mat for the NYU extractor, a raw r-*.ppm/d-*.pgm
scene for the sync tool, and a miniature KITTI raw+gt tree for the
manifest generator.
"""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from bts_tpu.data.manifest import load_manifest
from bts_tpu.data.tools.extract_nyu import extract
from bts_tpu.data.tools.make_manifests import (
    kitti_manifest,
    nyu_manifest,
    sync_nyu_raw,
)

H, W = 480, 640


@pytest.fixture
def nyu_mat(tmp_path):
    """Synthetic nyu_depth_v2_labeled.mat (+ splits.mat), 2 frames."""
    import h5py
    from scipy.io import savemat

    labeled = tmp_path / "labeled.mat"
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(2, 3, W, H), dtype=np.uint8)
    depths = rng.uniform(0.7, 9.5, size=(2, W, H)).astype(np.float32)
    with h5py.File(labeled, "w") as f:
        f["images"] = images
        f["rawDepths"] = depths
        # MATLAB cell array of strings: (1, N) object refs to char-code arrays.
        refs = []
        for i, name in enumerate(("bathroom", "kitchen")):
            ds = f.create_dataset(
                f"#refs#/{i}",
                data=np.array([[ord(c)] for c in name], dtype=np.uint16),
            )
            refs.append(ds.ref)
        f.create_dataset(
            "sceneTypes",
            data=np.array([refs], dtype=object),
            dtype=h5py.ref_dtype,
        )
    splits = tmp_path / "splits.mat"
    savemat(splits, {"trainNdxs": [[1]], "testNdxs": [[2]]})
    return str(labeled), str(splits), images, depths


def test_extract_nyu_fixture(tmp_path, nyu_mat):
    labeled, splits, images, depths = nyu_mat
    out = str(tmp_path / "official_splits")
    n = extract(labeled, splits, out)
    assert n == 2
    train_rgb = os.path.join(out, "train", "bathroom", "rgb_00000.jpg")
    test_rgb = os.path.join(out, "test", "kitchen", "rgb_00001.jpg")
    test_depth = os.path.join(out, "test", "kitchen", "sync_depth_00001.png")
    assert os.path.exists(train_rgb) and os.path.exists(test_rgb)

    # Depth png is lossless: must equal (rawDepths.T * 1000) as uint16.
    got = np.asarray(Image.open(test_depth))
    want = (depths[1].T * 1000).astype(np.uint16)
    assert got.shape == (H, W)
    np.testing.assert_array_equal(got, want)

    # The reference's asymmetric zero border: rows [0,7)+[474,480),
    # cols [0,7)+[632,640) (extract_official_train_test_set_from_mat.py:61-63).
    # JPEG ringing bleeds a little into the zeroed border; assert it is
    # far darker than the (noise, mean~127) interior rather than exactly 0.
    rgb = np.asarray(Image.open(test_rgb)).astype(np.int32)
    assert rgb.shape == (H, W, 3)
    interior = rgb[7:474, 7:632].mean()
    assert interior > 50  # interior survived
    for border in (rgb[:7], rgb[474:], rgb[:, :7], rgb[:, 632:]):
        assert border.mean() < interior / 4


def test_nyu_manifest_from_extracted_tree(tmp_path, nyu_mat):
    labeled, splits, _, _ = nyu_mat
    out = str(tmp_path / "official_splits")
    extract(labeled, splits, out)
    lines = nyu_manifest(out, "test")
    assert lines == [
        "kitchen/rgb_00001.jpg kitchen/sync_depth_00001.png 518.8579"
    ]
    # Generated lines parse with the production manifest loader.
    mf = tmp_path / "m.txt"
    mf.write_text("\n".join(lines) + "\n")
    entries = load_manifest(str(mf))
    assert entries[0].focal == pytest.approx(518.8579)


def _write_pgm16(path, arr):
    """NYU raw depth format: 16-bit big-endian binary PGM (P5)."""
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n65535\n".encode())
        f.write(struct.pack(f">{h * w}H", *arr.ravel().tolist()))


def test_sync_nyu_raw_fixture(tmp_path):
    scene = tmp_path / "basement_0001a"
    scene.mkdir()
    rng = np.random.default_rng(1)
    n_frames, h, w = 15, 12, 16
    for i in range(n_frames):
        t = 1300000000.0 + i * 0.1
        rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(scene / f"r-{t:.6f}-{i}.ppm")
        # Kinect disparity for depths ~2m: d_raw = 1092.5 - 351.3/z.
        draw = np.full((h, w), int(1092.5 - 351.3 / 2.0), dtype=np.uint16)
        _write_pgm16(scene / f"d-{t + 0.02:.6f}-{i}.pgm", draw)
    out = tmp_path / "sync"
    n = sync_nyu_raw(str(scene), str(out))
    # sample_step=7 over 15 depth frames -> indices 0, 7, 14.
    assert n == 3
    for i in range(3):
        assert (out / f"rgb_{i:05d}.jpg").exists()
        depth = np.asarray(Image.open(out / f"sync_depth_{i:05d}.png"))
        assert depth.shape == (h, w)
        # 351.3/(1092.5 - d_raw) should land close to 2m (mm units).
        valid = depth[depth > 0]
        assert valid.size and abs(valid.mean() - 2000) < 30


def test_kitti_manifest_fixture(tmp_path):
    raw = tmp_path / "raw"
    gt = tmp_path / "gt"
    date, drive = "2011_09_26", "2011_09_26_drive_0002_sync"
    for cam in ("image_02", "image_03"):
        d = raw / date / drive / cam / "data"
        d.mkdir(parents=True)
        Image.new("RGB", (8, 4)).save(d / "0000000005.png")
    (raw / date / "calib_cam_to_cam.txt").write_text(
        "P_rect_01: 1.0 0 0 0\nP_rect_02: 721.5377 0.0 609.5593 44.857\n"
    )
    g = gt / "train" / drive / "proj_depth" / "groundtruth"
    for cam in ("image_02", "image_03"):
        (g / cam).mkdir(parents=True)
        Image.fromarray(np.zeros((4, 8), np.uint16)).save(
            g / cam / "0000000005.png"
        )
    lines = kitti_manifest(str(raw), str(gt), use_right=True)
    assert len(lines) == 1
    parts = lines[0].split()
    assert parts[0] == f"{date}/{drive}/image_02/data/0000000005.png"
    assert parts[1] == f"train/{drive}/proj_depth/groundtruth/image_02/0000000005.png"
    assert float(parts[2]) == pytest.approx(721.5377)
    assert parts[3] == f"{date}/{drive}/image_03/data/0000000005.png"
    assert parts[4].endswith("image_03/0000000005.png")
    # Same 5-field format the loader consumes for --use_right
    # (pytorch/bts_dataloader.py:99-104).
    mf = tmp_path / "m.txt"
    mf.write_text(lines[0] + "\n")
    e = load_manifest(str(mf))[0]
    assert e.right_image_path == parts[3]


# --------- archive-list parity vs the reference download lists ---------

REF_UTILS = "/root/reference/utils"
REPO_SPLITS = os.path.join(os.path.dirname(__file__), "..", "train_test_inputs")


def test_kitti_archive_urls_match_reference_list():
    """The derived per-manifest archive sets, unioned over the official
    eigen train+test splits, must reproduce the reference's 66-archive
    aria2c list (utils/kitti_archives_to_download.txt) exactly."""
    from bts_tpu.data.tools.download import kitti_archives_for_manifest

    urls = set()
    for mf in ("eigen_train_files_with_gt.txt", "eigen_test_files_with_gt.txt"):
        urls |= set(
            kitti_archives_for_manifest(os.path.join(REPO_SPLITS, mf))
        )
    ref = [
        line.strip()
        for line in open(os.path.join(REF_UTILS, "kitti_archives_to_download.txt"))
        if line.strip()
    ]
    assert len(ref) == 66
    assert sorted(urls) == sorted(ref)


def test_nyu_archive_urls_match_reference_list():
    """nyu_archive_urls() is byte-equal (content and order) to the
    reference's utils/nyudepthv2_archives_to_download.txt."""
    from bts_tpu.data.tools.download import nyu_archive_urls

    ref = [
        line.strip()
        for line in open(
            os.path.join(REF_UTILS, "nyudepthv2_archives_to_download.txt")
        )
        if line.strip()
    ]
    assert nyu_archive_urls() == ref
