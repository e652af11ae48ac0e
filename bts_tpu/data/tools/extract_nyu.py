"""NYU Depth V2 official-split extraction tool.

Capability parity with utils/extract_official_train_test_set_from_mat.py
(reference D5): converts `nyu_depth_v2_labeled.mat` (+ `splits.mat`) into

    <out>/official_splits/{train,test}/<scene>/rgb_%05d.jpg
    <out>/official_splits/{train,test}/<scene>/sync_depth_%05d.png

with uint16 depth in millimeters and a 7-pixel zeroed image border (the
reference zeroes the border to hide registration artifacts,
extract_official_train_test_set_from_mat.py:73-80).

Implementation is ours: h5py for the v7.3 .mat (the labeled set), scipy.io
for splits.mat, PIL for output.

Usage:
    python -m bts_tpu.data.tools.extract_nyu \
        nyu_depth_v2_labeled.mat splits.mat ./nyu_depth_v2
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

BORDER = 7
DEPTH_SCALE = 1000.0  # meters -> uint16 millimeters


def _scene_name(raw) -> str:
    return "".join(chr(c) for c in np.asarray(raw).ravel())


def extract(labeled_mat: str, splits_mat: str, out_root: str) -> int:
    import h5py
    from scipy.io import loadmat

    splits = loadmat(splits_mat)
    train_idx = set(int(i) for i in np.asarray(splits["trainNdxs"]).ravel())
    test_idx = set(int(i) for i in np.asarray(splits["testNdxs"]).ravel())

    n = 0
    with h5py.File(labeled_mat, "r") as f:
        images = f["images"]  # (N, 3, W, H) in HDF5 order
        depths = f["depths"]  # (N, W, H)
        scenes_refs = f["scenes"][0]
        count = images.shape[0]
        for i in range(count):
            one_based = i + 1
            if one_based in train_idx:
                split = "train"
            elif one_based in test_idx:
                split = "test"
            else:
                continue
            scene = _scene_name(f[scenes_refs[i]][()])
            scene_dir = os.path.join(out_root, "official_splits", split, scene)
            os.makedirs(scene_dir, exist_ok=True)

            # HDF5 stores (3, W, H): transpose to (H, W, 3).
            rgb = np.asarray(images[i]).transpose(2, 1, 0)
            rgb = rgb.copy()
            rgb[:BORDER, :] = 0
            rgb[-BORDER:, :] = 0
            rgb[:, :BORDER] = 0
            rgb[:, -BORDER:] = 0
            Image.fromarray(rgb.astype(np.uint8)).save(
                os.path.join(scene_dir, f"rgb_{i:05d}.jpg")
            )

            depth = np.asarray(depths[i]).T  # (H, W) meters
            depth_mm = np.clip(depth * DEPTH_SCALE, 0, 65535).astype(np.uint16)
            Image.fromarray(depth_mm).save(
                os.path.join(scene_dir, f"sync_depth_{i:05d}.png")
            )
            n += 1
    return n


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print(__doc__)
        return 1
    n = extract(argv[0], argv[1], argv[2])
    print(f"Extracted {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
