"""Data loaders: train / online_eval / test.

TPU-native replacement for the reference's DataLoader stack
(pytorch/bts_dataloader.py:43-76) and its distributed samplers:

  * train: per-host shard of a deterministic per-epoch shuffle (the
    equivalent of DistributedSampler.set_epoch, pytorch/bts_main.py:435-437),
    prefetched batches as NHWC numpy ready for device_put.
  * online_eval: exact-count, no-padding sharding — rank r takes
    indices[r::world] — matching DistributedSamplerNoEvenlyDivisible
    (distributed_sampler_no_evenly_divisible.py:7-72). Batched on device by
    padding with an explicit validity weight instead of dropping samples,
    so metric sums stay exact while the model runs at batch>1 (a TPU-side
    improvement over the reference's batch-1 eval).
  * test: sequential, no shuffle.

IO/augment runs on host threads; compute stays on device.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterator, List, Optional

import numpy as np

from bts_tpu.config import Config
from bts_tpu.data.manifest import ManifestEntry, load_manifest
from bts_tpu.data import transforms


class TrainLoader:
    """Deterministic, sharded, threaded training loader."""

    def __init__(
        self,
        cfg: Config,
        num_shards: int = 1,
        shard_index: int = 0,
        num_workers: Optional[int] = None,
    ):
        self.cfg = cfg
        self.entries = load_manifest(cfg.filenames_file)
        self.num_shards = num_shards
        self.shard_index = shard_index
        # cfg.batch_size is the GLOBAL batch (reference semantics: DDP
        # divides it per worker, pytorch/bts_main.py:351); each process
        # loads its 1/num_shards slice, and the local device mesh consumes
        # it via sharding.
        self.host_batch = max(cfg.batch_size // max(num_shards, 1), 1)
        self.num_workers = num_workers or max(cfg.num_threads, 1)
        # Resolved ONCE: 'auto' stats the --pretrained_model path, and the
        # style must not flip mid-run if that file moves (nor cost two
        # fstats per sample on the worker threads).
        self.normalization = cfg.resolved_normalization

    def __len__(self):
        return len(self.entries)

    def steps_per_epoch(self) -> int:
        """Floor division = drop the final partial batch each epoch.

        Deliberate deviation from the reference (DataLoader drop_last=False,
        i.e. ceil): jit needs fixed batch shapes, and padding the training
        batch would bias BN batch stats. With 24k+ samples the effect on
        num_total_steps — and therefore on the poly-LR horizon
        (pytorch/bts_main.py:456-458) — is < 0.01%. Eval loaders DO pad
        with a validity weight so metric counts stay exact.
        """
        return len(self._shard_indices(0)) // self.host_batch

    def _shard_indices(self, epoch: int) -> np.ndarray:
        """Per-epoch deterministic shuffle, then per-host contiguous shard
        (same semantics as DistributedSampler with set_epoch)."""
        order = np.random.default_rng(self.cfg.seed + epoch).permutation(
            len(self.entries)
        )
        return order[self.shard_index :: self.num_shards]

    def _load_one(self, entry: ManifestEntry, rng: np.random.Generator):
        cfg = self.cfg
        image_path = entry.image_path
        depth_path = entry.gt_path
        # KITTI --use_right: 50% chance to swap to the right-camera pair
        # (pytorch/bts_dataloader.py:99-101).
        if (
            cfg.dataset == "kitti"
            and cfg.use_right
            and entry.right_image_path is not None
            and rng.random() > 0.5
        ):
            image_path = entry.right_image_path
            depth_path = entry.right_gt_path
        if cfg.device_augment:
            # Host does decode + static crops + rotation; crop/flip/
            # photometric/normalize run fused on-device
            # (bts_tpu/data/device_augment.py).
            image, depth = transforms.load_raw_train_sample(
                os.path.join(cfg.data_path, image_path),
                os.path.join(cfg.gt_path, depth_path),
                cfg.dataset,
                rng,
                do_kb_crop=cfg.do_kb_crop,
                do_random_rotate=cfg.do_random_rotate,
                degree=cfg.degree,
            )
        else:
            image, depth = transforms.load_train_sample(
                os.path.join(cfg.data_path, image_path),
                os.path.join(cfg.gt_path, depth_path),
                cfg.dataset,
                cfg.input_height,
                cfg.input_width,
                rng,
                do_kb_crop=cfg.do_kb_crop,
                do_random_rotate=cfg.do_random_rotate,
                degree=cfg.degree,
                normalization=self.normalization,
            )
        return image, depth, np.float32(entry.focal)

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield batches {'image' (B,H,W,3), 'depth' (B,H,W,1), 'focal' (B,)}."""
        idx = self._shard_indices(epoch)
        n_batches = len(idx) // self.host_batch
        with cf.ThreadPoolExecutor(self.num_workers) as pool:

            def submit(i):
                entry = self.entries[idx[i]]
                rng = np.random.default_rng(
                    (self.cfg.seed, epoch, int(idx[i]))
                )
                return pool.submit(self._load_one, entry, rng)

            window = self.host_batch * 2
            futures = [submit(i) for i in range(min(window, n_batches * self.host_batch))]
            next_submit = len(futures)
            for b in range(n_batches):
                batch_futs = futures[b * self.host_batch : (b + 1) * self.host_batch]
                results = [f.result() for f in batch_futs]
                while next_submit < n_batches * self.host_batch and len(
                    futures
                ) < (b + 1) * self.host_batch + window:
                    futures.append(submit(next_submit))
                    next_submit += 1
                images, depths, focals = zip(*results)
                yield {
                    "image": np.stack(images),
                    "depth": np.stack(depths),
                    "focal": np.stack(focals),
                }


class EvalLoader:
    """Exact-count eval loader with uneven sharding (no padding of the
    per-rank index set; batch padding carries a weight=0 flag)."""

    def __init__(
        self,
        cfg: Config,
        mode: str = "online_eval",
        num_shards: int = 1,
        shard_index: int = 0,
        batch_size: Optional[int] = None,
    ):
        self.cfg = cfg
        self.mode = mode
        manifest = (
            cfg.filenames_file_eval
            if mode == "online_eval" and cfg.filenames_file_eval
            else cfg.filenames_file
        )
        self.entries = load_manifest(manifest)
        # Rank r takes indices[r::world] — exact-count semantics of
        # distributed_sampler_no_evenly_divisible.py:30-40.
        self.indices: List[int] = list(
            range(shard_index, len(self.entries), num_shards)
        )
        self.batch_size = batch_size or max(cfg.eval_batch_size, 1)
        self.normalization = cfg.resolved_normalization  # resolved once

    def __len__(self):
        return len(self.indices)

    def _data_root(self):
        cfg = self.cfg
        if self.mode == "online_eval":
            return (
                cfg.data_path_eval or cfg.data_path,
                cfg.gt_path_eval or cfg.gt_path,
            )
        return cfg.data_path, cfg.gt_path

    def samples(self) -> Iterator[dict]:
        """Yield single samples {'image', 'depth' (or None), 'focal',
        'entry'} — image normalized NHW3, depth in meters HW1."""
        data_root, gt_root = self._data_root()
        cfg = self.cfg
        for i in self.indices:
            entry = self.entries[i]
            gt_path = (
                os.path.join(gt_root, entry.gt_path)
                if (entry.gt_path and self.mode == "online_eval")
                else None
            )
            image, depth = transforms.load_eval_sample(
                os.path.join(data_root, entry.image_path),
                gt_path,
                cfg.dataset,
                do_kb_crop=cfg.do_kb_crop,
                normalization=self.normalization,
            )
            yield {
                "image": image,
                "depth": depth,
                "focal": np.float32(entry.focal),
                "entry": entry,
            }

    def batches(self) -> Iterator[dict]:
        """Yield fixed-shape batches with a validity 'weight' vector; the
        final partial batch is padded (weight 0) so jit sees one shape.

        Samples are grouped by image shape: NYU / kb-cropped KITTI are
        homogeneous (one group, order preserved), but a mixed-size manifest
        must not crash the np.stack below or silently drop samples — every
        sample is yielded exactly once, in a batch of its own shape group
        (reference exact-count semantics,
        distributed_sampler_no_evenly_divisible.py:30-40).
        """
        bs = self.batch_size
        bufs: dict = {}  # image shape -> buffered samples
        for s in self.samples():
            buf = bufs.setdefault(s["image"].shape, [])
            buf.append(s)
            if len(buf) == bs:
                yield self._collate(buf, bs)
                buf.clear()
        for buf in bufs.values():
            if buf:
                yield self._collate(buf, bs)

    @staticmethod
    def _collate(buf: List[dict], bs: int) -> dict:
        n = len(buf)
        image = np.stack([s["image"] for s in buf])
        if n < bs:
            pad = np.repeat(image[-1:], bs - n, axis=0)
            image = np.concatenate([image, pad])
        focal = np.array(
            [s["focal"] for s in buf] + [buf[-1]["focal"]] * (bs - n),
            dtype=np.float32,
        )
        weight = np.array([1.0] * n + [0.0] * (bs - n), dtype=np.float32)
        depths = [s["depth"] for s in buf] + [buf[-1]["depth"]] * (bs - n)
        return {
            "image": image,
            "focal": focal,
            "weight": weight,
            "depths": depths,
            "entries": [s["entry"] for s in buf],
        }
