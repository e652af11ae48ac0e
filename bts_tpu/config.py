"""Configuration / flag system.

Covers the reference's argparse surface so its experiment files carry over
unchanged: same flag names, ``@argfile`` support, and the single-positional-
argument-is-an-args-file convention (reference: pytorch/bts_main.py:49-120,
tensorflow/bts.py:31-38 namedtuple, arguments_train_*.txt files).

TPU-specific additions (mesh shape, precision, batched eval) are new flags
with defaults that reproduce reference behavior when unset.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional, Sequence


@dataclasses.dataclass
class Config:
    """All experiment configuration. Field names mirror reference flags."""

    # Mode / identity
    mode: str = "train"
    model_name: str = "bts_eigen_v2"
    encoder: str = "densenet161_bts"

    # Dataset
    dataset: str = "nyu"  # 'nyu' | 'kitti'
    data_path: str = ""
    gt_path: str = ""
    filenames_file: str = ""
    input_height: int = 480
    input_width: int = 640
    max_depth: float = 10.0

    # Log and save
    log_directory: str = ""
    checkpoint_path: str = ""
    # Warm-start from a torch checkpoint / torchvision state dict via the
    # weight converter (TF equivalent: --pretrained_model name-intersection
    # warm start, tensorflow/bts_main.py:95-123,228-232).
    pretrained_model: str = ""
    log_freq: int = 100
    save_freq: int = 500
    # Retain at most N periodic 'model-{step}' checkpoints (0 = unlimited;
    # TF twin used Saver(max_to_keep=200), tensorflow/bts_main.py:214).
    max_to_keep: int = 200

    # Training
    fix_first_conv_blocks: bool = False
    fix_first_conv_block: bool = False
    bn_no_track_stats: bool = False
    weight_decay: float = 1e-2
    bts_size: int = 512
    retrain: bool = False
    adam_eps: float = 1e-6
    batch_size: int = 4
    num_epochs: int = 50
    learning_rate: float = 1e-4
    end_learning_rate: float = -1.0
    variance_focus: float = 0.85

    # Preprocessing
    do_random_rotate: bool = False
    degree: float = 2.5
    do_kb_crop: bool = False
    use_right: bool = False
    # Input normalization: 'imagenet' (torchvision convention, the PT
    # pipeline, pytorch/bts_dataloader.py:244) | 'caffe' (TF convention:
    # x255 - mean, x0.017, tensorflow/bts_dataloader.py:148-153) | 'auto'
    # (caffe when --pretrained_model is a TF checkpoint — the reference's
    # ImageNet slim weights assume caffe statistics — else imagenet).
    normalization: str = "auto"

    # Multi-device (reference: --num_threads/--world_size/...; here: one
    # JAX process per host, SPMD over the mesh instead of mp.spawn+NCCL)
    num_threads: int = 1
    world_size: int = 1
    rank: int = 0
    dist_url: str = ""
    dist_backend: str = ""
    gpu: Optional[int] = None
    multiprocessing_distributed: bool = False

    # Online eval
    do_online_eval: bool = False
    data_path_eval: str = ""
    gt_path_eval: str = ""
    filenames_file_eval: str = ""
    min_depth_eval: float = 1e-3
    max_depth_eval: float = 80.0
    eigen_crop: bool = False
    garg_crop: bool = False
    eval_freq: int = 500
    eval_summary_directory: str = ""

    # Test / eval-script flags (reference: bts_test.py / bts_eval.py args)
    save_lpg: bool = False
    pred_path: str = ""
    min_depth: float = 1e-3  # eval_with_pngs naming
    focal: float = -1.0  # bts_sequence custom focal

    # --- TPU-native additions (no reference equivalent) ---
    # Device mesh: number of data-parallel shards; 0 = all local devices.
    num_devices: int = 0
    mesh_axis_name: str = "data"
    # Compute precision: 'bfloat16' keeps params fp32, computes in bf16.
    compute_dtype: str = "float32"
    # Batched evaluation/inference (reference is batch-1).
    eval_batch_size: int = 1
    # On-device batched metrics for online eval (predictions never leave
    # the device; only a 10-float accumulator is read back). --no-device_eval
    # falls back to the per-sample numpy protocol path.
    device_eval: bool = True
    # RNG seed for init + data augmentation.
    seed: int = 42
    # LPG kernel implementation: auto | xla | pallas | ffi
    lpg_impl: str = "auto"
    # Which reference twin's graph to build: 'pt' (PyTorch reference,
    # default), 'tf' (the TF twin, tensorflow/bts.py — decoder conv
    # biases, theta=pi/6 plane decode, atrous ELU, align-corners guidance
    # downsample, encoder BN eps 1.1e-5), or 'auto' (a full TF BTS
    # checkpoint at --checkpoint_path/--pretrained_model selects 'tf').
    model_flavor: str = "auto"
    # Space-to-depth decoder tail (exact math, big TPU layout win).
    fast_tail: bool = True
    # Run rotation/crop/flip/photometric/normalize fused on-device inside
    # the jitted train step (host only decodes + static-crops).
    device_augment: bool = False
    # Store the Adam FIRST moment (mu) in bfloat16 — optax mu_dtype; the
    # second moment stays f32, so this saves ~25% of the two-moment state
    # (one of four param-sized optimizer trees incl. params). Enough to
    # fit batch 32 without remat; reference-exact f32 moments when off.
    adam_bf16_moments: bool = False
    # Use jax.checkpoint (remat) on the encoder to trade FLOPs for HBM.
    remat: bool = False
    # Remat policy when --remat is on: 'conv' saves conv outputs and
    # recomputes the elementwise BN/ReLU chains in the backward; 'full'
    # recomputes everything.
    remat_policy: str = "conv"
    # Remat scope: 'encoder' (skips saved as the boundary) or 'all' (also
    # remat the decoder — for batches where decoder activations OOM).
    remat_scope: str = "encoder"
    # Checkpoint + exit cleanly when SIGTERM arrives (cloud TPU preemption
    # delivers SIGTERM with a grace window). --no-preempt_checkpoint
    # restores plain kill semantics.
    preempt_checkpoint: bool = True
    # Dispatch checkpoint saves to a background thread (orbax async): the
    # step loop continues while device->host reads and file writes run.
    # Costs transient HBM (the saved state stays referenced until the
    # write commits). The torch analogue blocks on torch.save.
    async_checkpoint: bool = False
    # Capture a jax.profiler trace of training steps [10, 10+profile_steps).
    profile_steps: int = 0
    profile_dir: str = "/tmp/bts_tpu_trace"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def depth_mask_min(self) -> float:
        """Training loss valid-depth threshold.

        Reference: pytorch/bts_main.py:449-452 (NYU > 0.1, KITTI > 1.0).
        """
        return 0.1 if self.dataset == "nyu" else 1.0

    @property
    def resolved_end_learning_rate(self) -> float:
        """Reference: pytorch/bts_main.py:423 (-1 means 0.1 * lr)."""
        if self.end_learning_rate != -1.0:
            return self.end_learning_rate
        return 0.1 * self.learning_rate

    @property
    def resolved_normalization(self) -> str:
        """'imagenet', 'caffe' or 'caffe_unscaled'; 'auto' sniffs
        --pretrained_model.

        A TF ImageNet warm start (tensorflow/bts_main.py:228-232) only makes
        sense with the TF pipeline's caffe statistics
        (tensorflow/bts_dataloader.py:148-153) — feeding torchvision-
        normalized inputs to caffe-trained encoder weights silently degrades
        the warm start, so 'auto' selects caffe exactly then.

        The TF reference applies the x0.017 scale ONLY for densenet encoders
        (tensorflow/bts_dataloader.py:151-153); for every other encoder the
        caffe convention is mean subtraction alone. A requested 'caffe' on a
        non-densenet encoder therefore resolves to 'caffe_unscaled'.
        """
        if self.normalization == "imagenet":
            return "imagenet"
        if self.normalization == "caffe_unscaled":
            # Already-resolved style: snapshot_run pins RESOLVED values into
            # arguments.txt for replay, so every resolved output must also
            # be a valid input (non-densenet caffe runs resolve to this).
            return "caffe_unscaled"
        if self.normalization not in ("caffe", "auto"):
            raise ValueError(
                f"normalization must be 'imagenet', 'caffe', "
                f"'caffe_unscaled' or 'auto' (got {self.normalization!r})"
            )
        caffe = (
            "caffe" if self.encoder.startswith("densenet") else "caffe_unscaled"
        )
        if self.normalization == "caffe":
            return caffe
        if self.pretrained_model:
            from bts_tpu.models.convert_tf import is_tf_checkpoint

            if is_tf_checkpoint(self.pretrained_model):
                return caffe
        if self.resolved_flavor == "tf":
            # A full TF BTS checkpoint was trained on the TF pipeline's
            # caffe statistics (tensorflow/bts_dataloader.py:148-153).
            return caffe
        return "imagenet"

    def validate(self) -> "Config":
        """Loudly reject typo'd enum flags at the CLI boundary.

        Without this a mistyped --dataset silently trains/evals with the
        OTHER dataset's semantics everywhere the code branches on
        `dataset == "kitti"` (depth scaling /1000 vs /256, mask threshold
        0.1 vs 1.0, focal scaling, crops) — the reference has the same
        fall-through behavior; we make it an error instead.
        """
        if self.dataset not in ("nyu", "kitti"):
            raise ValueError(
                f"dataset must be 'nyu' or 'kitti' (got {self.dataset!r})"
            )
        if self.remat_policy not in ("conv", "full"):
            raise ValueError(
                f"remat_policy must be 'conv' or 'full' "
                f"(got {self.remat_policy!r})"
            )
        if self.remat_scope not in ("encoder", "all"):
            raise ValueError(
                f"remat_scope must be 'encoder' or 'all' "
                f"(got {self.remat_scope!r})"
            )
        if self.lpg_impl not in ("auto", "xla", "pallas", "ffi"):
            raise ValueError(
                f"lpg_impl must be one of auto/xla/pallas/ffi "
                f"(got {self.lpg_impl!r})"
            )
        # These two raise on invalid values and cache their sniffs.
        _ = self.resolved_normalization
        _ = self.resolved_flavor
        return self

    @property
    def resolved_flavor(self) -> str:
        """'pt' or 'tf'; 'auto' sniffs --checkpoint_path/--pretrained_model
        for a full TF BTS checkpoint (the TF zoo's bts_nyu_v2/bts_eigen_v2
        models, tensorflow/README.md:89,198) OR an orbax checkpoint this
        framework saved from a flavor='tf' run (so resuming / serving a
        tf-flavor run dir rebuilds the tf graph without an explicit
        --model_flavor tf).

        The 'auto' sniff opens the checkpoint and enumerates its variable
        map, so the result is cached per instance — create_model, the
        loaders, the snapshot and predict would otherwise each re-read the
        checkpoint index. dataclasses.replace copies declared fields only,
        so replaced configs re-resolve."""
        if self.model_flavor in ("pt", "tf"):
            return self.model_flavor
        if self.model_flavor != "auto":
            raise ValueError(
                f"model_flavor must be 'pt', 'tf' or 'auto' "
                f"(got {self.model_flavor!r})"
            )
        cached = self.__dict__.get("_resolved_flavor_cache")
        key = (self.checkpoint_path, self.pretrained_model)
        if cached is not None and cached[0] == key:
            return cached[1]
        flavor = "pt"
        for path in key:
            if not path:
                continue
            from bts_tpu.models.convert_tf import (
                is_full_tf_bts_checkpoint,
                is_tf_checkpoint,
            )

            if is_tf_checkpoint(path) and is_full_tf_bts_checkpoint(path):
                flavor = "tf"
                break
            import os

            if os.path.isdir(path):
                from bts_tpu.training.checkpoint import orbax_saved_tf_flavor

                if orbax_saved_tf_flavor(path):
                    flavor = "tf"
                    break
        self._resolved_flavor_cache = (key, flavor)
        return flavor


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="BTS-TPU", fromfile_prefix_chars="@"
    )
    # Reference convention: whitespace-separated tokens inside arg files
    # (pytorch/bts_main.py:42-50).
    parser.convert_arg_line_to_args = lambda line: line.split()

    defaults = Config()
    for field in dataclasses.fields(Config):
        flag = "--" + field.name
        default = getattr(defaults, field.name)
        if field.type == "bool" or isinstance(default, bool):
            # BooleanOptionalAction also generates --no-<name>, so
            # default-True bools (fast_tail) are controllable from the CLI
            # and args files; bare --<name> keeps reference store_true
            # semantics.
            parser.add_argument(
                flag, action=argparse.BooleanOptionalAction, default=default
            )
        elif field.name == "gpu":
            parser.add_argument(flag, type=int, default=None)
        else:
            ftype = type(default) if default is not None else str
            parser.add_argument(flag, type=ftype, default=default)
    return parser


def parse_args(argv: Optional[Sequence[str]] = None) -> Config:
    """Parse CLI args into a Config.

    Mirrors the reference entry convention: a single positional argument is
    treated as an @args-file (pytorch/bts_main.py:116-120).
    """
    if argv is None:
        argv = sys.argv[1:]
    argv = list(argv)
    if len(argv) == 1 and not argv[0].startswith("-"):
        argv = ["@" + argv[0]]
    parser = _build_parser()
    ns = parser.parse_args(argv)
    return Config(**vars(ns)).validate()


def config_to_argfile(cfg: Config) -> str:
    """Serialize a Config back to reference-style args-file text."""
    lines: List[str] = []
    defaults = Config()
    for field in dataclasses.fields(Config):
        val = getattr(cfg, field.name)
        default = getattr(defaults, field.name)
        if val == default:
            continue
        if isinstance(val, bool):
            # val != default here, so non-default False means --no-<name>.
            lines.append(f"--{field.name}" if val else f"--no-{field.name}")
        else:
            lines.append(f"--{field.name} {val}")
    return "\n".join(lines) + "\n"
