"""Optimizer assembly: AdamW param groups, poly LR, layer freezing.

Reference semantics reproduced:
  * AdamW with two param groups — encoder weight_decay=cfg.weight_decay,
    decoder weight_decay=0 (pytorch/bts_main.py:371-373) — via
    optax.multi_transform labels.
  * Polynomial LR decay applied every step (pytorch/bts_main.py:456-458).
  * set_misc layer freezing (pytorch/bts_main.py:217-247): always freeze the
    encoder's first conv and the encoder BN affine params that the
    reference's '.bn' / 'norm' name-substring rules actually match —
    for resnets that is bn1/bn2/bn3 + the stem bn1 but NOT the downsample
    BN ('downsample.1' contains no '.bn'), which therefore stays trainable;
    --fix_first_conv_block(s) additionally freezes the first (two)
    residual/dense blocks. The reference's substring rules match nothing
    for mobilenetv2 — preserved.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from bts_tpu.config import Config
from bts_tpu.training.lr import polynomial_decay


def _is_resnet_family(encoder_name: str) -> bool:
    return "resne" in encoder_name  # matches reference ('resne' in encoder)


def frozen_predicate(cfg: Config):
    """Returns fn(path_str) -> bool for encoder-param freezing."""
    name = cfg.encoder
    if name == "mobilenetv2_bts":
        return lambda path: False

    if _is_resnet_family(name):
        first_conv = "encoder/conv1/"
        # The reference's '.bn' substring (bts_main.py:236) matches
        # torchvision's bn1/bn2/bn3 and the stem bn1, but NOT the
        # downsample BN (named 'downsample.1') — so downsample BN
        # scale/bias stay trainable. Preserve that exactly.
        bn_markers = ("/bn1/", "/bn2/", "/bn3/", "encoder/bn1/")
        blocks = []
        if cfg.fix_first_conv_blocks:
            blocks = ["encoder/layer1_0/", "encoder/layer1_1/"]
        elif cfg.fix_first_conv_block:
            blocks = ["encoder/layer1_0/"]

        def pred(path: str) -> bool:
            if not path.startswith("encoder/"):
                return False
            if path.startswith(first_conv):
                return True
            if any(m in path for m in bn_markers):
                return True
            return any(path.startswith(b) for b in blocks)

        return pred

    # densenet family
    first_conv = "encoder/conv0/"
    blocks = []
    if cfg.fix_first_conv_blocks:
        blocks = [
            "encoder/denseblock1/denselayer1/",
            "encoder/denseblock1/denselayer2/",
        ]
    elif cfg.fix_first_conv_block:
        blocks = ["encoder/denseblock1/denselayer1/"]

    def pred(path: str) -> bool:
        if not path.startswith("encoder/"):
            return False
        if path.startswith(first_conv):
            return True
        # 'norm' substring == all BN params (norm0/1/2/5, transition norm).
        if "/norm" in path:
            return True
        return any(path.startswith(b) for b in blocks)

    return pred


def param_labels(params: Dict[str, Any], cfg: Config):
    """Label each param leaf 'frozen' | 'encoder' | 'decoder'."""
    pred = frozen_predicate(cfg)

    def label(path, _):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if pred(path_str):
            return "frozen"
        return "encoder" if path_str.startswith("encoder") else "decoder"

    return jax.tree_util.tree_map_with_path(label, params)


def advance_schedule_count(opt_state, step: int):
    """Position every LR-schedule state in `opt_state` at `step`.

    Used when resuming from a reference (TF/torch) checkpoint: weights and
    global_step carry over but the optax state starts fresh, and the poly
    LR must continue from the restored step like both references do
    (pytorch/bts_main.py:456-458 keys LR on global_step;
    tensorflow/bts_main.py:136-139 on the restored global_step variable).
    Without this the APPLIED lr restarts at base_lr while the logs print
    the global_step-decayed value. Only ScaleByScheduleState is touched:
    Adam's bias-correction count stays 0, the correct correction for the
    fresh (zero) moments.
    """
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, optax.ScaleByScheduleState):
            # A FRESH array per state (as optax.init creates them): a
            # single array object shared across the tree aliases the
            # donated buffer in the jitted train step — the TPU runtime
            # rejects the aliased donation at execution (INVALID_ARGUMENT).
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, jnp.int32)
            )
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(walk(x) for x in node))
        if isinstance(node, tuple):
            return tuple(walk(x) for x in node)
        if isinstance(node, list):
            return [walk(x) for x in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)


def create_optimizer(cfg: Config, params, num_total_steps: int):
    """(optimizer, schedule) with reference param groups + freezing."""
    schedule = polynomial_decay(
        cfg.learning_rate,
        cfg.resolved_end_learning_rate,
        num_total_steps,
        power=0.9,
    )
    labels = param_labels(params, cfg)
    # bf16 first moment (--adam_bf16_moments): cuts the optimizer-state
    # HBM for the mu tree in half (optax mu_dtype; nu stays f32) at the
    # cost of first-moment accumulation precision. No reference
    # equivalent; off by default (reference-exact f32 moments).
    mu_dtype = (
        jax.numpy.bfloat16
        if getattr(cfg, "adam_bf16_moments", False)
        else None
    )
    tx = optax.multi_transform(
        {
            "encoder": optax.adamw(
                schedule,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
                mu_dtype=mu_dtype,
            ),
            "decoder": optax.adamw(
                schedule, eps=cfg.adam_eps, weight_decay=0.0, mu_dtype=mu_dtype
            ),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, schedule
