"""Train state + the jitted train step.

TPU-native core of the training loop (reference hot loop:
pytorch/bts_main.py:439-466): one pure function, jit-compiled over a
`jax.sharding.Mesh` — the batch is sharded on the data axis, params are
replicated, and GSPMD inserts the gradient all-reduce over ICI (the
reference's DDP allreduce, pytorch/bts_main.py:352,455).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from bts_tpu.training.loss import silog_loss


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(params, batch_stats, tx, mesh=None) -> TrainState:
    # tx.init runs under one jit: eagerly it dispatches ~2 tiny ops per
    # param leaf (~1400 executions for a 350-leaf tree), which serialize
    # over the axon tunnel's ~30ms round-trip into minutes of dead time
    # before step 0. One compiled program initializes everything at once.
    opt_state, step = jax.jit(
        lambda p: (tx.init(p), jnp.zeros((), jnp.int32))
    )(params)
    state = TrainState(
        step=step,
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    if mesh is not None:
        # Replicate onto the step's mesh now so step 1 and step 2 share one
        # compiled executable (see mesh.replicate_tree for the retrace trap).
        from bts_tpu.parallel.mesh import replicate_tree

        state = replicate_tree(state, mesh)
    return state


def make_train_step(model, tx, cfg):
    """Build the jit-able train step closure.

    The returned fn: (state, batch) -> (state, metrics) where batch is
    {'image' (B,H,W,3), 'depth' (B,H,W,1), 'focal' (B,)}.
    """
    mask_min = cfg.depth_mask_min
    variance_focus = cfg.variance_focus
    # bn_no_track_stats: run BN in inference mode during training
    # (reference bn_init_as_tf, pytorch/bts.py:26-31). The TF twin ALWAYS
    # trains that way — every encoder BN is built is_training=False
    # (tensorflow/bts.py:188-192) and the decoder gets bn_training=False
    # (tensorflow/bts_main.py:167-168) — so flavor='tf' freezes BN stats
    # unconditionally: fine-tuning a TF-zoo checkpoint must normalize by
    # the checkpoint's moving stats, not clobber them with batch stats.
    bn_train = not (
        cfg.bn_no_track_stats or cfg.resolved_flavor == "tf"
    )
    device_augment = cfg.device_augment
    if device_augment:
        from bts_tpu.data.device_augment import augment_batch

        aug_base_key = jax.random.key(cfg.seed)
        normalization = cfg.resolved_normalization

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        if bn_train:
            outs, updates = model.apply(
                variables,
                batch["image"],
                batch["focal"],
                train=True,
                mutable=["batch_stats"],
            )
            new_stats = updates["batch_stats"]
        else:
            outs = model.apply(
                variables, batch["image"], batch["focal"], train=False
            )
            new_stats = batch_stats
        depth_est = outs[4][..., 0]
        depth_gt = batch["depth"][..., 0]
        mask = depth_gt > mask_min
        loss = silog_loss(depth_est, depth_gt, mask, variance_focus)
        return loss, new_stats

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if device_augment:
            # Fused on-device augmentation, deterministic per (seed, step).
            key = jax.random.fold_in(aug_base_key, state.step)
            # Rotation already happened on the host (see loader raw mode —
            # gather-based device rotation measured 3.4x slower).
            image, depth = augment_batch(
                key,
                batch["image"],
                batch["depth"],
                out_h=cfg.input_height,
                out_w=cfg.input_width,
                degree=cfg.degree,
                dataset=cfg.dataset,
                do_random_rotate=False,
                normalization=normalization,
            )
            batch = {"image": image, "depth": depth, "focal": batch["focal"]}
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss}

    return train_step


def make_panel_forward(model, cfg):
    """Jitted train=False forward for TensorBoard image panels.

    Reproduces the exact device-augment view the train step saw at `step`
    (same fold_in key), so the logged panels show what the network trained
    on — the reference logs the live training batch
    (pytorch/bts_main.py:482-496).
    """
    device_augment = cfg.device_augment
    if device_augment:
        from bts_tpu.data.device_augment import augment_batch

        aug_base_key = jax.random.key(cfg.seed)
        normalization = cfg.resolved_normalization

    def fwd(params, batch_stats, batch, step):
        image, depth = batch["image"], batch["depth"]
        if device_augment:
            key = jax.random.fold_in(aug_base_key, step)
            image, depth = augment_batch(
                key,
                image,
                depth,
                out_h=cfg.input_height,
                out_w=cfg.input_width,
                degree=cfg.degree,
                dataset=cfg.dataset,
                do_random_rotate=False,
                normalization=normalization,
            )
        variables = {"params": params, "batch_stats": batch_stats}
        outs = model.apply(variables, image, batch["focal"], train=False)
        return outs, image, depth

    return jax.jit(fwd)


def jit_train_step(train_step, mesh, axis_name: str = "data"):
    """Jit with explicit shardings: state replicated, batch data-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
