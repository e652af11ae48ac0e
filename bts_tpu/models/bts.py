"""The full BTS model: encoder zoo + decoder.

Reference: pytorch/bts.py:268-331 (encoder wrapper + BtsModel). Encoder
registry mirrors the reference's options and per-backbone skip channel
widths (pytorch/bts.py:273-301).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.decoder import BTSDecoder
from bts_tpu.models.encoders import densenet, mobilenet, resnet

Dtype = Any

# name -> (factory, feat_out_channels) — pytorch/bts.py:273-301.
ENCODERS = {
    "densenet121_bts": (densenet.densenet121, [64, 64, 128, 256, 1024]),
    "densenet161_bts": (densenet.densenet161, [96, 96, 192, 384, 2208]),
    "resnet50_bts": (resnet.resnet50, [64, 256, 512, 1024, 2048]),
    "resnet101_bts": (resnet.resnet101, [64, 256, 512, 1024, 2048]),
    "resnext50_bts": (resnet.resnext50, [64, 256, 512, 1024, 2048]),
    "resnext101_bts": (resnet.resnext101, [64, 256, 512, 1024, 2048]),
    "mobilenetv2_bts": (mobilenet.mobilenetv2, [16, 24, 32, 64, 1280]),
}


class BTSModel(nn.Module):
    """encoder(x) -> 5 skips -> decoder -> 5 outputs.

    __call__(x NHWC f32/bf16 normalized image, focal (B,)) returns
    (lpg8x8, lpg4x4, lpg2x2, reduc1x1, depth_est), matching the reference
    output tuple (pytorch/bts.py:329-331).
    """

    encoder_name: str = "densenet161_bts"
    max_depth: float = 10.0
    dataset: str = "nyu"
    bts_size: int = 512
    lpg_impl: str = "auto"
    dtype: Dtype = jnp.float32
    remat: bool = False
    # 'conv': save only conv outputs, recompute the elementwise BN/ReLU
    # chains in the backward (they fuse into the cotangent convs). 'full':
    # recompute everything (measured slower at the recipe shapes).
    remat_policy: str = "conv"
    # 'encoder': remat the encoder only (skips stay saved as the boundary).
    # 'all': also remat the decoder — needed for very large batches where
    # decoder activations alone exceed HBM.
    remat_scope: str = "encoder"
    fast_tail: bool = True
    # 'pt' (default) | 'tf': which reference twin's graph to reproduce.
    # 'tf' (tensorflow/bts.py) is for TF-zoo checkpoints: decoder conv
    # biases, theta_max=pi/6, atrous ELU, align-corners guidance
    # downsample, encoder BN eps 1.1e-5. See BTSDecoder.flavor.
    flavor: str = "pt"

    @nn.compact
    def __call__(self, x, focal, train: bool = False):
        factory, _ = ENCODERS[self.encoder_name]
        template = factory(dtype=self.dtype)
        kwargs = {
            k: getattr(template, k)
            for k in template.__dataclass_fields__
            if k not in ("parent", "name")
        }
        if self.flavor == "tf":
            if "bn_eps" not in kwargs:
                raise ValueError(
                    "flavor='tf' supports densenet encoders only — the TF "
                    "reference zoo ships densenet121/161 checkpoints "
                    "(tensorflow/bts.py:398-430)"
                )
            kwargs["bn_eps"] = 1.1e-5  # tensorflow/bts.py:189-193
            # slim-'SAME' stem padding (tensorflow/bts.py:204-210).
            kwargs["tf_stem"] = True
        enc_cls = type(template)
        if self.remat:
            # Rematerialize encoder activations in the backward pass to trade
            # FLOPs for HBM (TPU-native; no reference equivalent).
            policy = (
                jax.checkpoint_policies.save_only_these_names("conv_out")
                if self.remat_policy == "conv"
                else None
            )
            enc_cls = nn.remat(enc_cls, static_argnums=(2,), policy=policy)
        enc = enc_cls(**kwargs, name="encoder")
        skips = enc(x.astype(self.dtype), train)
        dec_cls = BTSDecoder
        if self.remat and self.remat_scope == "all":
            # The skips stay saved (they are the remat boundary between the
            # two scopes); everything inside the decoder is recomputed.
            dec_cls = nn.remat(dec_cls, static_argnums=(3,))
        return dec_cls(
            max_depth=self.max_depth,
            dataset=self.dataset,
            num_features=self.bts_size,
            lpg_impl=self.lpg_impl,
            dtype=self.dtype,
            fast_tail=self.fast_tail,
            flavor=self.flavor,
            name="decoder",
        )(skips, focal, train)


def create_model(cfg) -> BTSModel:
    """Build a BTSModel from a Config."""
    if cfg.encoder not in ENCODERS:
        raise ValueError(
            f"unknown encoder '{cfg.encoder}'; options: {sorted(ENCODERS)}"
        )
    if cfg.bts_size < 128:
        # The reduction_1x1 plane head halves bts_size//32 channels down to
        # a final <8-wide stage (reference pytorch/bts.py:83-122), so
        # bts_size//32 must be >= 4. Below that the fast tail would die
        # with a bare IndexError deep in _FastReducParams.
        raise ValueError(
            f"bts_size must be >= 128 (got {cfg.bts_size}): the "
            "reduction_1x1 head needs bts_size//32 >= 4 channels"
        )
    return BTSModel(
        encoder_name=cfg.encoder,
        max_depth=cfg.max_depth,
        dataset=cfg.dataset,
        bts_size=cfg.bts_size,
        lpg_impl=cfg.lpg_impl,
        dtype=jnp.dtype(cfg.compute_dtype),
        remat=cfg.remat,
        remat_policy=cfg.remat_policy,
        remat_scope=getattr(cfg, "remat_scope", "encoder"),
        fast_tail=cfg.fast_tail,
        flavor=getattr(cfg, "resolved_flavor", "pt"),
    )


def init_model(
    model: BTSModel, rng: jax.Array, input_shape: Tuple[int, int, int, int]
):
    """Initialize params + batch_stats with a dummy batch.

    Jitted: one compiled program instead of thousands of eager dispatches
    (matters on remote/tunneled devices).
    """

    @jax.jit
    def _init(rng):
        dummy = jnp.zeros(input_shape, jnp.float32)
        focal = jnp.full((input_shape[0],), 518.8579, jnp.float32)
        return model.init(rng, dummy, focal, train=False)

    variables = _init(rng)
    return variables["params"], variables.get("batch_stats", {})
