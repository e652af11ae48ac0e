"""End-to-end decoder parity vs the reference PyTorch implementation.

Strategy: import the reference decoder (read-only, from /root/reference —
used purely as a test oracle, never copied), give it random weights, convert
that state dict with our converter, and compare full decoder outputs. This
pins down every numeric in M3-M7 of SURVEY.md §2.1: DASPP cascade, BN
eps/momentum, reduction chains, the theta=pi/3 plane decode, LPG at 8/4/2,
and the final depth head.

The reference LPG hardcodes .cuda() (pytorch/bts.py:140,143) — monkeypatched
to stay on CPU.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.medium  # round-end canary tier (see pyproject markers)

REFERENCE_PT = "/root/reference/pytorch"


@pytest.fixture(scope="module")
def reference_bts():
    sys.path.insert(0, REFERENCE_PT)
    # Neutralize the hardcoded .cuda() calls for CPU execution.
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import bts as ref_bts  # noqa: F401  (reference module, oracle only)

        yield ref_bts
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REFERENCE_PT)


@pytest.mark.parametrize("dataset,max_depth", [("nyu", 10.0), ("kitti", 80.0)])
def test_decoder_matches_reference(reference_bts, dataset, max_depth):
    from bts_tpu.models.convert import convert_state_dict
    from bts_tpu.models.decoder import BTSDecoder

    torch.manual_seed(0)
    H, W = 64, 96
    feat_out_channels = [64, 64, 128, 256, 1024]
    params_ns = types.SimpleNamespace(max_depth=max_depth, dataset=dataset)
    ref = reference_bts.bts(params_ns, feat_out_channels, 512)
    ref.eval()

    # Random-but-sane running stats so BN eval mode is exercised.
    state = {}
    for k, v in ref.state_dict().items():
        if k.endswith("running_var"):
            v = torch.rand_like(v) + 0.5
        elif k.endswith("running_mean"):
            v = torch.randn_like(v) * 0.1
        elif k.endswith("num_batches_tracked"):
            continue
        elif v.dtype.is_floating_point:
            v = torch.randn_like(v) * 0.05
        state[k] = v
    ref.load_state_dict(state, strict=False)

    rng = np.random.default_rng(0)
    divs = [2, 4, 8, 16, 32]
    feats_np = [
        rng.normal(size=(1, H // d, W // d, c)).astype(np.float32)
        for d, c in zip(divs, feat_out_channels)
    ]
    focal = np.array([718.856], dtype=np.float32)

    with torch.no_grad():
        ref_outs = ref(
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np],
            torch.from_numpy(focal),
        )
    ref_outs = [o.numpy() for o in ref_outs]

    # Our decoder with the converted weights.
    dec = BTSDecoder(max_depth=max_depth, dataset=dataset, num_features=512)
    variables = dec.init(
        jax.random.key(0),
        [jnp.asarray(f) for f in feats_np],
        jnp.asarray(focal),
        train=False,
    )
    # Converter expects 'decoder.'-prefixed keys.
    torch_state = {
        "decoder." + k: v.numpy() for k, v in ref.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    params, stats = convert_state_dict(
        torch_state,
        {"decoder": variables["params"]},
        {"decoder": variables["batch_stats"]},
    )
    outs = dec.apply(
        {"params": params["decoder"], "batch_stats": stats["decoder"]},
        [jnp.asarray(f) for f in feats_np],
        jnp.asarray(focal),
        train=False,
    )

    names = ["lpg8x8", "lpg4x4", "lpg2x2", "reduc1x1", "depth"]
    for name, ours, theirs in zip(names, outs, ref_outs):
        ours = np.asarray(ours)  # NHWC, (1,H,W,1)
        theirs = theirs.transpose(0, 2, 3, 1) if theirs.ndim == 4 else theirs[..., None]
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        np.testing.assert_allclose(
            ours, theirs, rtol=5e-4, atol=5e-5, err_msg=name
        )
