"""SparseCtrl ControlNet parity vs torch reference (tiny config).

Reference: models/controlnets/controlnet_sparsectrl.py:97.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_sparsectrl import SparseControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4,
    conditioning_channels=3,
    down_block_types=("CrossAttnDownBlockMotion", "DownBlockMotion"),
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_num_groups=4,
    cross_attention_dim=16,
    attention_head_dim=4,
    motion_num_attention_heads=2,
    use_simplified_condition_embedding=True,
    concat_conditioning_mask=True,
)


def _inputs(rng, frames=3):
    sample = rng.randn(1, 4, frames, 8, 8).astype(np.float32)
    cond = rng.randn(1, 3, frames, 8, 8).astype(np.float32)
    mask = np.zeros((1, 1, frames, 8, 8), np.float32)
    mask[:, :, 0] = 1.0  # first frame is the sparse condition
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    t = np.array(500, np.int64)
    return sample, cond, mask, ctx, t


def test_sparsectrl_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.controlnets.controlnet_sparsectrl import (
        SparseControlNetModel as TorchSparse,
    )

    torch.manual_seed(0)
    tm = TorchSparse(**TINY)
    tm.eval()
    with torch.no_grad():  # randomize zero-init paths for a non-trivial check
        tm.controlnet_cond_embedding.weight.normal_()
        tm.controlnet_cond_embedding.bias.normal_()
        for blk in tm.controlnet_down_blocks:
            blk.weight.normal_()
            blk.bias.normal_()
        tm.controlnet_mid_block.weight.normal_()
        tm.controlnet_mid_block.bias.normal_()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SparseControlNetModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    sample, cond, mask, ctx, t = _inputs(np.random.RandomState(0))
    frames = sample.shape[2]
    with torch.no_grad():
        ref_down, ref_mid = tm(
            torch.from_numpy(sample), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx).repeat_interleave(frames, dim=0),
            controlnet_cond=torch.from_numpy(cond), conditioning_scale=0.9,
            conditioning_mask=torch.from_numpy(mask), return_dict=False,
        )
    ours_down, ours_mid = m(
        params, jnp.asarray(sample), 500, encoder_hidden_states=jnp.asarray(ctx),
        controlnet_cond=jnp.asarray(cond), conditioning_scale=0.9,
        conditioning_mask=jnp.asarray(mask), return_dict=False,
    )
    assert len(ours_down) == len(ref_down)
    for o, r in zip(ours_down, ref_down):
        # ours NHWC vs torch NCHW
        err = np.max(np.abs(np.transpose(np.asarray(o), (0, 3, 1, 2)) - r.numpy()))
        assert err < 5e-4, f"sparsectrl down residual diverges: {err}"
    err = np.max(np.abs(np.transpose(np.asarray(ours_mid), (0, 3, 1, 2)) - ref_mid.numpy()))
    assert err < 5e-4, f"sparsectrl mid residual diverges: {err}"


def test_sparsectrl_zero_init_is_noop():
    m = SparseControlNetModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    sample, cond, mask, ctx, t = _inputs(np.random.RandomState(1))
    down, mid = m(params, jnp.asarray(sample), 500, encoder_hidden_states=jnp.asarray(ctx),
                  controlnet_cond=jnp.asarray(cond), conditioning_mask=jnp.asarray(mask),
                  return_dict=False)
    for s in down:
        np.testing.assert_allclose(np.asarray(s), 0.0)
    np.testing.assert_allclose(np.asarray(mid), 0.0)
