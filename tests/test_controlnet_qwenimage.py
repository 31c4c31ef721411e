"""QwenImage ControlNet parity vs torch reference + transformer integration.

Reference: models/controlnets/controlnet_qwenimage.py:51.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_qwenimage import (
    QwenImageControlNetModel,
    QwenImageMultiControlNetModel,
)
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=2,
    in_channels=16,
    out_channels=4,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(8, 4, 4),
)


def _inputs(rng):
    x = rng.randn(2, 16, 16).astype(np.float32)
    cond = rng.randn(2, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 7, 24).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[0, 5:] = 0
    t = np.array([0.5, 0.9], dtype=np.float32)
    return x, cond, ehs, mask, t, [(1, 4, 4)]


def test_qwen_controlnet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import QwenImageControlNetModel as TorchCN

    tm = TorchCN(**TINY)
    tm.eval()
    # zero-init blocks would make outputs trivially zero; randomize them
    with torch.no_grad():
        for blk in tm.controlnet_blocks:
            blk.weight.normal_()
            blk.bias.normal_()
        tm.controlnet_x_embedder.weight.normal_()
        tm.controlnet_x_embedder.bias.normal_()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = QwenImageControlNetModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    x, cond, ehs, mask, t, img_shapes = _inputs(np.random.RandomState(0))
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), controlnet_cond=torch.from_numpy(cond),
            conditioning_scale=0.8, encoder_hidden_states=torch.from_numpy(ehs),
            encoder_hidden_states_mask=torch.from_numpy(mask),
            timestep=torch.from_numpy(t), img_shapes=img_shapes,
        ).controlnet_block_samples
    ours = m(params, jnp.asarray(x), jnp.asarray(cond), conditioning_scale=0.8,
             encoder_hidden_states=jnp.asarray(ehs), encoder_hidden_states_mask=jnp.asarray(mask),
             timestep=jnp.asarray(t), img_shapes=img_shapes).controlnet_block_samples
    assert len(ours) == len(ref) == 2
    for o, r in zip(ours, ref):
        err = np.max(np.abs(np.asarray(o) - r.numpy()))
        assert err < 5e-4, f"controlnet block sample diverges: {err}"


def test_qwen_controlnet_zero_init_and_transformer_hookup():
    from diffusers_tpu.models.transformers.transformer_qwenimage import QwenImageTransformer2DModel

    key = jax.random.PRNGKey(0)
    transformer = QwenImageTransformer2DModel(**TINY)
    t_params = transformer.init_params(key)
    cn, cn_params = QwenImageControlNetModel.from_transformer(
        transformer, t_params, num_layers=2, attention_head_dim=16, num_attention_heads=2, key=key,
    )

    x, cond, ehs, mask, t, img_shapes = _inputs(np.random.RandomState(1))
    samples = cn(cn_params, jnp.asarray(x), jnp.asarray(cond),
                 encoder_hidden_states=jnp.asarray(ehs), encoder_hidden_states_mask=jnp.asarray(mask),
                 timestep=jnp.asarray(t), img_shapes=img_shapes).controlnet_block_samples
    # zero-init residual path: an untrained ControlNet contributes nothing
    for s in samples:
        np.testing.assert_allclose(np.asarray(s), 0.0)

    base = transformer(t_params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(mask),
                       jnp.asarray(t), img_shapes=img_shapes).sample
    with_cn = transformer(t_params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(mask),
                          jnp.asarray(t), img_shapes=img_shapes,
                          controlnet_block_samples=samples).sample
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn), atol=1e-6)


def test_qwen_multi_controlnet_sums():
    key = jax.random.PRNGKey(2)
    nets = [QwenImageControlNetModel(**TINY) for _ in range(2)]
    params = [n.init_params(jax.random.PRNGKey(i)) for i, n in enumerate(nets)]
    multi = QwenImageMultiControlNetModel(nets)
    x, cond, ehs, mask, t, img_shapes = _inputs(np.random.RandomState(3))
    out = multi(params, jnp.asarray(x), [jnp.asarray(cond)] * 2, [1.0, 0.5],
                encoder_hidden_states=jnp.asarray(ehs), encoder_hidden_states_mask=jnp.asarray(mask),
                timestep=jnp.asarray(t), img_shapes=img_shapes)
    assert len(out.controlnet_block_samples) == 2
