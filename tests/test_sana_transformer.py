"""SanaTransformer2DModel: torch parity (ReLU linear attention, GLUMBConv FF,
modulated output norm)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")


def _tiny_pair(**overrides):
    from diffusers import SanaTransformer2DModel as TorchSana

    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
    from diffusers_tpu.models.transformers.sana_transformer import SanaTransformer2DModel

    cfg = dict(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=2, num_cross_attention_heads=2, cross_attention_head_dim=8,
        cross_attention_dim=16, caption_channels=12, mlp_ratio=2.0,
        sample_size=8, patch_size=1,
    )
    cfg.update(overrides)
    torch.manual_seed(0)
    ref = TorchSana(**cfg).eval()
    ours = SanaTransformer2DModel(**cfg)
    params = convert_torch_state_dict(ours, {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, ours, params


def test_sana_transformer_parity():
    ref, ours, params = _tiny_pair()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 12).astype(np.float32)
    t = np.array([3.0, 7.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t)).sample.numpy()
    out = np.asarray(ours(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t)).sample)
    assert out.shape == ref_out.shape
    assert np.max(np.abs(out - ref_out)) < 5e-4, np.max(np.abs(out - ref_out))


def test_sana_transformer_guidance_parity():
    """Sana-Sprint variant: guidance-conditioned time embedding."""
    ref, ours, params = _tiny_pair(guidance_embeds=True)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(1, 6, 12).astype(np.float32)
    t = np.array([5.0], dtype=np.float32)
    g = np.array([4.5], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t), guidance=torch.from_numpy(g)
        ).sample.numpy()
    out = np.asarray(ours(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), guidance=jnp.asarray(g)).sample)
    assert np.max(np.abs(out - ref_out)) < 5e-4, np.max(np.abs(out - ref_out))
