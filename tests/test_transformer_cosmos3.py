"""Cosmos3OmniTransformer parity vs the torch reference: packed multimodal
MoT forward with text + vision + sound + action streams."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_cosmos3 import Cosmos3OmniTransformer

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    head_dim=8,
    hidden_size=32,
    intermediate_size=48,
    latent_channel=4,
    latent_patch_size=2,
    num_attention_heads=4,
    num_hidden_layers=2,
    num_key_value_heads=2,
    patch_latent_dim=16,
    rope_theta=10000.0,
    rope_axes_dim=(2, 1, 1),
    vocab_size=100,
    sound_gen=True,
    sound_dim=6,
    action_gen=True,
    action_dim=5,
    num_embodiment_domains=3,
)


def _packing(rng):
    """Joint sequence: 5 text tokens (und) ‖ 8 vision + 3 sound + 2 action (gen)."""
    return dict(
        input_ids=np.array([3, 17, 42, 9, 55], dtype=np.int64),
        text_indexes=np.arange(5, dtype=np.int64),
        position_ids=rng.randint(0, 64, size=(3, 18)).astype(np.int64),
        und_len=5,
        sequence_length=18,
        # one vision item: [1, C=4, T=2, H=3, W=3] → pad to 4x4 → 2x2x2=8 patches
        vision_tokens=[rng.randn(1, 4, 2, 3, 3).astype(np.float32)],
        vision_token_shapes=[(2, 2, 2)],
        vision_sequence_indexes=np.arange(5, 13, dtype=np.int64),
        vision_mse_loss_indexes=np.arange(9, 13, dtype=np.int64),  # noisy frame 1 → 4 patches
        vision_timesteps=rng.rand(4).astype(np.float32) * 1000,
        vision_noisy_frame_indexes=[np.array([1], dtype=np.int64)],
        sound_tokens=[rng.randn(6, 3).astype(np.float32)],
        sound_token_shapes=[(3,)],
        sound_sequence_indexes=np.arange(13, 16, dtype=np.int64),
        sound_mse_loss_indexes=np.arange(13, 16, dtype=np.int64),
        sound_timesteps=rng.rand(3).astype(np.float32) * 1000,
        sound_noisy_frame_indexes=[np.array([0, 1, 2], dtype=np.int64)],
        action_tokens=[rng.randn(2, 5).astype(np.float32)],
        action_token_shapes=[(2,)],
        action_sequence_indexes=np.arange(16, 18, dtype=np.int64),
        action_mse_loss_indexes=np.arange(16, 18, dtype=np.int64),
        action_timesteps=rng.rand(2).astype(np.float32) * 1000,
        action_noisy_frame_indexes=[np.array([0, 1], dtype=np.int64)],
        action_domain_ids=[np.array(1, dtype=np.int64)],
    )


def test_cosmos3_omni_parity():
    torch = pytest.importorskip("torch")
    from diffusers import Cosmos3OmniTransformer as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Cosmos3OmniTransformer(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    pk = _packing(rng)

    def to_torch(v):
        if isinstance(v, np.ndarray):
            return torch.from_numpy(v)
        if isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            return [torch.from_numpy(x) for x in v]
        return v

    with torch.no_grad():
        ref = tm(**{k: to_torch(v) for k, v in pk.items()})

    def to_jax(v):
        if isinstance(v, np.ndarray):
            return jnp.asarray(v)
        if isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            return [jnp.asarray(x) for x in v]
        return v

    out = m(params, **{k: to_jax(v) for k, v in pk.items()})

    for mine, theirs, tag in [
        (out.sample[0], ref.sample[0].numpy(), "vision"),
        (out.sound[0], ref.sound[0].numpy(), "sound"),
        (out.action[0], ref.action[0].numpy(), "action"),
    ]:
        mine = np.asarray(mine)
        assert mine.shape == theirs.shape, (tag, mine.shape, theirs.shape)
        assert np.max(np.abs(mine - theirs)) < 5e-4, (tag, np.max(np.abs(mine - theirs)))


def test_cosmos3_vision_only_forward():
    import jax

    m = Cosmos3OmniTransformer(**{**TINY, "sound_gen": False, "sound_dim": None,
                                  "action_gen": False, "action_dim": None})
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    pk = _packing(rng)
    out = m(
        params,
        input_ids=jnp.asarray(pk["input_ids"]),
        text_indexes=jnp.asarray(pk["text_indexes"]),
        position_ids=jnp.asarray(pk["position_ids"][0][:13]),  # 1-D path
        und_len=5,
        sequence_length=13,
        vision_tokens=[jnp.asarray(pk["vision_tokens"][0])],
        vision_token_shapes=pk["vision_token_shapes"],
        vision_sequence_indexes=jnp.asarray(pk["vision_sequence_indexes"]),
        vision_mse_loss_indexes=jnp.asarray(pk["vision_mse_loss_indexes"]),
        vision_timesteps=jnp.asarray(pk["vision_timesteps"]),
        vision_noisy_frame_indexes=[jnp.asarray(pk["vision_noisy_frame_indexes"][0])],
    )
    assert out.sound is None and out.action is None
    assert np.asarray(out.sample[0]).shape == (1, 4, 2, 3, 3)
    assert np.isfinite(np.asarray(out.sample[0])).all()
