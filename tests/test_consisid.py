"""ConsisID: transformer parity vs torch reference (face modules exercised),
DPM scheduler parity, pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/consisid_transformer_3d.py:351`,
`/root/reference/src/diffusers/schedulers/scheduling_dpm_cogvideox.py:134`,
`/root/reference/src/diffusers/pipelines/consisid/pipeline_consisid.py`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.consisid_transformer_3d import ConsisIDTransformer3DModel
from diffusers_tpu.schedulers import CogVideoXDPMScheduler

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=8,
    out_channels=4,
    time_embed_dim=16,
    text_embed_dim=12,
    num_layers=2,
    sample_width=8,
    sample_height=8,
    sample_frames=9,
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=6,
    use_rotary_positional_embeddings=True,
    is_train_face=True,
    cross_attn_interval=2,
    cross_attn_dim_head=4,
    cross_attn_num_heads=2,
    LFE_id_dim=10,
    LFE_vit_dim=12,
    LFE_depth=5,
    LFE_dim_head=4,
    LFE_num_heads=2,
    LFE_num_id_token=3,
    LFE_num_querie=4,
    LFE_output_dim=16,  # must be inner_dim/3*2 dims? kv_dim = inner*2/3
    LFE_ff_mult=2,
    LFE_num_scale=5,
)


@pytest.mark.refparity
def test_consisid_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ConsisIDTransformer3DModel as TorchModel

    # kv_dim of perceiver cross-attn = inner_dim*2/3 — LFE_output_dim must match
    inner = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    tiny = dict(TINY, LFE_output_dim=int(inner / 3 * 2) if (inner * 2) % 3 == 0 else 16)
    # inner=16 → kv_dim = 10 (int(16/3*2)); LFE_output_dim must equal kv_dim
    tiny["LFE_output_dim"] = int(inner / 3 * 2)

    tm = TorchModel(**tiny)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ConsisIDTransformer3DModel(**tiny)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, F = 2, 2
    x = rng.randn(B, F, 8, 8, 8).astype(np.float32)
    ehs = rng.randn(B, 6, 12).astype(np.float32)
    t = np.array([500, 20], dtype=np.int64)
    id_cond = rng.randn(B, 10).astype(np.float32)
    id_vit = [rng.randn(B, 7, 12).astype(np.float32) for _ in range(5)]
    rope = m.rope(height=8 // 1, width=8 // 1, num_frames=F)
    rope_np = (np.asarray(rope[0]), np.asarray(rope[1]))

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=(torch.from_numpy(rope_np[0]), torch.from_numpy(rope_np[1])),
            id_cond=torch.from_numpy(id_cond),
            id_vit_hidden=[torch.from_numpy(v) for v in id_vit],
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          image_rotary_emb=rope, id_cond=jnp.asarray(id_cond),
          id_vit_hidden=[jnp.asarray(v) for v in id_vit]).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_cogvideox_dpm_scheduler_parity():
    torch = pytest.importorskip("torch")
    from diffusers.schedulers.scheduling_dpm_cogvideox import (
        CogVideoXDPMScheduler as TorchSched,
    )

    ts = TorchSched(num_train_timesteps=100, prediction_type="v_prediction",
                    rescale_betas_zero_snr=False)
    ts.set_timesteps(4)
    ours = CogVideoXDPMScheduler(num_train_timesteps=100, prediction_type="v_prediction",
                                 rescale_betas_zero_snr=False)
    state = ours.set_timesteps(4)
    assert np.array_equal(np.asarray(state.timesteps), ts.timesteps.numpy())

    rng = np.random.RandomState(0)
    sample_t = torch.from_numpy(rng.randn(1, 2, 4, 4, 4).astype(np.float32))
    sample_j = jnp.asarray(sample_t.numpy())
    old_t = None
    old_j = jnp.zeros_like(sample_j)
    has_old = 0.0
    timesteps = ts.timesteps.tolist()
    zero_noise = np.zeros(sample_t.shape, np.float32)

    import diffusers.schedulers.scheduling_dpm_cogvideox as ref_mod
    orig_randn = ref_mod.randn_tensor
    ref_mod.randn_tensor = lambda *a, **kw: torch.from_numpy(zero_noise)
    import diffusers_tpu.schedulers.scheduling_dpm_cogvideox as our_mod
    orig_jrandn = our_mod.randn_tensor
    our_mod.randn_tensor = lambda shape, key=None, dtype=None: jnp.zeros(shape, jnp.float32)
    try:
        for i, t in enumerate(timesteps):
            mo = rng.randn(*sample_t.shape).astype(np.float32)
            t_back = timesteps[i - 1] if i > 0 else None
            ref_prev, ref_x0 = ts.step(torch.from_numpy(mo), old_t, t, t_back, sample_t)
            prev, x0 = ours.step(state, jnp.asarray(mo), old_j, t,
                                 t_back if t_back is not None else t,
                                 sample_j, old_pred_valid=jnp.asarray(has_old))
            assert np.max(np.abs(np.asarray(prev) - ref_prev.numpy())) < 1e-4, (i, t)
            assert np.max(np.abs(np.asarray(x0) - ref_x0.numpy())) < 1e-4
            sample_t, old_t = ref_prev, ref_x0
            sample_j, old_j = prev, x0
            has_old = 1.0
    finally:
        ref_mod.randn_tensor = orig_randn
        our_mod.randn_tensor = orig_jrandn


class DummyTok:
    def __call__(self, text, padding=None, max_length=None, truncation=True,
                 return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 4 + len(t) % 3)
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1

        class R:
            input_ids = ids
            attention_mask = mask

        return R()


def test_consisid_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.consisid import ConsisIDPipeline

    key = jax.random.PRNGKey(0)
    inner = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    tiny = dict(TINY, LFE_output_dim=int(inner / 3 * 2))
    transformer = ConsisIDTransformer3DModel(**tiny)
    vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3, block_out_channels=(8, 8), latent_channels=4,
        layers_per_block=1, norm_num_groups=4, temporal_compression_ratio=4,
        down_block_types=("CogVideoXDownBlock3D", "CogVideoXDownBlock3D"),
        up_block_types=("CogVideoXUpBlock3D", "CogVideoXUpBlock3D"),
        scaling_factor=1.0,
    )
    te = T5EncoderModel(vocab_size=64, d_model=12, d_kv=6, d_ff=24, num_layers=2, num_heads=2)
    pipe = ConsisIDPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=CogVideoXDPMScheduler(num_train_timesteps=100),
    )
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    id_cond = rng.randn(1, 10).astype(np.float32)
    id_vit = [rng.randn(1, 7, 12).astype(np.float32) for _ in range(5)]
    out = pipe(image, prompt="a person waves", height=16, width=16, num_frames=5,
               num_inference_steps=2, guidance_scale=2.0, use_dynamic_cfg=True,
               id_cond=jnp.asarray(id_cond), id_vit_hidden=[jnp.asarray(v) for v in id_vit],
               key=key, max_sequence_length=6, output_type="latent")
    assert np.isfinite(np.asarray(out.frames)).all()
