"""Bria FIBO: transformer parity vs torch reference (per-block text-layer
injection exercised) + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_bria_fibo.py:429`,
`/root/reference/src/diffusers/pipelines/bria_fibo/pipeline_bria_fibo.py`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_bria_fibo import BriaFiboTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=8,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=24,
    guidance_embeds=False,
    axes_dims_rope=[2, 2, 4],
    text_encoder_dim=12,
)


@pytest.mark.refparity
def test_bria_fibo_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_bria_fibo import (
        BriaFiboTransformer2DModel as TorchModel,
    )

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = BriaFiboTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 6
    x = rng.randn(B, S_img, 8).astype(np.float32)
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    layers = [rng.randn(B, S_txt, 12).astype(np.float32) for _ in range(4)]
    t = np.array([0.3, 0.8], dtype=np.float32)
    txt_ids = np.zeros((S_txt, 3), np.float32)
    img_ids = np.zeros((S_img, 3), np.float32)
    img_ids[:, 1] = np.repeat(np.arange(4), 4)
    img_ids[:, 2] = np.tile(np.arange(4), 4)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            text_encoder_layers=[torch.from_numpy(l) for l in layers],
            timestep=torch.from_numpy(t), img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
        ).sample.numpy()
    rope = m.pos_embed(np.concatenate([txt_ids, img_ids], axis=0))
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), [jnp.asarray(l) for l in layers],
          jnp.asarray(t), image_rotary_emb=rope).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class DummyTok:
    bos_token_id = 1

    def __call__(self, text, padding=None, max_length=None, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        lens = [min(max_length or 16, 5 + len(t) % 4) for t in text]
        width = max(lens)
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_bria_fibo_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.bria_fibo import BriaFiboPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    # 2+2 blocks need >= 4 hidden-state layers -> 3-layer LM gives 4 (embeds + 3)
    te = LlamaModel(vocab_size=128, hidden_size=12, intermediate_size=24, num_hidden_layers=3,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=6)
    transformer = BriaFiboTransformer2DModel(**TINY)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=8, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False], latents_mean=[0.0] * 8, latents_std=[1.0] * 8,
        scale_factor_temporal=1, scale_factor_spatial=2,
    )
    pipe = BriaFiboPipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
    )
    pipe.vae_scale_factor = 2  # tiny VAE downsamples 2x (hub config is 16x)
    out = pipe('{"scene": "a lighthouse at dusk"}', height=8, width=8,
               num_inference_steps=2, guidance_scale=2.0, key=key,
               max_sequence_length=12, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
