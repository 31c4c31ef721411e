"""Ovis-Image: transformer parity vs torch reference + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_ovis_image.py:384`,
`/root/reference/src/diffusers/pipelines/ovis_image/pipeline_ovis_image.py:129`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ovis_image import OvisImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=16,
    out_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=24,
    axes_dims_rope=(2, 2, 4),
)


@pytest.mark.refparity
def test_ovis_image_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import OvisImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = OvisImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 6
    x = rng.randn(B, S_img, 16).astype(np.float32)
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)
    txt_ids = np.zeros((S_txt, 3), np.float32)
    txt_ids[:, 1] = np.arange(S_txt)
    txt_ids[:, 2] = np.arange(S_txt)
    img_ids = np.zeros((S_img, 3), np.float32)
    img_ids[:, 1] = np.repeat(np.arange(4), 4)
    img_ids[:, 2] = np.tile(np.arange(4), 4)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t), img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
        ).sample.numpy()
    rope = m.pos_embed(np.concatenate([txt_ids, img_ids], axis=0))
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), image_rotary_emb=rope).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class DummyQwen3Tok:
    def apply_chat_template(self, message, tokenize=False, add_generation_prompt=True,
                            enable_thinking=False):
        return message[0]["content"]

    def __call__(self, text, padding=None, truncation=True, max_length=None,
                 return_tensors="np", add_special_tokens=False):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 30 + len(t) % 5)
            ids[i, :n] = [(hash(t) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_ovis_image_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.ovis_image import OvisImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = OvisImageTransformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, scaling_factor=1.0, shift_factor=0.0,
    )
    te = LlamaModel(vocab_size=128, hidden_size=24, intermediate_size=48, num_hidden_layers=2,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=12, qk_norm=True)
    pipe = OvisImagePipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyQwen3Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )
    out = pipe("a cat on a mat", height=16, width=16, num_inference_steps=2,
               guidance_scale=2.0, key=key, max_sequence_length=16, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
