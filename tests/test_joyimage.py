"""JoyImage: transformer parity vs torch reference (multi-item roll path) +
edit pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_joyimage.py:372`,
`/root/reference/src/diffusers/pipelines/joyimage/pipeline_joyimage_edit.py:104`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_joyimage import JoyImageEditTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=[1, 2, 2],
    in_channels=4,
    hidden_size=24,
    num_attention_heads=2,
    text_dim=16,
    mlp_width_ratio=2.0,
    num_layers=2,
    rope_dim_list=[4, 4, 4],
    rope_type="mrope",
    theta=256,
)


@pytest.mark.refparity
def test_joyimage_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_joyimage import (
        JoyImageEditTransformer3DModel as TorchModel,
    )

    tm = TorchModel(**TINY)
    tm.eval()
    with torch.no_grad():  # zero modulation tables degenerate; randomize
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = JoyImageEditTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, N = 2, 3  # multi-item: 2 reference slots + 1 target
    x = rng.randn(B, N, 4, 1, 8, 8).astype(np.float32)
    ehs = rng.randn(B, 5, 16).astype(np.float32)
    t = np.array([500.0, 20.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


class DummyTok:
    def __call__(self, text, max_length=None, padding=True, truncation=True,
                 return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        lens = [min(max_length or 64, 40 + len(t) % 5) for t in text]
        width = max(lens)
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_joyimage_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.joyimage import JoyImageEditPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = JoyImageEditTransformer3DModel(**TINY)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=1, scale_factor_spatial=2,
    )
    te = LlamaModel(vocab_size=128, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=8, qk_norm=True)
    pipe = JoyImageEditPipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
    )
    ref_image = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    out = pipe("make the sky purple", image=ref_image, height=16, width=16,
               num_inference_steps=2, guidance_scale=2.0, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
