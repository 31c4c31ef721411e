"""ERNIE-Image: transformer parity vs torch reference + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_ernie_image.py:296`,
`/root/reference/src/diffusers/pipelines/ernie_image/pipeline_ernie_image.py:42`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ernie_image import ErnieImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    hidden_size=32,
    num_attention_heads=2,
    num_layers=2,
    ffn_hidden_size=48,
    in_channels=16,
    out_channels=16,
    patch_size=1,
    text_in_dim=12,
    rope_theta=256,
    rope_axes_dim=(4, 6, 6),
)


@pytest.mark.refparity
def test_ernie_image_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ErnieImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    with torch.no_grad():  # zero-init heads/modulation degenerate; randomize
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ErnieImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, H, W, Tmax = 2, 4, 6, 5
    x = rng.randn(B, 16, H, W).astype(np.float32)
    text = rng.randn(B, Tmax, 12).astype(np.float32)
    lens = np.array([5, 3], dtype=np.int64)
    text[1, 3:] = 0.0
    t = np.array([0.25, 0.75], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            text_bth=torch.from_numpy(text), text_lens=torch.from_numpy(lens),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text), jnp.asarray(lens)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class DummyTok:
    bos_token_id = 1

    def __call__(self, text, add_special_tokens=True, truncation=True, padding=False):
        n = 4 + len(text) % 5
        return {"input_ids": [(hash(text) + j) % 60 + 2 for j in range(n)]}


def test_ernie_image_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_flux2 import AutoencoderKLFlux2
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.ernie_image import ErnieImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = ErnieImageTransformer2DModel(**TINY)
    vae = AutoencoderKLFlux2(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 8), layers_per_block=1,
        latent_channels=4, norm_num_groups=4,
    )
    te = LlamaModel(vocab_size=64, hidden_size=12, intermediate_size=24, num_hidden_layers=3,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=6)
    pipe = ErnieImagePipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
        scheduler=FlowMatchEulerDiscreteScheduler(),
    )
    # vae_scale_factor = 2**2 = 4; 16x16 image -> 4x4 latent grid, 16ch patchified
    out = pipe("a red cube", height=16, width=16, num_inference_steps=2,
               guidance_scale=2.0, key=key, output_type="np", use_pe=False)
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
