"""SD3ControlNetModel parity vs torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_sd3 import SD3ControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=32,
    patch_size=1,
    in_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=32,
    caption_projection_dim=32,
    pooled_projection_dim=64,
    out_channels=4,
    pos_embed_max_size=96,
)


def _inputs():
    rng = np.random.RandomState(0)
    return dict(
        hidden_states=rng.randn(2, 4, 16, 16).astype(np.float32),
        controlnet_cond=rng.randn(2, 4, 16, 16).astype(np.float32),
        encoder_hidden_states=rng.randn(2, 8, 32).astype(np.float32),
        pooled_projections=rng.randn(2, 64).astype(np.float32),
        timestep=np.array([500, 500], dtype=np.int64),
    )


@pytest.mark.refparity
def test_sd3_controlnet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import SD3ControlNetModel as TorchCN

    tm = TorchCN(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if not k.endswith("pos_embed.pos_embed")}
    m = SD3ControlNetModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    ins = _inputs()
    with torch.no_grad():
        ref = tm(**{k: torch.from_numpy(v) for k, v in ins.items()}, conditioning_scale=0.7)
    out = m(params, conditioning_scale=0.7, **{k: jnp.asarray(v) for k, v in ins.items()})

    assert len(out.controlnet_block_samples) == len(ref.controlnet_block_samples)
    for mine, theirs in zip(out.controlnet_block_samples, ref.controlnet_block_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-4


@pytest.mark.refparity
def test_sd3_controlnet_injection_parity():
    torch = pytest.importorskip("torch")
    from diffusers import SD3ControlNetModel as TorchCN, SD3Transformer2DModel as TorchSD3

    tcn = TorchCN(**TINY)
    tcn.eval()
    tfm = TorchSD3(**TINY)
    tfm.eval()
    cn = SD3ControlNetModel(**TINY)
    cn_params = convert_torch_state_dict(
        cn, {k: v.detach().numpy() for k, v in tcn.state_dict().items() if not k.endswith("pos_embed.pos_embed")}
    )
    fm = SD3Transformer2DModel(**TINY)
    fm_params = convert_torch_state_dict(
        fm, {k: v.detach().numpy() for k, v in tfm.state_dict().items() if not k.endswith("pos_embed.pos_embed")}
    )

    ins = _inputs()
    with torch.no_grad():
        torch_ins = {k: torch.from_numpy(v) for k, v in ins.items()}
        cn_ref = tcn(**torch_ins, conditioning_scale=0.9)
        fwd = {k: v for k, v in torch_ins.items() if k != "controlnet_cond"}
        ref = tfm(**fwd, block_controlnet_hidden_states=cn_ref.controlnet_block_samples).sample.numpy()

    jax_ins = {k: jnp.asarray(v) for k, v in ins.items()}
    cn_out = cn(cn_params, conditioning_scale=0.9, **jax_ins)
    fwd_jax = {k: v for k, v in jax_ins.items() if k != "controlnet_cond"}
    out = np.asarray(
        fm(fm_params, **fwd_jax, block_controlnet_hidden_states=cn_out.controlnet_block_samples).sample
    )
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


def test_sd3_controlnet_zero_init_noop():
    cn = SD3ControlNetModel(**TINY)
    params = cn.init_params(jax.random.PRNGKey(0))
    ins = {k: jnp.asarray(v) for k, v in _inputs().items()}
    out = cn(params, conditioning_scale=1.0, **ins)
    for s in out.controlnet_block_samples:
        assert float(jnp.abs(s).max()) == 0.0


def test_sd3_controlnet_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.controlnet_sd3.pipeline_stable_diffusion_3_controlnet import (
        StableDiffusion3ControlNetPipeline,
    )
    from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler
    from test_pipeline_sdxl import DummyTokenizer

    key = jax.random.PRNGKey(0)
    # num_layers=2: the last block is context_pre_only and skips controlnet injection
    tiny = dict(sample_size=8, patch_size=2, in_channels=4, num_layers=2, attention_head_dim=8,
                num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
                pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96)
    transformer = SD3Transformer2DModel(**tiny)
    cn = SD3ControlNetModel(**tiny)
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    cn_params["controlnet_blocks"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.2, cn_params["controlnet_blocks"]
    )
    cn_params["pos_embed_input"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(8), x.shape) * 0.2, cn_params["pos_embed_input"]
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=1.5, shift_factor=0.06,
    )
    te1 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                                      num_attention_heads=2, projection_dim=16)
    te2 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                                      num_attention_heads=2, projection_dim=16)
    t5 = T5EncoderModel(vocab_size=1000, d_model=32, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    pipe = StableDiffusion3ControlNetPipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=3.0),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te1, te1.init_params(key)),
        tokenizer=DummyTokenizer(),
        text_encoder_2=(te2, te2.init_params(key)),
        tokenizer_2=DummyTokenizer(),
        text_encoder_3=(t5, t5.init_params(key)),
        tokenizer_3=DummyTokenizer(),
        controlnet=(cn, cn_params),
    )
    cond = jnp.asarray(np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1)
    out = pipe("a house", control_image=cond, height=8, width=8, num_inference_steps=2,
               guidance_scale=5.0, controlnet_conditioning_scale=0.8, max_sequence_length=16,
               key=key, output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()

    out0 = pipe("a house", control_image=cond, height=8, width=8, num_inference_steps=2,
                guidance_scale=5.0, controlnet_conditioning_scale=0.0, max_sequence_length=16,
                key=key, output_type="np")
    assert np.abs(out.images - out0.images).max() > 1e-6
