"""AnyFlow: transformer parity vs torch reference, FlowMapEuler scheduler
parity, pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_anyflow.py:507`,
`/root/reference/src/diffusers/schedulers/scheduling_flow_map_euler_discrete.py:42`,
`/root/reference/src/diffusers/pipelines/anyflow/pipeline_anyflow.py`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_anyflow import AnyFlowTransformer3DModel
from diffusers_tpu.schedulers import FlowMapEulerDiscreteScheduler

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=48,
    num_layers=2,
    cross_attn_norm=True,
    rope_max_seq_len=32,
    gate_value=0.25,
    deltatime_type="r",
)


@pytest.mark.refparity
def test_anyflow_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AnyFlowTransformer3DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AnyFlowTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, F = 2, 3
    x = rng.randn(B, F, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(B, 5, 16).astype(np.float32)
    t = rng.uniform(100, 900, (B, F)).astype(np.float32)
    r = rng.uniform(0, 100, (B, F)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            r_timestep=torch.from_numpy(r), encoder_hidden_states=torch.from_numpy(ehs),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(r), jnp.asarray(ehs)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_flow_map_euler_parity():
    torch = pytest.importorskip("torch")
    from diffusers.schedulers.scheduling_flow_map_euler_discrete import (
        FlowMapEulerDiscreteScheduler as TorchSched,
    )

    ts = TorchSched(num_train_timesteps=1000, shift=5.0)
    ts.set_timesteps(4)
    ours = FlowMapEulerDiscreteScheduler(num_train_timesteps=1000, shift=5.0)
    state = ours.set_timesteps(4)
    assert np.allclose(np.asarray(state.sigmas), ts.sigmas.numpy(), atol=1e-6)
    assert np.allclose(np.asarray(state.timesteps), ts.timesteps.numpy(), atol=1e-3)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 2, 4, 4, 4).astype(np.float32)
    for i, t in enumerate(ts.timesteps.tolist()):
        v = rng.randn(*sample.shape).astype(np.float32)
        ref = ts.step(torch.from_numpy(v), t, torch.from_numpy(sample), return_dict=False)[0]
        out = ours.step(state, jnp.asarray(v), t, jnp.asarray(sample), return_dict=False)[0]
        assert np.max(np.abs(np.asarray(out) - ref.numpy())) < 1e-5, i
        # any-step: explicit off-schedule r
        ref2 = ts.step(torch.from_numpy(v), t, torch.from_numpy(sample),
                       r_timestep=123.0, return_dict=False)[0]
        out2 = ours.step(state, jnp.asarray(v), t, jnp.asarray(sample),
                         r_timestep=123.0, return_dict=False)[0]
        assert np.max(np.abs(np.asarray(out2) - ref2.numpy())) < 1e-5
        sample = ref.numpy()


class DummyTok:
    def __call__(self, text, padding=None, max_length=None, truncation=True,
                 return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 5 + len(t) % 4)
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1

        class R:
            input_ids = ids
            attention_mask = mask

        return R()


def test_anyflow_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.pipelines.anyflow import AnyFlowPipeline

    key = jax.random.PRNGKey(0)
    transformer = AnyFlowTransformer3DModel(**TINY)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    te = UMT5EncoderModel(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    pipe = AnyFlowPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=FlowMapEulerDiscreteScheduler(shift=5.0),
    )
    out = pipe("a sunrise timelapse", height=16, width=16, num_frames=5,
               num_inference_steps=2, key=key, max_sequence_length=10, output_type="latent")
    assert np.isfinite(np.asarray(out.frames)).all()
