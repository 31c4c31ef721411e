"""GGUF parse/write round-trip, load-time quantizer lifecycle,
PipelineQuantizationConfig routing, and DDUF archives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.quantizers import (
    Int8WeightOnlyConfig,
    PipelineQuantizationConfig,
    load_gguf_checkpoint,
    resolve_quantization_config,
    save_gguf,
)
from diffusers_tpu.quantizers.gguf import quantize_q8_0


def test_gguf_roundtrip_f32_f16(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(8, 16).astype(np.float32),
        "b.weight": rng.randn(4, 4, 3).astype(np.float16),
    }
    path = str(tmp_path / "m.gguf")
    save_gguf(path, tensors, metadata={"general.architecture": "test"})
    loaded, meta = load_gguf_checkpoint(path, return_metadata=True)
    assert meta["general.architecture"] == "test"
    np.testing.assert_array_equal(loaded["a.weight"], tensors["a.weight"])
    np.testing.assert_array_equal(loaded["b.weight"], tensors["b.weight"])


def test_gguf_q8_0_dequant_accuracy(tmp_path):
    rng = np.random.RandomState(1)
    w = rng.randn(64, 96).astype(np.float32)
    path = str(tmp_path / "q.gguf")
    save_gguf(path, {"w": w}, quantize="q8_0")
    loaded = load_gguf_checkpoint(path)
    # Q8_0: per-32-block absmax/127 scale → max error = scale/2 (+ f16
    # rounding of the stored scale, worst case ~scale * 2^-11)
    scale = np.abs(w.reshape(-1, 32)).max(axis=1, keepdims=True) / 127.0
    err = np.abs(loaded["w"].reshape(-1, 32) - w.reshape(-1, 32))
    assert (err <= scale * 0.501 + 1e-7).all()


def test_q4_q5_dequant_against_manual():
    """Hand-pack one Q4_0 block and check the vectorized dequant."""
    import struct

    from diffusers_tpu.quantizers.gguf import GGML_Q4_0, _dequant

    d = np.float16(0.5)
    nibbles = np.arange(16, dtype=np.uint8)
    qs = (nibbles | (nibbles[::-1] << 4)).astype(np.uint8)  # elem i=lo, i+16=hi
    raw = np.frombuffer(d.tobytes() + qs.tobytes(), dtype=np.uint8)
    out = _dequant(raw, GGML_Q4_0, 32)
    expected = np.concatenate([np.arange(16), np.arange(16)[::-1]]).astype(np.float32)
    np.testing.assert_allclose(out, 0.5 * (expected - 8.0), rtol=1e-3)


def test_resolve_quantization_config():
    assert resolve_quantization_config(None) is None
    cfg = resolve_quantization_config("int8_weight_only")
    assert isinstance(cfg, Int8WeightOnlyConfig)
    cfg = resolve_quantization_config({"quant_method": "int8_weight_only", "min_weight_size": 1})
    assert cfg.min_weight_size == 1
    with pytest.raises(ValueError, match="unknown quant_method"):
        resolve_quantization_config("nvfp4")


def test_model_from_pretrained_quantizes(tmp_path):
    from diffusers_tpu.models import UNet2DModel

    model = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=8,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    model.save_pretrained(tmp_path, params)
    _, qparams = UNet2DModel.from_pretrained(
        tmp_path, quantization_config={"quant_method": "int8_weight_only", "min_weight_size": 1}
    )
    found = []
    def walk(t):
        if isinstance(t, dict):
            if "kernel_scale" in t:
                found.append(t["kernel"].dtype)
            for v in t.values():
                if isinstance(v, dict):
                    walk(v)
    walk(qparams)
    assert found and all(d == jnp.int8 for d in found)


def test_pipeline_quant_config_routing():
    pq = PipelineQuantizationConfig(
        quant_backend="int8_weight_only", components_to_quantize=["unet"]
    )
    assert isinstance(pq.config_for("unet"), Int8WeightOnlyConfig)
    assert pq.config_for("vae") is None
    pq2 = PipelineQuantizationConfig(quant_mapping={"transformer": "fp8_weight_only"})
    assert pq2.config_for("transformer").quant_method == "fp8_weight_only"
    assert pq2.config_for("unet") is None


def test_dduf_roundtrip(tmp_path):
    from diffusers_tpu.models import UNet2DModel
    from diffusers_tpu.pipelines import DDPMPipeline
    from diffusers_tpu.schedulers import DDPMScheduler
    from diffusers_tpu.utils.dduf import save_dduf

    model = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=8,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = DDPMPipeline(unet=(model, params), scheduler=DDPMScheduler(num_train_timesteps=10))
    saved = tmp_path / "pipe"
    pipe.save_pretrained(saved)
    archive = save_dduf(str(saved), str(tmp_path / "pipe.dduf"))

    pipe2 = DDPMPipeline.from_pretrained(archive)
    a = pipe(batch_size=1, num_inference_steps=2, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe2(batch_size=1, num_inference_steps=2, key=jax.random.PRNGKey(0), output_type="np").images
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_model_from_gguf_file(tmp_path):
    from diffusers_tpu.models import UNet2DModel
    from diffusers_tpu.models.modeling_utils import flatten_to_torch_state_dict

    model = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=8,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    model.save_pretrained(tmp_path, params)
    sd = flatten_to_torch_state_dict(model, params)
    save_gguf(str(tmp_path / "model.gguf"), {k: np.ascontiguousarray(v) for k, v in sd.items()})
    _, params2 = UNet2DModel.from_pretrained(tmp_path, gguf_file="model.gguf")
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
