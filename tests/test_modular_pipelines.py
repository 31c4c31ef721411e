"""Modular pipeline runtime: block model, sequential/auto dispatch, the
scanned SD denoise block pack, ComponentsManager dedup (reference
`modular_pipelines/modular_pipeline.py:321,615,963,1325`,
`components_manager.py:302`)."""

import jax
import numpy as np
import pytest

from diffusers_tpu.modular_pipelines import (
    AutoPipelineBlocks,
    ComponentsBundle,
    ComponentsManager,
    InputParam,
    ModularPipeline,
    ModularPipelineBlocks,
    OutputParam,
    PipelineState,
)
from diffusers_tpu.modular_pipelines.stable_diffusion import SD_BLOCKS

from tests.test_pipeline_stable_diffusion import get_dummy_pipeline


def _components():
    pipe = get_dummy_pipeline()
    return ComponentsBundle(
        unet=pipe.unet, vae=pipe.vae, text_encoder=pipe.text_encoder,
        tokenizer=pipe.tokenizer, scheduler=pipe.scheduler,
    ), pipe


def test_sd_modular_blocks_match_monolithic_pipeline():
    components, pipe = _components()
    modular = ModularPipeline(SD_BLOCKS(), components)
    kwargs = dict(prompt="a modular fox", height=16, width=16, num_inference_steps=2,
                  guidance_scale=6.0, key=jax.random.PRNGKey(3))
    images = modular(output="images", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").images)
    np.testing.assert_allclose(np.asarray(images), ref, atol=1e-4)


def test_block_declarations_and_state():
    blocks = SD_BLOCKS()
    names = blocks.input_names
    assert "prompt" in names and "guidance_scale" in names
    # intermediates produced upstream are not user inputs
    assert "prompt_embeds" not in names
    outs = [o.name for o in blocks.intermediate_outputs]
    assert "latents" in outs and "images" in outs

    state = PipelineState()
    state.set("a", 1)
    assert "a" in state and state.get(["a", "b"], default=0) == {"a": 1, "b": 0}


def test_auto_block_trigger_dispatch():
    class A(ModularPipelineBlocks):
        inputs = [InputParam("image", default=None)]
        intermediate_outputs = [OutputParam("route")]

        def __call__(self, components, state):
            state.set("route", "img2img")
            return state

    class B(ModularPipelineBlocks):
        inputs = []
        intermediate_outputs = [OutputParam("route")]

        def __call__(self, components, state):
            state.set("route", "text2img")
            return state

    class Auto(AutoPipelineBlocks):
        block_classes = [A, B]
        block_names = ["img2img", "text2img"]
        block_trigger_inputs = ["image", None]

    auto = Auto()
    s = PipelineState()
    s.set("image", object())
    assert auto(None, s).get("route") == "img2img"
    s2 = PipelineState()
    assert auto(None, s2).get("route") == "text2img"


def test_missing_required_input_raises():
    class NeedsX(ModularPipelineBlocks):
        inputs = [InputParam("x", required=True)]

        def __call__(self, components, state):
            self.get_block_state(state)
            return state

    with pytest.raises(ValueError, match="missing required input"):
        NeedsX()(None, PipelineState())


def test_components_manager_dedup_and_info():
    components, pipe = _components()
    manager = ComponentsManager()
    name = manager.add("unet", components.unet, collection="sd")
    # identical param tree registered under a different name → deduped
    name2 = manager.add("unet_copy", (components.unet[0], components.unet[1]))
    assert name2 == name
    info = manager.get_model_info("unet")
    assert info["num_params"] > 0 and info["memory_bytes"] > 0
    assert "unet" in manager.get_components_by_collection("sd")
    manager.remove("unet")
    assert "unet" not in manager


# --------------------------------------------------------- round-4 depth

def test_sdxl_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.stable_diffusion_xl import SDXL_BLOCKS
    from tests.test_pipeline_sdxl import get_dummy_pipeline as get_sdxl

    pipe = get_sdxl()
    components = ComponentsBundle(
        unet=pipe.unet, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, text_encoder_2=pipe.text_encoder_2,
        tokenizer=pipe.tokenizer, tokenizer_2=pipe.tokenizer_2,
    )
    modular = ModularPipeline(SDXL_BLOCKS(), components)
    kwargs = dict(prompt="a modular astronaut", height=16, width=16, num_inference_steps=3,
                  guidance_scale=5.0, key=jax.random.PRNGKey(7))
    images = modular(output="images", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").images)
    np.testing.assert_allclose(np.asarray(images), ref, atol=1e-3)


def test_flux_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.flux import FLUX_BLOCKS
    from tests.test_pipeline_flux import get_dummy_pipeline as get_flux

    pipe = get_flux()
    components = ComponentsBundle(
        transformer=pipe.transformer, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, text_encoder_2=pipe.text_encoder_2,
        tokenizer=pipe.tokenizer, tokenizer_2=pipe.tokenizer_2,
    )
    modular = ModularPipeline(FLUX_BLOCKS(), components)
    kwargs = dict(prompt="a modular squirrel", height=32, width=32, num_inference_steps=2,
                  guidance_scale=3.5, max_sequence_length=16, key=jax.random.PRNGKey(11))
    images = modular(output="images", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").images)
    np.testing.assert_allclose(np.asarray(images), ref, atol=1e-3)


def test_modular_pipeline_from_pretrained(tmp_path):
    from diffusers_tpu.modular_pipelines.stable_diffusion_xl import SDXL_BLOCKS
    from tests.test_pipeline_sdxl import DummyTokenizer, get_dummy_pipeline as get_sdxl

    pipe = get_sdxl()
    pipe.save_pretrained(str(tmp_path / "sdxl"))
    manager = ComponentsManager()
    modular = ModularPipeline.from_pretrained(
        str(tmp_path / "sdxl"),
        tokenizer=DummyTokenizer(), tokenizer_2=DummyTokenizer(),
        components_manager=manager, collection="sdxl",
    )
    assert isinstance(modular.blocks, SDXL_BLOCKS)  # resolved from _class_name
    assert "unet" in manager and manager.get_memory_footprint() > 0
    images = modular(output="images", prompt="loaded", height=16, width=16,
                     num_inference_steps=2, guidance_scale=5.0,
                     key=jax.random.PRNGKey(0), output_type="np")
    assert np.asarray(images).shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(images)).all()


def test_components_manager_content_dedup_and_offload_guard():
    import copy

    components, pipe = _components()
    manager = ComponentsManager()
    name = manager.add("unet", components.unet)
    # a deep copy has different leaf ids but identical content -> deduped
    copied = (components.unet[0], copy.deepcopy(jax.device_get(components.unet[1])))
    copied = (copied[0], jax.tree.map(jax.numpy.asarray, copied[1]))
    name2 = manager.add("unet_reload", copied)
    assert name2 == name
    with pytest.raises(NotImplementedError, match="HBM-resident"):
        manager.enable_auto_cpu_offload()
