"""AutoPipeline task resolution (reference tests/pipelines/test_pipelines_auto.py)."""

import numpy as np


def test_auto_pipeline_task_resolution(tmp_path):
    from diffusers_tpu import (
        AutoPipelineForImage2Image,
        AutoPipelineForInpainting,
        AutoPipelineForText2Image,
    )
    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline
    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion_img2img import (
        StableDiffusionImg2ImgPipeline,
    )
    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion_inpaint import (
        StableDiffusionInpaintPipeline,
    )
    from test_pipeline_stable_diffusion import DummyTokenizer, get_dummy_pipeline

    pipe = get_dummy_pipeline()
    pipe.save_pretrained(tmp_path)
    # the hermetic test tokenizer is not a real transformers class — null it
    # in the serialized index (components may be None) and re-attach post-load
    import json

    index_path = tmp_path / "model_index.json"
    index = json.loads(index_path.read_text())
    index["tokenizer"] = [None, None]
    index_path.write_text(json.dumps(index))

    t2i = AutoPipelineForText2Image.from_pretrained(str(tmp_path))
    assert isinstance(t2i, StableDiffusionPipeline)
    i2i = AutoPipelineForImage2Image.from_pretrained(str(tmp_path))
    assert isinstance(i2i, StableDiffusionImg2ImgPipeline)
    inp = AutoPipelineForInpainting.from_pretrained(str(tmp_path))
    assert isinstance(inp, StableDiffusionInpaintPipeline)
    i2i.tokenizer = DummyTokenizer()

    import jax

    out = i2i(
        "a cat",
        image=np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1,
        strength=0.5,
        num_inference_steps=4,
        guidance_scale=5.0,
        key=jax.random.PRNGKey(0),
        output_type="np",
    )
    assert out.images.shape == (1, 8, 8, 3) and np.isfinite(out.images).all()


def test_from_pipe_shares_components():
    """from_pipe rebinds components by reference (pipeline_utils.py:2122)."""
    import jax
    import numpy as np

    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion_img2img import (
        StableDiffusionImg2ImgPipeline,
    )
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    t2i = get_dummy_pipeline()
    i2i = StableDiffusionImg2ImgPipeline.from_pipe(t2i)
    assert i2i.unet[1] is t2i.unet[1]  # zero-copy component sharing
    assert i2i.vae[1] is t2i.vae[1]

    image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    from PIL import Image

    out = i2i(
        prompt="from_pipe check",
        image=Image.fromarray((image * 255).astype(np.uint8)),
        strength=0.5,
        num_inference_steps=2,
        output_type="np",
        key=jax.random.PRNGKey(0),
    ).images
    assert np.isfinite(out).all()
