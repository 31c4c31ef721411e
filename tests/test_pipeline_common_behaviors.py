"""PipelineTesterMixin applied across pipeline families (reference strategy:
every pipeline suite inherits test_pipelines_common.PipelineTesterMixin)."""

import jax

from tests.pipeline_test_utils import PipelineTesterMixin


class TestStableDiffusionCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a red fox", height=16, width=16, num_inference_steps=2,
            guidance_scale=6.0, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestFluxCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_flux import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a blue owl", height=32, width=32, num_inference_steps=2,
            output_type="np", key=jax.random.PRNGKey(0),
        )


class TestSDXLCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_sdxl import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a glass bridge", height=32, width=32, num_inference_steps=2,
            guidance_scale=5.0, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestWanCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_wan import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a paper boat", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=5.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )


class TestLTXCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_ltx import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a meteor shower", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=3.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )


class TestHunyuanVideoCommon(PipelineTesterMixin):
    output_attr = "frames"
    cfg_param = None  # distilled guidance; no on/off CFG surface

    def get_pipeline(self):
        from tests.test_pipeline_hunyuan_video import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        from tests.test_pipeline_hunyuan_video import TEMPLATE

        return dict(
            prompt="a neon fox", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=6.0, prompt_template=TEMPLATE,
            max_sequence_length=8, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestCogVideoXCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_cogvideox import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a paper crane", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=6.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )


class TestPixArtCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_pixart import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a copper kite", height=8, width=8, num_inference_steps=2,
            guidance_scale=4.0, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestAnimateDiffCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_animatediff import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a wooden train", height=16, width=16, num_frames=4,
            num_inference_steps=2, guidance_scale=6.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )


class TestSVDCommon(PipelineTesterMixin):
    output_attr = "frames"
    batch_param = "image"
    supports_batch_consistency = False
    cfg_param = None

    def get_pipeline(self):
        from tests.test_pipeline_svd import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        import numpy as _np

        image = _np.zeros((1, 3, 16, 16), dtype=_np.float32)
        return dict(
            image=image, height=16, width=16, num_frames=4,
            num_inference_steps=2, output_type="np", key=jax.random.PRNGKey(0),
        )
