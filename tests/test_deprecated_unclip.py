"""UnCLIP (Karlo) pipeline: prior → variance-learning decoder → two-phase
super-res, with the UnCLIPTextProjModel conditioning."""

import jax
import jax.numpy as jnp
import numpy as np


class Tok:
    model_max_length = 7

    def __call__(self, prompts, padding=None, max_length=7, truncation=True, return_tensors="np"):
        class Out:
            pass

        o = Out()
        ids, masks = [], []
        for p in prompts:
            n = len(p) % 3 + 2
            ids.append([((hash(p) + i) % 80) + 2 for i in range(n)] + [0] * (max_length - n))
            masks.append([1] * n + [0] * (max_length - n))
        o.input_ids = np.array(ids)
        o.attention_mask = np.array(masks)
        return o


def test_unclip_pipeline_smoke():
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.transformers.prior_transformer import PriorTransformer
    from diffusers_tpu.models.unets.unet_2d import UNet2DModel
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.deprecated.unclip import UnCLIPPipeline, UnCLIPTextProjModel
    from diffusers_tpu.schedulers.scheduling_unclip import UnCLIPScheduler

    key = jax.random.PRNGKey(0)
    prior = PriorTransformer(num_attention_heads=2, attention_head_dim=8, num_layers=2,
                             embedding_dim=16, num_embeddings=7, additional_embeddings=4)
    te = CLIPTextModelWithProjection(
        vocab_size=100, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16)
    text_proj = UnCLIPTextProjModel(clip_extra_context_tokens=2, clip_embeddings_dim=16,
                                    time_embed_dim=32, cross_attention_dim=16)
    # 8px variance-learning decoder: in 3, out 6, identity class embedding
    decoder = UNet2DConditionModel(
        sample_size=8, in_channels=3, out_channels=6, layers_per_block=1,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), attention_head_dim=2, cross_attention_dim=16,
        norm_num_groups=4, class_embed_type="identity")
    sr = UNet2DModel(
        sample_size=16, in_channels=6, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4)

    pipe = UnCLIPPipeline(
        prior=(prior, prior.init_params(key)),
        decoder=(decoder, decoder.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(),
        text_proj=(text_proj, text_proj.init_params(key)),
        super_res_first=(sr, sr.init_params(key)),
        super_res_last=(sr, sr.init_params(jax.random.PRNGKey(7))),
        prior_scheduler=UnCLIPScheduler(variance_type="fixed_small_log", prediction_type="sample",
                                        clip_sample=True, clip_sample_range=5.0),
        decoder_scheduler=UnCLIPScheduler(variance_type="learned_range", prediction_type="epsilon"),
        super_res_scheduler=UnCLIPScheduler(variance_type="fixed_small_log", prediction_type="epsilon"),
    )
    out = pipe("a corgi", prior_num_inference_steps=2, decoder_num_inference_steps=2,
               super_res_num_inference_steps=2, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()
