"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: SDXL-class UNet forward latency at 1024px (the reference benchmark
CI's SDXL workload, `/root/reference/benchmarks/benchmarking_sdxl.py:10`),
bf16, batch 2 (CFG pair), on the attached accelerator. From it we derive
images/sec for a 30-step generation.

vs_baseline: the reference publishes no absolute SDXL-UNet-on-L40 number in
its repo; BASELINE.json's north star is images/sec/chip >= 2x reference
A100. Public measurements put SDXL 1024px 30-step at ~0.51 images/sec on
A100-80GB bf16 (no compile). vs_baseline reports our images/sec / (2 x 0.51).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_sdxl_unet():
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    # stabilityai/stable-diffusion-xl-base-1.0 unet config (architecture-true)
    model = UNet2DConditionModel(
        sample_size=128,
        in_channels=4,
        out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        transformer_layers_per_block=(1, 2, 10),
        attention_head_dim=(5, 10, 20),
        cross_attention_dim=2048,
        use_linear_projection=True,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
    )
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return model, params


def main():
    model, params = build_sdxl_unet()
    batch = 2  # CFG pair
    h = w = 128  # 1024px / 8
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(batch, 4, h, w), dtype=jnp.bfloat16)
    ehs = jnp.asarray(rng.randn(batch, 77, 2048), dtype=jnp.bfloat16)
    text_embeds = jnp.asarray(rng.randn(batch, 1280), dtype=jnp.bfloat16)
    time_ids = jnp.asarray(rng.randn(batch, 6), dtype=jnp.bfloat16)

    @jax.jit
    def fwd(params, sample, t, ehs, text_embeds, time_ids):
        return model(
            params,
            sample,
            t,
            encoder_hidden_states=ehs,
            added_cond_kwargs={"text_embeds": text_embeds, "time_ids": time_ids},
        ).sample

    # warmup/compile. NOTE: through the axon tunnel block_until_ready does not
    # actually wait for device completion — a scalar readback is the only
    # reliable fence, so we time N queued steps and fetch one scalar at the end.
    out = fwd(params, sample, jnp.asarray(500), ehs, text_embeds, time_ids)
    _ = float(jnp.sum(out.astype(jnp.float32)))

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, sample, jnp.asarray(500), ehs, text_embeds, time_ids)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    latency = (time.perf_counter() - start) / n_iters

    # 30-step CFG-pair generation throughput (UNet-dominated; VAE ignored)
    images_per_sec = 1.0 / (30 * latency)
    a100_reference_imgs_per_sec = 0.51  # public SDXL 1024px 30-step A100 bf16
    print(
        json.dumps(
            {
                "metric": "sdxl_unet_fwd_latency_1024px_bf16_b2",
                "value": round(latency * 1000, 3),
                "unit": "ms",
                "images_per_sec_30step": round(images_per_sec, 4),
                "vs_baseline": round(images_per_sec / (2 * a100_reference_imgs_per_sec), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
