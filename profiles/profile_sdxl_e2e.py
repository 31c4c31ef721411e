"""Stage-breakdown profile of the real SDXL pipeline call on one TPU chip.

Measures, with scalar-readback fences (the only reliable device fence
through the axon tunnel), where the end-to-end wall clock goes:

  1. encode      — tokenize + both jitted CLIP towers (pos + neg paths)
  2. latent      — full call with output_type="latent" (encode + prep +
                   30-step CFG denoise scan, no decode)
  3. full        — default output_type="pil" (adds VAE decode + device
                   uint8 postprocess + host transfer + PIL wrap)

Derived:  denoise = latent - encode;  decode+transfer = full - latent.

Companion artifact: profiles/sdxl_e2e_r04.md (committed numbers).
Optionally writes a jax.profiler trace with --trace <dir> for
TensorBoard/Perfetto (reference analogue:
examples/profiling/profiling_pipelines.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "astype"):
            return float(jnp.sum(leaf.astype(jnp.float32)))
    return None


def timeit(fn, iters=3):
    fn()  # warm (compile)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    return (time.perf_counter() - start) / iters, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--trace", type=str, default=None, help="jax.profiler trace dir")
    args = parser.parse_args()

    from bench import build_sdxl_pipeline

    pipe = build_sdxl_pipeline()
    prompt = "a photo of an astronaut riding a horse on mars"

    # 1. encode stage (both towers, pos + forced-zeros neg path)
    def encode():
        out = pipe.encode_prompt(prompt, do_cfg=True)
        fence(out[0])
        return out

    encode_s, _ = timeit(encode)

    # 2. through denoise (latent output skips decode)
    def latent_call():
        out = pipe(prompt, num_inference_steps=args.steps, guidance_scale=5.0,
                   key=jax.random.PRNGKey(0), output_type="latent").images
        fence(out)
        return out

    latent_s, _ = timeit(latent_call)

    # 3. full call (pil): adds decode + uint8 postprocess + host transfer
    def full_call():
        return pipe(prompt, num_inference_steps=args.steps, guidance_scale=5.0,
                    key=jax.random.PRNGKey(0), output_type="pil").images

    full_s, _ = timeit(full_call)

    if args.trace:
        from diffusers_tpu.utils import profiling

        with profiling.trace(args.trace):
            full_call()

    report = {
        "steps": args.steps,
        "encode_ms": round(encode_s * 1000, 1),
        "latent_e2e_ms": round(latent_s * 1000, 1),
        "full_e2e_ms": round(full_s * 1000, 1),
        "derived_denoise_prep_ms": round((latent_s - encode_s) * 1000, 1),
        "derived_decode_postprocess_transfer_ms": round((full_s - latent_s) * 1000, 1),
        "images_per_sec": round(1.0 / full_s, 4),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
