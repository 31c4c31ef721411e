"""diffusers-tpu CLI (mirror of the reference `commands/diffusers_cli.py:47`).

Subcommands:
  env              — environment debug report (jax/TPU devices, library versions)
  convert          — single-file LDM checkpoint → framework layout conversion stub
  bench            — run the headline benchmark
  fp16_safetensors — cast a saved model/pipeline's safetensors to fp16/bf16 variant
                     (reference `commands/fp16_safetensors.py:51`)
  schema           — dump a pipeline folder's component schema as JSON
                     (reference `commands/schema.py`)
  custom_blocks    — scaffold a custom ModularPipelineBlocks file
                     (reference `commands/custom_blocks.py`)
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys


def env_command(args):
    import jax

    import diffusers_tpu

    info = {
        "diffusers_tpu": diffusers_tpu.__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "default_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
        "process_index": jax.process_index(),
    }
    try:
        import flax

        info["flax"] = flax.__version__
    except Exception:
        pass
    try:
        import transformers

        info["transformers"] = transformers.__version__
    except Exception:
        pass
    print(json.dumps(info, indent=2))


def convert_command(args):
    from ..loaders.single_file import (
        convert_ldm_clip_state_dict,
        convert_ldm_unet_state_dict,
        convert_ldm_vae_state_dict,
        load_single_file_checkpoint,
    )

    sd = load_single_file_checkpoint(args.checkpoint)
    print(f"loaded {len(sd)} tensors from {args.checkpoint}")
    vae = convert_ldm_vae_state_dict(sd)
    clip = convert_ldm_clip_state_dict(sd)
    print(f"vae: {len(vae)} keys, clip: {len(clip)} keys (unet conversion requires the model config)")


def bench_command(args):
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


def fp16_safetensors_command(args):
    """Re-save every `*.safetensors` under a model/pipeline folder as a
    half-precision variant (`diffusion_pytorch_model.<variant>.safetensors`),
    reference `commands/fp16_safetensors.py:51`. Pure tensor cast — no model
    instantiation, so it works for any architecture."""
    import numpy as np
    from safetensors import safe_open
    from safetensors.numpy import save_file

    variant = args.variant
    target = {"fp16": np.float16, "bf16": None}[variant]  # bf16 via ml_dtypes below
    if variant == "bf16":
        import ml_dtypes

        target = ml_dtypes.bfloat16

    converted = 0
    for root, _, files in os.walk(args.path):
        for fname in files:
            if not fname.endswith(".safetensors") or f".{variant}." in fname:
                continue
            src = os.path.join(root, fname)
            tensors, meta = {}, None
            with safe_open(src, framework="numpy") as f:
                meta = f.metadata()
                for key in f.keys():
                    t = f.get_tensor(key)
                    tensors[key] = t.astype(target) if t.dtype in (np.float32, np.float64) else t
            stem, ext = os.path.splitext(fname)
            dst = os.path.join(root, f"{stem}.{variant}{ext}")
            save_file(tensors, dst, metadata=meta or {"format": "np"})
            converted += 1
            print(f"wrote {dst}")
    print(f"converted {converted} file(s) to {variant}")


def schema_command(args):
    """Dump a pipeline folder's component schema: model_index.json plus each
    component's config.json (reference `commands/schema.py`)."""
    schema = {}
    index_path = os.path.join(args.path, "model_index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            schema["model_index"] = json.load(f)
    for entry in sorted(os.listdir(args.path)):
        sub = os.path.join(args.path, entry)
        cfg = os.path.join(sub, "config.json")
        if os.path.isdir(sub) and os.path.exists(cfg):
            with open(cfg) as f:
                schema[entry] = json.load(f)
    print(json.dumps(schema, indent=2))


_CUSTOM_BLOCK_TEMPLATE = '''"""Custom modular pipeline block — scaffolded by `diffusers-tpu-cli custom_blocks`."""

from diffusers_tpu.modular_pipelines import ModularPipelineBlocks, InputParam, OutputParam


class {name}(ModularPipelineBlocks):
    @property
    def description(self):
        return "TODO: describe what this block computes"

    @property
    def inputs(self):
        return [InputParam("sample", required=True)]

    @property
    def intermediate_outputs(self):
        return [OutputParam("sample")]

    def __call__(self, components, state):
        block_state = self.get_block_state(state)
        # TODO: transform block_state.sample
        self.set_block_state(state, block_state)
        return components, state
'''


def custom_blocks_command(args):
    out = args.output or f"{args.name.lower()}_block.py"
    with open(out, "w") as f:
        f.write(_CUSTOM_BLOCK_TEMPLATE.format(name=args.name))
    print(f"scaffolded custom block {args.name!r} at {out}")


def main():
    parser = argparse.ArgumentParser("diffusers-tpu-cli")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("env", help="print environment debug report")

    p_convert = sub.add_parser("convert", help="inspect/convert a single-file checkpoint")
    p_convert.add_argument("checkpoint")

    sub.add_parser("bench", help="run the headline benchmark")

    p_fp16 = sub.add_parser("fp16_safetensors", help="cast saved safetensors to a half-precision variant")
    p_fp16.add_argument("path")
    p_fp16.add_argument("--variant", choices=["fp16", "bf16"], default="fp16")

    p_schema = sub.add_parser("schema", help="dump a pipeline folder's component schema")
    p_schema.add_argument("path")

    p_blocks = sub.add_parser("custom_blocks", help="scaffold a custom modular block file")
    p_blocks.add_argument("name")
    p_blocks.add_argument("--output", default=None)

    args = parser.parse_args()
    {
        "env": env_command,
        "convert": convert_command,
        "bench": bench_command,
        "fp16_safetensors": fp16_safetensors_command,
        "schema": schema_command,
        "custom_blocks": custom_blocks_command,
    }[args.command](args)


if __name__ == "__main__":
    main()
