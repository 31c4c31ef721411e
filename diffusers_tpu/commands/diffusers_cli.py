"""diffusers-tpu CLI (mirror of the reference `commands/diffusers_cli.py:47`).

Subcommands:
  env      — environment debug report (jax/TPU devices, library versions)
  convert  — single-file LDM checkpoint → framework layout conversion stub
  bench    — run the headline benchmark
"""

from __future__ import annotations

import argparse
import json
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


def main():
    parser = argparse.ArgumentParser("diffusers-tpu-cli")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("env", help="print environment debug report")

    p_convert = sub.add_parser("convert", help="inspect/convert a single-file checkpoint")
    p_convert.add_argument("checkpoint")

    sub.add_parser("bench", help="run the headline benchmark")

    args = parser.parse_args()
    {"env": env_command, "convert": convert_command, "bench": bench_command}[args.command](args)


if __name__ == "__main__":
    main()
