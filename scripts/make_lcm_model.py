"""Fuse an LCM (or any) LoRA into a base checkpoint and export the merged
model — offline analog of the reference ``scripts/make_lcm_sdxl_model.py``
(which pulls ``latent-consistency/lcm-lora-*`` from HF, fuses, and saves;
this environment has no egress, so the LoRA comes from a local file).

Usage:
  python scripts/make_lcm_model.py <base_ckpt> <lcm_lora.safetensors> \
      <out_dir> --arch sdxl [--strength 1.0]

Works for every arch with a checkpoint importer + full-model export plan
(sd-family / sdxl / flux family / sd3 / wan / pixart / auraflow / cogview4
/ lumina2 / ...). The merged model decodes with the base's own layout, ready
for an LCM sampler (``sample.sampler: lcm``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base", help="base checkpoint (HF dir or LDM single file)")
    ap.add_argument("lora", help="LoRA safetensors (kohya / PEFT / ComfyUI)")
    ap.add_argument("out_dir")
    ap.add_argument("--arch", required=True)
    ap.add_argument("--strength", type=float, default=1.0)
    ap.add_argument("--model-kwargs", default="{}",
                    help='JSON model_kwargs (e.g. {"size": "tiny"})')
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # pure weight surgery
    except RuntimeError:
        pass

    from ai_toolkit_tpu.adapters.lora import merge_lora
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.io.full_export import export_full_model
    from ai_toolkit_tpu.io.lora_file import load_lora_file
    from ai_toolkit_tpu.models.registry import get_model_class

    import json

    model = get_model_class(args.arch)(
        ModelConfig(arch=args.arch, name_or_path=args.base,
                    model_kwargs=json.loads(args.model_kwargs)))
    variables = model.load_variables(jax.random.key(0))
    main_key = "dit" if "dit" in variables else "unet"

    km = None
    if hasattr(model, "lora_key_map"):
        km = model.lora_inverse_key_map(model.lora_key_map(variables[main_key]))
    else:
        from ai_toolkit_tpu.models.flux_dit import flux_inverse_key_map, flux_lora_key_map
        from ai_toolkit_tpu.models.unet import unet_lora_key_map

        if model.is_flow_matching and hasattr(model, "dit_config") \
                and hasattr(model.dit_config, "depth_double"):
            fwd = flux_lora_key_map(variables[main_key])
            km = flux_inverse_key_map(fwd, model.dit_config.depth_double,
                                      model.dit_config.depth_single)
        elif hasattr(model, "unet_config"):
            fwd = unet_lora_key_map(
                variables[main_key],
                num_levels=len(model.unet_config.block_out_channels))
            km = {v: k for k, v in fwd.items()}
            km.update({v.replace(".", "_"): k for k, v in fwd.items()})

    tree, meta = load_lora_file(args.lora, km)
    n = sum(1 for _ in __import__("jax").tree.leaves(tree))
    if not n:
        raise SystemExit(f"no LoRA entries matched the {args.arch} layout")
    print(f"fusing {n} LoRA leaves at strength {args.strength}", file=sys.stderr)
    variables[main_key] = merge_lora(variables[main_key], tree,
                                     multiplier=args.strength)
    written = export_full_model(model, variables, args.out_dir)
    for p in written:
        print(p, file=sys.stderr)
    print(f"merged model written to {args.out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
