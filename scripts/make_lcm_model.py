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
    from ai_toolkit_tpu.io.lora_file import load_lora_file_split
    from ai_toolkit_tpu.jobs.train_process import SDTrainProcess
    from ai_toolkit_tpu.models.registry import get_model_class

    import json

    model = get_model_class(args.arch)(
        ModelConfig(arch=args.arch, name_or_path=args.base,
                    model_kwargs=json.loads(args.model_kwargs)))
    variables = model.load_variables(jax.random.key(0))
    main_key = "dit" if "dit" in variables else "unet"

    # the trainer's own resolution handles every arch (model-provided maps,
    # flux-family stacks, unet levels, generic dict inversion)
    km_fwd = SDTrainProcess._key_map(model, variables[main_key])
    km = SDTrainProcess._inverse_key_map(model, km_fwd)

    tree, _te_trees, meta = load_lora_file_split(args.lora, km)

    def _count_resolved(node, ref):
        n = 0
        for k, v in node.items():
            if not isinstance(ref, dict) or k not in ref:
                continue
            if isinstance(v, dict) and "a" in v:
                n += 1
            elif isinstance(v, dict):
                n += _count_resolved(v, ref[k])
        return n

    n = _count_resolved(tree, variables[main_key])
    if not n:
        raise SystemExit(
            f"no LoRA entries resolved to real {args.arch} modules — wrong "
            f"--arch or an unsupported key layout")
    print(f"fusing {n} LoRA leaves at strength {args.strength}", file=sys.stderr)
    variables[main_key] = merge_lora(variables[main_key], tree,
                                     multiplier=args.strength)
    written = export_full_model(model, variables, args.out_dir)
    for p in written:
        print(p, file=sys.stderr)
    print(f"merged model written to {args.out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
