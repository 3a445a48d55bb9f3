"""Convert a LoRA safetensors file between kohya / PEFT / ComfyUI layouts.

Parity target: the reference's conversion scripts
(``scripts/convert_cog.py`` diffusers->kohya LDM, ``scripts/
convert_lora_to_peft_format.py``, ``scripts/convert_diffusers_to_comfy*.py``)
collapsed into one tool over our shared layout grammar (io/lora_file):

  kohya:  lora_<root>_<module_path>.lora_down.weight / .lora_up.weight / .alpha
  peft:   transformer.<module.path>.lora_A.weight / .lora_B.weight
  comfy:  diffusion_model.<module.path>.lora_A.weight / .lora_B.weight

peft <-> comfy is a pure prefix swap; X -> kohya flattens dots; kohya -> dotted
needs the dot positions back, which requires a module-name vocabulary — pass
``--arch`` to resolve them through that model's LoRA key map (the same tables
the trainer uses to save reference-identical layouts).

Usage: python scripts/convert_lora_format.py in.safetensors out.safetensors \
          --to peft|comfy|kohya [--arch flux] [--alpha-default 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def _force_cpu() -> None:
    """Key-name resolution needs no accelerator — keep model init off the
    (shared, slow-to-compile) TPU backend."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def detect_format(keys: list[str]) -> str:
    if any(k.endswith(".lora_down.weight") for k in keys):
        return "kohya"
    if any(k.startswith("diffusion_model.") for k in keys):
        return "comfy"
    if any(".lora_A." in k or ".lora_B." in k for k in keys):
        return "peft"
    raise SystemExit(f"unrecognized LoRA layout; sample keys: {keys[:5]}")


def _module_vocab(arch: str) -> dict[str, str]:
    """kohya flattened name -> dotted module path, via the arch's key map."""
    _force_cpu()
    import jax

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class(arch)(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    main = "dit" if "dit" in variables else "unet" if "unet" in variables else None
    if main is None:
        raise SystemExit(f"arch {arch}: no dit/unet component to map")
    if hasattr(model, "lora_key_map"):
        km = model.lora_key_map(variables[main])
    else:
        from ai_toolkit_tpu.models.flux_dit import flux_lora_key_map
        from ai_toolkit_tpu.models.unet import unet_lora_key_map

        if model.is_flow_matching:
            km = flux_lora_key_map(variables[main])
        else:
            km = unet_lora_key_map(
                variables[main],
                num_levels=len(model.unet_config.block_out_channels))
    inv = (model.lora_inverse_key_map(km) if hasattr(model, "lora_inverse_key_map")
           else None)
    # expand '{L}' templates through the inverse map when available
    names = set()
    if inv:
        names.update(e for e in inv if "." in e)
    for ext in km.values():
        if "{L}" not in ext:
            names.add(ext)
        else:
            for layer in range(200):
                names.add(ext.replace("{L}", str(layer)))
    return {n.replace(".", "_"): n for n in names}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--to", required=True, choices=("kohya", "peft", "comfy"))
    ap.add_argument("--arch", default=None,
                    help="needed for kohya -> peft/comfy (dot positions)")
    ap.add_argument("--alpha-default", type=float, default=None,
                    help="alpha when converting peft/comfy -> kohya")
    args = ap.parse_args()

    from safetensors.numpy import load_file, save_file

    flat = load_file(args.src)
    src_fmt = detect_format(list(flat))
    print(f"{args.src}: {len(flat)} keys, detected {src_fmt} -> {args.to}",
          file=sys.stderr)
    if src_fmt == args.to:
        save_file(dict(flat), args.dst)
        return

    out: dict[str, np.ndarray] = {}
    if src_fmt in ("peft", "comfy"):
        pre = "transformer." if src_fmt == "peft" else "diffusion_model."
        modules: dict[str, dict] = {}
        for k, v in flat.items():
            body = k[len(pre):] if k.startswith(pre) else k
            for tag, slot in ((".lora_A.weight", "down"), (".lora_B.weight", "up")):
                if body.endswith(tag):
                    modules.setdefault(body[: -len(tag)], {})[slot] = v
        if args.to in ("peft", "comfy"):
            npre = "transformer." if args.to == "peft" else "diffusion_model."
            for mod, parts in modules.items():
                for slot, tag in (("down", "lora_A"), ("up", "lora_B")):
                    if slot in parts:
                        out[f"{npre}{mod}.{tag}.weight"] = parts[slot]
        else:  # -> kohya
            for mod, parts in modules.items():
                base = "lora_unet_" + mod.replace(".", "_")
                if "down" in parts:
                    out[f"{base}.lora_down.weight"] = parts["down"]
                    rank = parts["down"].shape[0]
                    alpha = args.alpha_default if args.alpha_default is not None else float(rank)
                    out[f"{base}.alpha"] = np.asarray(alpha, np.float32)
                if "up" in parts:
                    out[f"{base}.lora_up.weight"] = parts["up"]
    else:  # kohya source
        if args.arch is None:
            raise SystemExit("kohya -> dotted layouts needs --arch to resolve "
                             "module-name dot positions")
        vocab = _module_vocab(args.arch)
        npre = "transformer." if args.to == "peft" else "diffusion_model."
        unmatched = []
        # peft/comfy consumers assume alpha == rank; fold kohya's alpha into
        # the up weight (delta = alpha/rank * up@down) so strength survives
        alphas = {k[: -len(".alpha")]: float(np.asarray(v).reshape(-1)[0])
                  for k, v in flat.items() if k.endswith(".alpha")}
        for k, v in flat.items():
            for tag, slot in ((".lora_down.weight", "lora_A"),
                              (".lora_up.weight", "lora_B")):
                if not k.endswith(tag):
                    continue
                base = k[: -len(tag)]
                flatname = base
                for p in ("lora_transformer_", "lora_unet_", "lora_te1_",
                          "lora_te2_", "lora_te_"):
                    if flatname.startswith(p):
                        flatname = flatname[len(p):]
                        break
                dotted = vocab.get(flatname)
                if dotted is None:
                    unmatched.append(k)
                    continue
                if slot == "lora_B" and base in alphas:
                    rank = v.shape[1] if v.ndim >= 2 else v.shape[0]
                    factor = alphas[base] / max(rank, 1)
                    if factor != 1.0:
                        v = (np.asarray(v, np.float32) * factor).astype(v.dtype)
                out[f"{npre}{dotted}.{slot}.weight"] = v
        if unmatched:
            print(f"warning: {len(unmatched)} unmatched keys, e.g. "
                  f"{unmatched[:3]}", file=sys.stderr)
        if not out:
            raise SystemExit("no keys converted — wrong --arch?")
    save_file(out, args.dst)
    print(f"wrote {len(out)} keys -> {args.dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
