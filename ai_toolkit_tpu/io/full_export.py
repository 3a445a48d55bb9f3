"""Full-model interop export: our flax trees -> torch-layout safetensors.

Round-2 gap fix (reference ``toolkit/saving.py:22-139`` + ``keymaps/``): a
full fine-tune (or a merge-on-save LoRA) must produce checkpoints other
tools can load. We invert the SAME rule lists the importers use
(``tree_to_torch``), so export/import are exact inverses by construction;
outputs land in an HF-layout directory (``transformer|unet/``, ``vae/``,
``text_encoder*/``) loadable by diffusers and by our own ``load_*_checkpoint``
functions.
"""

from __future__ import annotations

import os

import numpy as np

from ai_toolkit_tpu.io.torch_import import tree_to_torch


def _get(tree, path):
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _wan_specials(tree, cfg) -> dict[str, np.ndarray]:
    """Inverse of wan_dit_tree's custom conversions: linear patch embedding
    back to Conv3d layout, modulation tables back to scale_shift_table."""
    out: dict[str, np.ndarray] = {}
    k = _get(tree, "patch_embedding/kernel")
    if k is not None:
        pt, ph, pw = cfg.patch_size
        o = k.shape[1]
        out["patch_embedding.weight"] = np.ascontiguousarray(
            np.asarray(k).reshape(pt, ph, pw, -1, o).transpose(4, 3, 0, 1, 2)
        )
    b = _get(tree, "patch_embedding/bias")
    if b is not None:
        out["patch_embedding.bias"] = np.asarray(b)
    head = _get(tree, "head_modulation")
    if head is not None:
        out["scale_shift_table"] = np.asarray(head)[None]  # diffusers [1, 2, d]
    mod = _get(tree, "blocks/block/modulation")
    if mod is not None:  # scanned [L, 6, d]
        for i in range(mod.shape[0]):
            out[f"blocks.{i}.scale_shift_table"] = np.asarray(mod[i])[None]
    else:
        i = 0
        while (m := _get(tree, f"block_{i}/modulation")) is not None:
            out[f"blocks.{i}.scale_shift_table"] = np.asarray(m)[None]
            i += 1
    return out


def component_plan(model) -> list[tuple[str, str, str, list, object]]:
    """[(component_key, subdir, filename, rules, specials_fn|None)] for the
    arch, or raises for archs without an inverse mapping yet."""
    from ai_toolkit_tpu.io.sd_import import clip_rules, t5_rules, unet_rules, vae_rules

    plan: list[tuple[str, str, str, list, object]] = []
    arch = (model.config.arch or "").lower()
    W = "diffusion_pytorch_model.safetensors"
    M = "model.safetensors"

    if hasattr(model, "unet_config"):  # sd1/sd2/sdxl family
        nl = len(model.unet_config.block_out_channels)
        plan.append(("unet", "unet", W, unet_rules(nl), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        for comp, sub in (("clip", "text_encoder"), ("clip2", "text_encoder_2")):
            plan.append((comp, sub, M, clip_rules(), None))
        return plan

    # only the true BFL-layout flux family (hidream/extra archs reuse
    # FluxConfig but have different param trees)
    flux_archs = {"flux", "flux_schnell", "flex1", "flex2", "flux_kontext",
                  "chroma", "zeta_chroma", "chroma_radiance"}
    if arch in flux_archs and hasattr(model, "dit_config"):
        from ai_toolkit_tpu.io.flux_import import chroma_approximator_rules, flux_dit_rules

        rules = flux_dit_rules(model.dit_config.scan_blocks)
        if getattr(model.dit_config, "chroma_mod", False):
            rules = chroma_approximator_rules() + rules
        plan.append(("dit", "transformer", W, rules, None))
        if hasattr(model, "vae_config") and hasattr(model.vae_config, "channel_multipliers"):
            plan.append(("vae", "vae", W, vae_rules(
                len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
            ), None))
        plan.append(("clip", "text_encoder", M, clip_rules(), None))
        plan.append(("t5", "text_encoder_2", M, t5_rules(), None))
        return plan

    if arch.startswith("wan"):
        from ai_toolkit_tpu.io.dit_importers import wan_dit_rules

        i2v = getattr(model.dit_config, "i2v", False)
        rules = wan_dit_rules(model.dit_config.scan_blocks, i2v)
        cfg = model.dit_config
        plan.append(("dit", "transformer", W, rules, lambda t: _wan_specials(t, cfg)))
        if getattr(model, "multistage", False):
            plan.append(("dit_low", "transformer_2", W, rules,
                         lambda t: _wan_specials(t, cfg)))
        plan.append(("t5", "text_encoder", M,
                     t5_rules(per_layer_bias=model.t5_config.per_layer_bias), None))
        return plan

    raise NotImplementedError(
        f"full-model export is not implemented for arch '{model.config.arch}' — "
        f"supported: sd1/sd2/sdxl family, flux family, wan family"
    )


def export_full_model(
    model, variables: dict, out_dir: str, dtype=np.float16,
    components: list[str] | None = None,
) -> list[str]:
    """Write each trained/available component as torch-layout safetensors in
    an HF directory. Returns the written file paths."""
    import jax

    from safetensors.numpy import save_file

    written: list[str] = []
    for comp, subdir, fname, rules, specials in component_plan(model):
        if comp not in variables:
            continue
        if components is not None and comp not in components:
            continue
        tree = jax.tree.map(np.asarray, variables[comp])
        flat = tree_to_torch(tree, rules)
        if specials is not None:
            flat.update(specials(tree))
        if not flat:
            continue
        flat = {
            k: np.ascontiguousarray(np.asarray(v).astype(dtype))
            for k, v in flat.items()
        }
        os.makedirs(os.path.join(out_dir, subdir), exist_ok=True)
        path = os.path.join(out_dir, subdir, fname)
        save_file(flat, path, metadata={"software": "ai_toolkit_tpu", "format": "pt"})
        written.append(path)
    return written
