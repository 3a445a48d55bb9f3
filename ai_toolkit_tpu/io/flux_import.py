"""FLUX checkpoint import: BFL-layout safetensors -> our variable tree.

Key layout spec: BFL ``flux1-dev.safetensors`` module names (the same names
the reference's vendored flux model uses). Scanned configs stack per-block
tensors onto a leading layer axis.
"""

from __future__ import annotations

import os

import numpy as np

from ai_toolkit_tpu.io.torch_import import Rule, load_safetensors_dir, torch_to_tree


def chroma_approximator_rules() -> list[Rule]:
    """Chroma distilled-guidance (Approximator) keys — BFL/ComfyUI layout
    ``distilled_guidance_layer.*`` (reference chroma/src/layers.py:390).
    Appended to flux_dit_rules for the chroma arch; harmless otherwise."""
    p = r"distilled_guidance_layer\."
    rules: list[Rule] = [
        (p + r"in_proj\.weight", "distilled_guidance/in_proj/kernel", "linear"),
        (p + r"in_proj\.bias", "distilled_guidance/in_proj/bias", "direct"),
        (p + r"out_proj\.weight", "distilled_guidance/out_proj/kernel", "linear"),
        (p + r"out_proj\.bias", "distilled_guidance/out_proj/bias", "direct"),
        (p + r"layers\.(\d+)\.in_layer\.weight", "distilled_guidance/layer_{0}/in_layer/kernel", "linear"),
        (p + r"layers\.(\d+)\.in_layer\.bias", "distilled_guidance/layer_{0}/in_layer/bias", "direct"),
        (p + r"layers\.(\d+)\.out_layer\.weight", "distilled_guidance/layer_{0}/out_layer/kernel", "linear"),
        (p + r"layers\.(\d+)\.out_layer\.bias", "distilled_guidance/layer_{0}/out_layer/bias", "direct"),
        (p + r"norms\.(\d+)\.scale", "distilled_guidance/norm_{0}/scale", "direct"),
    ]
    return rules


def radiance_rules(in_ch: int = 3, pixel_patch: int = 16) -> list[Rule]:
    """chroma_radiance extras over the chroma trunk (reference
    chroma/src/radiance.py:130-205): the pixel patchify conv (imported as a
    Linear over c-major flattened patches) and the NeRF decoder head."""
    cf = f"conv_flatten:{in_ch}:{pixel_patch}:{pixel_patch}"
    return [
        (r"img_in_patch\.weight", "img_in/kernel", cf),
        (r"img_in_patch\.bias", "img_in/bias", "direct"),
        (r"nerf_image_embedder\.embedder\.0\.weight", "nerf_embedder/kernel", "linear"),
        (r"nerf_image_embedder\.embedder\.0\.bias", "nerf_embedder/bias", "direct"),
        (r"nerf_blocks\.(\d+)\.param_generator\.weight", "nerf_{0}/param_generator/kernel", "linear"),
        (r"nerf_blocks\.(\d+)\.param_generator\.bias", "nerf_{0}/param_generator/bias", "direct"),
        (r"nerf_blocks\.(\d+)\.norm\.scale", "nerf_{0}/norm/scale", "direct"),
        (r"nerf_final_layer_conv\.norm\.scale", "nerf_final_norm/scale", "direct"),
        (r"nerf_final_layer_conv\.conv\.weight", "nerf_final_conv/kernel", "conv2d"),
        (r"nerf_final_layer_conv\.conv\.bias", "nerf_final_conv/bias", "direct"),
    ]


def load_radiance_checkpoint(path: str, model) -> dict:
    """chroma_radiance single-file (lodestones Chroma1-Radiance layout,
    reference chroma_radiance_model.py:153-180) or a dir containing one,
    plus optional HF-layout text_encoder_2/ (t5) companion."""
    import jax

    from safetensors import safe_open

    variables = model.init_variables(jax.random.key(0))
    f = path
    if os.path.isdir(path):
        cands = [os.path.join(path, n) for n in sorted(os.listdir(path))
                 if n.endswith(".safetensors")]
        f = cands[0] if cands else None
    flat = {}
    if f and os.path.isfile(f):
        with safe_open(f, "np") as sf:
            flat = {k: sf.get_tensor(k) for k in sf.keys()}
        flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
    if not any(k.startswith("double_blocks.") for k in flat):
        raise ValueError(
            f"chroma_radiance: no importable checkpoint at {path!r} "
            "(expected a single safetensors file with double_blocks.* keys)")
    cfg = model.dit_config
    rules = (radiance_rules(cfg.in_channels // cfg.pixel_patch ** 2, cfg.pixel_patch)
             + chroma_approximator_rules() + flux_dit_rules(cfg.scan_blocks))
    tree, unmatched = torch_to_tree(flat, rules)
    if unmatched:
        print(f"radiance import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
    variables["dit"] = _merge_imported(variables["dit"], tree, "radiance dit")
    if os.path.isdir(path):
        from ai_toolkit_tpu.io.sd_import import t5_rules

        d = os.path.join(path, "text_encoder_2")
        if "t5" in variables and os.path.isdir(d):
            t5_flat = load_safetensors_dir(path, "text_encoder_2")
            t, _ = torch_to_tree(t5_flat, t5_rules())
            if t:
                variables["t5"] = _merge_imported(variables["t5"], t, "t5")
    return variables


def flux_dit_rules(scan_blocks: bool = True) -> list[Rule]:
    if scan_blocks:
        blk = [
            (r"double_blocks\.(\d+)\.img_attn\.qkv\.weight", "double_blocks/block/img_qkv/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.img_attn\.qkv\.bias", "double_blocks/block/img_qkv/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.qkv\.weight", "double_blocks/block/txt_qkv/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.qkv\.bias", "double_blocks/block/txt_qkv/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_attn\.norm\.query_norm\.scale", "double_blocks/block/img_qknorm/query_norm/scale", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_attn\.norm\.key_norm\.scale", "double_blocks/block/img_qknorm/key_norm/scale", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.norm\.query_norm\.scale", "double_blocks/block/txt_qknorm/query_norm/scale", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.norm\.key_norm\.scale", "double_blocks/block/txt_qknorm/key_norm/scale", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_attn\.proj\.weight", "double_blocks/block/img_proj/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.img_attn\.proj\.bias", "double_blocks/block/img_proj/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.proj\.weight", "double_blocks/block/txt_proj/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.txt_attn\.proj\.bias", "double_blocks/block/txt_proj/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_mlp\.0\.weight", "double_blocks/block/img_mlp_in/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.img_mlp\.0\.bias", "double_blocks/block/img_mlp_in/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_mlp\.2\.weight", "double_blocks/block/img_mlp_out/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.img_mlp\.2\.bias", "double_blocks/block/img_mlp_out/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_mlp\.0\.weight", "double_blocks/block/txt_mlp_in/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.txt_mlp\.0\.bias", "double_blocks/block/txt_mlp_in/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_mlp\.2\.weight", "double_blocks/block/txt_mlp_out/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.txt_mlp\.2\.bias", "double_blocks/block/txt_mlp_out/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.img_mod\.lin\.weight", "double_blocks/block/img_mod/mod/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.img_mod\.lin\.bias", "double_blocks/block/img_mod/mod/bias", "direct_stack"),
            (r"double_blocks\.(\d+)\.txt_mod\.lin\.weight", "double_blocks/block/txt_mod/mod/kernel", "linear_stack"),
            (r"double_blocks\.(\d+)\.txt_mod\.lin\.bias", "double_blocks/block/txt_mod/mod/bias", "direct_stack"),
            (r"single_blocks\.(\d+)\.linear1\.weight", "single_blocks/block/linear1/kernel", "linear_stack"),
            (r"single_blocks\.(\d+)\.linear1\.bias", "single_blocks/block/linear1/bias", "direct_stack"),
            (r"single_blocks\.(\d+)\.linear2\.weight", "single_blocks/block/linear2/kernel", "linear_stack"),
            (r"single_blocks\.(\d+)\.linear2\.bias", "single_blocks/block/linear2/bias", "direct_stack"),
            (r"single_blocks\.(\d+)\.modulation\.lin\.weight", "single_blocks/block/mod/mod/kernel", "linear_stack"),
            (r"single_blocks\.(\d+)\.modulation\.lin\.bias", "single_blocks/block/mod/mod/bias", "direct_stack"),
            (r"single_blocks\.(\d+)\.norm\.query_norm\.scale", "single_blocks/block/qknorm/query_norm/scale", "direct_stack"),
            (r"single_blocks\.(\d+)\.norm\.key_norm\.scale", "single_blocks/block/qknorm/key_norm/scale", "direct_stack"),
        ]
    else:
        blk = [
            (r"double_blocks\.(\d+)\.img_attn\.qkv\.weight", "double_{0}/img_qkv/kernel", "linear"),
            (r"double_blocks\.(\d+)\.img_attn\.qkv\.bias", "double_{0}/img_qkv/bias", "direct"),
            (r"double_blocks\.(\d+)\.txt_attn\.qkv\.weight", "double_{0}/txt_qkv/kernel", "linear"),
            (r"double_blocks\.(\d+)\.txt_attn\.qkv\.bias", "double_{0}/txt_qkv/bias", "direct"),
            (r"double_blocks\.(\d+)\.img_attn\.norm\.query_norm\.scale", "double_{0}/img_qknorm/query_norm/scale", "direct"),
            (r"double_blocks\.(\d+)\.img_attn\.norm\.key_norm\.scale", "double_{0}/img_qknorm/key_norm/scale", "direct"),
            (r"double_blocks\.(\d+)\.txt_attn\.norm\.query_norm\.scale", "double_{0}/txt_qknorm/query_norm/scale", "direct"),
            (r"double_blocks\.(\d+)\.txt_attn\.norm\.key_norm\.scale", "double_{0}/txt_qknorm/key_norm/scale", "direct"),
            (r"double_blocks\.(\d+)\.img_attn\.proj\.weight", "double_{0}/img_proj/kernel", "linear"),
            (r"double_blocks\.(\d+)\.img_attn\.proj\.bias", "double_{0}/img_proj/bias", "direct"),
            (r"double_blocks\.(\d+)\.txt_attn\.proj\.weight", "double_{0}/txt_proj/kernel", "linear"),
            (r"double_blocks\.(\d+)\.txt_attn\.proj\.bias", "double_{0}/txt_proj/bias", "direct"),
            (r"double_blocks\.(\d+)\.img_mlp\.0\.weight", "double_{0}/img_mlp_in/kernel", "linear"),
            (r"double_blocks\.(\d+)\.img_mlp\.0\.bias", "double_{0}/img_mlp_in/bias", "direct"),
            (r"double_blocks\.(\d+)\.img_mlp\.2\.weight", "double_{0}/img_mlp_out/kernel", "linear"),
            (r"double_blocks\.(\d+)\.img_mlp\.2\.bias", "double_{0}/img_mlp_out/bias", "direct"),
            (r"double_blocks\.(\d+)\.txt_mlp\.0\.weight", "double_{0}/txt_mlp_in/kernel", "linear"),
            (r"double_blocks\.(\d+)\.txt_mlp\.0\.bias", "double_{0}/txt_mlp_in/bias", "direct"),
            (r"double_blocks\.(\d+)\.txt_mlp\.2\.weight", "double_{0}/txt_mlp_out/kernel", "linear"),
            (r"double_blocks\.(\d+)\.txt_mlp\.2\.bias", "double_{0}/txt_mlp_out/bias", "direct"),
            (r"double_blocks\.(\d+)\.img_mod\.lin\.weight", "double_{0}/img_mod/mod/kernel", "linear"),
            (r"double_blocks\.(\d+)\.img_mod\.lin\.bias", "double_{0}/img_mod/mod/bias", "direct"),
            (r"double_blocks\.(\d+)\.txt_mod\.lin\.weight", "double_{0}/txt_mod/mod/kernel", "linear"),
            (r"double_blocks\.(\d+)\.txt_mod\.lin\.bias", "double_{0}/txt_mod/mod/bias", "direct"),
            (r"single_blocks\.(\d+)\.linear1\.weight", "single_{0}/linear1/kernel", "linear"),
            (r"single_blocks\.(\d+)\.linear1\.bias", "single_{0}/linear1/bias", "direct"),
            (r"single_blocks\.(\d+)\.linear2\.weight", "single_{0}/linear2/kernel", "linear"),
            (r"single_blocks\.(\d+)\.linear2\.bias", "single_{0}/linear2/bias", "direct"),
            (r"single_blocks\.(\d+)\.modulation\.lin\.weight", "single_{0}/mod/mod/kernel", "linear"),
            (r"single_blocks\.(\d+)\.modulation\.lin\.bias", "single_{0}/mod/mod/bias", "direct"),
            (r"single_blocks\.(\d+)\.norm\.query_norm\.scale", "single_{0}/qknorm/query_norm/scale", "direct"),
            (r"single_blocks\.(\d+)\.norm\.key_norm\.scale", "single_{0}/qknorm/key_norm/scale", "direct"),
        ]
    return blk + [
        (r"img_in\.weight", "img_in/kernel", "linear"),
        (r"img_in\.bias", "img_in/bias", "direct"),
        (r"txt_in\.weight", "txt_in/kernel", "linear"),
        (r"txt_in\.bias", "txt_in/bias", "direct"),
        (r"time_in\.in_layer\.weight", "time_in/in_layer/kernel", "linear"),
        (r"time_in\.in_layer\.bias", "time_in/in_layer/bias", "direct"),
        (r"time_in\.out_layer\.weight", "time_in/out_layer/kernel", "linear"),
        (r"time_in\.out_layer\.bias", "time_in/out_layer/bias", "direct"),
        (r"vector_in\.in_layer\.weight", "vector_in/in_layer/kernel", "linear"),
        (r"vector_in\.in_layer\.bias", "vector_in/in_layer/bias", "direct"),
        (r"vector_in\.out_layer\.weight", "vector_in/out_layer/kernel", "linear"),
        (r"vector_in\.out_layer\.bias", "vector_in/out_layer/bias", "direct"),
        (r"guidance_in\.in_layer\.weight", "guidance_in/in_layer/kernel", "linear"),
        (r"guidance_in\.in_layer\.bias", "guidance_in/in_layer/bias", "direct"),
        (r"guidance_in\.out_layer\.weight", "guidance_in/out_layer/kernel", "linear"),
        (r"guidance_in\.out_layer\.bias", "guidance_in/out_layer/bias", "direct"),
        (r"final_layer\.linear\.weight", "final_proj/kernel", "linear"),
        (r"final_layer\.linear\.bias", "final_proj/bias", "direct"),
        (r"final_layer\.adaLN_modulation\.1\.weight", "final_mod/kernel", "linear"),
        (r"final_layer\.adaLN_modulation\.1\.bias", "final_mod/bias", "direct"),
    ]


def load_flux_checkpoint(path: str, model) -> dict:
    """Load a local flux checkpoint dir: transformer (BFL layout) + vae + TEs.

    Missing components fall back to random init (logged) — this environment is
    offline, so partial checkpoints must not be fatal.
    """
    import jax

    variables = model.init_variables(jax.random.key(0))

    # transformer: single-file BFL (flux1-dev.safetensors) or transformer/ dir
    for sub in ("transformer", "flux1-dev.safetensors", "flux1-schnell.safetensors", "."):
        p = os.path.join(path, sub)
        if os.path.exists(p):
            flat = load_safetensors_dir(path, sub if sub != "." else None)
            flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
            if any(k.startswith("double_blocks.") for k in flat):
                rules = flux_dit_rules(model.dit_config.scan_blocks)
                if getattr(model.dit_config, "chroma_mod", False):
                    rules = chroma_approximator_rules() + rules
                tree, unmatched = torch_to_tree(flat, rules)
                if tree:
                    variables["dit"] = _merge_imported(variables["dit"], tree, "flux dit")
                break

    # HF-layout companions: vae/, text_encoder/ (clip), text_encoder_2/ (t5)
    from ai_toolkit_tpu.io.sd_import import clip_rules, t5_rules, vae_rules

    companions = [
        ("vae", "vae", vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block)),
        ("text_encoder", "clip", clip_rules()),
        ("text_encoder_2", "t5", t5_rules()),
    ]
    for subdir, comp, rules in companions:
        d = os.path.join(path, subdir)
        if comp in variables and os.path.isdir(d):
            flat = load_safetensors_dir(path, subdir)
            tree, _ = torch_to_tree(flat, rules)
            if tree:
                variables[comp] = _merge_imported(variables[comp], tree, comp)
    return variables


def _merge_imported(init_tree: dict, imported: dict, name: str) -> dict:
    """Overlay imported leaves onto the init tree, checking shapes."""
    import jax

    n_ok, n_bad = 0, 0

    def walk(dst, src):
        nonlocal n_ok, n_bad
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = walk(dst.get(k, {}), v)
            else:
                cur = dst.get(k)
                if cur is not None and tuple(cur.shape) == tuple(v.shape):
                    out[k] = v.astype(np.asarray(cur).dtype)
                    n_ok += 1
                else:
                    n_bad += 1
        return out

    merged = walk(init_tree, imported)
    print(f"imported {name}: {n_ok} tensors ({n_bad} shape mismatches skipped)")
    return merged
