"""Checkpoint importers for the wan / ltx2 / flux2 DiT families.

Layout sources (all verified against in-reference code, not guessed):

- **wan**: diffusers ``WanTransformer3DModel`` key names, confirmed by the
  reference's own converter ``/root/reference/toolkit/models/wan21/
  wan_lora_convert.py`` (attn1/attn2, to_q/to_k/to_v/to_out.0,
  ffn.net.0.proj / ffn.net.2) plus the standard diffusers
  condition_embedder / scale_shift_table / patch_embedding modules.
- **ltx2**: diffusers ``LTX2VideoTransformer3DModel`` names per the
  reference converter ``extensions_built_in/diffusion_models/ltx2/
  convert_ltx2_to_diffusers.py`` (proj_in, time_embed, per-block
  scale_shift_table, norm_q/norm_k). Video stream only — the audio stream
  here uses a different (1D-VAE) front end (see models/ltx2_av.py).
- **flux2**: the vendored BFL source ``extensions_built_in/diffusion_models/
  flux2/src/model.py`` — flux1 block names plus GLOBAL stream modulations
  (double_stream_modulation_img/txt, single_stream_modulation) and
  bias-free Linears; global modulation kernels are tiled over the layer
  axis of our per-block stacks (numerically identical).
"""

from __future__ import annotations

import os

import numpy as np

from ai_toolkit_tpu.io.torch_import import (
    Rule,
    convert_tensor,
    load_safetensors_dir,
    torch_to_tree,
)


def _patchify3d_to_linear(v: np.ndarray) -> np.ndarray:
    """Conv3d patch embedding [out, in, kt, kh, kw] -> Linear kernel
    [kt*kh*kw*in, out], matching wan_patchify's (t, y, x, c) feature order."""
    o = v.shape[0]
    return np.ascontiguousarray(v.transpose(2, 3, 4, 1, 0).reshape(-1, o))


def _table(v: np.ndarray, n: int, d: int) -> np.ndarray:
    """scale_shift_table with any leading broadcast dims -> [n, d]."""
    return np.ascontiguousarray(np.asarray(v).reshape(-1, d)[-n:])


# ---------------------------------------------------------------- wan


def wan_dit_rules(scan_blocks: bool = True, i2v: bool = False) -> list[Rule]:
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    kind = "_stack" if scan_blocks else ""

    def lin(src, dst):
        return [
            (rf"blocks\.(\d+)\.{src}\.weight", b + dst + "/kernel", "linear" + kind),
            (rf"blocks\.(\d+)\.{src}\.bias", b + dst + "/bias", "direct" + kind),
        ]

    rules: list[Rule] = []
    for src, dst in (
        ("attn1.to_q", "self_q"), ("attn1.to_k", "self_k"), ("attn1.to_v", "self_v"),
        (r"attn1.to_out\.0", "self_o"),
        ("attn2.to_q", "cross_q"), ("attn2.to_k", "cross_k"), ("attn2.to_v", "cross_v"),
        (r"attn2.to_out\.0", "cross_o"),
        (r"ffn.net\.0\.proj", "ffn_in"), (r"ffn.net\.2", "ffn_out"),
    ):
        rules += lin(src.replace(".", r"\."), dst)
    for src, dst in (
        ("attn1.norm_q", "self_q_norm"), ("attn1.norm_k", "self_k_norm"),
        ("attn2.norm_q", "cross_q_norm"), ("attn2.norm_k", "cross_k_norm"),
    ):
        rules.append(
            (rf"blocks\.(\d+)\.{src.replace('.', chr(92) + '.')}\.weight",
             b + dst + "/scale", "direct" + kind)
        )
    rules += [
        (r"blocks\.(\d+)\.norm2\.weight", b + "norm2/scale", "direct" + kind),
        (r"blocks\.(\d+)\.norm2\.bias", b + "norm2/bias", "direct" + kind),
    ]
    if i2v:
        rules += lin(r"attn2\.add_k_proj", "cross_k_img")
        rules += lin(r"attn2\.add_v_proj", "cross_v_img")
        rules.append((r"blocks\.(\d+)\.attn2\.norm_added_k\.weight",
                      b + "cross_k_img_norm/scale", "direct" + kind))
    top = [
        (r"condition_embedder\.text_embedder\.linear_1\.weight", "text_embedding_in/kernel", "linear"),
        (r"condition_embedder\.text_embedder\.linear_1\.bias", "text_embedding_in/bias", "direct"),
        (r"condition_embedder\.text_embedder\.linear_2\.weight", "text_embedding_out/kernel", "linear"),
        (r"condition_embedder\.text_embedder\.linear_2\.bias", "text_embedding_out/bias", "direct"),
        (r"condition_embedder\.time_embedder\.linear_1\.weight", "time_fc1/kernel", "linear"),
        (r"condition_embedder\.time_embedder\.linear_1\.bias", "time_fc1/bias", "direct"),
        (r"condition_embedder\.time_embedder\.linear_2\.weight", "time_fc2/kernel", "linear"),
        (r"condition_embedder\.time_embedder\.linear_2\.bias", "time_fc2/bias", "direct"),
        (r"condition_embedder\.time_proj\.weight", "time_projection/kernel", "linear"),
        (r"condition_embedder\.time_proj\.bias", "time_projection/bias", "direct"),
        (r"proj_out\.weight", "head_out/kernel", "linear"),
        (r"proj_out\.bias", "head_out/bias", "direct"),
    ]
    if i2v:
        top += [
            (r"condition_embedder\.image_embedder\.norm1\.weight", "img_emb_norm1/scale", "direct"),
            (r"condition_embedder\.image_embedder\.norm1\.bias", "img_emb_norm1/bias", "direct"),
            (r"condition_embedder\.image_embedder\.ff\.net\.0\.proj\.weight", "img_emb_in/kernel", "linear"),
            (r"condition_embedder\.image_embedder\.ff\.net\.0\.proj\.bias", "img_emb_in/bias", "direct"),
            (r"condition_embedder\.image_embedder\.ff\.net\.2\.weight", "img_emb_out/kernel", "linear"),
            (r"condition_embedder\.image_embedder\.ff\.net\.2\.bias", "img_emb_out/bias", "direct"),
            (r"condition_embedder\.image_embedder\.norm2\.weight", "img_emb_norm2/scale", "direct"),
            (r"condition_embedder\.image_embedder\.norm2\.bias", "img_emb_norm2/bias", "direct"),
        ]
    return rules + top


def wan_dit_tree(flat: dict[str, np.ndarray], cfg, i2v: bool = False) -> tuple[dict, list[str]]:
    """diffusers wan state dict -> WanDiT params tree. cfg: WanConfig."""
    flat = {k.removeprefix("model.diffusion_model.").removeprefix("transformer."): v
            for k, v in flat.items()}
    tree, unmatched = torch_to_tree(flat, wan_dit_rules(cfg.scan_blocks, i2v))
    d = cfg.dim
    # tables + conv3d patchify need custom conversion
    still: list[str] = []
    blocks: dict[int, np.ndarray] = {}
    for k in unmatched:
        v = flat[k]
        if k == "patch_embedding.weight":
            _set(tree, "patch_embedding/kernel", _patchify3d_to_linear(v))
        elif k == "patch_embedding.bias":
            _set(tree, "patch_embedding/bias", np.asarray(v))
        elif k == "scale_shift_table":
            _set(tree, "head_modulation", _table(v, 2, d))
        else:
            import re

            m = re.match(r"blocks\.(\d+)\.scale_shift_table$", k)
            if m:
                blocks[int(m.group(1))] = _table(v, 6, d)
            else:
                still.append(k)
    if blocks:
        idxs = sorted(blocks)
        stacked = np.stack([blocks[i] for i in idxs])
        if cfg.scan_blocks:
            _set(tree, "blocks/block/modulation", stacked)
        else:
            for i in idxs:
                _set(tree, f"block_{i}/modulation", blocks[i])
    return tree, still


# ---------------------------------------------------------------- ltx2 (video stream)


def ltx2_dit_rules(scan_blocks: bool = True) -> list[Rule]:
    """diffusers LTX2 video transformer -> WanDiT-layout tree (non-joint)."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    kind = "_stack" if scan_blocks else ""

    def lin(src, dst):
        return [
            (rf"transformer_blocks\.(\d+)\.{src}\.weight", b + dst + "/kernel", "linear" + kind),
            (rf"transformer_blocks\.(\d+)\.{src}\.bias", b + dst + "/bias", "direct" + kind),
        ]

    rules: list[Rule] = []
    for src, dst in (
        (r"attn1\.to_q", "self_q"), (r"attn1\.to_k", "self_k"), (r"attn1\.to_v", "self_v"),
        (r"attn1\.to_out\.0", "self_o"),
        (r"attn2\.to_q", "cross_q"), (r"attn2\.to_k", "cross_k"), (r"attn2\.to_v", "cross_v"),
        (r"attn2\.to_out\.0", "cross_o"),
        (r"ff\.net\.0\.proj", "ffn_in"), (r"ff\.net\.2", "ffn_out"),
    ):
        rules += lin(src, dst)
    for src, dst in (
        (r"attn1\.norm_q", "self_q_norm"), (r"attn1\.norm_k", "self_k_norm"),
        (r"attn2\.norm_q", "cross_q_norm"), (r"attn2\.norm_k", "cross_k_norm"),
    ):
        rules.append((rf"transformer_blocks\.(\d+)\.{src}\.weight",
                      b + dst + "/scale", "direct" + kind))
    return rules + [
        (r"proj_in\.weight", "patch_embedding/kernel", "linear"),
        (r"proj_in\.bias", "patch_embedding/bias", "direct"),
        (r"time_embed\.emb\.timestep_embedder\.linear_1\.weight", "time_fc1/kernel", "linear"),
        (r"time_embed\.emb\.timestep_embedder\.linear_1\.bias", "time_fc1/bias", "direct"),
        (r"time_embed\.emb\.timestep_embedder\.linear_2\.weight", "time_fc2/kernel", "linear"),
        (r"time_embed\.emb\.timestep_embedder\.linear_2\.bias", "time_fc2/bias", "direct"),
        (r"time_embed\.linear\.weight", "time_projection/kernel", "linear"),
        (r"time_embed\.linear\.bias", "time_projection/bias", "direct"),
        (r"caption_projection\.linear_1\.weight", "text_embedding_in/kernel", "linear"),
        (r"caption_projection\.linear_1\.bias", "text_embedding_in/bias", "direct"),
        (r"caption_projection\.linear_2\.weight", "text_embedding_out/kernel", "linear"),
        (r"caption_projection\.linear_2\.bias", "text_embedding_out/bias", "direct"),
        (r"proj_out\.weight", "head_out/kernel", "linear"),
        (r"proj_out\.bias", "head_out/bias", "direct"),
    ]


def ltx2_dit_tree(flat: dict[str, np.ndarray], cfg) -> tuple[dict, list[str]]:
    flat = {k.removeprefix("model.diffusion_model.").removeprefix("transformer."): v
            for k, v in flat.items()}
    tree, unmatched = torch_to_tree(flat, ltx2_dit_rules(cfg.scan_blocks))
    d = cfg.dim
    still: list[str] = []
    blocks: dict[int, np.ndarray] = {}
    for k in unmatched:
        v = flat[k]
        import re

        m = re.match(r"transformer_blocks\.(\d+)\.scale_shift_table$", k)
        if k == "scale_shift_table":
            _set(tree, "head_modulation", _table(v, 2, d))
        elif m:
            blocks[int(m.group(1))] = _table(v, 6, d)
        else:
            still.append(k)
    if blocks:
        idxs = sorted(blocks)
        if cfg.scan_blocks:
            _set(tree, "blocks/block/modulation", np.stack([blocks[i] for i in idxs]))
        else:
            for i in idxs:
                _set(tree, f"block_{i}/modulation", blocks[i])
    return tree, still


# ---------------------------------------------------------------- flux2


def flux2_dit_tree(flat: dict[str, np.ndarray], cfg) -> tuple[dict, list[str]]:
    """BFL flux2 state dict -> FluxDiT tree. Global stream modulations are
    tiled over the per-block modulation stacks (identical math: flux2 computes
    one modulation from vec and reuses it in every block)."""
    from ai_toolkit_tpu.io.flux_import import flux_dit_rules

    flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
    tree, unmatched = torch_to_tree(flat, flux_dit_rules(cfg.scan_blocks))
    still: list[str] = []
    Ld, Ls = cfg.depth_double, cfg.depth_single

    def tile_mod(v: np.ndarray, paths: list[str], depth: int):
        kern = convert_tensor(v, "linear")
        if cfg.scan_blocks:
            for p in paths:
                _set(tree, p, np.broadcast_to(kern, (depth,) + kern.shape).copy())
        else:
            for p in paths:
                for i in range(depth):
                    _set(tree, p.format(i), kern.copy())

    for k in unmatched:
        v = flat[k]
        if k == "double_stream_modulation_img.lin.weight":
            tile_mod(v, ["double_blocks/block/img_mod/mod/kernel"] if cfg.scan_blocks
                     else ["double_{0}/img_mod/mod/kernel"], Ld)
        elif k == "double_stream_modulation_txt.lin.weight":
            tile_mod(v, ["double_blocks/block/txt_mod/mod/kernel"] if cfg.scan_blocks
                     else ["double_{0}/txt_mod/mod/kernel"], Ld)
        elif k == "single_stream_modulation.lin.weight":
            tile_mod(v, ["single_blocks/block/mod/mod/kernel"] if cfg.scan_blocks
                     else ["single_{0}/mod/mod/kernel"], Ls)
        else:
            still.append(k)
    _zero_missing_biases(tree)
    return tree, still


def _zero_missing_biases(tree: dict):
    """flux2 Linears are bias-free; our modules have bias params — any bias
    whose kernel was imported but which itself wasn't must be zero, not
    random-init."""
    for k, v in list(tree.items()):
        if isinstance(v, dict):
            if "kernel" in v and "bias" not in v:
                kern = v["kernel"]
                v["bias"] = np.zeros(
                    kern.shape[:-2] + kern.shape[-1:], np.asarray(kern).dtype
                ) if kern.ndim > 2 else np.zeros((kern.shape[-1],), np.asarray(kern).dtype)
            else:
                _zero_missing_biases(v)


def _set(tree: dict, path: str, v):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = v


# ---------------------------------------------------------------- loaders


def load_wan_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + transformer_2/ for wan22 multistage) or a
    single safetensors file. Missing components keep random init (offline)."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    i2v = getattr(model.dit_config, "i2v", False)
    for sub, key in (("transformer", "dit"), ("transformer_2", "dit_low")):
        p = os.path.join(path, sub)
        if os.path.isdir(p) and key in variables:
            flat = load_safetensors_dir(p)
            tree, unmatched = wan_dit_tree(flat, model.dit_config, i2v)
            if unmatched:
                print(f"wan import [{sub}]: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
            variables[key] = _merge_imported(variables[key], tree, f"wan {sub}")
    if os.path.isfile(path):
        flat = load_safetensors_dir(path)
        tree, unmatched = wan_dit_tree(flat, model.dit_config, i2v)
        if unmatched:
            print(f"wan import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "wan dit")
    return variables


def load_ltx2_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = ltx2_dit_tree(flat, model.dit_config)
        if unmatched:
            print(f"ltx2 import: {len(unmatched)} unmatched (audio-stream keys "
                  f"land here by design; e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "ltx2 dit")
    return variables


def load_flux2_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    for sub in ("transformer", "flux2-dev.safetensors", "."):
        p = os.path.join(path, sub)
        if os.path.exists(p):
            flat = load_safetensors_dir(path, sub if sub != "." else None)
            flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
            if any(k.startswith("double_blocks.") for k in flat):
                tree, unmatched = flux2_dit_tree(flat, model.dit_config)
                if unmatched:
                    print(f"flux2 import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
                variables["dit"] = _merge_imported(variables["dit"], tree, "flux2 dit")
                break
    return variables
