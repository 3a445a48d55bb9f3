"""Qwen-Image checkpoint importer (diffusers ``QwenImageTransformer2DModel``
layout -> our scanned FluxDiT tree).

Parity bridge for ``extensions_built_in/diffusion_models/qwen_image/
qwen_image.py:102-131`` (the reference loads the transformer with
``from_pretrained``/``from_single_file``). Differences vs the BFL flux
layout handled here:

- q/k/v are separate Linears (``attn.to_q/to_k/to_v`` for the image stream,
  ``attn.add_q_proj/add_k_proj/add_v_proj`` for text) -> fused into our
  ``img_qkv``/``txt_qkv`` kernels ([in, 3h], q|k|v order).
- per-stream output projections ``attn.to_out.0`` / ``attn.to_add_out``.
- ``norm_out.linear`` (AdaLayerNormContinuous) emits (scale, shift);
  our final_mod consumes (shift, scale) -> halves swapped on import.
- ``txt_norm`` (RMSNorm before txt_in) has no slot in our graph (txt_in is
  a plain Linear); its scale is returned in ``unmatched`` and reported.

Weights are stacked on a leading layer axis for the nn.scan layout.
"""

from __future__ import annotations

import os

import numpy as np


def _t(v):  # torch Linear weight [out, in] -> kernel [in, out]
    return np.ascontiguousarray(np.asarray(v).T)


def _fuse_qkv(flat: dict, prefix: str, q: str, k: str, v: str):
    kw = np.concatenate([_t(flat[f"{prefix}{q}.weight"]), _t(flat[f"{prefix}{k}.weight"]),
                         _t(flat[f"{prefix}{v}.weight"])], axis=-1)
    kb = None
    if f"{prefix}{q}.bias" in flat:
        kb = np.concatenate([np.asarray(flat[f"{prefix}{x}.bias"]) for x in (q, k, v)])
    return kw, kb


def qwen_transformer_to_tree(
    flat: dict[str, np.ndarray], depth: int, scan: bool = True
) -> tuple[dict, list[str]]:
    """Returns (params tree matching FluxDiT(depth_double=depth, depth_single=0,
    scan_blocks=scan), unmatched keys). ``scan=False`` writes per-layer
    ``double_{i}/`` subtrees instead of stacked leaves (tiny test models)."""
    used: set[str] = set()

    def take(key):
        used.add(key)
        return np.asarray(flat[key])

    tree: dict = {}

    def put(path: str, val):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    put("img_in/kernel", _t(take("img_in.weight")))
    if "img_in.bias" in flat:
        put("img_in/bias", take("img_in.bias"))
    put("txt_in/kernel", _t(take("txt_in.weight")))
    if "txt_in.bias" in flat:
        put("txt_in/bias", take("txt_in.bias"))
    put("time_in/in_layer/kernel", _t(take("time_text_embed.timestep_embedder.linear_1.weight")))
    put("time_in/in_layer/bias", take("time_text_embed.timestep_embedder.linear_1.bias"))
    put("time_in/out_layer/kernel", _t(take("time_text_embed.timestep_embedder.linear_2.weight")))
    put("time_in/out_layer/bias", take("time_text_embed.timestep_embedder.linear_2.bias"))

    # final adaln: diffusers (scale, shift) -> ours (shift, scale)
    w = _t(take("norm_out.linear.weight"))
    b = take("norm_out.linear.bias")
    h2 = w.shape[-1] // 2
    put("final_mod/kernel", np.concatenate([w[:, h2:], w[:, :h2]], axis=-1))
    put("final_mod/bias", np.concatenate([b[h2:], b[:h2]]))
    put("final_proj/kernel", _t(take("proj_out.weight")))
    if "proj_out.bias" in flat:
        put("final_proj/bias", take("proj_out.bias"))

    per_layer: dict[str, list] = {}

    def stack_put(path, val):
        if scan:
            per_layer.setdefault(path, []).append(val)
        else:  # closes over the loop's current layer index
            put(path.replace("double_blocks/block", f"double_{i}"), val)

    for i in range(depth):
        p = f"transformer_blocks.{i}."
        kw, kb = _fuse_qkv(flat, p, "attn.to_q", "attn.to_k", "attn.to_v")
        for key in (f"{p}attn.to_{x}.{s}" for x in "qkv" for s in ("weight", "bias")):
            used.add(key)
        stack_put("double_blocks/block/img_qkv/kernel", kw)
        if kb is not None:
            stack_put("double_blocks/block/img_qkv/bias", kb)
        kw, kb = _fuse_qkv(flat, p, "attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj")
        for key in (f"{p}attn.add_{x}_proj.{s}" for x in "qkv" for s in ("weight", "bias")):
            used.add(key)
        stack_put("double_blocks/block/txt_qkv/kernel", kw)
        if kb is not None:
            stack_put("double_blocks/block/txt_qkv/bias", kb)
        for src, dst in (
            ("attn.norm_q.weight", "img_qknorm/query_norm/scale"),
            ("attn.norm_k.weight", "img_qknorm/key_norm/scale"),
            ("attn.norm_added_q.weight", "txt_qknorm/query_norm/scale"),
            ("attn.norm_added_k.weight", "txt_qknorm/key_norm/scale"),
        ):
            stack_put(f"double_blocks/block/{dst}", take(p + src))
        for src, dst in (
            ("attn.to_out.0", "img_proj"), ("attn.to_add_out", "txt_proj"),
            ("img_mlp.net.0.proj", "img_mlp_in"), ("img_mlp.net.2", "img_mlp_out"),
            ("txt_mlp.net.0.proj", "txt_mlp_in"), ("txt_mlp.net.2", "txt_mlp_out"),
            ("img_mod.1", "img_mod/mod"), ("txt_mod.1", "txt_mod/mod"),
        ):
            stack_put(f"double_blocks/block/{dst}/kernel", _t(take(f"{p}{src}.weight")))
            if f"{p}{src}.bias" in flat:
                stack_put(f"double_blocks/block/{dst}/bias", take(f"{p}{src}.bias"))

    for path, vals in per_layer.items():
        put(path, np.stack(vals))

    unmatched = [k for k in flat if k not in used]
    return tree, unmatched


def load_qwen_checkpoint(path: str, model) -> dict:
    """HF-layout dir with transformer/*.safetensors; TE/VAE random-init when
    their subfolders are absent (documented: the qwen 3D VAE and Qwen2.5-VL
    importers land with the video-VAE importer work)."""
    import jax

    from ai_toolkit_tpu.io.torch_import import load_safetensors_dir  # type: ignore

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    if os.path.isdir(tdir):
        flat = load_safetensors_dir(tdir)
        tree, unmatched = qwen_transformer_to_tree(
            flat, model.dit_config.depth_double, model.dit_config.scan_blocks)
        if unmatched:
            print(f"qwen import: {len(unmatched)} unmatched keys (e.g. {unmatched[:3]})")
        # merge (not replace): vector_in has no qwen-checkpoint source and
        # must keep its init params or apply() fails on a missing collection
        from ai_toolkit_tpu.io.flux_import import _merge_imported

        variables["dit"] = _merge_imported(variables["dit"], tree, "qwen dit")
    # qwen's VAE is diffusers AutoencoderKLQwenImage == the wan 2.1 causal
    # VAE; exact import via the wan rules when the model runs the 3D VAE
    vae_dir = os.path.join(path, "vae")
    if getattr(model, "_vae_3d", False) and os.path.isdir(vae_dir):
        from ai_toolkit_tpu.io.flux_import import _merge_imported
        from ai_toolkit_tpu.io.video_vae_import import (
            load_wan_vae_tree,
            wan_vae_config_from_json,
        )
        from ai_toolkit_tpu.models.wan_vae import WanVAE

        cfg = wan_vae_config_from_json(vae_dir)
        model.vae_config = cfg
        model.vae = WanVAE(cfg)
        tree, unmatched = load_wan_vae_tree(vae_dir)
        if unmatched:
            print(f"qwen vae import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        sd_ = cfg.spatial_downscale
        ref = model.vae.init(
            jax.random.key(0), jax.numpy.zeros((1, 1, 2 * sd_, 2 * sd_, 3))
        )["params"]
        variables["vae"] = _merge_imported(ref, tree, "qwen vae")
    elif getattr(model, "_vae_mage", False) and os.path.isdir(vae_dir):
        # mageflow: exact MageVAE (student.dconv_encoder.* / pipeline.* keys)
        from ai_toolkit_tpu.io.dit_importers import mage_vae_rules
        from ai_toolkit_tpu.io.flux_import import _merge_imported
        from ai_toolkit_tpu.io.torch_import import torch_to_tree

        flat = load_safetensors_dir(vae_dir)
        tree, unmatched = torch_to_tree(flat, mage_vae_rules())
        skip = ("s_embedder.proj1", "y_embedder.encoder", "y_embedder.bottleneck")
        unmatched = [k for k in unmatched if not any(s in k for s in skip)]
        if unmatched:
            print(f"mage vae import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["vae"] = _merge_imported(variables["vae"], tree, "mage vae")
    # mageflow TE: Qwen3-VL text tower (final hidden states)
    tedir = os.path.join(path, "text_encoder")
    if getattr(model, "is_mageflow", False) and os.path.isdir(tedir):
        from ai_toolkit_tpu.io.flux_import import _merge_imported
        from ai_toolkit_tpu.io.sd_import import llm_rules
        from ai_toolkit_tpu.io.torch_import import torch_to_tree

        flat = load_safetensors_dir(tedir)
        flat = {k.replace("model.language_model.", "model."): v for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "mageflow te")
    return variables
