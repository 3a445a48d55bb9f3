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


def _llm_flat(tree, gemma: bool = False, glm_fuse: bool = False) -> dict[str, np.ndarray]:
    """Hand-written inverse of ``sd_import.llm_rules`` — the ``(?:model\\.)?``
    optional prefix in those regexes defeats the generic rule inverter
    (``tree_to_torch`` treats every paren group as a substitution slot).

    Emits the base-model state-dict layout (``embed_tokens.weight``,
    ``layers.N.*``, ``norm.weight``, no ``model.`` prefix) that transformers
    ``*Model.save_pretrained`` writes and our importers re-read (the import
    regexes accept both prefixes).

    ``gemma``: norms were imported as (1 + w) -> subtract 1 on the way out,
    and the Gemma2 sandwich norms get their own HF names. ``glm_fuse``:
    re-fuse the swiglu gate/up rows into ``mlp.gate_up_proj`` (transformers
    GlmModel layout; exact inverse of ``dit_importers.glm_split_fused``).
    """
    out: dict[str, np.ndarray] = {}

    def norm_out(v):
        v = np.asarray(v)
        return np.ascontiguousarray(v - 1.0 if gemma else v)

    if "token_embedding" in tree:
        out["embed_tokens.weight"] = np.ascontiguousarray(np.asarray(tree["token_embedding"]))
    if "final_norm" in tree:
        out["norm.weight"] = norm_out(tree["final_norm"]["scale"])

    lin = {"q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
           "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
           "down": "mlp.down_proj"}
    norms = {"input_norm": "input_layernorm",
             "q_norm": "self_attn.q_norm", "k_norm": "self_attn.k_norm"}
    if gemma:
        norms.update({"post_attn_norm": "post_attention_layernorm",
                      "pre_mlp_norm": "pre_feedforward_layernorm",
                      "post_mlp_norm": "post_feedforward_layernorm"})
    else:
        norms["pre_mlp_norm"] = "post_attention_layernorm"

    i = 0
    while f"layer_{i}" in tree:
        blk, p = tree[f"layer_{i}"], f"layers.{i}."
        for ours, theirs in lin.items():
            if ours in blk:
                out[p + theirs + ".weight"] = np.ascontiguousarray(np.asarray(blk[ours]["kernel"]).T)
                if "bias" in blk[ours]:
                    out[p + theirs + ".bias"] = np.ascontiguousarray(np.asarray(blk[ours]["bias"]))
        for ours, theirs in norms.items():
            if ours in blk:
                out[p + theirs + ".weight"] = norm_out(blk[ours]["scale"])
        i += 1

    if glm_fuse:
        fused: dict[str, np.ndarray] = {}
        for k in [k for k in out if ".mlp.gate_proj." in k]:
            ku = k.replace("gate_proj", "up_proj")
            fused[k.replace("gate_proj", "gate_up_proj")] = np.ascontiguousarray(
                np.concatenate([out.pop(k), out.pop(ku)], axis=0))
        out.update(fused)
    return out


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


def _split_qkv(kern, bias):
    """Inverse of qwen_import._fuse_qkv: [in, 3h] kernel -> 3 torch [h, in]."""
    h = kern.shape[-1] // 3
    ws = [np.ascontiguousarray(kern[:, i * h:(i + 1) * h].T) for i in range(3)]
    bs = None if bias is None else [np.asarray(bias[i * h:(i + 1) * h]) for i in range(3)]
    return ws, bs


def _qwen_flat(tree) -> dict[str, np.ndarray]:
    """Inverse of ``qwen_import.qwen_transformer_to_tree`` (diffusers
    QwenImageTransformer2DModel layout; scanned stacks unrolled, fused qkv
    split back into to_q/to_k/to_v + add_*_proj, final adaln halves swapped
    back to diffusers (scale, shift) order)."""
    out: dict[str, np.ndarray] = {}

    def lin(path, key):
        node = _get(tree, path)
        if node is None:
            return
        out[key + ".weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        if "bias" in node:
            out[key + ".bias"] = np.asarray(node["bias"])

    lin("img_in", "img_in")
    lin("txt_in", "txt_in")
    lin("time_in/in_layer", "time_text_embed.timestep_embedder.linear_1")
    lin("time_in/out_layer", "time_text_embed.timestep_embedder.linear_2")
    lin("final_proj", "proj_out")
    fm = _get(tree, "final_mod")
    if fm is not None:  # ours (shift, scale) -> diffusers (scale, shift)
        k = np.asarray(fm["kernel"])
        b = np.asarray(fm["bias"])
        h2 = k.shape[-1] // 2
        out["norm_out.linear.weight"] = np.ascontiguousarray(
            np.concatenate([k[:, h2:], k[:, :h2]], axis=-1).T)
        out["norm_out.linear.bias"] = np.concatenate([b[h2:], b[:h2]])

    scanned = _get(tree, "double_blocks/block") is not None
    if scanned:
        blk = _get(tree, "double_blocks/block")
        depth = np.asarray(blk["img_qkv"]["kernel"]).shape[0]
    else:
        depth = 0
        while _get(tree, f"double_{depth}") is not None:
            depth += 1

    def layer_leaf(i, path):
        if scanned:
            node = _get(tree, "double_blocks/block/" + path)
            return None if node is None else np.asarray(node[i])
        node = _get(tree, f"double_{i}/" + path)
        return None if node is None else np.asarray(node)

    for i in range(depth):
        p = f"transformer_blocks.{i}."
        for fused, names in (("img_qkv", ("attn.to_q", "attn.to_k", "attn.to_v")),
                             ("txt_qkv", ("attn.add_q_proj", "attn.add_k_proj",
                                          "attn.add_v_proj"))):
            ws, bs = _split_qkv(layer_leaf(i, fused + "/kernel"),
                                layer_leaf(i, fused + "/bias"))
            for j, name in enumerate(names):
                out[p + name + ".weight"] = ws[j]
                if bs is not None:
                    out[p + name + ".bias"] = bs[j]
        for dst, src in (("attn.norm_q.weight", "img_qknorm/query_norm/scale"),
                         ("attn.norm_k.weight", "img_qknorm/key_norm/scale"),
                         ("attn.norm_added_q.weight", "txt_qknorm/query_norm/scale"),
                         ("attn.norm_added_k.weight", "txt_qknorm/key_norm/scale")):
            out[p + dst] = layer_leaf(i, src)
        for src, dst in (("img_proj", "attn.to_out.0"), ("txt_proj", "attn.to_add_out"),
                         ("img_mlp_in", "img_mlp.net.0.proj"), ("img_mlp_out", "img_mlp.net.2"),
                         ("txt_mlp_in", "txt_mlp.net.0.proj"), ("txt_mlp_out", "txt_mlp.net.2"),
                         ("img_mod/mod", "img_mod.1"), ("txt_mod/mod", "txt_mod.1")):
            out[p + dst + ".weight"] = np.ascontiguousarray(layer_leaf(i, src + "/kernel").T)
            b = layer_leaf(i, src + "/bias")
            if b is not None:
                out[p + dst + ".bias"] = b
    return out


def _flux2_specials(tree, flat) -> dict[str, np.ndarray]:
    """Post-process the flux1-rule inverse into the BFL flux2 layout: the
    per-block modulation stacks collapse back to the three global stream
    modulations (flux2 computes ONE modulation from vec and reuses it in every
    block — the import tiled it; export takes block 0 and warns if a full
    fine-tune made the tiles diverge, which the flux2 layout cannot hold).
    All-zero biases (flux2 Linears are bias-free; the import zero-filled them)
    are dropped; trained nonzero biases are kept so our own re-import stays a
    round trip."""
    import re

    out: dict[str, np.ndarray] = {}
    mods = {
        r"double_blocks\.(\d+)\.img_mod\.lin\.weight": "double_stream_modulation_img.lin.weight",
        r"double_blocks\.(\d+)\.txt_mod\.lin\.weight": "double_stream_modulation_txt.lin.weight",
        r"single_blocks\.(\d+)\.modulation\.lin\.weight": "single_stream_modulation.lin.weight",
    }
    per_block: dict[str, dict[int, np.ndarray]] = {}
    for key in list(flat):
        for pat, gkey in mods.items():
            m = re.match(pat, key)
            if m:
                per_block.setdefault(gkey, {})[int(m.group(1))] = flat.pop(key)
                break
    for gkey, layers in per_block.items():
        out[gkey] = layers[0]
        if any(not np.allclose(v, layers[0], atol=1e-3)
               for i, v in layers.items() if i > 0):
            print(f"flux2 export: per-block modulations diverged under {gkey}; "
                  f"the BFL layout keeps only the shared (block 0) kernel")
    for key in list(flat):
        if key.endswith(".bias") and not np.any(flat[key]):
            flat.pop(key)
    return out


def _hidream_flat(tree, cfg) -> dict[str, np.ndarray]:
    """Inverse of ``dit_importers.hidream_dit_tree`` (vendored reference layout,
    ``extensions_built_in/diffusion_models/hidream/src/models/``). ``txt_in``
    has no torch counterpart (the reference projects captions per block; we
    project once) and is skipped — re-import leaves it at init, matching the
    forward import path."""
    out: dict[str, np.ndarray] = {}

    def T(a):
        return np.ascontiguousarray(np.asarray(a).T)

    def lin(path, key):
        node = _get(tree, path)
        if node is None:
            return
        out[key + ".weight"] = T(node["kernel"])
        if "bias" in node:
            out[key + ".bias"] = np.asarray(node["bias"])

    for src, dst in (
        ("time_in/in_layer", "t_embedder.timestep_embedder.linear_1"),
        ("time_in/out_layer", "t_embedder.timestep_embedder.linear_2"),
        ("vector_in/in_layer", "p_embedder.pooled_embedder.linear_1"),
        ("vector_in/out_layer", "p_embedder.pooled_embedder.linear_2"),
        ("img_in", "x_embedder.proj"),
        ("final_proj", "final_layer.linear"),
        ("final_mod", "final_layer.adaLN_modulation.1"),
    ):
        lin(src, dst)

    def emit_stack(scan_path, loop_fmt, emit_one):
        blk = _get(tree, scan_path)
        if blk is not None:  # scanned: leading layer axis on every leaf
            depth = len(next(iter(_iter_leaves(blk)))[1])

            def get(i, path, _blk=blk):
                node = _get(_blk, path)
                return None if node is None else np.asarray(node[i])

            for i in range(depth):
                emit_one(i, lambda p, _i=i: get(_i, p))
        else:
            i = 0
            while _get(tree, loop_fmt.format(i)) is not None:
                def get(path, _i=i):
                    node = _get(tree, loop_fmt.format(_i) + "/" + path)
                    return None if node is None else np.asarray(node)

                emit_one(i, get)
                i += 1

    def moe_flat(prefix, get, sub):
        out[prefix + ".gate.weight"] = T(get(sub + "/gate/kernel"))
        for w in ("w1", "w2", "w3"):
            stk = get(f"{sub}/experts/{w}/kernel")  # [E, in, out]
            for e in range(stk.shape[0]):
                out[f"{prefix}.experts.{e}.{w}.weight"] = T(stk[e])
            out[f"{prefix}.shared_experts.{w}.weight"] = T(get(f"{sub}/shared/{w}/kernel"))

    def emit_double(i, get):
        p = f"double_stream_blocks.{i}.block."
        ik, tk = get("img_mod/mod/kernel"), get("txt_mod/mod/kernel")
        out[p + "adaLN_modulation.1.weight"] = T(np.concatenate([ik, tk], axis=-1))
        out[p + "adaLN_modulation.1.bias"] = np.concatenate(
            [get("img_mod/mod/bias"), get("txt_mod/mod/bias")])
        for stream, names, qn, proj in (
            ("img", ("attn1.to_q", "attn1.to_k", "attn1.to_v"),
             "attn1.q_rms_norm", "attn1.to_out"),
            ("txt", ("attn1.to_q_t", "attn1.to_k_t", "attn1.to_v_t"),
             "attn1.q_rms_norm_t", "attn1.to_out_t"),
        ):
            ws, bs = _split_qkv(get(f"{stream}_qkv/kernel"), get(f"{stream}_qkv/bias"))
            for j, n in enumerate(names):
                out[p + n + ".weight"] = ws[j]
                if bs is not None:
                    out[p + n + ".bias"] = bs[j]
            out[p + qn + ".weight"] = get(f"{stream}_qknorm/query_norm/scale")
            out[p + qn.replace("q_rms", "k_rms") + ".weight"] = get(
                f"{stream}_qknorm/key_norm/scale")
            out[p + proj + ".weight"] = T(get(f"{stream}_proj/kernel"))
            b = get(f"{stream}_proj/bias")
            if b is not None:
                out[p + proj + ".bias"] = b
        moe_flat(p + "ff_i", get, "img_mlp_moe")
        for w in ("w1", "w2", "w3"):
            out[p + f"ff_t.{w}.weight"] = T(get(f"txt_mlp_swiglu/{w}/kernel"))

    def emit_single(i, get):
        p = f"single_stream_blocks.{i}.block."
        out[p + "adaLN_modulation.1.weight"] = T(get("mod/mod/kernel"))
        out[p + "adaLN_modulation.1.bias"] = get("mod/mod/bias")
        ws, bs = _split_qkv(get("qkv/kernel"), get("qkv/bias"))
        for j, n in enumerate(("attn1.to_q", "attn1.to_k", "attn1.to_v")):
            out[p + n + ".weight"] = ws[j]
            if bs is not None:
                out[p + n + ".bias"] = bs[j]
        out[p + "attn1.q_rms_norm.weight"] = get("qknorm/query_norm/scale")
        out[p + "attn1.k_rms_norm.weight"] = get("qknorm/key_norm/scale")
        out[p + "attn1.to_out.weight"] = T(get("proj/kernel"))
        b = get("proj/bias")
        if b is not None:
            out[p + "attn1.to_out.bias"] = b
        moe_flat(p + "ff_i", get, "mlp_moe")

    emit_stack("double_blocks/block", "double_{0}", emit_double)
    emit_stack("single_blocks/block", "single_{0}", emit_single)
    return out


def _iter_leaves(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _iter_leaves(v, p)
        else:
            yield p, v


def _ltx2_specials(tree, cfg) -> dict[str, np.ndarray]:
    """Inverse of ltx2_dit_tree's table handling (scale_shift_table leaves)."""
    out: dict[str, np.ndarray] = {}
    head = _get(tree, "head_modulation")
    if head is not None:
        out["scale_shift_table"] = np.asarray(head)
    mod = _get(tree, "blocks/block/modulation")
    if mod is not None:
        for i in range(mod.shape[0]):
            out[f"transformer_blocks.{i}.scale_shift_table"] = np.asarray(mod[i])
    else:
        i = 0
        while (m := _get(tree, f"block_{i}/modulation")) is not None:
            out[f"transformer_blocks.{i}.scale_shift_table"] = np.asarray(m)
            i += 1
    return out


def component_plan(model) -> list[tuple[str, str, str, list, object]]:
    """[(component_key, subdir, filename, rules, specials_fn|None)] for the
    arch, or raises for archs without an inverse mapping yet.

    ``rules`` may be None for archs whose importer is a hand-written tree
    builder (qwen) — then ``specials`` produces the whole flat dict.
    ``specials`` receives ``(tree, flat)`` and may mutate ``flat`` in place
    (flux2 pops per-block keys its layout cannot hold)."""
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
        if getattr(model.dit_config, "nerf_head", False):
            from ai_toolkit_tpu.io.flux_import import radiance_rules

            cfg = model.dit_config
            pp = cfg.pixel_patch
            # radiance's img_in is the patchify conv (img_in_patch.* in the
            # checkpoint) — drop the plain-linear flux rule so export doesn't
            # also emit a mistransposed img_in.weight for the same leaf
            rules = radiance_rules(cfg.in_channels // pp**2, pp) + [
                r for r in rules if not r[0].startswith("img_in")
            ]
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
        plan.append(("dit", "transformer", W, rules, lambda t, f: _wan_specials(t, cfg)))
        if getattr(model, "multistage", False):
            plan.append(("dit_low", "transformer_2", W, rules,
                         lambda t, f: _wan_specials(t, cfg)))
        plan.append(("t5", "text_encoder", M,
                     t5_rules(per_layer_bias=model.t5_config.per_layer_bias), None))
        return plan

    if arch.startswith(("qwen_image", "mageflow")):
        # hand-written importer (qwen_import.qwen_transformer_to_tree) ->
        # hand-written inverse; TE/VAE stay with their own import paths
        plan.append(("dit", "transformer", W, None, lambda t, f: _qwen_flat(t)))
        return plan

    if arch.startswith(("sd3", "sd35")):
        from ai_toolkit_tpu.io.sd3_import import sd3_flat

        cfg = model.dit_config
        plan.append(("dit", "transformer", W, None,
                     lambda t, f, _c=cfg: sd3_flat(t, _c)))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        plan.append(("clip", "text_encoder", M, clip_rules(), None))
        plan.append(("clip2", "text_encoder_2", M, clip_rules(), None))
        plan.append(("t5", "text_encoder_3", M, t5_rules(), None))
        return plan

    if arch == "lumina2":
        from ai_toolkit_tpu.io.dit_importers import lumina2_rules

        plan.append(("dit", "transformer", W,
                     lumina2_rules(model.dit_config.scan_blocks), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        plan.append(("te", "text_encoder", M, None,
                     lambda t, f: _llm_flat(t, gemma=True)))
        return plan

    if arch == "omnigen2":
        from ai_toolkit_tpu.io.dit_importers import omnigen2_rules

        # mllm (qwen2.5-vl) stays with its own import path, like lumina2's TE
        plan.append(("dit", "transformer", W,
                     omnigen2_rules(model.dit_config.scan_blocks), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        return plan

    if arch.startswith("hidream"):
        cfg = model.dit_config
        plan.append(("dit", "transformer", W, None,
                     lambda t, f, _c=cfg: _hidream_flat(t, _c)))
        return plan

    if arch.startswith("flux2"):
        from ai_toolkit_tpu.io.flux_import import flux_dit_rules

        plan.append(("dit", "transformer", W,
                     flux_dit_rules(model.dit_config.scan_blocks), _flux2_specials))
        return plan

    if arch.startswith(("ltx2", "ltxv")) and not arch.startswith("minimax"):
        from ai_toolkit_tpu.io.dit_importers import ltx2_dit_rules

        cfg = model.dit_config
        plan.append(("dit", "transformer", W, ltx2_dit_rules(cfg.scan_blocks),
                     lambda t, f: _ltx2_specials(t, cfg)))
        plan.append(("te", "text_encoder", M, None,
                     lambda t, f: _llm_flat(t, gemma=True)))
        return plan

    if arch.startswith("pixart"):
        from ai_toolkit_tpu.io.dit_importers import pixart_rules

        cfg = model.dit_config
        plan.append(("dit", "transformer", W,
                     pixart_rules(cfg.scan_blocks, cfg.micro_cond,
                                  cfg.in_channels, cfg.patch_size), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        plan.append(("t5", "text_encoder", M, t5_rules(), None))
        return plan

    if arch == "cogview4":
        from ai_toolkit_tpu.io.dit_importers import cogview4_rules

        plan.append(("dit", "transformer", W,
                     cogview4_rules(model.dit_config.scan_blocks), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        plan.append(("te", "text_encoder", M, None,
                     lambda t, f: _llm_flat(t, glm_fuse=True)))
        return plan

    if arch == "auraflow":
        from ai_toolkit_tpu.io.dit_importers import auraflow_rules

        plan.append(("dit", "transformer", W,
                     auraflow_rules(model.dit_config.scan_blocks), None))
        plan.append(("vae", "vae", W, vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block
        ), None))
        plan.append(("t5", "text_encoder", M,
                     t5_rules(per_layer_bias=model.t5_config.per_layer_bias), None))
        return plan

    raise NotImplementedError(
        f"full-model export is not implemented for arch '{model.config.arch}' — "
        f"supported: sd1/sd2/sdxl family, sd3/sd3.5, flux family, wan family, "
        f"qwen_image/mageflow, hidream, flux2 family, ltx2, lumina2, omnigen2, "
        f"auraflow"
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
        flat = tree_to_torch(tree, rules) if rules is not None else {}
        if specials is not None:
            flat.update(specials(tree, flat))
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
