"""SD3 / SD3.5 checkpoint import + export (diffusers SD3Transformer2DModel).

The reference loads sd3 through diffusers (``toolkit/stable_diffusion_model.py:396``);
the transformer layout is the public diffusers one:

- ``pos_embed.proj`` Conv2d patch embed + ``pos_embed.pos_embed`` learned table
- ``context_embedder``, ``time_text_embed.{timestep,text}_embedder.linear_{1,2}``
- ``transformer_blocks.{i}.``: ``norm1.linear`` (6d adaLN-zero; 9d for
  sd3.5-medium dual-attention blocks), ``norm1_context.linear`` (6d; the last
  block is context_pre_only -> 2d continuous), ``attn.to_q/k/v``,
  ``attn.add_{q,k,v}_proj``, ``attn.norm_{q,k}`` / ``norm_added_{q,k}`` (sd3.5),
  ``attn.to_out.0``, ``attn.to_add_out``, ``ff(.net.0.proj|.net.2)``,
  ``ff_context.*``, and ``attn2.*`` on dual-attention blocks
- ``norm_out.linear`` (continuous, chunk order **scale, shift** — ours is
  shift, scale -> halves swapped both ways), ``proj_out``

Our tree: FluxDiT with ``dual_blocks``/``double_blocks``/``final_block``
stacks (see models/flux_dit.py). Token feature order is patch-major
``(ph pw c)`` — exactly diffusers' unpatchify ``nhwpqc`` order, so proj_out
imports as a plain linear and the conv patch embed reshapes to (kh, kw, c).
"""

from __future__ import annotations

import os

import numpy as np

from ai_toolkit_tpu.io.dit_importers import _set, _flatten
from ai_toolkit_tpu.io.torch_import import load_safetensors_dir


def _fuse(flat, used, names, bias=True):
    kw = np.concatenate([np.asarray(flat[n + ".weight"]).T for n in names], axis=-1)
    used.update(n + ".weight" for n in names)
    out = {"kernel": np.ascontiguousarray(kw)}
    if bias and names[0] + ".bias" in flat:
        out["bias"] = np.concatenate([np.asarray(flat[n + ".bias"]) for n in names])
        used.update(n + ".bias" for n in names)
    return out


def sd3_dit_tree(flat: dict[str, np.ndarray], cfg) -> tuple[dict, list[str]]:
    """diffusers SD3Transformer2DModel flat dict -> FluxDiT(sd3) tree."""
    flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
    used: set[str] = set()
    tree: dict = {}

    def take(k):
        used.add(k)
        return np.asarray(flat[k])

    def has(k):
        return k in flat

    def lin(src, dst, into=None):
        t = into if into is not None else tree
        _set(t, dst + "/kernel", np.ascontiguousarray(take(src + ".weight").T))
        if has(src + ".bias"):
            _set(t, dst + "/bias", take(src + ".bias"))

    # --- top level ---
    if has("pos_embed.proj.weight"):
        w = take("pos_embed.proj.weight")  # conv [d, c, kh, kw]
        k = w.transpose(2, 3, 1, 0)  # (kh, kw, c, d) -> flatten (kh kw c) rows
        _set(tree, "img_in/kernel", np.ascontiguousarray(k.reshape(-1, k.shape[-1])))
        if has("pos_embed.proj.bias"):
            _set(tree, "img_in/bias", take("pos_embed.proj.bias"))
    if has("pos_embed.pos_embed"):
        tab = take("pos_embed.pos_embed")  # [1, M*M, d]
        m_ck = int(round(tab.shape[1] ** 0.5))
        m = cfg.pos_embed_max_size
        if m_ck != m:
            if m_ck > m:  # center-crop the checkpoint grid to ours
                g = tab.reshape(m_ck, m_ck, -1)
                o = (m_ck - m) // 2
                tab = np.ascontiguousarray(g[o:o + m, o:o + m].reshape(1, m * m, -1))
            else:
                raise ValueError(
                    f"sd3 pos_embed table in checkpoint is {m_ck}x{m_ck} but the "
                    f"model wants {m}x{m} — set model_kwargs.size to the right variant")
        _set(tree, "pos_embed", tab)
    lin("context_embedder", "txt_in")
    lin("time_text_embed.timestep_embedder.linear_1", "time_in/in_layer")
    lin("time_text_embed.timestep_embedder.linear_2", "time_in/out_layer")
    lin("time_text_embed.text_embedder.linear_1", "vector_in/in_layer")
    lin("time_text_embed.text_embedder.linear_2", "vector_in/out_layer")
    lin("proj_out", "final_proj")
    if has("norm_out.linear.weight"):
        k = take("norm_out.linear.weight").T  # [d, 2d] diffusers (scale, shift)
        b = take("norm_out.linear.bias")
        h2 = k.shape[-1] // 2
        _set(tree, "final_mod/kernel",
             np.ascontiguousarray(np.concatenate([k[:, h2:], k[:, :h2]], axis=-1)))
        _set(tree, "final_mod/bias", np.concatenate([b[h2:], b[:h2]]))

    # --- blocks ---
    n = cfg.depth_double
    n_dual = cfg.dual_attention_layers
    n_final = 1 if cfg.final_context_pre_only else 0

    def block_tree(i, final=False, dual=False):
        p = f"transformer_blocks.{i}."
        sub: dict = {}
        lin(p + "norm1.linear", "img_mod/mod", sub)
        if final:
            # AdaLayerNormContinuous: plain linear, (scale, shift) — our
            # FinalDoubleBlock implements the same chunk order
            lin(p + "norm1_context.linear", "txt_mod", sub)
        else:
            lin(p + "norm1_context.linear", "txt_mod/mod", sub)
        sub["img_qkv"] = _fuse(flat, used, [p + "attn.to_q", p + "attn.to_k", p + "attn.to_v"])
        sub["txt_qkv"] = _fuse(
            flat, used, [p + "attn.add_q_proj", p + "attn.add_k_proj", p + "attn.add_v_proj"])
        if has(p + "attn.norm_q.weight"):
            _set(sub, "img_qknorm/query_norm/scale", take(p + "attn.norm_q.weight"))
            _set(sub, "img_qknorm/key_norm/scale", take(p + "attn.norm_k.weight"))
            _set(sub, "txt_qknorm/query_norm/scale", take(p + "attn.norm_added_q.weight"))
            _set(sub, "txt_qknorm/key_norm/scale", take(p + "attn.norm_added_k.weight"))
        lin(p + "attn.to_out.0", "img_proj", sub)
        lin(p + "ff.net.0.proj", "img_mlp_in", sub)
        lin(p + "ff.net.2", "img_mlp_out", sub)
        if not final:
            lin(p + "attn.to_add_out", "txt_proj", sub)
            lin(p + "ff_context.net.0.proj", "txt_mlp_in", sub)
            lin(p + "ff_context.net.2", "txt_mlp_out", sub)
        if dual:
            sub["img2_qkv"] = _fuse(
                flat, used, [p + "attn2.to_q", p + "attn2.to_k", p + "attn2.to_v"])
            if has(p + "attn2.norm_q.weight"):
                _set(sub, "img2_qknorm/query_norm/scale", take(p + "attn2.norm_q.weight"))
                _set(sub, "img2_qknorm/key_norm/scale", take(p + "attn2.norm_k.weight"))
            lin(p + "attn2.to_out.0", "img2_proj", sub)
        return sub

    def emit(blocks: list[dict], scan_path: str, loop_fmt: str):
        if not blocks:
            return
        if cfg.scan_blocks:
            leaves: dict[str, list] = {}
            for sub in blocks:
                for pth, v in _flatten(sub).items():
                    leaves.setdefault(pth, []).append(v)
            for pth, vals in leaves.items():
                _set(tree, f"{scan_path}/{pth}", np.stack(vals))
        else:
            for j, sub in enumerate(blocks):
                for pth, v in _flatten(sub).items():
                    _set(tree, loop_fmt.format(j) + "/" + pth, v)

    present = [i for i in range(n) if has(f"transformer_blocks.{i}.attn.to_q.weight")]
    duals = [block_tree(i, dual=True) for i in present if i < n_dual]
    mains = [block_tree(i) for i in present if n_dual <= i < n - n_final]
    emit(duals, "dual_blocks/block", "dual_{0}")
    emit(mains, "double_blocks/block", "double_{0}")
    if n_final and (n - 1) in present:
        for pth, v in _flatten(block_tree(n - 1, final=True)).items():
            _set(tree, "final_block/" + pth, v)

    unmatched = [k for k in flat if k not in used]
    return tree, unmatched


def load_sd3_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + text_encoder{,_2,_3}/) or a
    single diffusers-layout transformer safetensors file."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import clip_rules, t5_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = sd3_dit_tree(flat, model.dit_config)
        if unmatched:
            print(f"sd3 import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "sd3 dit")

    companions = [
        ("vae", "vae", vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block)),
        ("text_encoder", "clip", clip_rules()),
        ("text_encoder_2", "clip2", clip_rules()),
        ("text_encoder_3", "t5", t5_rules()),
    ]
    for subdir, comp, rules in companions:
        d = os.path.join(path, subdir)
        if comp in variables and os.path.isdir(d):
            flat = load_safetensors_dir(path, subdir)
            tree, _ = torch_to_tree(flat, rules)
            if tree:
                variables[comp] = _merge_imported(variables[comp], tree, comp)
    return variables


def sd3_flat(tree: dict, cfg) -> dict[str, np.ndarray]:
    """Inverse of :func:`sd3_dit_tree` for full-model export."""
    out: dict[str, np.ndarray] = {}

    def T(a):
        return np.ascontiguousarray(np.asarray(a).T)

    def _get(t, path):
        node = t
        for k in path.split("/"):
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    def lin(src_path, key, t=None):
        node = _get(t if t is not None else tree, src_path)
        if node is None:
            return
        out[key + ".weight"] = T(node["kernel"])
        if "bias" in node:
            out[key + ".bias"] = np.asarray(node["bias"])

    k = _get(tree, "img_in/kernel")
    if k is not None:
        d = k.shape[-1]
        c = k.shape[0] // 4
        out["pos_embed.proj.weight"] = np.ascontiguousarray(
            np.asarray(k).reshape(2, 2, c, d).transpose(3, 2, 0, 1))
        b = _get(tree, "img_in/bias")
        if b is not None:
            out["pos_embed.proj.bias"] = np.asarray(b)
    tab = _get(tree, "pos_embed")
    if tab is not None:
        out["pos_embed.pos_embed"] = np.asarray(tab)
    lin("txt_in", "context_embedder")
    lin("time_in/in_layer", "time_text_embed.timestep_embedder.linear_1")
    lin("time_in/out_layer", "time_text_embed.timestep_embedder.linear_2")
    lin("vector_in/in_layer", "time_text_embed.text_embedder.linear_1")
    lin("vector_in/out_layer", "time_text_embed.text_embedder.linear_2")
    lin("final_proj", "proj_out")
    fm = _get(tree, "final_mod")
    if fm is not None:  # ours (shift, scale) -> diffusers (scale, shift)
        kk = np.asarray(fm["kernel"])
        bb = np.asarray(fm["bias"])
        h2 = kk.shape[-1] // 2
        out["norm_out.linear.weight"] = np.ascontiguousarray(
            np.concatenate([kk[:, h2:], kk[:, :h2]], axis=-1).T)
        out["norm_out.linear.bias"] = np.concatenate([bb[h2:], bb[:h2]])

    n_dual = cfg.dual_attention_layers
    n = cfg.depth_double
    n_final = 1 if cfg.final_context_pre_only else 0

    def split3(node, names, p):
        kern = np.asarray(node["kernel"])
        h = kern.shape[-1] // 3
        for j, nme in enumerate(names):
            out[p + nme + ".weight"] = np.ascontiguousarray(kern[:, j * h:(j + 1) * h].T)
        if "bias" in node:
            bias = np.asarray(node["bias"])
            for j, nme in enumerate(names):
                out[p + nme + ".bias"] = np.asarray(bias[j * h:(j + 1) * h])

    def emit_block(i, sub, final=False, dual=False):
        p = f"transformer_blocks.{i}."
        lin("img_mod/mod", p + "norm1.linear", sub)
        if final:
            lin("txt_mod", p + "norm1_context.linear", sub)
        else:
            lin("txt_mod/mod", p + "norm1_context.linear", sub)
        split3(_get(sub, "img_qkv"), ("attn.to_q", "attn.to_k", "attn.to_v"), p)
        split3(_get(sub, "txt_qkv"),
               ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"), p)
        qn = _get(sub, "img_qknorm")
        if qn is not None:
            out[p + "attn.norm_q.weight"] = np.asarray(qn["query_norm"]["scale"])
            out[p + "attn.norm_k.weight"] = np.asarray(qn["key_norm"]["scale"])
            tn = _get(sub, "txt_qknorm")
            out[p + "attn.norm_added_q.weight"] = np.asarray(tn["query_norm"]["scale"])
            out[p + "attn.norm_added_k.weight"] = np.asarray(tn["key_norm"]["scale"])
        lin("img_proj", p + "attn.to_out.0", sub)
        lin("img_mlp_in", p + "ff.net.0.proj", sub)
        lin("img_mlp_out", p + "ff.net.2", sub)
        if not final:
            lin("txt_proj", p + "attn.to_add_out", sub)
            lin("txt_mlp_in", p + "ff_context.net.0.proj", sub)
            lin("txt_mlp_out", p + "ff_context.net.2", sub)
        if dual:
            split3(_get(sub, "img2_qkv"), ("attn2.to_q", "attn2.to_k", "attn2.to_v"), p)
            qn2 = _get(sub, "img2_qknorm")
            if qn2 is not None:
                out[p + "attn2.norm_q.weight"] = np.asarray(qn2["query_norm"]["scale"])
                out[p + "attn2.norm_k.weight"] = np.asarray(qn2["key_norm"]["scale"])
            lin("img2_proj", p + "attn2.to_out.0", sub)

    def layer_subs(scan_path, loop_fmt, count):
        blk = _get(tree, scan_path)
        if blk is not None:
            flat_lv = _flatten(blk)
            depth = len(next(iter(flat_lv.values())))
            subs = []
            for j in range(depth):
                sub: dict = {}
                for pth, v in flat_lv.items():
                    _set(sub, pth, np.asarray(v[j]))
                subs.append(sub)
            return subs
        subs = []
        j = 0
        while _get(tree, loop_fmt.format(j)) is not None:
            subs.append(_get(tree, loop_fmt.format(j)))
            j += 1
        return subs

    for j, sub in enumerate(layer_subs("dual_blocks/block", "dual_{0}", n_dual)):
        emit_block(j, sub, dual=True)
    for j, sub in enumerate(layer_subs("double_blocks/block", "double_{0}", n - n_dual - n_final)):
        emit_block(n_dual + j, sub)
    fb = _get(tree, "final_block")
    if n_final and fb is not None:
        emit_block(n - 1, fb, final=True)
    return out
