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
        # NOTE: plain dots here — lin() escapes them once. Pre-escaped entries
        # used to double-escape, silently dropping to_out/ffn weights on
        # import (caught by tests/test_wan_golden.py).
        ("attn1.to_q", "self_q"), ("attn1.to_k", "self_k"), ("attn1.to_v", "self_v"),
        ("attn1.to_out.0", "self_o"),
        ("attn2.to_q", "cross_q"), ("attn2.to_k", "cross_k"), ("attn2.to_v", "cross_v"),
        ("attn2.to_out.0", "cross_o"),
        ("ffn.net.0.proj", "ffn_in"), ("ffn.net.2", "ffn_out"),
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


# ---------------------------------------------------------------- hidream


def hidream_dit_tree(flat: dict[str, np.ndarray], cfg) -> tuple[dict, list[str]]:
    """HiDream transformer (vendored reference layout,
    ``extensions_built_in/diffusion_models/hidream/src/models/``) -> FluxDiT
    MoE tree. Per-block text projections (caption_projection.*) have no slot
    here (we project text once) and are returned unmatched."""
    flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
    used: set[str] = set()
    tree: dict = {}

    def take(k):
        used.add(k)
        return np.asarray(flat[k])

    def has(k):
        return k in flat

    def lin(src, dst):
        _set(tree, dst + "/kernel", np.ascontiguousarray(take(src + ".weight").T))
        if has(src + ".bias"):
            _set(tree, dst + "/bias", take(src + ".bias"))

    for src, dst in (
        ("t_embedder.timestep_embedder.linear_1", "time_in/in_layer"),
        ("t_embedder.timestep_embedder.linear_2", "time_in/out_layer"),
        ("p_embedder.pooled_embedder.linear_1", "vector_in/in_layer"),
        ("p_embedder.pooled_embedder.linear_2", "vector_in/out_layer"),
        ("x_embedder.proj", "img_in"),
        ("final_layer.linear", "final_proj"),
        ("final_layer.adaLN_modulation.1", "final_mod"),
    ):
        if has(src + ".weight"):
            lin(src, dst)

    d = cfg.hidden_size

    def fuse(prefix, names, dst):
        kw = np.concatenate([take(f"{prefix}{n}.weight").T for n in names], axis=-1)
        _set(tree, dst + "/kernel", np.ascontiguousarray(kw))
        if has(f"{prefix}{names[0]}.bias"):
            _set(tree, dst + "/bias",
                 np.concatenate([take(f"{prefix}{n}.bias") for n in names]))

    def swiglu(prefix, dst):
        for w in ("w1", "w2", "w3"):
            _set(tree, f"{dst}/{w}/kernel", np.ascontiguousarray(take(f"{prefix}.{w}.weight").T))

    def moe(prefix, dst, n_experts):
        _set(tree, f"{dst}/gate/kernel", np.ascontiguousarray(take(f"{prefix}.gate.weight").T))
        for w in ("w1", "w2", "w3"):
            stk = np.stack([take(f"{prefix}.experts.{e}.{w}.weight").T for e in range(n_experts)])
            _set(tree, f"{dst}/experts/{w}/kernel", np.ascontiguousarray(stk))
        swiglu(f"{prefix}.shared_experts", f"{dst}/shared")

    def block_prefix(kind, i):
        return f"{kind}_stream_blocks.{i}.block."

    dbl: dict[int, dict] = {}
    for i in range(cfg.depth_double):
        p = block_prefix("double", i)
        if not has(p + "attn1.to_q.weight"):
            continue
        sub: dict = {}

        def bset(path, v, sub=sub):
            _set(sub, path, v)

        # adaLN 12*d -> img_mod (first 6d) + txt_mod (last 6d)
        w = take(p + "adaLN_modulation.1.weight").T  # [d, 12d]
        b = take(p + "adaLN_modulation.1.bias")
        bset("img_mod/mod/kernel", np.ascontiguousarray(w[:, : 6 * d]))
        bset("txt_mod/mod/kernel", np.ascontiguousarray(w[:, 6 * d:]))
        bset("img_mod/mod/bias", b[: 6 * d])
        bset("txt_mod/mod/bias", b[6 * d:])
        for stream, names, qn, proj in (
            ("img", ("attn1.to_q", "attn1.to_k", "attn1.to_v"), "attn1.q_rms_norm", "attn1.to_out"),
            ("txt", ("attn1.to_q_t", "attn1.to_k_t", "attn1.to_v_t"), "attn1.q_rms_norm_t", "attn1.to_out_t"),
        ):
            kw = np.concatenate([take(p + n + ".weight").T for n in names], axis=-1)
            bset(f"{stream}_qkv/kernel", np.ascontiguousarray(kw))
            if has(p + names[0] + ".bias"):
                bset(f"{stream}_qkv/bias", np.concatenate([take(p + n + ".bias") for n in names]))
            bset(f"{stream}_qknorm/query_norm/scale", take(p + qn + ".weight"))
            bset(f"{stream}_qknorm/key_norm/scale", take(p + qn.replace("q_rms", "k_rms") + ".weight"))
            bset(f"{stream}_proj/kernel", np.ascontiguousarray(take(p + proj + ".weight").T))
            if has(p + proj + ".bias"):
                bset(f"{stream}_proj/bias", take(p + proj + ".bias"))
        # image stream: MoE; text stream: dense SwiGLU (ff_t)
        _set_into(sub, "img_mlp_moe", _moe_tree(flat, used, p + "ff_i", cfg.moe_experts))
        _set_into(sub, "txt_mlp_swiglu", _swiglu_tree(flat, used, p + "ff_t"))
        dbl[i] = sub

    sgl: dict[int, dict] = {}
    for i in range(cfg.depth_single):
        p = block_prefix("single", i)
        if not has(p + "attn1.to_q.weight"):
            continue
        sub = {}
        w = take(p + "adaLN_modulation.1.weight").T
        _set(sub, "mod/mod/kernel", np.ascontiguousarray(w))
        _set(sub, "mod/mod/bias", take(p + "adaLN_modulation.1.bias"))
        kw = np.concatenate(
            [take(p + f"attn1.to_{n}.weight").T for n in ("q", "k", "v")], axis=-1
        )
        _set(sub, "qkv/kernel", np.ascontiguousarray(kw))
        if has(p + "attn1.to_q.bias"):
            _set(sub, "qkv/bias",
                 np.concatenate([take(p + f"attn1.to_{n}.bias") for n in ("q", "k", "v")]))
        _set(sub, "qknorm/query_norm/scale", take(p + "attn1.q_rms_norm.weight"))
        _set(sub, "qknorm/key_norm/scale", take(p + "attn1.k_rms_norm.weight"))
        _set(sub, "proj/kernel", np.ascontiguousarray(take(p + "attn1.to_out.weight").T))
        if has(p + "attn1.to_out.bias"):
            _set(sub, "proj/bias", take(p + "attn1.to_out.bias"))
        _set_into(sub, "mlp_moe", _moe_tree(flat, used, p + "ff_i", cfg.moe_experts))
        sgl[i] = sub

    def emit(blocks: dict[int, dict], scan_path: str, loop_fmt: str):
        if not blocks:
            return
        if cfg.scan_blocks:
            idxs = sorted(blocks)
            leaves: dict[str, list] = {}
            for i in idxs:
                for pth, v in _flatten(blocks[i]).items():
                    leaves.setdefault(pth, []).append(v)
            for pth, vals in leaves.items():
                _set(tree, f"{scan_path}/{pth}", np.stack(vals))
        else:
            for i, sub in blocks.items():
                for pth, v in _flatten(sub).items():
                    _set(tree, loop_fmt.format(i) + "/" + pth, v)

    emit(dbl, "double_blocks/block", "double_{0}")
    emit(sgl, "single_blocks/block", "single_{0}")
    unmatched = [k for k in flat if k not in used]
    return tree, unmatched


def _swiglu_tree(flat, used, prefix):
    out = {}
    for w in ("w1", "w2", "w3"):
        k = f"{prefix}.{w}.weight"
        used.add(k)
        out[w] = {"kernel": np.ascontiguousarray(np.asarray(flat[k]).T)}
    return out


def _moe_tree(flat, used, prefix, n_experts):
    out = {"gate": {}, "experts": {}, "shared": _swiglu_tree(flat, used, f"{prefix}.shared_experts")}
    k = f"{prefix}.gate.weight"
    used.add(k)
    out["gate"]["kernel"] = np.ascontiguousarray(np.asarray(flat[k]).T)
    for w in ("w1", "w2", "w3"):
        vals = []
        for e in range(n_experts):
            k = f"{prefix}.experts.{e}.{w}.weight"
            used.add(k)
            vals.append(np.asarray(flat[k]).T)
        out["experts"][w] = {"kernel": np.ascontiguousarray(np.stack(vals))}
    return out


def _set_into(tree: dict, key: str, sub: dict):
    tree[key] = sub


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def load_hidream_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = hidream_dit_tree(flat, model.dit_config)
        if unmatched:
            print(f"hidream import: {len(unmatched)} unmatched (per-block "
                  f"caption projections land here by design; e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "hidream dit")
    return variables


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
    # umt5 text encoder (per-layer relative bias)
    te_dir = os.path.join(path, "text_encoder") if os.path.isdir(path) else None
    if te_dir and os.path.isdir(te_dir):
        from ai_toolkit_tpu.io.sd_import import t5_rules

        flat = load_safetensors_dir(te_dir)
        tree, _ = torch_to_tree(
            flat, t5_rules(per_layer_bias=model.t5_config.per_layer_bias)
        )
        if tree:
            variables["t5"] = _merge_imported(variables["t5"], tree, "wan umt5")
    # exact diffusers AutoencoderKLWan import (wan21.py:456 loads vae/)
    vae_dir = os.path.join(path, "vae") if os.path.isdir(path) else None
    if vae_dir and os.path.isdir(vae_dir):
        from ai_toolkit_tpu.io.video_vae_import import (
            load_wan_vae_tree, wan_vae_config_from_json,
        )
        from ai_toolkit_tpu.models.wan_vae import WanVAE

        cfg = wan_vae_config_from_json(vae_dir)
        model.vae_config = cfg
        model.vae = WanVAE(cfg)
        tree, unmatched = load_wan_vae_tree(vae_dir)
        if unmatched:
            print(f"wan vae import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        sd_, td = cfg.spatial_downscale, cfg.temporal_downscale
        ref = model.vae.init(
            jax.random.key(0),
            jax.numpy.zeros((1, td + 1, 2 * sd_, 2 * sd_, 3)),
        )["params"]
        variables["vae"] = _merge_imported(ref, tree, "wan vae")
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
    # Gemma-3 caption encoder (reference ltx2.py:288 loads text_encoder/ via
    # Gemma3ForConditionalGeneration; the text tower nests under
    # language_model.model.* in composite saves, plain model.* in text-only)
    tedir = os.path.join(path, "text_encoder") if os.path.isdir(path) else None
    if tedir and os.path.isdir(tedir) and "te" in variables:
        from ai_toolkit_tpu.io.sd_import import llm_rules

        flat = load_safetensors_dir(path, "text_encoder")
        flat = {k.replace("language_model.model.", "").replace("language_model.", ""): v
                for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules(gemma=True))
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "ltx2 gemma te")
    elif "te" in variables and os.path.isdir(path):
        print("ltx2 import WARNING: no text_encoder/ subdir — the Gemma-3 "
              "caption tower stays RANDOM-INIT (conditioning will be garbage)")
    # exact AutoencoderKLLTX2Video import (ltx2.py:486 loads vae/)
    vae_dir = os.path.join(path, "vae") if os.path.isdir(path) else None
    if vae_dir and os.path.isdir(vae_dir):
        from ai_toolkit_tpu.io.video_vae_import import load_ltx_video_vae
        from ai_toolkit_tpu.models.ltx_video_vae import LTXVideoVAE

        cfg, tree, unmatched = load_ltx_video_vae(vae_dir)
        if unmatched:
            print(f"ltx2 vae import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        model.vae_config = cfg
        model.vae = LTXVideoVAE(cfg)
        sd_, td = cfg.spatial_downscale, cfg.temporal_downscale
        ref = model.vae.init(
            jax.random.key(0), jax.numpy.zeros((1, td + 1, 2 * sd_, 2 * sd_, 3))
        )["params"]
        variables["vae"] = _merge_imported(ref, tree, "ltx2 vae")
    # mel audio chain (audio_vae/ + vocoder/) when the mel backend is active
    if (getattr(model, "audio_backend", None) not in (None, "mel")
            and os.path.isdir(os.path.join(path, "audio_vae"))):
        print(
            "WARNING: ltx2 import skipping the checkpoint's audio_vae/ — "
            f"audio_backend='{model.audio_backend}' substitutes a random-init "
            "waveform VAE. Remove the audio_vae override for reference "
            "numerics."
        )
    if getattr(model, "audio_backend", None) == "mel" and os.path.isdir(path):
        avdir = os.path.join(path, "audio_vae")
        if os.path.isdir(avdir) and "audio_vae" in variables:
            from ai_toolkit_tpu.io.video_vae_import import load_ltx_audio_vae

            acfg, tree, unmatched = load_ltx_audio_vae(avdir)
            if unmatched:
                print(f"ltx2 audio-vae import: {len(unmatched)} unmatched "
                      f"(e.g. {unmatched[:3]})")
            model.audio_vae_config = acfg
            variables["audio_vae"] = _merge_imported(
                variables["audio_vae"], tree, "ltx2 audio vae"
            )
        vdir = os.path.join(path, "vocoder")
        if os.path.isdir(vdir) and "vocoder" in variables:
            from ai_toolkit_tpu.models.ltx_vocoder import vocoder_rules

            flat = load_safetensors_dir(vdir)
            tree, unmatched = torch_to_tree(flat, vocoder_rules())
            if unmatched:
                print(f"ltx2 vocoder import: {len(unmatched)} unmatched "
                      f"(e.g. {unmatched[:3]})")
            variables["vocoder"] = _merge_imported(
                variables["vocoder"], tree, "ltx2 vocoder"
            )
    return variables


def lumina2_rules(scan_blocks: bool = True) -> list[Rule]:
    """diffusers Lumina2Transformer2DModel -> models/lumina2_dit.Lumina2DiT.

    Module internals pinned by the vendored Lumina2 blocks (see
    lumina2_dit.py docstring). Main 26 layers scan; the 2+2 refiner blocks
    stay unrolled."""
    b = "layers/block/" if scan_blocks else "layer_{0}/"
    kind = "_stack" if scan_blocks else ""

    def blk(src, dst, lin=True, bias=True):
        pre = r"layers\.(\d+)\."
        out = [(pre + src + r"\.weight", b + dst + ("/kernel" if lin else "/scale"),
                ("linear" if lin else "direct") + kind)]
        if lin and bias:
            out.append((pre + src + r"\.bias", b + dst + "/bias", "direct" + kind))
        return out

    rules: list[Rule] = []
    rules += blk(r"norm1\.linear", "norm1_lin")
    rules += blk(r"norm1\.norm", "norm1_norm", lin=False)
    for w in ("q", "k", "v"):
        rules += blk(rf"attn\.to_{w}", f"attn/to_{w}", bias=False)
    rules += blk(r"attn\.to_out\.0", "attn/to_out", bias=False)
    rules += blk(r"attn\.norm_q", "attn/q_norm", lin=False)
    rules += blk(r"attn\.norm_k", "attn/k_norm", lin=False)
    for i in (1, 2, 3):
        rules += blk(rf"feed_forward\.linear_{i}", f"ffn_w{i}", bias=False)
    for nm in ("norm2", "ffn_norm1", "ffn_norm2"):
        rules += blk(nm, nm, lin=False)

    def refiner(kind_name):
        pre = rf"{kind_name}\.(\d+)\."
        dst = kind_name + "_{0}/"
        out = []
        if kind_name == "noise_refiner":
            out += [(pre + r"norm1\.linear\.weight", dst + "norm1_lin/kernel", "linear"),
                    (pre + r"norm1\.linear\.bias", dst + "norm1_lin/bias", "direct"),
                    (pre + r"norm1\.norm\.weight", dst + "norm1_norm/scale", "direct")]
        else:  # context refiner: norm1 IS the plain RMSNorm
            out += [(pre + r"norm1\.weight", dst + "norm1_norm/scale", "direct")]
        for w in ("q", "k", "v"):
            out.append((pre + rf"attn\.to_{w}\.weight", dst + f"attn/to_{w}/kernel", "linear"))
        out += [(pre + r"attn\.to_out\.0\.weight", dst + "attn/to_out/kernel", "linear"),
                (pre + r"attn\.norm_q\.weight", dst + "attn/q_norm/scale", "direct"),
                (pre + r"attn\.norm_k\.weight", dst + "attn/k_norm/scale", "direct")]
        for i in (1, 2, 3):
            out.append((pre + rf"feed_forward\.linear_{i}\.weight",
                        dst + f"ffn_w{i}/kernel", "linear"))
        for nm in ("norm2", "ffn_norm1", "ffn_norm2"):
            out.append((pre + nm + r"\.weight", dst + nm + "/scale", "direct"))
        return out

    rules += refiner("noise_refiner")
    rules += refiner("context_refiner")
    rules += [
        (r"x_embedder\.weight", "x_embedder/kernel", "linear"),
        (r"x_embedder\.bias", "x_embedder/bias", "direct"),
        (r"time_caption_embed\.timestep_embedder\.linear_1\.weight", "time_in/in_layer/kernel", "linear"),
        (r"time_caption_embed\.timestep_embedder\.linear_1\.bias", "time_in/in_layer/bias", "direct"),
        (r"time_caption_embed\.timestep_embedder\.linear_2\.weight", "time_in/out_layer/kernel", "linear"),
        (r"time_caption_embed\.timestep_embedder\.linear_2\.bias", "time_in/out_layer/bias", "direct"),
        (r"time_caption_embed\.caption_embedder\.0\.weight", "cap_norm/scale", "direct"),
        (r"time_caption_embed\.caption_embedder\.1\.weight", "cap_proj/kernel", "linear"),
        (r"time_caption_embed\.caption_embedder\.1\.bias", "cap_proj/bias", "direct"),
        (r"norm_out\.linear_1\.weight", "final_mod/kernel", "linear"),
        (r"norm_out\.linear_1\.bias", "final_mod/bias", "direct"),
        (r"norm_out\.linear_2\.weight", "final_proj/kernel", "linear"),
        (r"norm_out\.linear_2\.bias", "final_proj/bias", "direct"),
    ]
    return rules


def load_lumina2_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + text_encoder/) or single file."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
        tree, unmatched = torch_to_tree(flat, lumina2_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"lumina2 import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "lumina2 dit")
    for subdir, comp, rules in (
        ("vae", "vae", vae_rules(len(model.vae_config.channel_multipliers),
                                 model.vae_config.layers_per_block)),
        ("text_encoder", "te", llm_rules(gemma=True)),
    ):
        d = os.path.join(path, subdir)
        if comp in variables and os.path.isdir(d):
            flat = load_safetensors_dir(path, subdir)
            tree, _ = torch_to_tree(flat, rules)
            if tree:
                variables[comp] = _merge_imported(variables[comp], tree, comp)
    return variables


def omnigen2_rules(scan_blocks: bool = True) -> list[Rule]:
    """diffusers OmniGen2Transformer2DModel -> models/omnigen2_dit.OmniGen2DiT.

    The block layout is the vendored Lumina2 block (transformer_omnigen2.py:
    32-177 builds OmniGen2TransformerBlock from the same block_lumina2
    modules), so the lumina2 rules apply verbatim; OmniGen2 adds the
    reference-image patch embedder + per-image index embedding
    (transformer_omnigen2.py:258-261,339) and a third modulated refiner stack
    ``ref_image_refiner`` (:284-295)."""
    rules = lumina2_rules(scan_blocks)
    pre = r"ref_image_refiner\.(\d+)\."
    dst = "ref_refiner_{0}/"
    rules += [(pre + r"norm1\.linear\.weight", dst + "norm1_lin/kernel", "linear"),
              (pre + r"norm1\.linear\.bias", dst + "norm1_lin/bias", "direct"),
              (pre + r"norm1\.norm\.weight", dst + "norm1_norm/scale", "direct")]
    for w in ("q", "k", "v"):
        rules.append((pre + rf"attn\.to_{w}\.weight", dst + f"attn/to_{w}/kernel", "linear"))
    rules += [(pre + r"attn\.to_out\.0\.weight", dst + "attn/to_out/kernel", "linear"),
              (pre + r"attn\.norm_q\.weight", dst + "attn/q_norm/scale", "direct"),
              (pre + r"attn\.norm_k\.weight", dst + "attn/k_norm/scale", "direct")]
    for i in (1, 2, 3):
        rules.append((pre + rf"feed_forward\.linear_{i}\.weight",
                      dst + f"ffn_w{i}/kernel", "linear"))
    for nm in ("norm2", "ffn_norm1", "ffn_norm2"):
        rules.append((pre + nm + r"\.weight", dst + nm + "/scale", "direct"))
    rules += [
        (r"ref_image_patch_embedder\.weight", "ref_embedder/kernel", "linear"),
        (r"ref_image_patch_embedder\.bias", "ref_embedder/bias", "direct"),
        (r"image_index_embedding", "image_index_emb", "direct"),
    ]
    return rules


def load_omnigen2_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + mllm/) or a single transformer file.

    Layout per the reference loader (omnigen2/__init__.py:77-121: transformer
    under ``transformer/``, FLUX VAE under ``vae/``, Qwen2.5-VL under
    ``mllm/``)."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        flat = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()}
        tree, unmatched = torch_to_tree(flat, omnigen2_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"omnigen2 import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "omnigen2 dit")
    vdir = os.path.join(path, "vae")
    if os.path.isdir(vdir):
        flat = load_safetensors_dir(path, "vae")
        tree, _ = torch_to_tree(flat, vae_rules(len(model.vae_config.channel_multipliers),
                                                model.vae_config.layers_per_block))
        if tree:
            variables["vae"] = _merge_imported(variables["vae"], tree, "omnigen2 vae")
    mdir = os.path.join(path, "mllm")
    if os.path.isdir(mdir):
        flat = load_safetensors_dir(path, "mllm")
        # Qwen2.5-VL composite: text tower under model.language_model.*
        flat = {k.replace("model.language_model.", "model."): v for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "omnigen2 mllm")
    return variables


def flite_rules(scan_blocks: bool = True) -> list[Rule]:
    """F-Lite DiT checkpoint keys (vendored f_light/src/model.py layout)."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    kind = "_stack" if scan_blocks else ""

    def lin(src, dst, bias=True):
        out = [(rf"blocks\.(\d+)\.{src}\.weight", b + dst + "/kernel", "linear" + kind)]
        if bias:
            out.append((rf"blocks\.(\d+)\.{src}\.bias", b + dst + "/bias", "direct" + kind))
        return out

    rules: list[Rule] = []
    rules += lin(r"self_attn\.qkv", "self_qkv")
    rules += lin(r"self_attn\.proj", "self_proj", bias=False)
    rules += lin(r"cross_attn\.q", "cross_q")
    rules += lin(r"cross_attn\.context_kv", "cross_kv")
    rules += lin(r"cross_attn\.proj", "cross_proj", bias=False)
    rules += lin(r"mlp\.0", "mlp_in")
    rules += lin(r"mlp\.2", "mlp_out")
    rules += lin(r"adaLN_modulation\.1", "mod")
    for i in (1, 2, 3):
        rules.append((rf"blocks\.(\d+)\.norm{i}\.weight", b + f"norm{i}_scale",
                      "direct" + kind))
    rules.append((r"blocks\.(\d+)\.self_attn\.lambda_param", b + "lambda_param",
                  "direct" + kind))
    rules += [
        (r"patch_embed\.patch_proj\.weight", "patch_proj_kernel", "conv2d"),
        (r"patch_embed\.patch_proj\.bias", "patch_proj_bias", "direct"),
        (r"register_tokens", "register_tokens", "direct"),
        (r"time_embed\.0\.weight", "time_embed_in/kernel", "linear"),
        (r"time_embed\.0\.bias", "time_embed_in/bias", "direct"),
        (r"time_embed\.2\.weight", "time_embed_out/kernel", "linear"),
        (r"time_embed\.2\.bias", "time_embed_out/bias", "direct"),
        (r"final_modulation\.1\.weight", "final_mod/kernel", "linear"),
        (r"final_modulation\.1\.bias", "final_mod/bias", "direct"),
        (r"final_norm\.weight", "final_norm_scale", "direct"),
        (r"final_proj\.weight", "final_proj/kernel", "linear"),
        (r"final_proj\.bias", "final_proj/bias", "direct"),
    ]
    return rules


def load_flite_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = torch_to_tree(flat, flite_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"f-lite import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "f-lite dit")
    from ai_toolkit_tpu.io.sd_import import t5_rules, vae_rules

    for subdir, comp, rules in (
        ("vae", "vae", vae_rules(len(model.vae_config.channel_multipliers),
                                 model.vae_config.layers_per_block)),
        ("text_encoder", "t5", t5_rules()),
    ):
        d = os.path.join(path, subdir)
        if comp in variables and os.path.isdir(d):
            flat = load_safetensors_dir(d)
            tree, _ = torch_to_tree(flat, rules)
            if tree:
                variables[comp] = _merge_imported(variables[comp], tree, f"f-lite {comp}")
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


# ---------------------------------------------------------------- boogu


def _boogu_basic_rules(src: str, dst: str, modulated: bool, stack: bool) -> list[Rule]:
    r"""Rules for one BooguImageTransformerBlock family.

    ``src`` is a regex prefix whose group 0 is the layer index (e.g.
    ``r"noise_refiner\.(\d+)\."``); ``dst`` the '/'-joined destination prefix
    (use ``{0}`` for per-layer names, omit it for scanned stacks)."""
    kl = "linear" + ("_stack" if stack else "")
    kd = "direct" + ("_stack" if stack else "")
    rules: list[Rule] = []
    for s, d in (
        ("attn.to_q", "attn_q"), ("attn.to_k", "attn_k"), ("attn.to_v", "attn_v"),
        ("attn.to_out.0", "attn_out"),
        ("feed_forward.linear_1", "feed_forward/linear_1"),
        ("feed_forward.linear_2", "feed_forward/linear_2"),
        ("feed_forward.linear_3", "feed_forward/linear_3"),
    ):
        rules.append((src + s.replace(".", r"\.") + r"\.weight", f"{dst}{d}/kernel", kl))
    for s, d in (
        ("attn.norm_q", "attn_q_norm"), ("attn.norm_k", "attn_k_norm"),
        ("norm2", "norm2"), ("ffn_norm1", "ffn_norm1"), ("ffn_norm2", "ffn_norm2"),
    ):
        rules.append((src + s.replace(".", r"\.") + r"\.weight", f"{dst}{d}/scale", kd))
    if modulated:
        rules += [
            (src + r"norm1\.linear\.weight", f"{dst}norm1/linear/kernel", kl),
            (src + r"norm1\.linear\.bias", f"{dst}norm1/linear/bias", kd),
            (src + r"norm1\.norm\.weight", f"{dst}norm1/norm/scale", kd),
        ]
    else:
        rules.append((src + r"norm1\.weight", f"{dst}norm1/scale", kd))
    return rules


def _boogu_double_rules(stack: bool) -> list[Rule]:
    src = r"double_stream_layers\.(\d+)\."
    dst = "double_blocks/block/" if stack else "double_{0}/"
    kl = "linear" + ("_stack" if stack else "")
    kd = "direct" + ("_stack" if stack else "")
    rules: list[Rule] = []
    for s, d in (
        ("img_instruct_attn.processor.img_to_q", "img_to_q"),
        ("img_instruct_attn.processor.img_to_k", "img_to_k"),
        ("img_instruct_attn.processor.img_to_v", "img_to_v"),
        ("img_instruct_attn.processor.instruct_to_q", "instruct_to_q"),
        ("img_instruct_attn.processor.instruct_to_k", "instruct_to_k"),
        ("img_instruct_attn.processor.instruct_to_v", "instruct_to_v"),
        ("img_instruct_attn.processor.instruct_out", "instruct_out"),
        ("img_instruct_attn.processor.img_out", "img_out"),
        ("img_instruct_attn.to_out.0", "joint_to_out"),
        ("img_self_attn.to_q", "self_to_q"), ("img_self_attn.to_k", "self_to_k"),
        ("img_self_attn.to_v", "self_to_v"), ("img_self_attn.to_out.0", "self_to_out"),
        ("img_feed_forward.linear_1", "img_feed_forward/linear_1"),
        ("img_feed_forward.linear_2", "img_feed_forward/linear_2"),
        ("img_feed_forward.linear_3", "img_feed_forward/linear_3"),
        ("instruct_feed_forward.linear_1", "instruct_feed_forward/linear_1"),
        ("instruct_feed_forward.linear_2", "instruct_feed_forward/linear_2"),
        ("instruct_feed_forward.linear_3", "instruct_feed_forward/linear_3"),
    ):
        rules.append((src + s.replace(".", r"\.") + r"\.weight", f"{dst}{d}/kernel", kl))
    for s, d in (
        ("img_instruct_attn.norm_q", "joint_q_norm"),
        ("img_instruct_attn.norm_k", "joint_k_norm"),
        ("img_self_attn.norm_q", "self_q_norm"),
        ("img_self_attn.norm_k", "self_k_norm"),
        ("img_ffn_norm1", "img_ffn_norm1"), ("img_attn_norm", "img_attn_norm"),
        ("img_self_attn_norm", "img_self_attn_norm"),
        ("img_ffn_norm2", "img_ffn_norm2"),
        ("instruct_ffn_norm1", "instruct_ffn_norm1"),
        ("instruct_attn_norm", "instruct_attn_norm"),
        ("instruct_ffn_norm2", "instruct_ffn_norm2"),
    ):
        rules.append((src + s.replace(".", r"\.") + r"\.weight", f"{dst}{d}/scale", kd))
    for mod in ("img_norm1", "img_norm2", "img_norm3", "instruct_norm1", "instruct_norm2"):
        rules += [
            (src + mod + r"\.linear\.weight", f"{dst}{mod}/linear/kernel", kl),
            (src + mod + r"\.linear\.bias", f"{dst}{mod}/linear/bias", kd),
            (src + mod + r"\.norm\.weight", f"{dst}{mod}/norm/scale", kd),
        ]
    return rules


def boogu_dit_rules(scan_blocks: bool = True, num_refiner: int = 2) -> list[Rule]:
    """BooguImageTransformer2DModel state dict -> BooguDiT tree
    (reference boogu_image/src/transformer.py module names)."""
    rules: list[Rule] = [
        (r"x_embedder\.weight", "x_embedder/kernel", "linear"),
        (r"x_embedder\.bias", "x_embedder/bias", "direct"),
        (r"ref_image_patch_embedder\.weight", "ref_image_patch_embedder/kernel", "linear"),
        (r"ref_image_patch_embedder\.bias", "ref_image_patch_embedder/bias", "direct"),
        (r"time_caption_embed\.timestep_embedder\.linear_1\.weight", "t_embed_1/kernel", "linear"),
        (r"time_caption_embed\.timestep_embedder\.linear_1\.bias", "t_embed_1/bias", "direct"),
        (r"time_caption_embed\.timestep_embedder\.linear_2\.weight", "t_embed_2/kernel", "linear"),
        (r"time_caption_embed\.timestep_embedder\.linear_2\.bias", "t_embed_2/bias", "direct"),
        (r"time_caption_embed\.caption_embedder\.0\.weight", "cap_norm/scale", "direct"),
        (r"time_caption_embed\.caption_embedder\.1\.weight", "cap_embed/kernel", "linear"),
        (r"time_caption_embed\.caption_embedder\.1\.bias", "cap_embed/bias", "direct"),
        (r"norm_out\.linear_1\.weight", "norm_out_linear_1/kernel", "linear"),
        (r"norm_out\.linear_1\.bias", "norm_out_linear_1/bias", "direct"),
        (r"norm_out\.linear_2\.weight", "norm_out_linear_2/kernel", "linear"),
        (r"norm_out\.linear_2\.bias", "norm_out_linear_2/bias", "direct"),
        (r"image_index_embedding", "image_index_embedding", "direct"),
    ]
    for fam, mod in (("noise_refiner", True), ("ref_image_refiner", True),
                     ("context_refiner", False)):
        rules += _boogu_basic_rules(
            rf"{fam}\.(\d+)\.", fam + "_{0}/", modulated=mod, stack=False)
    rules += _boogu_basic_rules(
        r"single_stream_layers\.(\d+)\.",
        "single_blocks/block/" if scan_blocks else "single_{0}/",
        modulated=True, stack=scan_blocks)
    rules += _boogu_double_rules(scan_blocks)
    return rules


def load_boogu_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = torch_to_tree(
            flat, boogu_dit_rules(model.dit_config.scan_blocks,
                                  model.dit_config.num_refiner_layers))
        if unmatched:
            print(f"boogu import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "boogu dit")
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules

    vdir = os.path.join(path, "vae")
    if os.path.isdir(vdir):
        flat = load_safetensors_dir(vdir)
        tree, _ = torch_to_tree(
            flat, vae_rules(len(model.vae_config.channel_multipliers),
                            model.vae_config.layers_per_block))
        if tree:
            variables["vae"] = _merge_imported(variables["vae"], tree, "boogu vae")
    mdir = os.path.join(path, "mllm")
    if os.path.isdir(mdir):
        flat = load_safetensors_dir(mdir)
        # Qwen3-VL: text tower lives under model.language_model.*
        flat = {k.replace("model.language_model.", "model."): v for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "boogu mllm")
    return variables


# ---------------------------------------------------------------- prx


def prx_rules(scan_blocks: bool = True) -> list[Rule]:
    r"""PRXTransformer2DModel (vendored diffusers layout,
    ``extensions_built_in/diffusion_models/prx_pixel_t2i/src/transformer_prx.py``)
    -> PRXDiT tree. Covers both the single-linear ``img_in`` and the two-layer
    bottleneck ``img_in.0/.1`` variants."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    L = "linear_stack" if scan_blocks else "linear"
    D = "direct_stack" if scan_blocks else "direct"
    p = r"blocks\.(\d+)\."
    rules: list[Rule] = [
        (r"img_in\.weight", "img_in/kernel", "linear"),
        (r"img_in\.bias", "img_in/bias", "direct"),
        (r"img_in\.0\.weight", "img_in_0/kernel", "linear"),
        (r"img_in\.0\.bias", "img_in_0/bias", "direct"),
        (r"img_in\.1\.weight", "img_in_1/kernel", "linear"),
        (r"img_in\.1\.bias", "img_in_1/bias", "direct"),
        (r"txt_in\.weight", "txt_in/kernel", "linear"),
        (r"txt_in\.bias", "txt_in/bias", "direct"),
        (r"time_in\.in_layer\.weight", "time_in/in_layer/kernel", "linear"),
        (r"time_in\.in_layer\.bias", "time_in/in_layer/bias", "direct"),
        (r"time_in\.out_layer\.weight", "time_in/out_layer/kernel", "linear"),
        (r"time_in\.out_layer\.bias", "time_in/out_layer/bias", "direct"),
        (r"resolution_embedder\.mlp\.in_layer\.weight", "res_embed/in_layer/kernel", "linear"),
        (r"resolution_embedder\.mlp\.in_layer\.bias", "res_embed/in_layer/bias", "direct"),
        (r"resolution_embedder\.mlp\.out_layer\.weight", "res_embed/out_layer/kernel", "linear"),
        (r"resolution_embedder\.mlp\.out_layer\.bias", "res_embed/out_layer/bias", "direct"),
        (p + r"modulation\.lin\.weight", b + "mod/kernel", L),
        (p + r"modulation\.lin\.bias", b + "mod/bias", D),
        (p + r"attention\.img_qkv_proj\.weight", b + "img_qkv/kernel", L),
        (p + r"attention\.txt_kv_proj\.weight", b + "txt_kv/kernel", L),
        (p + r"attention\.norm_q\.weight", b + "q_norm", D),
        (p + r"attention\.norm_k\.weight", b + "k_norm", D),
        (p + r"attention\.norm_added_k\.weight", b + "added_k_norm", D),
        (p + r"attention\.to_out\.0\.weight", b + "attn_out/kernel", L),
        (p + r"gate_proj\.weight", b + "gate/kernel", L),
        (p + r"up_proj\.weight", b + "up/kernel", L),
        (p + r"down_proj\.weight", b + "down/kernel", L),
        (r"final_layer\.linear\.weight", "final_proj/kernel", "linear"),
        (r"final_layer\.linear\.bias", "final_proj/bias", "direct"),
        (r"final_layer\.adaLN_modulation\.1\.weight", "final_mod/kernel", "linear"),
        (r"final_layer\.adaLN_modulation\.1\.bias", "final_mod/bias", "direct"),
    ]
    return rules


def load_prx_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = torch_to_tree(flat, prx_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"prx import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "prx dit")
    from ai_toolkit_tpu.io.sd_import import llm_rules

    tedir = os.path.join(path, "text_encoder")
    if os.path.isdir(tedir):
        flat = load_safetensors_dir(tedir)
        # Qwen3-VL composite saves nest the text tower under model.language_model.*
        flat = {k.replace("model.language_model.", "model."): v for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "prx text_encoder")
    return variables


# ---------------------------------------------------------------- ideogram4


def ideogram_rules(scan_blocks: bool = True) -> list[Rule]:
    r"""Ideogram4Transformer2DModel (vendored layout,
    ``extensions_built_in/diffusion_models/ideogram4/src/transformer.py``)
    -> Ideogram4DiT tree."""
    b = "layers/block/" if scan_blocks else "layer_{0}/"
    L = "linear_stack" if scan_blocks else "linear"
    D = "direct_stack" if scan_blocks else "direct"
    p = r"layers\.(\d+)\."
    return [
        (r"input_proj\.weight", "input_proj/kernel", "linear"),
        (r"input_proj\.bias", "input_proj/bias", "direct"),
        (r"llm_cond_norm\.weight", "llm_cond_norm", "direct"),
        (r"llm_cond_proj\.weight", "llm_cond_proj/kernel", "linear"),
        (r"llm_cond_proj\.bias", "llm_cond_proj/bias", "direct"),
        (r"t_embedding\.mlp_in\.weight", "t_mlp_in/kernel", "linear"),
        (r"t_embedding\.mlp_in\.bias", "t_mlp_in/bias", "direct"),
        (r"t_embedding\.mlp_out\.weight", "t_mlp_out/kernel", "linear"),
        (r"t_embedding\.mlp_out\.bias", "t_mlp_out/bias", "direct"),
        (r"adaln_proj\.weight", "adaln_proj/kernel", "linear"),
        (r"adaln_proj\.bias", "adaln_proj/bias", "direct"),
        (r"embed_image_indicator\.weight", "image_indicator", "direct"),
        (p + r"attention\.qkv\.weight", b + "qkv/kernel", L),
        (p + r"attention\.norm_q\.weight", b + "q_norm", D),
        (p + r"attention\.norm_k\.weight", b + "k_norm", D),
        (p + r"attention\.o\.weight", b + "o/kernel", L),
        (p + r"attention_norm1\.weight", b + "attn_norm1", D),
        (p + r"attention_norm2\.weight", b + "attn_norm2", D),
        (p + r"ffn_norm1\.weight", b + "ffn_norm1", D),
        (p + r"ffn_norm2\.weight", b + "ffn_norm2", D),
        (p + r"adaln_modulation\.weight", b + "adaln/kernel", L),
        (p + r"adaln_modulation\.bias", b + "adaln/bias", D),
        (p + r"feed_forward\.w1\.weight", b + "w1/kernel", L),
        (p + r"feed_forward\.w2\.weight", b + "w2/kernel", L),
        (p + r"feed_forward\.w3\.weight", b + "w3/kernel", L),
        (r"final_layer\.linear\.weight", "final_linear/kernel", "linear"),
        (r"final_layer\.linear\.bias", "final_linear/bias", "direct"),
        (r"final_layer\.adaln_modulation\.weight", "final_adaln/kernel", "linear"),
        (r"final_layer\.adaln_modulation\.bias", "final_adaln/bias", "direct"),
    ]


def load_ideogram_checkpoint(path: str, model) -> dict:
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None:
        flat = load_safetensors_dir(src)
        tree, unmatched = torch_to_tree(flat, ideogram_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"ideogram4 import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "ideogram4 dit")
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules

    vdir = os.path.join(path, "vae")
    if os.path.isdir(vdir):
        flat = load_safetensors_dir(vdir)
        tree, _ = torch_to_tree(
            flat, vae_rules(len(model.vae_config.channel_multipliers),
                            model.vae_config.layers_per_block))
        if tree:
            variables["vae"] = _merge_imported(variables["vae"], tree, "ideogram4 vae")
    tedir = os.path.join(path, "text_encoder")
    if os.path.isdir(tedir):
        flat = load_safetensors_dir(tedir)
        # stock Qwen3-VL: text tower under model.language_model.*
        flat = {k.replace("model.language_model.", "model."): v for k, v in flat.items()}
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "ideogram4 text_encoder")
    return variables


# ---------------------------------------------------------------- mage vae


def _mage_dico_rules(src: str, dst: str, modulated: bool) -> list[Rule]:
    """One DiCo block family. src has the layer index as group 0."""
    rules: list[Rule] = [
        (src + r"conv1\.weight", dst + "conv1/kernel", "conv2d"),
        (src + r"conv1\.bias", dst + "conv1/bias", "direct"),
        (src + r"conv2\.weight", dst + "conv2/kernel", "conv2d"),
        (src + r"conv2\.bias", dst + "conv2/bias", "direct"),
        (src + r"conv3\.weight", dst + "conv3/kernel", "conv2d"),
        (src + r"conv3\.bias", dst + "conv3/bias", "direct"),
        (src + r"ca\.1\.weight", dst + "ca/conv/kernel", "conv2d"),
        (src + r"ca\.1\.bias", dst + "ca/conv/bias", "direct"),
        (src + r"conv4\.weight", dst + "conv4/kernel", "conv2d"),
        (src + r"conv4\.bias", dst + "conv4/bias", "direct"),
        (src + r"conv5\.weight", dst + "conv5/kernel", "conv2d"),
        (src + r"conv5\.bias", dst + "conv5/bias", "direct"),
    ]
    if modulated:
        rules += [
            (src + r"adaLN_modulation\.1\.weight", dst + "adaln/kernel", "linear"),
            (src + r"adaLN_modulation\.1\.bias", dst + "adaln/bias", "direct"),
        ]
    else:
        rules += [
            (src + r"norm1\.weight", dst + "norm1/scale", "direct"),
            (src + r"norm1\.bias", dst + "norm1/bias", "direct"),
            (src + r"norm2\.weight", dst + "norm2/scale", "direct"),
            (src + r"norm2\.bias", dst + "norm2/bias", "direct"),
        ]
    return rules


def mage_vae_rules() -> list[Rule]:
    r"""MageVAE checkpoint (``mageflow/src/vae.py``: encoder under
    ``student.dconv_encoder.*``, decoder under ``pipeline.*``) -> MageVAE tree.

    Skipped on purpose: ``pipeline.s_embedder.proj1`` (a patch stem applied to
    the denoiser's image input, which is always ZERO at decode),
    ``pipeline.y_embedder.encoder/bottleneck`` (the training-only teacher),
    and every ``t_embedder``-adjacent buffer the reference also drops.
    """
    e = r"student\.dconv_encoder\."
    d = r"pipeline\."
    rules: list[Rule] = [
        (e + r"patch_cond_embed\.weight", "encoder/patch_cond_embed/kernel", "conv2d"),
        (e + r"patch_cond_embed\.bias", "encoder/patch_cond_embed/bias", "direct"),
        (e + r"proj_down\.weight", "encoder/proj_down/kernel", "conv2d"),
        (e + r"proj_down\.bias", "encoder/proj_down/bias", "direct"),
        (e + r"z_proj\.weight", "encoder/z_proj/kernel", "conv2d"),
        (e + r"z_proj\.bias", "encoder/z_proj/bias", "direct"),
        (e + r"fuse_proj\.weight", "encoder/fuse_proj/kernel", "conv2d"),
        (e + r"fuse_proj\.bias", "encoder/fuse_proj/bias", "direct"),
        (e + r"t_embedder\.mlp\.0\.weight", "encoder/t_embed/in_layer/kernel", "linear"),
        (e + r"t_embedder\.mlp\.0\.bias", "encoder/t_embed/in_layer/bias", "direct"),
        (e + r"t_embedder\.mlp\.2\.weight", "encoder/t_embed/out_layer/kernel", "linear"),
        (e + r"t_embedder\.mlp\.2\.bias", "encoder/t_embed/out_layer/bias", "direct"),
        (e + r"norm_out\.weight", "encoder/norm_out/scale", "direct"),
        (e + r"norm_out\.bias", "encoder/norm_out/bias", "direct"),
        (e + r"proj_out\.weight", "encoder/proj_out/kernel", "conv2d"),
        (e + r"proj_out\.bias", "encoder/proj_out/bias", "direct"),
    ]
    rules += _mage_dico_rules(e + r"head_blocks\.(\d+)\.", "encoder/head_block_{0}/",
                              modulated=False)
    rules += _mage_dico_rules(e + r"blocks\.(\d+)\.", "encoder/block_{0}/",
                              modulated=True)
    # denoiser
    rules += [
        (d + r"t_embedder\.mlp\.0\.weight", "denoiser/t_embed/in_layer/kernel", "linear"),
        (d + r"t_embedder\.mlp\.0\.bias", "denoiser/t_embed/in_layer/bias", "direct"),
        (d + r"t_embedder\.mlp\.2\.weight", "denoiser/t_embed/out_layer/kernel", "linear"),
        (d + r"t_embedder\.mlp\.2\.bias", "denoiser/t_embed/out_layer/bias", "direct"),
        (d + r"y_embedder_x\.weight", "denoiser/y_embedder_x/kernel", "conv2d"),
        (d + r"y_embedder_x\.bias", "denoiser/y_embedder_x/bias", "direct"),
        (d + r"s_embedder\.proj2\.weight", "denoiser/s_proj2/kernel", "conv2d"),
        (d + r"s_embedder\.proj2\.bias", "denoiser/s_proj2/bias", "direct"),
        (d + r"x_embedder\.embedder\.0\.weight", "denoiser/x_embedder/kernel", "linear"),
        (d + r"x_embedder\.embedder\.0\.bias", "denoiser/x_embedder/bias", "direct"),
        (d + r"dec_net\.input_proj\.weight", "denoiser/input_proj/kernel", "linear"),
        (d + r"dec_net\.input_proj\.bias", "denoiser/input_proj/bias", "direct"),
        (d + r"dec_net\.cond_embed\.weight", "denoiser/cond_embed/kernel", "linear"),
        (d + r"dec_net\.cond_embed\.bias", "denoiser/cond_embed/bias", "direct"),
        (d + r"dec_net\.res_blocks\.(\d+)\.in_ln\.weight", "denoiser/res_{0}/in_ln/scale", "direct"),
        (d + r"dec_net\.res_blocks\.(\d+)\.in_ln\.bias", "denoiser/res_{0}/in_ln/bias", "direct"),
        (d + r"dec_net\.res_blocks\.(\d+)\.mlp\.0\.weight", "denoiser/res_{0}/mlp_in/kernel", "linear"),
        (d + r"dec_net\.res_blocks\.(\d+)\.mlp\.0\.bias", "denoiser/res_{0}/mlp_in/bias", "direct"),
        (d + r"dec_net\.res_blocks\.(\d+)\.mlp\.2\.weight", "denoiser/res_{0}/mlp_out/kernel", "linear"),
        (d + r"dec_net\.res_blocks\.(\d+)\.mlp\.2\.bias", "denoiser/res_{0}/mlp_out/bias", "direct"),
        (d + r"dec_net\.res_blocks\.(\d+)\.adaLN_modulation\.1\.weight", "denoiser/res_{0}/adaln/kernel", "linear"),
        (d + r"dec_net\.res_blocks\.(\d+)\.adaLN_modulation\.1\.bias", "denoiser/res_{0}/adaln/bias", "direct"),
        (d + r"final_layer\.norm\.weight", "denoiser/final_norm/scale", "direct"),
        (d + r"final_layer\.linear\.weight", "denoiser/final_linear/kernel", "linear"),
        (d + r"final_layer\.linear\.bias", "denoiser/final_linear/bias", "direct"),
    ]
    rules += _mage_dico_rules(d + r"blocks\.(\d+)\.", "denoiser/block_{0}/",
                              modulated=True)
    # CoD decoder
    c = d + r"y_embedder\.decoder\."
    rules += [
        (c + r"conv_in\.weight", "cod/conv_in/kernel", "conv2d"),
        (c + r"conv_in\.bias", "cod/conv_in/bias", "direct"),
        (c + r"norm_out\.weight", "cod/norm_out/scale", "direct"),
        (c + r"norm_out\.bias", "cod/norm_out/bias", "direct"),
        (c + r"conv_out\.weight", "cod/conv_out/kernel", "conv2d"),
        (c + r"conv_out\.bias", "cod/conv_out/bias", "direct"),
    ]
    for i in (0, 2, 4):  # resnet blocks
        rules += [
            (c + rf"block\.{i}\.norm1\.weight", f"cod/res_{i}/norm1/scale", "direct"),
            (c + rf"block\.{i}\.norm1\.bias", f"cod/res_{i}/norm1/bias", "direct"),
            (c + rf"block\.{i}\.conv1\.weight", f"cod/res_{i}/conv1/kernel", "conv2d"),
            (c + rf"block\.{i}\.conv1\.bias", f"cod/res_{i}/conv1/bias", "direct"),
            (c + rf"block\.{i}\.norm2\.weight", f"cod/res_{i}/norm2/scale", "direct"),
            (c + rf"block\.{i}\.norm2\.bias", f"cod/res_{i}/norm2/bias", "direct"),
            (c + rf"block\.{i}\.conv2\.weight", f"cod/res_{i}/conv2/kernel", "conv2d"),
            (c + rf"block\.{i}\.conv2\.bias", f"cod/res_{i}/conv2/bias", "direct"),
        ]
    for i in (1, 3):  # patched attention blocks
        rules += [
            (c + rf"block\.{i}\.norm\.weight", f"cod/attn_{i}/norm/scale", "direct"),
            (c + rf"block\.{i}\.norm\.bias", f"cod/attn_{i}/norm/bias", "direct"),
            (c + rf"block\.{i}\.q\.weight", f"cod/attn_{i}/q/kernel", "conv2d"),
            (c + rf"block\.{i}\.q\.bias", f"cod/attn_{i}/q/bias", "direct"),
            (c + rf"block\.{i}\.k\.weight", f"cod/attn_{i}/k/kernel", "conv2d"),
            (c + rf"block\.{i}\.k\.bias", f"cod/attn_{i}/k/bias", "direct"),
            (c + rf"block\.{i}\.v\.weight", f"cod/attn_{i}/v/kernel", "conv2d"),
            (c + rf"block\.{i}\.v\.bias", f"cod/attn_{i}/v/bias", "direct"),
            (c + rf"block\.{i}\.proj_out\.weight", f"cod/attn_{i}/proj_out/kernel", "conv2d"),
            (c + rf"block\.{i}\.proj_out\.bias", f"cod/attn_{i}/proj_out/bias", "direct"),
        ]
    return rules


# ---------------------------------------------------------------- ernie_image


def ernie_rules(scan_blocks: bool = True) -> list[Rule]:
    r"""ErnieImageTransformer2DModel (vendored layout,
    ``extensions_built_in/diffusion_models/ernie_image/transformer.py``)
    -> ErnieDiT tree. adaLN is SHARED across layers (one Sequential at the
    top level); blocks carry only norms/attn/mlp weights."""
    b = "layers/block/" if scan_blocks else "layer_{0}/"
    L = "linear_stack" if scan_blocks else "linear"
    D = "direct_stack" if scan_blocks else "direct"
    p = r"layers\.(\d+)\."
    return [
        (r"x_embedder\.proj\.weight", "x_embedder/kernel", "conv2d"),
        (r"x_embedder\.proj\.bias", "x_embedder/bias", "direct"),
        (r"text_proj\.weight", "text_proj/kernel", "linear"),
        (r"time_embedding\.linear_1\.weight", "time_in/kernel", "linear"),
        (r"time_embedding\.linear_1\.bias", "time_in/bias", "direct"),
        (r"time_embedding\.linear_2\.weight", "time_out/kernel", "linear"),
        (r"time_embedding\.linear_2\.bias", "time_out/bias", "direct"),
        # nn.Sequential(SiLU, Linear) -> index 1
        (r"adaLN_modulation\.1\.weight", "adaLN_modulation/kernel", "linear"),
        (r"adaLN_modulation\.1\.bias", "adaLN_modulation/bias", "direct"),
        (p + r"adaLN_sa_ln\.weight", b + "adaLN_sa_ln/scale", D),
        (p + r"self_attention\.to_q\.weight", b + "to_q/kernel", L),
        (p + r"self_attention\.to_k\.weight", b + "to_k/kernel", L),
        (p + r"self_attention\.to_v\.weight", b + "to_v/kernel", L),
        (p + r"self_attention\.norm_q\.weight", b + "q_norm", D),
        (p + r"self_attention\.norm_k\.weight", b + "k_norm", D),
        (p + r"self_attention\.to_out\.0\.weight", b + "to_out/kernel", L),
        (p + r"adaLN_mlp_ln\.weight", b + "adaLN_mlp_ln/scale", D),
        (p + r"mlp\.gate_proj\.weight", b + "gate_proj/kernel", L),
        (p + r"mlp\.up_proj\.weight", b + "up_proj/kernel", L),
        (p + r"mlp\.linear_fc2\.weight", b + "linear_fc2/kernel", L),
        (r"final_norm\.linear\.weight", "final_mod/kernel", "linear"),
        (r"final_norm\.linear\.bias", "final_mod/bias", "direct"),
        (r"final_linear\.weight", "final_linear/kernel", "linear"),
        (r"final_linear\.bias", "final_linear/bias", "direct"),
    ]


def load_ernie_checkpoint(path: str, model) -> dict:
    """ernie_image checkpoint dir: transformer/ + text_encoder/ (Ernie-4.5,
    HF llama-style keys) + vae/ (AutoencoderKLFlux2: diffusers AutoencoderKL
    layout + a BatchNorm over the 128 patchified channels whose running
    stats standardize latents — ``ernie_image.py`` encode_images)."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules

    variables = model.init_variables(jax.random.key(0))
    tdir = os.path.join(path, "transformer")
    if os.path.isdir(tdir):
        flat = load_safetensors_dir(tdir)
        tree, unmatched = torch_to_tree(flat, ernie_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"ernie import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "ernie dit")
    tedir = os.path.join(path, "text_encoder")
    if os.path.isdir(tedir):
        flat = load_safetensors_dir(tedir)
        tree, _ = torch_to_tree(flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "ernie text_encoder")
    vdir = os.path.join(path, "vae")
    if os.path.isdir(vdir):
        flat = load_safetensors_dir(vdir)
        if "bn.running_mean" in flat:
            mean = np.asarray(flat["bn.running_mean"], np.float32)
            var = np.asarray(flat["bn.running_var"], np.float32)
            variables["latent_bn"] = {
                "mean": mean, "std": np.sqrt(var + 1e-5),
            }
        tree, _ = torch_to_tree(flat, vae_rules())
        if tree:
            variables["vae"] = _merge_imported(variables["vae"], tree, "ernie vae")
    return variables


# ---------------------------------------------------------------- krea2


def _krea_fusion_block_rules(src: str, dst: str) -> list[Rule]:
    rules: list[Rule] = []
    for s, d in (("attn.wq", "attn/wq"), ("attn.wk", "attn/wk"),
                 ("attn.wv", "attn/wv"), ("attn.gate", "attn/gate"),
                 ("attn.wo", "attn/wo"), ("mlp.gate", "mlp/gate"),
                 ("mlp.up", "mlp/up"), ("mlp.down", "mlp/down")):
        rules.append((src + s.replace(".", r"\.") + r"\.weight", f"{dst}{d}/kernel", "linear"))
        rules.append((src + s.replace(".", r"\.") + r"\.bias", f"{dst}{d}/bias", "direct"))
    for s, d in (("prenorm.scale", "prenorm/scale"), ("postnorm.scale", "postnorm/scale"),
                 ("attn.qknorm.qnorm.scale", "attn/q_norm"),
                 ("attn.qknorm.knorm.scale", "attn/k_norm")):
        rules.append((src + s.replace(".", r"\."), f"{dst}{d}", "direct"))
    return rules


def krea_rules(scan_blocks: bool = True) -> list[Rule]:
    r"""Krea2 SingleStreamDiT (vendored layout,
    ``extensions_built_in/diffusion_models/krea2/src/mmdit.py``) -> KreaDiT
    tree. All RMSNorm scales are stored zero-init (applied as 1+scale) so they
    import 'direct'; mod.lin / last.modulation.lin are additive params."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    L = "linear_stack" if scan_blocks else "linear"
    D = "direct_stack" if scan_blocks else "direct"
    p = r"blocks\.(\d+)\."
    rules: list[Rule] = [
        (r"first\.weight", "first/kernel", "linear"),
        (r"first\.bias", "first/bias", "direct"),
        (r"tmlp\.0\.weight", "tmlp_0/kernel", "linear"),
        (r"tmlp\.0\.bias", "tmlp_0/bias", "direct"),
        (r"tmlp\.2\.weight", "tmlp_2/kernel", "linear"),
        (r"tmlp\.2\.bias", "tmlp_2/bias", "direct"),
        (r"tproj\.1\.weight", "tproj_1/kernel", "linear"),
        (r"tproj\.1\.bias", "tproj_1/bias", "direct"),
        (r"txtfusion\.projector\.weight", "txtfusion/projector/kernel", "linear"),
        (r"txtmlp\.0\.scale", "txtmlp_norm/scale", "direct"),
        (r"txtmlp\.1\.weight", "txtmlp_1/kernel", "linear"),
        (r"txtmlp\.1\.bias", "txtmlp_1/bias", "direct"),
        (r"txtmlp\.3\.weight", "txtmlp_3/kernel", "linear"),
        (r"txtmlp\.3\.bias", "txtmlp_3/bias", "direct"),
        (r"last\.norm\.scale", "last_norm/scale", "direct"),
        (r"last\.linear\.weight", "last_linear/kernel", "linear"),
        (r"last\.linear\.bias", "last_linear/bias", "direct"),
        (r"last\.modulation\.lin", "last_mod_lin", "direct"),
        (p + r"mod\.lin", b + "mod_lin", D),
    ]
    for i in range(2):
        rules += _krea_fusion_block_rules(
            rf"txtfusion\.layerwise_blocks\.{i}\.", f"txtfusion/layerwise_{i}/")
        rules += _krea_fusion_block_rules(
            rf"txtfusion\.refiner_blocks\.{i}\.", f"txtfusion/refiner_{i}/")
    for s, d in (("attn.wq", "attn/wq"), ("attn.wk", "attn/wk"),
                 ("attn.wv", "attn/wv"), ("attn.gate", "attn/gate"),
                 ("attn.wo", "attn/wo"), ("mlp.gate", "mlp/gate"),
                 ("mlp.up", "mlp/up"), ("mlp.down", "mlp/down")):
        rules.append((p + s.replace(".", r"\.") + r"\.weight", b + f"{d}/kernel", L))
        rules.append((p + s.replace(".", r"\.") + r"\.bias", b + f"{d}/bias", D))
    for s, d in (("prenorm.scale", "prenorm/scale"), ("postnorm.scale", "postnorm/scale"),
                 ("attn.qknorm.qnorm.scale", "attn/q_norm"),
                 ("attn.qknorm.knorm.scale", "attn/k_norm")):
        rules.append((p + s.replace(".", r"\."), b + d, D))
    return rules


def load_krea_checkpoint(path: str, model) -> dict:
    """krea2 layout (krea2.py load_model): the MMDiT is a single safetensors
    state dict (file path, or transformer/ under a dir); Qwen3-VL text tower
    under text_encoder/ and the Qwen-Image (wan21) VAE under vae/."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules

    variables = model.init_variables(jax.random.key(0))
    flat = None
    if os.path.isfile(path):
        flat = load_safetensors_dir(path)
    else:
        for sub in ("transformer", "."):
            p = os.path.join(path, sub)
            if os.path.isdir(p) or os.path.isfile(p):
                try:
                    flat = load_safetensors_dir(path, sub if sub != "." else None)
                except FileNotFoundError:
                    continue
                if any(k.startswith("blocks.") for k in flat):
                    break
                flat = None
    if flat:
        tree, unmatched = torch_to_tree(flat, krea_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"krea2 import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        variables["dit"] = _merge_imported(variables["dit"], tree, "krea2 dit")

    base = path if os.path.isdir(path) else os.path.dirname(path)
    tedir = os.path.join(base, "text_encoder")
    if os.path.isdir(tedir):
        te_flat = load_safetensors_dir(tedir)
        te_flat = {k.replace("model.language_model.", "model."): v
                   for k, v in te_flat.items()}
        tree, _ = torch_to_tree(te_flat, llm_rules())
        if tree:
            variables["te"] = _merge_imported(variables["te"], tree, "krea2 text_encoder")
    vdir = os.path.join(base, "vae")
    if os.path.isdir(vdir):
        from ai_toolkit_tpu.io.video_vae_import import (
            load_wan_vae_tree,
            wan_vae_config_from_json,
        )
        from ai_toolkit_tpu.models.wan_vae import WanVAE

        cfg = wan_vae_config_from_json(vdir)
        model.vae_config = cfg
        model.vae = WanVAE(cfg)
        tree, unmatched = load_wan_vae_tree(vdir)
        if unmatched:
            print(f"krea2 vae import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
        ref = model.vae.init(
            jax.random.key(0),
            jnp.zeros((1, 1, 2 * cfg.spatial_downscale, 2 * cfg.spatial_downscale, 3)),
        )["params"]
        variables["vae"] = _merge_imported(ref, tree, "krea2 vae")
    return variables


# ---------------------------------------------------------------- minimax_h3


def minimax_rules(scan_blocks: bool = True, refiner_layers: int = 2) -> list[Rule]:
    r"""MiniMaxH3Transformer (vendored layout,
    ``extensions_built_in/diffusion_models/minimax_h3/src/transformer.py``,
    original ``MiniMaxAI/MiniMax-H3`` checkpoint keys) -> flax tree."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    L = "linear_stack" if scan_blocks else "linear"
    D = "direct_stack" if scan_blocks else "direct"
    p = r"blocks\.(\d+)\."
    rules: list[Rule] = [
        (r"video_patch_proj\.weight", "video_patch_proj/kernel", "linear"),
        (r"video_patch_proj\.bias", "video_patch_proj/bias", "direct"),
        (r"audio_patch_proj\.weight", "audio_patch_proj/kernel", "linear"),
        (r"audio_patch_proj\.bias", "audio_patch_proj/bias", "direct"),
        (r"condition_proj\.weight", "condition_proj/kernel", "linear"),
        (r"condition_proj\.bias", "condition_proj/bias", "direct"),
        (r"time_embedder\.proj_in\.weight", "time_proj_in/kernel", "linear"),
        (r"time_embedder\.proj_in\.bias", "time_proj_in/bias", "direct"),
        (r"time_embedder\.proj_out\.weight", "time_proj_out/kernel", "linear"),
        (r"time_embedder\.proj_out\.bias", "time_proj_out/bias", "direct"),
        (r"adaln_t_table", "adaln_t_table", "direct"),
        (r"rope\.inv_freq", "rope_inv_freq", "direct"),
        (r"token_refiner\.final_norm\.weight", "token_refiner/refiner_norm/scale", "direct"),
        (r"final_layer\.norm\.weight", "final_norm/scale", "direct"),
        (r"final_layer\.adaln_proj\.linear\.weight", "final_adaln/linear/kernel", "linear"),
        (r"final_layer\.adaln_proj\.linear\.bias", "final_adaln/linear/bias", "direct"),
        (r"final_layer\.video_out\.weight", "video_out/kernel", "linear"),
        (r"final_layer\.video_out\.bias", "video_out/bias", "direct"),
        (r"final_layer\.audio_out\.weight", "audio_out/kernel", "linear"),
        (r"final_layer\.audio_out\.bias", "audio_out/bias", "direct"),
        (p + r"norm1\.weight", b + "norm1/scale", D),
        (p + r"norm2\.weight", b + "norm2/scale", D),
        (p + r"attn\.qkv_proj\.weight", b + "attn/qkv_proj/kernel", L),
        (p + r"attn\.q_norm\.weight", b + "attn/q_norm/scale", D),
        (p + r"attn\.k_norm\.weight", b + "attn/k_norm/scale", D),
        (p + r"attn\.out_proj\.weight", b + "attn/out_proj/kernel", L),
        (p + r"mlp\.fc1\.weight", b + "mlp/fc1/kernel", L),
        (p + r"mlp\.fc2\.weight", b + "mlp/fc2/kernel", L),
        (p + r"adaln_proj\.linear\.weight", b + "adaln_proj/linear/kernel", L),
        (p + r"adaln_proj\.linear\.bias", b + "adaln_proj/linear/bias", D),
    ]
    for i in range(refiner_layers):
        r = rf"token_refiner\.blocks\.{i}\."
        d = f"token_refiner/refiner_{i}/"
        rules += [
            (r + r"norm1\.weight", d + "norm1/scale", "direct"),
            (r + r"norm2\.weight", d + "norm2/scale", "direct"),
            (r + r"attn\.qkv_proj\.weight", d + "attn/qkv_proj/kernel", "linear"),
            (r + r"attn\.q_norm\.weight", d + "attn/q_norm/scale", "direct"),
            (r + r"attn\.k_norm\.weight", d + "attn/k_norm/scale", "direct"),
            (r + r"attn\.out_proj\.weight", d + "attn/out_proj/kernel", "linear"),
            (r + r"mlp\.fc1\.weight", d + "mlp/fc1/kernel", "linear"),
            (r + r"mlp\.fc2\.weight", d + "mlp/fc2/kernel", "linear"),
        ]
    return rules


# ---------------------------------------------------------------- zimage family


def zimage_canonical(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalize the three on-disk Z-Image layouts to the canonical (vendored
    ZImageDCT) key names, mirroring the reference's own conversion
    ``toolkit/models/v2/z_image.py:37-58``: split fused qkv, q_norm->norm_q,
    out->to_out.0, strip the all_x_embedder/all_final_layer ModuleDict keys."""
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if k == "__x0__":
            continue
        if k.endswith(".attention.qkv.weight"):
            prefix = k[: -len(".qkv.weight")]
            q, kk, vv = np.split(v, 3, axis=0)
            out[prefix + ".to_q.weight"] = q
            out[prefix + ".to_k.weight"] = kk
            out[prefix + ".to_v.weight"] = vv
            continue
        k = k.replace(".attention.out.weight", ".attention.to_out.0.weight")
        k = k.replace(".attention.q_norm.weight", ".attention.norm_q.weight")
        k = k.replace(".attention.k_norm.weight", ".attention.norm_k.weight")
        if k.startswith("all_x_embedder."):
            k = "x_embedder." + k.split(".", 2)[2]
        elif k.startswith("all_final_layer."):
            k = "final_layer." + k.split(".", 2)[2]
        out[k] = v
    return out


def _zimage_block_rules(src: str, dst: str, stacked: bool) -> list[Rule]:
    L = "linear_stack" if stacked else "linear"
    D = "direct_stack" if stacked else "direct"
    rules: list[Rule] = []
    for s, d in (("attention.to_q", "attention/to_q"),
                 ("attention.to_k", "attention/to_k"),
                 ("attention.to_v", "attention/to_v"),
                 ("attention.to_out.0", "attention/to_out"),
                 ("feed_forward.w1", "ff_w1"), ("feed_forward.w2", "ff_w2"),
                 ("feed_forward.w3", "ff_w3")):
        rules.append((src + s.replace(".", r"\.") + r"\.weight",
                      f"{dst}{d}/kernel", L))
    for s, d in (("attention.norm_q", "attention/q_norm"),
                 ("attention.norm_k", "attention/k_norm"),
                 ("attention_norm1", "attention_norm1"),
                 ("attention_norm2", "attention_norm2"),
                 ("ffn_norm1", "ffn_norm1"), ("ffn_norm2", "ffn_norm2")):
        rules.append((src + s.replace(".", r"\.") + r"\.weight",
                      f"{dst}{d}/scale", D))
    rules.append((src + r"adaLN_modulation\.0\.weight",
                  f"{dst}adaLN_modulation/kernel", L))
    rules.append((src + r"adaLN_modulation\.0\.bias",
                  f"{dst}adaLN_modulation/bias", D))
    return rules


def zimage_rules(scan_blocks: bool = True, n_refiner: int = 2,
                 head: str = "final",
                 decoder_res_blocks: int = 4) -> list[Rule]:
    r"""Canonical Z-Image layout (vendored ZImageDCT state-dict names,
    ``zeta_chroma_transformer.py:452-555``; diffusers/single-file checkpoints
    are first normalized by :func:`zimage_canonical`) -> ZImageDiT tree."""
    b = "layers/block/" if scan_blocks else "layer_{0}/"
    rules: list[Rule] = [
        (r"x_embedder\.weight", "x_embedder/kernel", "linear"),
        (r"x_embedder\.bias", "x_embedder/bias", "direct"),
        (r"t_embedder\.mlp\.0\.weight", "t_in/kernel", "linear"),
        (r"t_embedder\.mlp\.0\.bias", "t_in/bias", "direct"),
        (r"t_embedder\.mlp\.2\.weight", "t_out/kernel", "linear"),
        (r"t_embedder\.mlp\.2\.bias", "t_out/bias", "direct"),
        (r"cap_embedder\.0\.weight", "cap_norm/scale", "direct"),
        (r"cap_embedder\.1\.weight", "cap_proj/kernel", "linear"),
        (r"cap_embedder\.1\.bias", "cap_proj/bias", "direct"),
        (r"x_pad_token", "x_pad_token", "direct"),
        (r"cap_pad_token", "cap_pad_token", "direct"),
    ]
    rules += _zimage_block_rules(r"layers\.(\d+)\.", b, scan_blocks)
    for i in range(n_refiner):
        rules += _zimage_block_rules(rf"noise_refiner\.{i}\.",
                                     f"noise_refiner_{i}/", False)
        rules += _zimage_block_rules(rf"context_refiner\.{i}\.",
                                     f"context_refiner_{i}/", False)
    if head == "final":
        rules += [
            (r"final_layer\.linear\.weight", "final_linear/kernel", "linear"),
            (r"final_layer\.linear\.bias", "final_linear/bias", "direct"),
            (r"final_layer\.adaLN_modulation\.1\.weight", "final_adaln/kernel", "linear"),
            (r"final_layer\.adaLN_modulation\.1\.bias", "final_adaln/bias", "direct"),
        ]
    elif head == "dct":
        rules += [
            (r"dec_net\.cond_embed\.weight", "dec_net/cond_embed/kernel", "linear"),
            (r"dec_net\.cond_embed\.bias", "dec_net/cond_embed/bias", "direct"),
            (r"dec_net\.input_embedder\.embedder\.0\.weight",
             "dec_net/input_embedder/kernel", "linear"),
            (r"dec_net\.input_embedder\.embedder\.0\.bias",
             "dec_net/input_embedder/bias", "direct"),
            (r"dec_net\.final_layer\.linear\.weight", "dec_net/final_linear/kernel", "linear"),
            (r"dec_net\.final_layer\.linear\.bias", "dec_net/final_linear/bias", "direct"),
        ]
        for i in range(decoder_res_blocks):
            r = rf"dec_net\.res_blocks\.{i}\."
            d = f"dec_net/res_{i}/"
            rules += [
                (r + r"in_ln\.weight", d + "in_ln_scale", "direct"),
                (r + r"in_ln\.bias", d + "in_ln_bias", "direct"),
                (r + r"mlp\.0\.weight", d + "mlp_0/kernel", "linear"),
                (r + r"mlp\.0\.bias", d + "mlp_0/bias", "direct"),
                (r + r"mlp\.2\.weight", d + "mlp_2/kernel", "linear"),
                (r + r"mlp\.2\.bias", d + "mlp_2/bias", "direct"),
                (r + r"adaLN_modulation\.1\.weight", d + "adaLN/kernel", "linear"),
                (r + r"adaLN_modulation\.1\.bias", d + "adaLN/bias", "direct"),
            ]
    elif head == "l2p":
        for enc, ch in (("enc1", 64), ("enc2", 128), ("enc3", 256), ("enc4", 512)):
            rules += [
                (rf"local_decoder\.{enc}\.0\.weight", f"local_decoder/{enc}_0/kernel", "conv2d"),
                (rf"local_decoder\.{enc}\.0\.bias", f"local_decoder/{enc}_0/bias", "direct"),
            ]
        rules += [
            (r"local_decoder\.bottleneck\.0\.weight", "local_decoder/bottleneck_0/kernel", "conv2d"),
            (r"local_decoder\.bottleneck\.0\.bias", "local_decoder/bottleneck_0/bias", "direct"),
            (r"local_decoder\.out_conv\.weight", "local_decoder/out_conv/kernel", "conv2d"),
            (r"local_decoder\.out_conv\.bias", "local_decoder/out_conv/bias", "direct"),
        ]
        for lvl in (4, 3, 2, 1):
            rules += [
                (rf"local_decoder\.up{lvl}\.1\.weight", f"local_decoder/up{lvl}_1/kernel", "conv2d"),
                (rf"local_decoder\.up{lvl}\.1\.bias", f"local_decoder/up{lvl}_1/bias", "direct"),
                (rf"local_decoder\.dec{lvl}\.0\.weight", f"local_decoder/dec{lvl}_0/kernel", "conv2d"),
                (rf"local_decoder\.dec{lvl}\.0\.bias", f"local_decoder/dec{lvl}_0/bias", "direct"),
            ]
    return rules


def load_zimage_checkpoint(path: str, model) -> dict:
    """zimage / zimage_l2p: diffusers dir (transformer/ + text_encoder/ +
    vae/) or a single-file checkpoint (``z_image.py:172-181`` /
    ``z_image_l2p_model.py:331-436``). For zimage_l2p, a latent-space
    checkpoint is converted to pixel space exactly like the reference:
    fresh 0.001-scaled x_embedder, final_layer dropped, random local_decoder."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules, vae_rules

    cfg = model.dit_config
    variables = model.init_variables(jax.random.key(0))

    if os.path.isfile(path):
        flat = zimage_canonical(load_safetensors_dir(path))
        base = os.path.dirname(path)
    else:
        flat = zimage_canonical(load_safetensors_dir(path, "transformer"))
        base = path

    if cfg.head == "l2p":
        is_pixel = any(k.startswith("local_decoder.") for k in flat)
        if not is_pixel and "x_embedder.weight" in flat \
                and flat["x_embedder.weight"].shape[1] == cfg.in_feats:
            is_pixel = True
        if not is_pixel:
            # latent->pixel conversion (z_image_l2p_model.py:401-436)
            print("zimage_l2p import: converting latent-space checkpoint to "
                  "pixel space (fresh x_embedder/local_decoder)")
            rng = np.random.default_rng(0)
            flat["x_embedder.weight"] = (
                rng.standard_normal((cfg.dim, cfg.in_feats)).astype(np.float32)
                * 0.001)
            flat.pop("x_embedder.bias", None)
            flat = {k: v for k, v in flat.items()
                    if not k.startswith("final_layer.")}

    tree, unmatched = torch_to_tree(
        flat, zimage_rules(cfg.scan_blocks, cfg.n_refiner_layers, cfg.head))
    if unmatched:
        print(f"zimage import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
    variables["dit"] = _merge_imported(variables["dit"], tree, "zimage dit")

    tedir = os.path.join(base, "text_encoder") if base else ""
    extras = getattr(model.config, "extras_name_or_path", None)
    if not os.path.isdir(tedir) and extras and os.path.isdir(str(extras)):
        tedir = os.path.join(str(extras), "text_encoder")
    if os.path.isdir(tedir):
        te_flat = load_safetensors_dir(tedir)
        t, _ = torch_to_tree(te_flat, llm_rules())
        if t:
            variables["te"] = _merge_imported(variables["te"], t, "zimage text_encoder")
    vdir = os.path.join(base, "vae") if base else ""
    if "vae" in variables and os.path.isdir(vdir):
        v_flat = load_safetensors_dir(vdir)
        t, _ = torch_to_tree(v_flat, vae_rules())
        if t:
            variables["vae"] = _merge_imported(variables["vae"], t, "zimage vae")
    return variables


def load_zeta_checkpoint(path: str, model) -> dict:
    """zeta_chroma: a single ZImageDCT .safetensors file
    (``zeta_chroma_model.py:95-116``; use_x0 auto-detected from the __x0__
    buffer), Qwen3 text tower + tokenizer from extras_name_or_path."""
    import dataclasses

    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import llm_rules
    from ai_toolkit_tpu.models.zimage_dit import ZImageDiT

    raw = load_safetensors_dir(path)
    use_x0 = "__x0__" in raw
    if use_x0 != model.dit_config.use_x0:
        model.dit_config = dataclasses.replace(model.dit_config, use_x0=use_x0)
        model.dit = ZImageDiT(model.dit_config)
    cfg = model.dit_config
    variables = model.init_variables(jax.random.key(0))
    flat = zimage_canonical(raw)
    tree, unmatched = torch_to_tree(
        flat, zimage_rules(cfg.scan_blocks, cfg.n_refiner_layers, "dct",
                           cfg.decoder_num_res_blocks))
    if unmatched:
        print(f"zeta_chroma import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
    variables["dit"] = _merge_imported(variables["dit"], tree, "zeta_chroma dit")

    extras = getattr(model.config, "extras_name_or_path", None)
    if extras and os.path.isdir(str(extras)):
        tedir = os.path.join(str(extras), "text_encoder")
        if os.path.isdir(tedir):
            te_flat = load_safetensors_dir(tedir)
            t, _ = torch_to_tree(te_flat, llm_rules())
            if t:
                variables["te"] = _merge_imported(
                    variables["te"], t, "zeta_chroma text_encoder")
    return variables


def auraflow_rules(scan_blocks: bool = True) -> list[Rule]:
    """diffusers ``AuraFlowTransformer2DModel`` -> models/auraflow_dit.

    Layout pinned by the reference's vendored patch embed
    (``toolkit/models/auraflow.py:8-48``) plus the diffusers AuraFlow module
    grammar it loads (``stable_diffusion_model.py:606-611``):
    joint_transformer_blocks (MMDiT, add_*_proj/to_add_out context branch) +
    single_transformer_blocks, AuraFlowFeedForward linear_1/linear_2/
    out_projection, bias-free AdaLayerNormZero ``norm1(.context).linear``,
    ``norm_out.linear`` pre-final scale/shift, bias-free proj_out."""
    jb = "joint/block/" if scan_blocks else "joint_{0}/"
    sb = "single/block/" if scan_blocks else "single_{0}/"
    kind = "_stack" if scan_blocks else ""

    def lin(pre, src, dstpre, dst):
        return [(pre + src + r"\.weight", dstpre + dst + "/kernel", "linear" + kind)]

    rules: list[Rule] = []
    jpre = r"joint_transformer_blocks\.(\d+)\."
    spre = r"single_transformer_blocks\.(\d+)\."
    for pre, dstpre, joint in ((jpre, jb, True), (spre, sb, False)):
        rules += lin(pre, r"norm1\.linear", dstpre, "norm1_lin")
        for w in ("q", "k", "v"):
            rules += lin(pre, rf"attn\.to_{w}", dstpre, f"attn/to_{w}")
        rules += lin(pre, r"attn\.to_out\.0", dstpre, "attn/to_out")
        rules += lin(pre, r"ff\.linear_1", dstpre, "ff/w1")
        rules += lin(pre, r"ff\.linear_2", dstpre, "ff/w2")
        rules += lin(pre, r"ff\.out_projection", dstpre, "ff/out")
        if joint:
            rules += lin(pre, r"norm1_context\.linear", dstpre, "norm1_ctx_lin")
            for w in ("q", "k", "v"):
                rules += lin(pre, rf"attn\.add_{w}_proj", dstpre, f"attn/add_{w}")
            rules += lin(pre, r"attn\.to_add_out", dstpre, "attn/add_out")
            rules += lin(pre, r"ff_context\.linear_1", dstpre, "ff_ctx/w1")
            rules += lin(pre, r"ff_context\.linear_2", dstpre, "ff_ctx/w2")
            rules += lin(pre, r"ff_context\.out_projection", dstpre, "ff_ctx/out")
    rules += [
        (r"pos_embed\.proj\.weight", "patch_proj/kernel", "linear"),
        (r"pos_embed\.proj\.bias", "patch_proj/bias", "direct"),
        (r"pos_embed\.pos_embed", "pos_embed", "direct"),
        (r"register_tokens", "register_tokens", "direct"),
        (r"context_embedder\.weight", "context_embedder/kernel", "linear"),
        (r"time_step_proj\.linear_1\.weight", "time_in/in_layer/kernel", "linear"),
        (r"time_step_proj\.linear_1\.bias", "time_in/in_layer/bias", "direct"),
        (r"time_step_proj\.linear_2\.weight", "time_in/out_layer/kernel", "linear"),
        (r"time_step_proj\.linear_2\.bias", "time_in/out_layer/bias", "direct"),
        (r"norm_out\.linear\.weight", "final_mod/kernel", "linear"),
        (r"proj_out\.weight", "final_proj/kernel", "linear"),
    ]
    return rules


def load_auraflow_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + text_encoder/) or a single
    transformer .safetensors file."""
    import dataclasses
    import json

    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import t5_rules, vae_rules
    from ai_toolkit_tpu.models.auraflow_dit import AuraFlowConfig, AuraFlowDiT

    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None and os.path.isdir(src):
        cj = os.path.join(src, "config.json")
        if os.path.isfile(cj):
            with open(cj) as f:
                c = json.load(f)
            cfg = model.dit_config
            new = AuraFlowConfig(
                in_channels=c.get("in_channels", cfg.in_channels),
                out_channels=c.get("out_channels", cfg.out_channels),
                patch_size=c.get("patch_size", cfg.patch_size),
                num_heads=c.get("num_attention_heads", cfg.num_heads),
                head_dim=c.get("attention_head_dim", cfg.head_dim),
                n_double=c.get("num_mmdit_layers", cfg.n_double),
                n_single=c.get("num_single_dit_layers", cfg.n_single),
                context_dim=c.get("joint_attention_dim", cfg.context_dim),
                pos_embed_max_size=c.get("pos_embed_max_size", cfg.pos_embed_max_size),
                n_register=cfg.n_register,  # not a diffusers config key
                scan_blocks=cfg.scan_blocks, remat=cfg.remat,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            )
            if new != cfg:
                model.dit_config = new
                model.dit = AuraFlowDiT(new)
    variables = model.init_variables(jax.random.key(0))
    if src is not None:
        flat = load_safetensors_dir(src)
        flat = {k.removeprefix("model.diffusion_model.").removeprefix("transformer."): v
                for k, v in flat.items()}
        tree, unmatched = torch_to_tree(flat, auraflow_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"auraflow import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "auraflow dit")
    vdir = os.path.join(path, "vae") if os.path.isdir(path) else None
    if vdir and os.path.isdir(vdir) and "vae" in variables:
        flat = load_safetensors_dir(path, "vae")
        tree, _ = torch_to_tree(flat, vae_rules(len(model.vae_config.channel_multipliers),
                                                model.vae_config.layers_per_block))
        if tree:
            variables["vae"] = _merge_imported(variables["vae"], tree, "auraflow vae")
    tedir = os.path.join(path, "text_encoder") if os.path.isdir(path) else None
    if tedir and os.path.isdir(tedir) and "t5" in variables:
        flat = load_safetensors_dir(path, "text_encoder")
        tree, _ = torch_to_tree(flat, t5_rules(per_layer_bias=model.t5_config.per_layer_bias))
        if tree:
            variables["t5"] = _merge_imported(variables["t5"], tree, "auraflow pile-t5")
    return variables


def pixart_rules(scan_blocks: bool = True, micro_cond: bool = False,
                 in_channels: int = 4, patch: int = 2) -> list[Rule]:
    """diffusers ``PixArtTransformer2DModel`` / legacy ``Transformer2DModel``
    (the class the reference loads at ``stable_diffusion_model.py:486-536``)
    -> models/pixart_dit.PixArtDiT. adaLN-single: one shared 6d linear +
    per-block [6, d] scale_shift_table; conv patch embed folds to a Linear
    over channel-major patches (conv_flatten)."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    kind = "_stack" if scan_blocks else ""
    pre = r"transformer_blocks\.(\d+)\."

    def lin(src, dst):
        return [(pre + src + r"\.weight", b + dst + "/kernel", "linear" + kind),
                (pre + src + r"\.bias", b + dst + "/bias", "direct" + kind)]

    rules: list[Rule] = []
    for attn in ("attn1", "attn2"):
        for w in ("q", "k", "v"):
            rules += lin(rf"{attn}\.to_{w}", f"{attn}/to_{w}")
        rules += lin(rf"{attn}\.to_out\.0", f"{attn}/to_out")
    rules += lin(r"ff\.net\.0\.proj", "ff_in")
    rules += lin(r"ff\.net\.2", "ff_out")
    rules.append((pre + r"scale_shift_table", b + "scale_shift_table",
                  "direct" + kind))
    rules += [
        (r"pos_embed\.proj\.weight", "patch_proj/kernel",
         f"conv_flatten:{in_channels}:{patch}:{patch}"),
        (r"pos_embed\.proj\.bias", "patch_proj/bias", "direct"),
        (r"caption_projection\.linear_1\.weight", "caption_in/kernel", "linear"),
        (r"caption_projection\.linear_1\.bias", "caption_in/bias", "direct"),
        (r"caption_projection\.linear_2\.weight", "caption_out/kernel", "linear"),
        (r"caption_projection\.linear_2\.bias", "caption_out/bias", "direct"),
        (r"adaln_single\.emb\.timestep_embedder\.linear_1\.weight", "time_in/in_layer/kernel", "linear"),
        (r"adaln_single\.emb\.timestep_embedder\.linear_1\.bias", "time_in/in_layer/bias", "direct"),
        (r"adaln_single\.emb\.timestep_embedder\.linear_2\.weight", "time_in/out_layer/kernel", "linear"),
        (r"adaln_single\.emb\.timestep_embedder\.linear_2\.bias", "time_in/out_layer/bias", "direct"),
        (r"adaln_single\.linear\.weight", "adaln_linear/kernel", "linear"),
        (r"adaln_single\.linear\.bias", "adaln_linear/bias", "direct"),
        (r"scale_shift_table", "head_table", "direct"),
        (r"proj_out\.weight", "final_proj/kernel", "linear"),
        (r"proj_out\.bias", "final_proj/bias", "direct"),
    ]
    if micro_cond:
        for src, dst in (("resolution_embedder", "res_in"), ("aspect_ratio_embedder", "ar_in")):
            rules += [
                (rf"adaln_single\.emb\.{src}\.linear_1\.weight", f"{dst}/in_layer/kernel", "linear"),
                (rf"adaln_single\.emb\.{src}\.linear_1\.bias", f"{dst}/in_layer/bias", "direct"),
                (rf"adaln_single\.emb\.{src}\.linear_2\.weight", f"{dst}/out_layer/kernel", "linear"),
                (rf"adaln_single\.emb\.{src}\.linear_2\.bias", f"{dst}/out_layer/bias", "direct"),
            ]
    return rules


def load_pixart_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + text_encoder/) or a single
    transformer .safetensors file. Micro-cond (alpha-1024) is detected from
    the checkpoint's resolution_embedder keys; dims come from config.json."""
    import dataclasses
    import json

    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import t5_rules, vae_rules
    from ai_toolkit_tpu.models.pixart_dit import PixArtConfig, PixArtDiT

    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    flat = None
    if src is not None:
        flat = load_safetensors_dir(src)
        flat = {k.removeprefix("model.diffusion_model.").removeprefix("transformer."): v
                for k, v in flat.items()}
        cfg = model.dit_config
        micro = any(k.startswith("adaln_single.emb.resolution_embedder") for k in flat)
        upd: dict = {"micro_cond": micro}
        cj = os.path.join(src, "config.json") if os.path.isdir(src) else None
        if cj and os.path.isfile(cj):
            with open(cj) as f:
                c = json.load(f)
            upd.update(
                in_channels=c.get("in_channels", cfg.in_channels),
                patch_size=c.get("patch_size", cfg.patch_size),
                num_heads=c.get("num_attention_heads", cfg.num_heads),
                head_dim=c.get("attention_head_dim", cfg.head_dim),
                n_layers=c.get("num_layers", cfg.n_layers),
                caption_dim=c.get("caption_channels", cfg.caption_dim),
                sample_size=c.get("sample_size", cfg.sample_size),
                interpolation_scale=c.get("interpolation_scale",
                                          cfg.interpolation_scale) or 1,
                learned_sigma=c.get("out_channels") is None
                or c.get("out_channels") == 2 * c.get("in_channels", 4),
            )
        new = dataclasses.replace(cfg, **upd)
        if new != cfg:
            model.dit_config = new
            model.dit = PixArtDiT(new)
    variables = model.init_variables(jax.random.key(0))
    if flat is not None:
        tree, unmatched = torch_to_tree(
            flat, pixart_rules(model.dit_config.scan_blocks,
                               model.dit_config.micro_cond,
                               model.dit_config.in_channels,
                               model.dit_config.patch_size))
        if unmatched:
            print(f"pixart import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "pixart dit")
    if os.path.isdir(path):
        vdir = os.path.join(path, "vae")
        if os.path.isdir(vdir) and "vae" in variables:
            flat_v = load_safetensors_dir(path, "vae")
            tree, _ = torch_to_tree(flat_v, vae_rules(
                len(model.vae_config.channel_multipliers),
                model.vae_config.layers_per_block))
            if tree:
                variables["vae"] = _merge_imported(variables["vae"], tree, "pixart vae")
        tedir = os.path.join(path, "text_encoder")
        if os.path.isdir(tedir) and "t5" in variables:
            flat_t = load_safetensors_dir(path, "text_encoder")
            tree, _ = torch_to_tree(flat_t, t5_rules())
            if tree:
                variables["t5"] = _merge_imported(variables["t5"], tree, "pixart t5")
    return variables


def cogview4_rules(scan_blocks: bool = True) -> list[Rule]:
    """diffusers ``CogView4Transformer2DModel`` -> models/cogview4_dit.
    Module inventory pinned by the reference wrapper's quantization exclude
    list (``toolkit/models/cogview4.py:160-166``): norm1 (12-chunk adaLN
    linear), affine attn1.norm_q/norm_k, param-less norm2/norm2_context."""
    b = "blocks/block/" if scan_blocks else "block_{0}/"
    kind = "_stack" if scan_blocks else ""
    pre = r"transformer_blocks\.(\d+)\."

    def lin(src, dst):
        return [(pre + src + r"\.weight", b + dst + "/kernel", "linear" + kind),
                (pre + src + r"\.bias", b + dst + "/bias", "direct" + kind)]

    rules: list[Rule] = []
    rules += lin(r"norm1\.linear", "adaln")
    for w in ("q", "k", "v"):
        rules += lin(rf"attn1\.to_{w}", f"attn1/to_{w}")
    rules += lin(r"attn1\.to_out\.0", "attn1/to_out")
    for nm in ("norm_q", "norm_k"):
        rules += [(pre + rf"attn1\.{nm}\.weight", b + f"attn1/{nm}/scale", "direct" + kind),
                  (pre + rf"attn1\.{nm}\.bias", b + f"attn1/{nm}/bias", "direct" + kind)]
    rules += lin(r"ff\.net\.0\.proj", "ff_in")
    rules += lin(r"ff\.net\.2", "ff_out")
    rules += [
        (r"patch_embed\.proj\.weight", "patch_proj/kernel", "linear"),
        (r"patch_embed\.proj\.bias", "patch_proj/bias", "direct"),
        (r"patch_embed\.text_proj\.weight", "text_proj/kernel", "linear"),
        (r"patch_embed\.text_proj\.bias", "text_proj/bias", "direct"),
        (r"time_condition_embed\.timestep_embedder\.linear_1\.weight", "time_in/in_layer/kernel", "linear"),
        (r"time_condition_embed\.timestep_embedder\.linear_1\.bias", "time_in/in_layer/bias", "direct"),
        (r"time_condition_embed\.timestep_embedder\.linear_2\.weight", "time_in/out_layer/kernel", "linear"),
        (r"time_condition_embed\.timestep_embedder\.linear_2\.bias", "time_in/out_layer/bias", "direct"),
        (r"time_condition_embed\.condition_embedder\.linear_1\.weight", "cond_in/kernel", "linear"),
        (r"time_condition_embed\.condition_embedder\.linear_1\.bias", "cond_in/bias", "direct"),
        (r"time_condition_embed\.condition_embedder\.linear_2\.weight", "cond_out/kernel", "linear"),
        (r"time_condition_embed\.condition_embedder\.linear_2\.bias", "cond_out/bias", "direct"),
        (r"norm_out\.linear\.weight", "final_mod/kernel", "linear"),
        (r"norm_out\.linear\.bias", "final_mod/bias", "direct"),
        (r"proj_out\.weight", "final_proj/kernel", "linear"),
        (r"proj_out\.bias", "final_proj/bias", "direct"),
    ]
    return rules


def load_cogview4_checkpoint(path: str, model) -> dict:
    """HF-layout dir (transformer/ + vae/ + text_encoder/) or a single
    transformer .safetensors file; config.json drives all dims."""
    import dataclasses
    import json

    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import vae_rules
    from ai_toolkit_tpu.models.cogview4_dit import CogView4Config, CogView4DiT

    tdir = os.path.join(path, "transformer")
    src = tdir if os.path.isdir(tdir) else (path if os.path.isfile(path) else None)
    if src is not None and os.path.isdir(src):
        cj = os.path.join(src, "config.json")
        if os.path.isfile(cj):
            with open(cj) as f:
                c = json.load(f)
            cfg = model.dit_config
            rad = c.get("rope_axes_dim", list(cfg.rope_axes_dim))
            new = dataclasses.replace(
                cfg,
                in_channels=c.get("in_channels", cfg.in_channels),
                out_channels=c.get("out_channels", cfg.out_channels),
                patch_size=c.get("patch_size", cfg.patch_size),
                num_heads=c.get("num_attention_heads", cfg.num_heads),
                head_dim=c.get("attention_head_dim", cfg.head_dim),
                n_layers=c.get("num_layers", cfg.n_layers),
                text_embed_dim=c.get("text_embed_dim", cfg.text_embed_dim),
                time_embed_dim=c.get("time_embed_dim", cfg.time_embed_dim),
                condition_dim=c.get("condition_dim", cfg.condition_dim),
                rope_axes_dim=tuple(rad),
            )
            if new != cfg:
                model.dit_config = new
                model.dit = CogView4DiT(new)
    variables = model.init_variables(jax.random.key(0))
    if src is not None:
        flat = load_safetensors_dir(src)
        flat = {k.removeprefix("model.diffusion_model.").removeprefix("transformer."): v
                for k, v in flat.items()}
        tree, unmatched = torch_to_tree(flat, cogview4_rules(model.dit_config.scan_blocks))
        if unmatched:
            print(f"cogview4 import: {len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
        variables["dit"] = _merge_imported(variables["dit"], tree, "cogview4 dit")
    if os.path.isdir(path):
        vdir = os.path.join(path, "vae")
        if os.path.isdir(vdir) and "vae" in variables:
            flat_v = load_safetensors_dir(path, "vae")
            tree, _ = torch_to_tree(flat_v, vae_rules(
                len(model.vae_config.channel_multipliers),
                model.vae_config.layers_per_block))
            if tree:
                variables["vae"] = _merge_imported(variables["vae"], tree, "cogview4 vae")
        elif "vae" in variables:
            print("cogview4 import WARNING: no vae/ subdir — the VAE stays "
                  "RANDOM-INIT (decodes will be garbage)")
        tedir = os.path.join(path, "text_encoder")
        if os.path.isdir(tedir) and "te" in variables:
            from ai_toolkit_tpu.io.sd_import import llm_rules

            flat_t = load_safetensors_dir(path, "text_encoder")
            flat_t = glm_split_fused(flat_t)
            tree, _ = torch_to_tree(flat_t, llm_rules())
            if tree:
                variables["te"] = _merge_imported(variables["te"], tree, "cogview4 glm te")
        elif "te" in variables:
            print("cogview4 import WARNING: no text_encoder/ subdir — the "
                  "GLM-4 text tower stays RANDOM-INIT (conditioning will be "
                  "garbage; copy text_encoder/ from the source checkpoint)")
    return variables


def glm_split_fused(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """transformers GlmModel fuses the swiglu gate/up into one
    ``mlp.gate_up_proj`` Linear — split rows back into gate_proj/up_proj so
    the shared llm_rules apply."""
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if ".mlp.gate_up_proj." in k:
            half = v.shape[0] // 2
            out[k.replace("gate_up_proj", "gate_proj")] = np.ascontiguousarray(v[:half])
            out[k.replace("gate_up_proj", "up_proj")] = np.ascontiguousarray(v[half:])
        else:
            out[k] = v
    return out
