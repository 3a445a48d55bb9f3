"""LDM/SGM single-file checkpoint interop for the sd family.

The dominant distribution format for sd1/sd2/sdxl is the single safetensors
(or pickled .ckpt) file with ``model.diffusion_model.*`` (UNet),
``first_stage_model.*`` (VAE) and ``cond_stage_model.*`` /
``conditioner.embedders.N.*`` (text encoder) prefixes. The reference converts
these with literal key tables (``toolkit/kohya_model_util.py`` +
``toolkit/keymaps/stable_diffusion_*.json`` + ``toolkit/saving.py:22-139``);
here the same mapping is computed per-key, so both directions share one
source of truth and arbitrary block counts (tiny test configs) work too.

Import: LDM flat -> per-component diffusers-layout flats -> the existing
``sd_import`` rules. Export: ``tree_to_torch`` over the same rules -> inverse
renames -> one LDM flat (A1111/Comfy-loadable).
"""

from __future__ import annotations

import os
import re

import numpy as np

# ---------------------------------------------------------------------------
# UNet: model.diffusion_model.*  <->  diffusers UNet2DConditionModel
# ---------------------------------------------------------------------------

# resnet-internal renames (ldm, diffusers)
_RES_PARTS = [
    ("in_layers.0.", "norm1."),
    ("in_layers.2.", "conv1."),
    ("emb_layers.1.", "time_emb_proj."),
    ("out_layers.0.", "norm2."),
    ("out_layers.3.", "conv2."),
    ("skip_connection.", "conv_shortcut."),
]

_TOP_LEVEL = [
    ("time_embed.0.", "time_embedding.linear_1."),
    ("time_embed.2.", "time_embedding.linear_2."),
    ("label_emb.0.0.", "add_embedding.linear_1."),
    ("label_emb.0.2.", "add_embedding.linear_2."),
    ("input_blocks.0.0.", "conv_in."),
    ("out.0.", "conv_norm_out."),
    ("out.2.", "conv_out."),
]


def _res_to_diffusers(rest: str) -> str:
    for ldm, dif in _RES_PARTS:
        if rest.startswith(ldm):
            return dif + rest[len(ldm):]
    raise KeyError(f"unexpected LDM resnet param: {rest}")


def _res_to_ldm(rest: str) -> str:
    for ldm, dif in _RES_PARTS:
        if rest.startswith(dif):
            return ldm + rest[len(dif):]
    raise KeyError(f"unexpected diffusers resnet param: {rest}")


def unet_ldm_to_diffusers_key(key: str, layers_per_block: int = 2) -> str | None:
    """One UNet key, LDM -> diffusers. Returns None for keys diffusers drops."""
    L = layers_per_block + 1
    for ldm, dif in _TOP_LEVEL:
        if key.startswith(ldm):
            return dif + key[len(ldm):]
    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        i, mod, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        blk, layer = (i - 1) // L, (i - 1) % L
        if mod == 0:
            if rest.startswith("op."):  # Downsample2D
                return f"down_blocks.{blk}.downsamplers.0.conv.{rest[3:]}"
            return f"down_blocks.{blk}.resnets.{layer}.{_res_to_diffusers(rest)}"
        return f"down_blocks.{blk}.attentions.{layer}.{rest}"
    m = re.match(r"middle_block\.(\d+)\.(.+)", key)
    if m:
        mod, rest = int(m.group(1)), m.group(2)
        if mod == 1:
            return f"mid_block.attentions.0.{rest}"
        return f"mid_block.resnets.{0 if mod == 0 else 1}.{_res_to_diffusers(rest)}"
    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", key)
    if m:
        i, mod, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        blk, layer = i // L, i % L
        if mod == 0:
            return f"up_blocks.{blk}.resnets.{layer}.{_res_to_diffusers(rest)}"
        if rest.startswith("conv."):  # Upsample2D (module 1 or 2)
            return f"up_blocks.{blk}.upsamplers.0.{rest}"
        return f"up_blocks.{blk}.attentions.{layer}.{rest}"
    return None  # e.g. position embeddings some forks add


def unet_diffusers_to_ldm_key(key: str, layers_per_block: int = 2,
                              num_levels: int = 4,
                              attn_levels: tuple[int, ...] = ()) -> str | None:
    """One UNet key, diffusers -> LDM. ``attn_levels`` marks which up blocks
    carry attention (decides whether the upsampler is module 1 or 2)."""
    L = layers_per_block + 1
    for ldm, dif in _TOP_LEVEL:
        if key.startswith(dif):
            return ldm + key[len(dif):]
    m = re.match(r"down_blocks\.(\d+)\.(resnets|attentions|downsamplers)\.(\d+)\.(.+)", key)
    if m:
        blk, kind, layer, rest = int(m.group(1)), m.group(2), int(m.group(3)), m.group(4)
        if kind == "downsamplers":
            return f"input_blocks.{blk * L + L}.0.op.{rest[5:]}"  # strip 'conv.'
        i = 1 + blk * L + layer
        if kind == "resnets":
            return f"input_blocks.{i}.0.{_res_to_ldm(rest)}"
        return f"input_blocks.{i}.1.{rest}"
    m = re.match(r"mid_block\.(resnets|attentions)\.(\d+)\.(.+)", key)
    if m:
        kind, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        if kind == "attentions":
            return f"middle_block.1.{rest}"
        return f"middle_block.{0 if idx == 0 else 2}.{_res_to_ldm(rest)}"
    m = re.match(r"up_blocks\.(\d+)\.(resnets|attentions|upsamplers)\.(\d+)\.(.+)", key)
    if m:
        blk, kind, layer, rest = int(m.group(1)), m.group(2), int(m.group(3)), m.group(4)
        if kind == "upsamplers":
            mod = 2 if blk in attn_levels else 1
            return f"output_blocks.{blk * L + L - 1}.{mod}.{rest}"
        i = blk * L + layer
        if kind == "resnets":
            return f"output_blocks.{i}.0.{_res_to_ldm(rest)}"
        return f"output_blocks.{i}.1.{rest}"
    return None


# ---------------------------------------------------------------------------
# VAE: first_stage_model.*  <->  diffusers AutoencoderKL
# ---------------------------------------------------------------------------

_VAE_ATTN = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0",
             "norm": "group_norm"}


def vae_ldm_to_diffusers(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """first_stage_model-stripped LDM VAE flat -> diffusers AutoencoderKL flat
    (attention q/k/v/proj_out 1x1 convs become linears)."""
    n_up = 1 + max((int(m.group(1)) for k in flat
                    if (m := re.match(r"decoder\.up\.(\d+)\.", k))), default=-1)
    out: dict[str, np.ndarray] = {}
    for key, v in flat.items():
        k = key
        m = re.match(r"(encoder|decoder)\.(.+)", k)
        if not m:
            if k.startswith(("quant_conv.", "post_quant_conv.")):
                out[k] = v
            continue
        side, rest = m.groups()
        rest = rest.replace("nin_shortcut.", "conv_shortcut.")
        if rest.startswith("norm_out."):
            out[f"{side}.conv_norm_out.{rest[9:]}"] = v
            continue
        am = re.match(r"mid\.attn_1\.(\w+)\.(weight|bias)", rest)
        if am:
            name, wb = am.groups()
            vv = v
            if wb == "weight" and v.ndim == 4:  # [C, C, 1, 1] conv -> linear
                vv = np.ascontiguousarray(v[:, :, 0, 0])
            out[f"{side}.mid_block.attentions.0.{_VAE_ATTN[name]}.{wb}"] = vv
            continue
        bm = re.match(r"mid\.block_(\d)\.(.+)", rest)
        if bm:
            out[f"{side}.mid_block.resnets.{int(bm.group(1)) - 1}.{bm.group(2)}"] = v
            continue
        dm = re.match(r"down\.(\d+)\.block\.(\d+)\.(.+)", rest)
        if dm:
            out[f"{side}.down_blocks.{dm.group(1)}.resnets.{dm.group(2)}.{dm.group(3)}"] = v
            continue
        dm = re.match(r"down\.(\d+)\.downsample\.conv\.(.+)", rest)
        if dm:
            out[f"{side}.down_blocks.{dm.group(1)}.downsamplers.0.conv.{dm.group(2)}"] = v
            continue
        um = re.match(r"up\.(\d+)\.block\.(\d+)\.(.+)", rest)
        if um:  # LDM decoder.up is resolution-indexed; diffusers runs reversed
            out[f"{side}.up_blocks.{n_up - 1 - int(um.group(1))}.resnets.{um.group(2)}.{um.group(3)}"] = v
            continue
        um = re.match(r"up\.(\d+)\.upsample\.conv\.(.+)", rest)
        if um:
            out[f"{side}.up_blocks.{n_up - 1 - int(um.group(1))}.upsamplers.0.conv.{um.group(2)}"] = v
            continue
        out[f"{side}.{rest}"] = v  # conv_in / conv_out
    return out


def vae_diffusers_to_ldm(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    n_up = 1 + max((int(m.group(1)) for k in flat
                    if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))), default=-1)
    inv_attn = {v: k for k, v in _VAE_ATTN.items()}
    out: dict[str, np.ndarray] = {}
    for key, v in flat.items():
        m = re.match(r"(encoder|decoder)\.(.+)", key)
        if not m:
            out[key] = v
            continue
        side, rest = m.groups()
        if rest.startswith("conv_norm_out."):
            out[f"{side}.norm_out.{rest[14:]}"] = v
            continue
        am = re.match(r"mid_block\.attentions\.0\.(to_q|to_k|to_v|to_out\.0|group_norm)\.(weight|bias)", rest)
        if am:
            name, wb = am.groups()
            vv = v
            if wb == "weight" and v.ndim == 2:
                vv = np.ascontiguousarray(v[:, :, None, None])
            out[f"{side}.mid.attn_1.{inv_attn[name]}.{wb}"] = vv
            continue
        bm = re.match(r"mid_block\.resnets\.(\d)\.(.+)", rest)
        if bm:
            rr = bm.group(2).replace("conv_shortcut.", "nin_shortcut.")
            out[f"{side}.mid.block_{int(bm.group(1)) + 1}.{rr}"] = v
            continue
        dm = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.+)", rest)
        if dm:
            rr = dm.group(3).replace("conv_shortcut.", "nin_shortcut.")
            out[f"{side}.down.{dm.group(1)}.block.{dm.group(2)}.{rr}"] = v
            continue
        dm = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.+)", rest)
        if dm:
            out[f"{side}.down.{dm.group(1)}.downsample.conv.{dm.group(2)}"] = v
            continue
        um = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.+)", rest)
        if um:
            rr = um.group(3).replace("conv_shortcut.", "nin_shortcut.")
            out[f"{side}.up.{n_up - 1 - int(um.group(1))}.block.{um.group(2)}.{rr}"] = v
            continue
        um = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.+)", rest)
        if um:
            out[f"{side}.up.{n_up - 1 - int(um.group(1))}.upsample.conv.{um.group(2)}"] = v
            continue
        out[f"{side}.{rest}"] = v
    return out


# ---------------------------------------------------------------------------
# Text encoders: open_clip  <->  HF CLIPTextModel(WithProjection)
# ---------------------------------------------------------------------------

_OC_PARTS = [
    (".ln_1.", ".layer_norm1."), (".ln_2.", ".layer_norm2."),
    (".mlp.c_fc.", ".mlp.fc1."), (".mlp.c_proj.", ".mlp.fc2."),
    (".attn.out_proj.", ".self_attn.out_proj."),
]


def openclip_to_hf(flat: dict[str, np.ndarray],
                   drop_layers_from: int | None = None) -> dict[str, np.ndarray]:
    """open_clip text-tower flat (prefix stripped) -> HF CLIP layout.

    sd2 stores a 24-layer tower but uses the penultimate output — the
    reference drops resblocks.23 entirely (kohya_model_util.py:938-941);
    pass ``drop_layers_from=23`` there. ``text_projection`` (used by sdxl's
    second TE for pooled embeds) maps to a transposed Linear weight.
    """
    out: dict[str, np.ndarray] = {}
    for key, v in flat.items():
        if key == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = v
        elif key == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = v
        elif key.startswith("ln_final."):
            out["text_model.final_layer_norm." + key[9:]] = v
        elif key == "text_projection":
            # open_clip: pooled @ W [width, embed]; HF Linear weight [embed, width]
            out["text_projection.weight"] = np.ascontiguousarray(v.T)
        elif key == "logit_scale" or key.endswith("position_ids"):
            continue
        elif key.startswith("transformer.resblocks."):
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", key)
            i, rest = int(m.group(1)), m.group(2)
            if drop_layers_from is not None and i >= drop_layers_from:
                continue
            base = f"text_model.encoder.layers.{i}"
            if rest.startswith("attn.in_proj_"):
                wb = rest[len("attn.in_proj_"):]  # 'weight' | 'bias'
                q, k, vv = np.split(v, 3, axis=0)
                for name, t in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                    out[f"{base}.self_attn.{name}.{wb}"] = np.ascontiguousarray(t)
                continue
            mapped = "." + rest
            for oc, hf in _OC_PARTS:
                if mapped.startswith(oc):
                    mapped = hf + mapped[len(oc):]
                    break
            out[base + mapped] = v
    return out


def hf_to_openclip(flat: dict[str, np.ndarray],
                   fabricate_last_layer: bool = False) -> dict[str, np.ndarray]:
    """Inverse of openclip_to_hf. ``fabricate_last_layer`` recreates the sd2
    resblocks.23 the import dropped (cloned from 22, like the reference's
    make_dummy_weights, kohya_model_util.py:1330-1339) plus dummy
    text_projection/logit_scale so A1111-style loaders find a full tower."""
    out: dict[str, np.ndarray] = {}
    qkv: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    n_layers = -1
    width = None
    for key, v in flat.items():
        if key == "text_model.embeddings.position_embedding.weight":
            out["positional_embedding"] = v
        elif key == "text_model.embeddings.token_embedding.weight":
            out["token_embedding.weight"] = v
        elif key.startswith("text_model.final_layer_norm."):
            out["ln_final." + key[len("text_model.final_layer_norm."):]] = v
        elif key == "text_projection.weight":
            out["text_projection"] = np.ascontiguousarray(v.T)
        elif key.startswith("text_model.encoder.layers."):
            m = re.match(r"text_model\.encoder\.layers\.(\d+)\.(.+)", key)
            i, rest = int(m.group(1)), m.group(2)
            n_layers = max(n_layers, i + 1)
            am = re.match(r"self_attn\.(q|k|v)_proj\.(weight|bias)", rest)
            if am:
                qkv.setdefault((i, am.group(2)), {})[am.group(1)] = v
                if am.group(2) == "weight":
                    width = v.shape[0]
                continue
            mapped = "." + rest
            for oc, hf in _OC_PARTS:
                if mapped.startswith(hf):
                    mapped = oc + mapped[len(hf):]
                    break
            out[f"transformer.resblocks.{i}{mapped}"] = v
    for (i, wb), parts in qkv.items():
        out[f"transformer.resblocks.{i}.attn.in_proj_{wb}"] = np.ascontiguousarray(
            np.concatenate([parts["q"], parts["k"], parts["v"]], axis=0))
    if fabricate_last_layer and n_layers > 0:
        src = f"transformer.resblocks.{n_layers - 1}."
        dst = f"transformer.resblocks.{n_layers}."
        for k in list(out):
            if k.startswith(src):
                out[dst + k[len(src):]] = out[k].copy()
        if "text_projection" not in out and width is not None:
            out["text_projection"] = np.ones((width, width), out["token_embedding.weight"].dtype)
        out.setdefault("logit_scale", np.asarray(1.0, np.float32))
    return out


# ---------------------------------------------------------------------------
# Whole-checkpoint split / merge
# ---------------------------------------------------------------------------

_UNET_P = "model.diffusion_model."
_VAE_P = "first_stage_model."


def split_ldm_checkpoint(flat: dict[str, np.ndarray], layers_per_block: int = 2,
                         sd2_clip_layers: int = 23,
                         ) -> dict[str, dict[str, np.ndarray]]:
    """LDM single-file flat -> {'unet', 'vae', 'clip'[, 'clip2']} diffusers
    flats. Detects sd1 (cond_stage_model.transformer), sd2
    (cond_stage_model.model, penultimate), sdxl (conditioner.embedders.0+1)
    and the sdxl refiner (conditioner.embedders.0.model only)."""
    unet_ldm, vae_ldm = {}, {}
    clip_hf: dict[str, np.ndarray] = {}
    oc_sd2, oc_te0, oc_te1, clipl_xl = {}, {}, {}, {}
    for k, v in flat.items():
        if k.startswith(_UNET_P):
            unet_ldm[k[len(_UNET_P):]] = v
        elif k.startswith(_VAE_P):
            vae_ldm[k[len(_VAE_P):]] = v
        elif k.startswith("cond_stage_model.transformer."):
            clip_hf[k[len("cond_stage_model.transformer."):]] = v
        elif k.startswith("cond_stage_model.model."):
            oc_sd2[k[len("cond_stage_model.model."):]] = v
        elif k.startswith("conditioner.embedders.0.transformer."):
            clipl_xl[k[len("conditioner.embedders.0.transformer."):]] = v
        elif k.startswith("conditioner.embedders.0.model."):
            oc_te0[k[len("conditioner.embedders.0.model."):]] = v
        elif k.startswith("conditioner.embedders.1.model."):
            oc_te1[k[len("conditioner.embedders.1.model."):]] = v

    comps: dict[str, dict[str, np.ndarray]] = {}
    unet = {}
    for k, v in unet_ldm.items():
        nk = unet_ldm_to_diffusers_key(k, layers_per_block)
        if nk is not None:
            unet[nk] = v
    if unet:
        comps["unet"] = unet
    if vae_ldm:
        comps["vae"] = vae_ldm_to_diffusers(vae_ldm)
    if clip_hf:  # sd1: already HF text_model.* layout
        comps["clip"] = {k: v for k, v in clip_hf.items()
                         if not k.endswith("position_ids")}
    if clipl_xl:  # sdxl first TE (CLIP-L, HF layout in-checkpoint)
        comps["clip"] = {k: v for k, v in clipl_xl.items()
                         if not k.endswith("position_ids")}
    if oc_sd2:
        # sd2 uses the penultimate layer: the stored tower has one more
        # resblock than the HF text encoder (24 vs 23 at full size)
        comps["clip"] = openclip_to_hf(oc_sd2, drop_layers_from=sd2_clip_layers)
    if oc_te1:
        comps["clip2"] = openclip_to_hf(oc_te1)
    if oc_te0:  # refiner: OpenCLIP-G is the only tower, our component 'clip2'
        comps["clip2"] = openclip_to_hf(oc_te0)
    return comps


def is_ldm_checkpoint(flat_or_keys) -> bool:
    return any(str(k).startswith(_UNET_P) for k in flat_or_keys)


def _load_single_file(path: str) -> dict[str, np.ndarray]:
    if path.endswith((".safetensors", ".sft")):
        from safetensors import safe_open

        with safe_open(path, "np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}
    import torch  # .ckpt pickle fallback

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("state_dict", sd)
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items() if hasattr(v, "numpy")}


def load_ldm_checkpoint(path: str, model) -> dict:
    """Single LDM file -> model variables (via the sd_import rule lists)."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.sd_import import clip_rules, unet_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    flat = _load_single_file(path)
    if not is_ldm_checkpoint(flat):
        raise ValueError(
            f"'{path}' is not an LDM single-file checkpoint (no "
            f"model.diffusion_model.* keys) — pass an HF-layout directory instead")
    comps = split_ldm_checkpoint(flat, model.unet_config.layers_per_block,
                                 sd2_clip_layers=model.clip_config.num_layers)
    variables = model.init_variables(jax.random.key(0))
    rule_map = {
        "unet": unet_rules(len(model.unet_config.block_out_channels)),
        "vae": vae_rules(len(model.vae_config.channel_multipliers),
                         model.vae_config.layers_per_block),
        "clip": clip_rules(),
        "clip2": clip_rules(),
    }
    for comp, cflat in comps.items():
        if comp not in variables:
            continue
        tree, unmatched = torch_to_tree(cflat, rule_map[comp])
        if unmatched:
            print(f"ldm import [{comp}]: {len(unmatched)} unmatched "
                  f"(e.g. {unmatched[:3]})")
        if tree:
            variables[comp] = _merge_imported(variables[comp], tree, comp)
    return variables


def export_ldm_checkpoint(model, variables: dict, out_path: str,
                          dtype=np.float16) -> str:
    """Model variables -> one LDM-layout safetensors file (A1111/Comfy
    loadable; reference ``toolkit/saving.py:22-139`` via keymaps)."""
    import jax

    from safetensors.numpy import save_file

    from ai_toolkit_tpu.io.sd_import import clip_rules, unet_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import tree_to_torch

    ucfg = model.unet_config
    L = ucfg.layers_per_block
    n_levels = len(ucfg.block_out_channels)
    # which up levels have attention (decides upsampler module index): our
    # transformer_layers tuple is down-ordered; up level b mirrors level
    # n-1-b of the down path
    attn_levels = tuple(
        b for b in range(n_levels)
        if ucfg.transformer_layers[n_levels - 1 - b] > 0
    )
    arch = (model.config.arch or "sd1").lower()
    flat: dict[str, np.ndarray] = {}

    def np_tree(comp):
        return jax.tree.map(np.asarray, variables[comp])

    if "unet" in variables:
        dif = tree_to_torch(np_tree("unet"), unet_rules(n_levels))
        for k, v in dif.items():
            nk = unet_diffusers_to_ldm_key(k, L, n_levels, attn_levels)
            if nk is not None:
                flat[_UNET_P + nk] = v
    if "vae" in variables:
        dif = tree_to_torch(np_tree("vae"), vae_rules(
            len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block))
        for k, v in vae_diffusers_to_ldm(dif).items():
            flat[_VAE_P + k] = v
    is_xl = arch.startswith(("sdxl", "ssd_refiner"))
    is_refiner = "refiner" in arch
    if "clip" in variables and not is_refiner:
        dif = tree_to_torch(np_tree("clip"), clip_rules())
        if is_xl:
            for k, v in dif.items():
                flat[f"conditioner.embedders.0.transformer.{k}"] = v
        elif arch == "sd2":
            for k, v in hf_to_openclip(dif, fabricate_last_layer=True).items():
                flat[f"cond_stage_model.model.{k}"] = v
        else:
            for k, v in dif.items():
                flat[f"cond_stage_model.transformer.{k}"] = v
    if "clip2" in variables:
        dif = tree_to_torch(np_tree("clip2"), clip_rules())
        pfx = ("conditioner.embedders.0.model." if is_refiner
               else "conditioner.embedders.1.model.")
        for k, v in hf_to_openclip(dif).items():
            flat[pfx + k] = v
    flat = {k: np.ascontiguousarray(np.asarray(v).astype(dtype))
            for k, v in flat.items()}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_file(flat, out_path, metadata={"software": "ai_toolkit_tpu", "format": "pt"})
    return out_path
