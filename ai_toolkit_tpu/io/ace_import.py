"""ACE-Step 1.5 single-file checkpoint import.

The released AIO safetensors carries three prefixes
(``/root/reference/extensions_built_in/audio_models/ace_step/src/model.py:
1250-1340``):

- ``model.diffusion_model.`` -> AceStep15 (decoder DiT + condition encoder),
- ``vae.``                   -> OobleckVAE (weight-norm convs folded here),
- ``text_encoders.qwen3_06b.transformer.model.`` -> Qwen3-0.6B embedding TE.

``infer_ace_config`` reads the dims straight off the tensors like the
reference's ``infer_dit_config``, so 1.5 and XL files both load.
"""

from __future__ import annotations

import re

import numpy as np

from ai_toolkit_tpu.io.torch_import import torch_to_tree


def infer_ace_config(dit_sd: dict) -> dict:
    """Dims from tensor shapes (reference infer_dit_config)."""
    hidden = dit_sd["decoder.condition_embedder.bias"].shape[0]
    eh = dit_sd["decoder.condition_embedder.weight"].shape[1]
    inter = dit_sd["decoder.layers.0.mlp.gate_proj.weight"].shape[0]
    head_dim = dit_sd["decoder.layers.0.self_attn.q_norm.weight"].shape[0]
    heads = dit_sd["decoder.layers.0.self_attn.q_proj.weight"].shape[0] // head_dim
    kv = dit_sd["decoder.layers.0.self_attn.k_proj.weight"].shape[0] // head_dim
    n_dit = 1 + max(
        int(m.group(1)) for k in dit_sd
        if (m := re.match(r"decoder\.layers\.(\d+)\.", k))
    )
    n_lyric = 1 + max(
        (int(m.group(1)) for k in dit_sd
         if (m := re.match(r"encoder\.lyric_encoder\.layers\.(\d+)\.", k))),
        default=-1,
    )
    n_timbre = 1 + max(
        (int(m.group(1)) for k in dit_sd
         if (m := re.match(r"encoder\.timbre_encoder\.layers\.(\d+)\.", k))),
        default=-1,
    )
    w_in = dit_sd["decoder.proj_in.1.weight"]  # [hidden, in_ch, patch]
    w_out = dit_sd["decoder.proj_out.1.weight"]  # [hidden, out_ch, patch]
    enc_inter = dit_sd.get("encoder.lyric_encoder.layers.0.mlp.gate_proj.weight")
    enc_q = dit_sd.get("encoder.lyric_encoder.layers.0.self_attn.q_proj.weight")
    enc_k = dit_sd.get("encoder.lyric_encoder.layers.0.self_attn.k_proj.weight")
    return dict(
        hidden=hidden,
        enc_hidden=eh,
        inter=inter,
        head_dim=head_dim,
        heads=heads,
        kv=kv,
        n_dit=n_dit,
        n_lyric=n_lyric,
        n_timbre=n_timbre,
        in_ch=int(w_in.shape[1]),
        out_ch=int(w_out.shape[1]),
        patch=int(w_in.shape[2]),
        text_dim=int(dit_sd["encoder.text_projector.weight"].shape[1]),
        timbre_dim=int(dit_sd["encoder.timbre_encoder.embed_tokens.weight"].shape[1]),
        enc_inter=int(enc_inter.shape[0]) if enc_inter is not None else None,
        enc_heads=int(enc_q.shape[0]) // head_dim if enc_q is not None else None,
        enc_kv=int(enc_k.shape[0]) // head_dim if enc_k is not None else None,
    )


def _enc_stack_rules(prefix: str, dst_prefix: str) -> list:
    p = rf"{prefix}\.layers\.(\d+)\."
    d = dst_prefix + "/layers_{0}"
    rules = [
        (p + r"self_attn\.q_proj\.weight", d + "/self_attn/q_proj/kernel", "linear"),
        (p + r"self_attn\.k_proj\.weight", d + "/self_attn/k_proj/kernel", "linear"),
        (p + r"self_attn\.v_proj\.weight", d + "/self_attn/v_proj/kernel", "linear"),
        (p + r"self_attn\.o_proj\.weight", d + "/self_attn/o_proj/kernel", "linear"),
        (p + r"self_attn\.q_norm\.weight", d + "/self_attn/q_norm/weight", "direct"),
        (p + r"self_attn\.k_norm\.weight", d + "/self_attn/k_norm/weight", "direct"),
        (p + r"input_layernorm\.weight", d + "/input_layernorm/weight", "direct"),
        (p + r"post_attention_layernorm\.weight", d + "/post_attention_layernorm/weight", "direct"),
        (p + r"mlp\.gate_proj\.weight", d + "/mlp/gate_proj/kernel", "linear"),
        (p + r"mlp\.up_proj\.weight", d + "/mlp/up_proj/kernel", "linear"),
        (p + r"mlp\.down_proj\.weight", d + "/mlp/down_proj/kernel", "linear"),
    ]
    return rules


def ace_dit_rules() -> list:
    l = r"decoder\.layers\.(\d+)\."
    dl = "decoder/layers_{0}"
    rules = [
        # timestep embeds
        (r"decoder\.time_embed\.linear_1\.weight", "decoder/time_embed/linear_1/kernel", "linear"),
        (r"decoder\.time_embed\.linear_1\.bias", "decoder/time_embed/linear_1/bias", "direct"),
        (r"decoder\.time_embed\.linear_2\.weight", "decoder/time_embed/linear_2/kernel", "linear"),
        (r"decoder\.time_embed\.linear_2\.bias", "decoder/time_embed/linear_2/bias", "direct"),
        (r"decoder\.time_embed\.time_proj\.weight", "decoder/time_embed/time_proj/kernel", "linear"),
        (r"decoder\.time_embed\.time_proj\.bias", "decoder/time_embed/time_proj/bias", "direct"),
        (r"decoder\.time_embed_r\.linear_1\.weight", "decoder/time_embed_r/linear_1/kernel", "linear"),
        (r"decoder\.time_embed_r\.linear_1\.bias", "decoder/time_embed_r/linear_1/bias", "direct"),
        (r"decoder\.time_embed_r\.linear_2\.weight", "decoder/time_embed_r/linear_2/kernel", "linear"),
        (r"decoder\.time_embed_r\.linear_2\.bias", "decoder/time_embed_r/linear_2/bias", "direct"),
        (r"decoder\.time_embed_r\.time_proj\.weight", "decoder/time_embed_r/time_proj/kernel", "linear"),
        (r"decoder\.time_embed_r\.time_proj\.bias", "decoder/time_embed_r/time_proj/bias", "direct"),
        (r"decoder\.condition_embedder\.weight", "decoder/condition_embedder/kernel", "linear"),
        (r"decoder\.condition_embedder\.bias", "decoder/condition_embedder/bias", "direct"),
        # per-layer
        (l + r"self_attn_norm\.weight", dl + "/self_attn_norm/weight", "direct"),
        (l + r"cross_attn_norm\.weight", dl + "/cross_attn_norm/weight", "direct"),
        (l + r"mlp_norm\.weight", dl + "/mlp_norm/weight", "direct"),
        (l + r"scale_shift_table", dl + "/scale_shift_table", "direct"),
        (l + r"self_attn\.q_proj\.weight", dl + "/self_attn/q_proj/kernel", "linear"),
        (l + r"self_attn\.k_proj\.weight", dl + "/self_attn/k_proj/kernel", "linear"),
        (l + r"self_attn\.v_proj\.weight", dl + "/self_attn/v_proj/kernel", "linear"),
        (l + r"self_attn\.o_proj\.weight", dl + "/self_attn/o_proj/kernel", "linear"),
        (l + r"self_attn\.q_norm\.weight", dl + "/self_attn/q_norm/weight", "direct"),
        (l + r"self_attn\.k_norm\.weight", dl + "/self_attn/k_norm/weight", "direct"),
        (l + r"cross_attn\.q_proj\.weight", dl + "/cross_attn/q_proj/kernel", "linear"),
        (l + r"cross_attn\.k_proj\.weight", dl + "/cross_attn/k_proj/kernel", "linear"),
        (l + r"cross_attn\.v_proj\.weight", dl + "/cross_attn/v_proj/kernel", "linear"),
        (l + r"cross_attn\.o_proj\.weight", dl + "/cross_attn/o_proj/kernel", "linear"),
        (l + r"cross_attn\.q_norm\.weight", dl + "/cross_attn/q_norm/weight", "direct"),
        (l + r"cross_attn\.k_norm\.weight", dl + "/cross_attn/k_norm/weight", "direct"),
        (l + r"mlp\.gate_proj\.weight", dl + "/mlp/gate_proj/kernel", "linear"),
        (l + r"mlp\.up_proj\.weight", dl + "/mlp/up_proj/kernel", "linear"),
        (l + r"mlp\.down_proj\.weight", dl + "/mlp/down_proj/kernel", "linear"),
        # output head
        (r"decoder\.norm_out\.weight", "decoder/norm_out/weight", "direct"),
        (r"decoder\.scale_shift_table", "decoder/scale_shift_table", "direct"),
        # condition encoder
        (r"encoder\.text_projector\.weight", "encoder/text_projector/kernel", "linear"),
        (r"encoder\.lyric_encoder\.embed_tokens\.weight", "encoder/lyric_encoder/embed_tokens/kernel", "linear"),
        (r"encoder\.lyric_encoder\.embed_tokens\.bias", "encoder/lyric_encoder/embed_tokens/bias", "direct"),
        (r"encoder\.lyric_encoder\.norm\.weight", "encoder/lyric_encoder/norm/weight", "direct"),
        (r"encoder\.timbre_encoder\.embed_tokens\.weight", "encoder/timbre_encoder/embed_tokens/kernel", "linear"),
        (r"encoder\.timbre_encoder\.embed_tokens\.bias", "encoder/timbre_encoder/embed_tokens/bias", "direct"),
        (r"encoder\.timbre_encoder\.norm\.weight", "encoder/timbre_encoder/norm/weight", "direct"),
        (r"encoder\.timbre_encoder\.special_token", "encoder/timbre_encoder/special_token", "direct"),
        (r"null_condition_emb", "null_condition_emb", "direct"),
    ]
    rules += _enc_stack_rules(r"encoder\.lyric_encoder", "encoder/lyric_encoder")
    rules += _enc_stack_rules(r"encoder\.timbre_encoder", "encoder/timbre_encoder")
    return rules


def load_ace_dit(dit_sd: dict) -> tuple[dict, dict]:
    """AIO 'model.diffusion_model.'-stripped state dict -> (params, cfg_kw)."""
    cfg_kw = infer_ace_config(dit_sd)
    tree, unmatched = torch_to_tree(dit_sd, ace_dit_rules())
    # patchify convs need bespoke layouts (see AceDiT docstring)
    w_in = np.asarray(dit_sd["decoder.proj_in.1.weight"])  # [h, C, p]
    p = w_in.shape[2]
    tree.setdefault("decoder", {})
    tree["decoder"]["proj_in_kernel"] = np.ascontiguousarray(
        w_in.transpose(2, 1, 0).reshape(p * w_in.shape[1], w_in.shape[0])
    )
    tree["decoder"]["proj_in_bias"] = np.asarray(dit_sd["decoder.proj_in.1.bias"])
    w_out = np.asarray(dit_sd["decoder.proj_out.1.weight"])  # ConvT [h, out, p]
    tree["decoder"]["proj_out_kernel"] = np.ascontiguousarray(
        w_out.transpose(0, 2, 1).reshape(w_out.shape[0], p * w_out.shape[1])
    )
    tree["decoder"]["proj_out_bias"] = np.ascontiguousarray(
        np.tile(np.asarray(dit_sd["decoder.proj_out.1.bias"]), p)
    )
    leftovers = [
        k for k in unmatched
        if not k.startswith(("decoder.proj_in.", "decoder.proj_out.",
                             "tokenizer.", "detokenizer."))
    ]
    if leftovers:
        raise ValueError(f"ace dit import: {len(leftovers)} unmapped keys, "
                         f"first: {leftovers[:4]}")
    return tree, cfg_kw


def fold_weight_norm(sd: dict, prefix: str) -> np.ndarray:
    """torch parametrizations.weight_norm -> effective kernel:
    w = g * v / ||v||  (norm over all dims but 0)."""
    g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"], np.float32)
    v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def split_ace_checkpoint(flat: dict) -> tuple[dict, dict, dict]:
    """AIO file -> (dit_sd, vae_sd, te_sd) with prefixes stripped."""
    dit = {k.removeprefix("model.diffusion_model."): v for k, v in flat.items()
           if k.startswith("model.diffusion_model.")}
    vae = {k.removeprefix("vae."): v for k, v in flat.items()
           if k.startswith("vae.")}
    te_p = "text_encoders.qwen3_06b.transformer.model."
    te = {k.removeprefix(te_p): v for k, v in flat.items() if k.startswith(te_p)}
    return dit, vae, te


def _conv_fwd(sd: dict, prefix: str) -> dict:
    """Folded WNConv1d [out, in, k] -> flax WIO kernel (+bias)."""
    w = fold_weight_norm(sd, prefix)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    b = sd.get(f"{prefix}.bias")
    if b is not None:
        out["bias"] = np.asarray(b, np.float32)
    return out


def _conv_t(sd: dict, prefix: str) -> dict:
    """Folded WNConvT1d [in, out, k] -> the forward-conv-equivalent kernel
    used by models.ace_vae._conv1d_transpose: flip k, layout [k, in, out]."""
    w = fold_weight_norm(sd, prefix)
    out = {"kernel": np.ascontiguousarray(np.flip(w, -1).transpose(2, 0, 1))}
    b = sd.get(f"{prefix}.bias")
    if b is not None:
        out["bias"] = np.asarray(b, np.float32)
    return out


def _snake(sd: dict, prefix: str) -> dict:
    return {"alpha": np.asarray(sd[f"{prefix}.alpha"], np.float32),
            "beta": np.asarray(sd[f"{prefix}.beta"], np.float32)}


def _res_unit(sd: dict, prefix: str) -> dict:
    # ResUnit.layers: 0 SnakeBeta, 1 WNConv(7, dilated), 2 SnakeBeta, 3 WNConv(1)
    return {
        "snake_0": _snake(sd, f"{prefix}.layers.0"),
        "conv_0": _conv_fwd(sd, f"{prefix}.layers.1"),
        "snake_1": _snake(sd, f"{prefix}.layers.2"),
        "conv_1": _conv_fwd(sd, f"{prefix}.layers.3"),
    }


def load_ace_vae(vae_sd: dict, n_blocks: int) -> dict:
    """'vae.'-stripped state dict -> AceOobleckVAE params (weight norm folded).

    Reference module indexing (_SeqWrap Sequentials, model.py:1054-1090):
    encoder.layers: [conv_in, EncBlock*n, SnakeBeta, conv_out];
    decoder.layers: [conv_in, DecBlock*n, SnakeBeta, conv_out(no bias)];
    EncBlock.layers: [ResUnit(1), ResUnit(3), ResUnit(9), SnakeBeta, down];
    DecBlock.layers: [SnakeBeta, up(T), ResUnit(1), ResUnit(3), ResUnit(9)].
    """
    tree: dict = {}
    tree["enc_in"] = _conv_fwd(vae_sd, "encoder.layers.0")
    for i in range(n_blocks):
        p = f"encoder.layers.{i + 1}"
        tree[f"enc_{i}"] = {
            "res_0": _res_unit(vae_sd, f"{p}.layers.0"),
            "res_1": _res_unit(vae_sd, f"{p}.layers.1"),
            "res_2": _res_unit(vae_sd, f"{p}.layers.2"),
            "snake": _snake(vae_sd, f"{p}.layers.3"),
            "down": _conv_fwd(vae_sd, f"{p}.layers.4"),
        }
    tree["enc_snake"] = _snake(vae_sd, f"encoder.layers.{n_blocks + 1}")
    tree["enc_out"] = _conv_fwd(vae_sd, f"encoder.layers.{n_blocks + 2}")
    tree["dec_in"] = _conv_fwd(vae_sd, "decoder.layers.0")
    for j in range(n_blocks):
        p = f"decoder.layers.{j + 1}"
        tree[f"dec_{j}"] = {
            "snake": _snake(vae_sd, f"{p}.layers.0"),
            "up": _conv_t(vae_sd, f"{p}.layers.1"),
            "res_0": _res_unit(vae_sd, f"{p}.layers.2"),
            "res_1": _res_unit(vae_sd, f"{p}.layers.3"),
            "res_2": _res_unit(vae_sd, f"{p}.layers.4"),
        }
    tree["dec_snake"] = _snake(vae_sd, f"decoder.layers.{n_blocks + 1}")
    tree["dec_out"] = _conv_fwd(vae_sd, f"decoder.layers.{n_blocks + 2}")
    return tree


def infer_oobleck_config(vae_sd: dict) -> dict:
    """Oobleck dims from tensor shapes: channels/c_mults from block conv
    channel counts, strides from downsample kernel widths (k = 2*stride)."""
    w_in = vae_sd["encoder.layers.0.parametrizations.weight.original1"]
    channels = int(w_in.shape[0])
    in_ch = int(w_in.shape[1])
    n_blocks = 0
    while f"encoder.layers.{n_blocks + 1}.layers.4.parametrizations.weight.original1" in vae_sd:
        n_blocks += 1
    c_mults, strides = [], []
    for i in range(n_blocks):
        w = vae_sd[f"encoder.layers.{i + 1}.layers.4.parametrizations.weight.original1"]
        c_mults.append(int(w.shape[0]) // channels)
        strides.append(int(w.shape[2]) // 2)
    w_out = vae_sd[f"encoder.layers.{n_blocks + 2}.parametrizations.weight.original1"]
    return dict(in_ch=in_ch, channels=channels, latent_dim=int(w_out.shape[0]) // 2,
                c_mults=tuple(c_mults), strides=tuple(strides))
