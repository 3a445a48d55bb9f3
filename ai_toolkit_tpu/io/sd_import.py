"""SD-family checkpoint import: diffusers-layout safetensors -> our trees.

Covers UNet2DConditionModel, AutoencoderKL, and transformers CLIPTextModel
key layouts (HF directory structure: unet/, vae/, text_encoder/). The
reference handles the same conversions via ``kohya_model_util.py`` + JSON
keymaps; here it's the rule machinery in ``torch_import.py``.
"""

from __future__ import annotations

import os

import numpy as np

from ai_toolkit_tpu.io.torch_import import Rule, load_safetensors_dir, torch_to_tree


def unet_rules(num_levels: int = 4) -> list[Rule]:
    rules: list[Rule] = [
        (r"conv_in\.weight", "conv_in/kernel", "conv2d"),
        (r"conv_in\.bias", "conv_in/bias", "direct"),
        (r"conv_out\.weight", "conv_out/kernel", "conv2d"),
        (r"conv_out\.bias", "conv_out/bias", "direct"),
        (r"conv_norm_out\.weight", "norm_out/scale", "direct"),
        (r"conv_norm_out\.bias", "norm_out/bias", "direct"),
        (r"time_embedding\.linear_1\.weight", "time_fc1/kernel", "linear"),
        (r"time_embedding\.linear_1\.bias", "time_fc1/bias", "direct"),
        (r"time_embedding\.linear_2\.weight", "time_fc2/kernel", "linear"),
        (r"time_embedding\.linear_2\.bias", "time_fc2/bias", "direct"),
        (r"add_embedding\.linear_1\.weight", "add_fc1/kernel", "linear"),
        (r"add_embedding\.linear_1\.bias", "add_fc1/bias", "direct"),
        (r"add_embedding\.linear_2\.weight", "add_fc2/kernel", "linear"),
        (r"add_embedding\.linear_2\.bias", "add_fc2/bias", "direct"),
    ]

    def res_rules(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.norm1\.weight", f"{dst}/norm1/scale", "direct"),
            (rf"{src}\.norm1\.bias", f"{dst}/norm1/bias", "direct"),
            (rf"{src}\.conv1\.weight", f"{dst}/conv1/kernel", "conv2d"),
            (rf"{src}\.conv1\.bias", f"{dst}/conv1/bias", "direct"),
            (rf"{src}\.time_emb_proj\.weight", f"{dst}/time_emb_proj/kernel", "linear"),
            (rf"{src}\.time_emb_proj\.bias", f"{dst}/time_emb_proj/bias", "direct"),
            (rf"{src}\.norm2\.weight", f"{dst}/norm2/scale", "direct"),
            (rf"{src}\.norm2\.bias", f"{dst}/norm2/bias", "direct"),
            (rf"{src}\.conv2\.weight", f"{dst}/conv2/kernel", "conv2d"),
            (rf"{src}\.conv2\.bias", f"{dst}/conv2/bias", "direct"),
            (rf"{src}\.conv_shortcut\.weight", f"{dst}/conv_shortcut/kernel", "conv2d"),
            (rf"{src}\.conv_shortcut\.bias", f"{dst}/conv_shortcut/bias", "direct"),
        ]

    def attn_rules(src: str, dst: str) -> list[Rule]:
        leaf = [
            ("attn1.to_q", "attn1_q", "linear"), ("attn1.to_k", "attn1_k", "linear"),
            ("attn1.to_v", "attn1_v", "linear"), ("attn1.to_out.0", "attn1_out", "linear"),
            ("attn2.to_q", "attn2_q", "linear"), ("attn2.to_k", "attn2_k", "linear"),
            ("attn2.to_v", "attn2_v", "linear"), ("attn2.to_out.0", "attn2_out", "linear"),
            ("ff.net.0.proj", "ff_in", "linear"), ("ff.net.2", "ff_out", "linear"),
        ]
        out: list[Rule] = [
            (rf"{src}\.norm\.weight", f"{dst}/norm/scale", "direct"),
            (rf"{src}\.norm\.bias", f"{dst}/norm/bias", "direct"),
            (rf"{src}\.proj_in\.weight", f"{dst}/proj_in/kernel", "linear_or_conv1x1"),
            (rf"{src}\.proj_in\.bias", f"{dst}/proj_in/bias", "direct"),
            (rf"{src}\.proj_out\.weight", f"{dst}/proj_out/kernel", "linear_or_conv1x1"),
            (rf"{src}\.proj_out\.bias", f"{dst}/proj_out/bias", "direct"),
        ]
        for tsrc, tdst, kind in leaf:
            out.append((
                rf"{src}\.transformer_blocks\.(\d+)\.{tsrc.replace('.', chr(92)+'.')}\.weight",
                f"{dst}/block_{{{src.count('(')}}}/{tdst}/kernel", kind,
            ))
            out.append((
                rf"{src}\.transformer_blocks\.(\d+)\.{tsrc.replace('.', chr(92)+'.')}\.bias",
                f"{dst}/block_{{{src.count('(')}}}/{tdst}/bias", kind.replace("linear", "direct"),
            ))
        for n in (1, 2, 3):
            out.append((rf"{src}\.transformer_blocks\.(\d+)\.norm{n}\.weight",
                        f"{dst}/block_{{{src.count('(')}}}/norm{n}/scale", "direct"))
            out.append((rf"{src}\.transformer_blocks\.(\d+)\.norm{n}\.bias",
                        f"{dst}/block_{{{src.count('(')}}}/norm{n}/bias", "direct"))
        return out

    for i in range(num_levels):
        for j in range(4):
            rules += res_rules(rf"down_blocks\.{i}\.resnets\.{j}", f"down_{i}_res_{j}")
            rules += attn_rules(rf"down_blocks\.{i}\.attentions\.{j}", f"down_{i}_attn_{j}")
            u = num_levels - 1 - i  # diffusers up index -> our channel level
            rules += res_rules(rf"up_blocks\.{i}\.resnets\.{j}", f"up_{u}_res_{j}")
            rules += attn_rules(rf"up_blocks\.{i}\.attentions\.{j}", f"up_{u}_attn_{j}")
        rules += [
            (rf"down_blocks\.{i}\.downsamplers\.0\.conv\.weight", f"down_{i}_downsample/kernel", "conv2d"),
            (rf"down_blocks\.{i}\.downsamplers\.0\.conv\.bias", f"down_{i}_downsample/bias", "direct"),
            (rf"up_blocks\.{i}\.upsamplers\.0\.conv\.weight", f"up_{num_levels-1-i}_upsample/kernel", "conv2d"),
            (rf"up_blocks\.{i}\.upsamplers\.0\.conv\.bias", f"up_{num_levels-1-i}_upsample/bias", "direct"),
        ]
    rules += res_rules(r"mid_block\.resnets\.0", "mid_res_0")
    rules += res_rules(r"mid_block\.resnets\.1", "mid_res_1")
    rules += attn_rules(r"mid_block\.attentions\.0", "mid_attn")
    return rules


def vae_rules(num_levels: int = 4, layers_per_block: int = 2) -> list[Rule]:
    rules: list[Rule] = [
        (r"quant_conv\.weight", "quant_conv/kernel", "conv2d"),
        (r"quant_conv\.bias", "quant_conv/bias", "direct"),
        (r"post_quant_conv\.weight", "post_quant_conv/kernel", "conv2d"),
        (r"post_quant_conv\.bias", "post_quant_conv/bias", "direct"),
    ]
    for side in ("encoder", "decoder"):
        rules += [
            (rf"{side}\.conv_in\.weight", f"{side}/conv_in/kernel", "conv2d"),
            (rf"{side}\.conv_in\.bias", f"{side}/conv_in/bias", "direct"),
            (rf"{side}\.conv_out\.weight", f"{side}/conv_out/kernel", "conv2d"),
            (rf"{side}\.conv_out\.bias", f"{side}/conv_out/bias", "direct"),
            (rf"{side}\.conv_norm_out\.weight", f"{side}/norm_out/scale", "direct"),
            (rf"{side}\.conv_norm_out\.bias", f"{side}/norm_out/bias", "direct"),
        ]
        for mid_i, mid_name in ((1, "mid_block_1"), (2, "mid_block_2")):
            for part, kind in (("norm1", "scale_pair"), ("conv1", "conv2d"),
                               ("norm2", "scale_pair"), ("conv2", "conv2d"),
                               ("conv_shortcut", "conv2d")):
                if kind == "scale_pair":
                    rules.append((rf"{side}\.mid_block\.resnets\.{mid_i-1}\.{part}\.weight",
                                  f"{side}/{mid_name}/{part}/scale", "direct"))
                    rules.append((rf"{side}\.mid_block\.resnets\.{mid_i-1}\.{part}\.bias",
                                  f"{side}/{mid_name}/{part}/bias", "direct"))
                else:
                    rules.append((rf"{side}\.mid_block\.resnets\.{mid_i-1}\.{part}\.weight",
                                  f"{side}/{mid_name}/{part}/kernel", kind))
                    rules.append((rf"{side}\.mid_block\.resnets\.{mid_i-1}\.{part}\.bias",
                                  f"{side}/{mid_name}/{part}/bias", "direct"))
        rules += [
            (rf"{side}\.mid_block\.attentions\.0\.group_norm\.weight", f"{side}/mid_attn/norm/scale", "direct"),
            (rf"{side}\.mid_block\.attentions\.0\.group_norm\.bias", f"{side}/mid_attn/norm/bias", "direct"),
            (rf"{side}\.mid_block\.attentions\.0\.to_q\.weight", f"{side}/mid_attn/q/kernel", "linear"),
            (rf"{side}\.mid_block\.attentions\.0\.to_q\.bias", f"{side}/mid_attn/q/bias", "direct"),
            (rf"{side}\.mid_block\.attentions\.0\.to_k\.weight", f"{side}/mid_attn/k/kernel", "linear"),
            (rf"{side}\.mid_block\.attentions\.0\.to_k\.bias", f"{side}/mid_attn/k/bias", "direct"),
            (rf"{side}\.mid_block\.attentions\.0\.to_v\.weight", f"{side}/mid_attn/v/kernel", "linear"),
            (rf"{side}\.mid_block\.attentions\.0\.to_v\.bias", f"{side}/mid_attn/v/bias", "direct"),
            (rf"{side}\.mid_block\.attentions\.0\.to_out\.0\.weight", f"{side}/mid_attn/proj_out/kernel", "linear"),
            (rf"{side}\.mid_block\.attentions\.0\.to_out\.0\.bias", f"{side}/mid_attn/proj_out/bias", "direct"),
        ]
    for i in range(num_levels):
        u = num_levels - 1 - i
        for j in range(layers_per_block + 1):
            for part in ("norm1", "norm2"):
                rules.append((rf"encoder\.down_blocks\.{i}\.resnets\.{j}\.{part}\.weight",
                              f"encoder/down_{i}_block_{j}/{part}/scale", "direct"))
                rules.append((rf"encoder\.down_blocks\.{i}\.resnets\.{j}\.{part}\.bias",
                              f"encoder/down_{i}_block_{j}/{part}/bias", "direct"))
                rules.append((rf"decoder\.up_blocks\.{i}\.resnets\.{j}\.{part}\.weight",
                              f"decoder/up_{u}_block_{j}/{part}/scale", "direct"))
                rules.append((rf"decoder\.up_blocks\.{i}\.resnets\.{j}\.{part}\.bias",
                              f"decoder/up_{u}_block_{j}/{part}/bias", "direct"))
            for part in ("conv1", "conv2", "conv_shortcut"):
                rules.append((rf"encoder\.down_blocks\.{i}\.resnets\.{j}\.{part}\.weight",
                              f"encoder/down_{i}_block_{j}/{part}/kernel", "conv2d"))
                rules.append((rf"encoder\.down_blocks\.{i}\.resnets\.{j}\.{part}\.bias",
                              f"encoder/down_{i}_block_{j}/{part}/bias", "direct"))
                rules.append((rf"decoder\.up_blocks\.{i}\.resnets\.{j}\.{part}\.weight",
                              f"decoder/up_{u}_block_{j}/{part}/kernel", "conv2d"))
                rules.append((rf"decoder\.up_blocks\.{i}\.resnets\.{j}\.{part}\.bias",
                              f"decoder/up_{u}_block_{j}/{part}/bias", "direct"))
        rules += [
            (rf"encoder\.down_blocks\.{i}\.downsamplers\.0\.conv\.weight",
             f"encoder/down_{i}_downsample/kernel", "conv2d"),
            (rf"encoder\.down_blocks\.{i}\.downsamplers\.0\.conv\.bias",
             f"encoder/down_{i}_downsample/bias", "direct"),
            (rf"decoder\.up_blocks\.{i}\.upsamplers\.0\.conv\.weight",
             f"decoder/up_{u}_upsample/kernel", "conv2d"),
            (rf"decoder\.up_blocks\.{i}\.upsamplers\.0\.conv\.bias",
             f"decoder/up_{u}_upsample/bias", "direct"),
        ]
    return rules


def clip_rules() -> list[Rule]:
    p = r"text_model\.encoder\.layers\.(\d+)\."
    return [
        (r"text_model\.embeddings\.token_embedding\.weight", "token_embedding", "direct"),
        (r"text_model\.embeddings\.position_embedding\.weight", "position_embedding", "direct"),
        (p + r"self_attn\.q_proj\.weight", "layer_{0}/q/kernel", "linear"),
        (p + r"self_attn\.q_proj\.bias", "layer_{0}/q/bias", "direct"),
        (p + r"self_attn\.k_proj\.weight", "layer_{0}/k/kernel", "linear"),
        (p + r"self_attn\.k_proj\.bias", "layer_{0}/k/bias", "direct"),
        (p + r"self_attn\.v_proj\.weight", "layer_{0}/v/kernel", "linear"),
        (p + r"self_attn\.v_proj\.bias", "layer_{0}/v/bias", "direct"),
        (p + r"self_attn\.out_proj\.weight", "layer_{0}/out/kernel", "linear"),
        (p + r"self_attn\.out_proj\.bias", "layer_{0}/out/bias", "direct"),
        (p + r"layer_norm1\.weight", "layer_{0}/ln1/scale", "direct"),
        (p + r"layer_norm1\.bias", "layer_{0}/ln1/bias", "direct"),
        (p + r"layer_norm2\.weight", "layer_{0}/ln2/scale", "direct"),
        (p + r"layer_norm2\.bias", "layer_{0}/ln2/bias", "direct"),
        (p + r"mlp\.fc1\.weight", "layer_{0}/fc1/kernel", "linear"),
        (p + r"mlp\.fc1\.bias", "layer_{0}/fc1/bias", "direct"),
        (p + r"mlp\.fc2\.weight", "layer_{0}/fc2/kernel", "linear"),
        (p + r"mlp\.fc2\.bias", "layer_{0}/fc2/bias", "direct"),
        (r"text_model\.final_layer_norm\.weight", "final_ln/scale", "direct"),
        (r"text_model\.final_layer_norm\.bias", "final_ln/bias", "direct"),
        (r"text_projection\.weight", "text_projection/kernel", "linear"),
    ]


def t5_rules(per_layer_bias: bool = False) -> list[Rule]:
    p = r"encoder\.block\.(\d+)\.layer\."
    if per_layer_bias:
        # UMT5: every block owns a relative-bias table
        bias_rules = [(p + r"0\.SelfAttention\.relative_attention_bias\.weight",
                       "layer_{0}/relative_attention_bias", "direct")]
    else:
        bias_rules = [(
            r"encoder\.block\.0\.layer\.0\.SelfAttention\.relative_attention_bias\.weight",
            "relative_attention_bias", "direct")]
    return [
        (r"shared\.weight", "token_embedding", "direct"),
        (r"encoder\.embed_tokens\.weight", "token_embedding", "direct"),
    ] + bias_rules + [
        (p + r"0\.SelfAttention\.q\.weight", "layer_{0}/q/kernel", "linear"),
        (p + r"0\.SelfAttention\.k\.weight", "layer_{0}/k/kernel", "linear"),
        (p + r"0\.SelfAttention\.v\.weight", "layer_{0}/v/kernel", "linear"),
        (p + r"0\.SelfAttention\.o\.weight", "layer_{0}/o/kernel", "linear"),
        (p + r"0\.layer_norm\.weight", "layer_{0}/ln1/scale", "direct"),
        (p + r"1\.DenseReluDense\.wi_0\.weight", "layer_{0}/wi_0/kernel", "linear"),
        (p + r"1\.DenseReluDense\.wi_1\.weight", "layer_{0}/wi_1/kernel", "linear"),
        (p + r"1\.DenseReluDense\.wo\.weight", "layer_{0}/wo/kernel", "linear"),
        (p + r"1\.layer_norm\.weight", "layer_{0}/ln2/scale", "direct"),
        (r"encoder\.final_layer_norm\.weight", "final_ln/scale", "direct"),
    ]


def load_sd_checkpoint(path: str, model) -> dict:
    """HF-layout dir (unet/, vae/, text_encoder/[, text_encoder_2/])."""
    import jax

    from ai_toolkit_tpu.io.flux_import import _merge_imported

    variables = model.init_variables(jax.random.key(0))
    n_levels = len(model.unet_config.block_out_channels)
    parts = [
        ("unet", "unet", unet_rules(n_levels)),
        ("vae", "vae", vae_rules(len(model.vae_config.channel_multipliers),
                                  model.vae_config.layers_per_block)),
        ("text_encoder", "clip", clip_rules()),
        ("text_encoder_2", "clip2", clip_rules()),
    ]
    # component-path overrides (reference ModelConfig unet_path / vae_path /
    # text_encoder_path): load that part from a different checkpoint dir
    overrides = {
        "unet": getattr(model.config, "unet_path", None),
        "vae": getattr(model.config, "vae_path", None),
        "clip": getattr(model.config, "text_encoder_path", None),
    }
    for subdir, comp, rules in parts:
        root = path
        ov = overrides.get(comp)
        if ov:
            if os.path.isdir(os.path.join(ov, subdir)):
                root = ov  # a full HF dir: use its matching subdir
            else:
                root, subdir = os.path.split(ov.rstrip("/"))
        d = os.path.join(root, subdir)
        if comp in variables and os.path.isdir(d):
            flat = load_safetensors_dir(root, subdir)
            tree, _ = torch_to_tree(flat, rules)
            if tree:
                variables[comp] = _merge_imported(variables[comp], tree, f"{comp}")
    return variables


def clip_vision_rules() -> list[Rule]:
    """HF CLIPVisionModelWithProjection -> our CLIPVisionModel tree."""
    p = r"vision_model\.encoder\.layers\.(\d+)\."
    return [
        (r"vision_model\.embeddings\.patch_embedding\.weight", "patch_embedding/kernel", "conv2d"),
        (r"vision_model\.embeddings\.class_embedding", "class_embedding", "direct"),
        (r"vision_model\.embeddings\.position_embedding\.weight", "position_embedding", "direct"),
        (r"vision_model\.pre_layrnorm\.weight", "pre_ln/scale", "direct"),
        (r"vision_model\.pre_layrnorm\.bias", "pre_ln/bias", "direct"),
        (p + r"self_attn\.q_proj\.weight", "layer_{0}/q/kernel", "linear"),
        (p + r"self_attn\.q_proj\.bias", "layer_{0}/q/bias", "direct"),
        (p + r"self_attn\.k_proj\.weight", "layer_{0}/k/kernel", "linear"),
        (p + r"self_attn\.k_proj\.bias", "layer_{0}/k/bias", "direct"),
        (p + r"self_attn\.v_proj\.weight", "layer_{0}/v/kernel", "linear"),
        (p + r"self_attn\.v_proj\.bias", "layer_{0}/v/bias", "direct"),
        (p + r"self_attn\.out_proj\.weight", "layer_{0}/out/kernel", "linear"),
        (p + r"self_attn\.out_proj\.bias", "layer_{0}/out/bias", "direct"),
        (p + r"layer_norm1\.weight", "layer_{0}/ln1/scale", "direct"),
        (p + r"layer_norm1\.bias", "layer_{0}/ln1/bias", "direct"),
        (p + r"layer_norm2\.weight", "layer_{0}/ln2/scale", "direct"),
        (p + r"layer_norm2\.bias", "layer_{0}/ln2/bias", "direct"),
        (p + r"mlp\.fc1\.weight", "layer_{0}/fc1/kernel", "linear"),
        (p + r"mlp\.fc1\.bias", "layer_{0}/fc1/bias", "direct"),
        (p + r"mlp\.fc2\.weight", "layer_{0}/fc2/kernel", "linear"),
        (p + r"mlp\.fc2\.bias", "layer_{0}/fc2/bias", "direct"),
        (r"vision_model\.post_layernorm\.weight", "post_ln/scale", "direct"),
        (r"vision_model\.post_layernorm\.bias", "post_ln/bias", "direct"),
        (r"visual_projection\.weight", "visual_projection/kernel", "linear"),
    ]


def clip_lora_key_map(tree: dict) -> dict[str, str]:
    """internal clip paths -> HF dotted module names (kohya te lora keys)."""
    import re as _re

    out: dict[str, str] = {}

    def walk(node, prefix):
        for k, v in node.items():
            if not isinstance(v, dict):
                continue
            path = prefix + (k,)
            if "kernel" in v or "a" in v:
                p = "/".join(path)
                m = _re.match(r"^layer_(\d+)/(q|k|v|out|fc1|fc2)$", p)
                if m:
                    i, mod = m.groups()
                    sub = {
                        "q": "self_attn.q_proj", "k": "self_attn.k_proj",
                        "v": "self_attn.v_proj", "out": "self_attn.out_proj",
                        "fc1": "mlp.fc1", "fc2": "mlp.fc2",
                    }[mod]
                    out[p] = f"text_model.encoder.layers.{i}.{sub}"
            else:
                walk(v, path)

    walk(tree, ())
    return out


def llm_rules(gemma: bool = False) -> list[Rule]:
    """HF Llama / Qwen2 / Gemma2 decoder state dicts -> LLMEncoder tree.

    (Reference loads these TEs via transformers AutoModel:
    hidream llama-3.1, qwen_image Qwen2.5-VL text tower, ltx2 gemma.)
    Gemma RMSNorms store w and apply (1 + w) -> 'plus_one' kind.
    """
    norm = "plus_one" if gemma else "direct"
    p = r"(?:model\.)?layers\.(\d+)\."
    rules: list[Rule] = [
        (r"(?:model\.)?embed_tokens\.weight", "token_embedding", "direct"),
        (r"(?:model\.)?norm\.weight", "final_norm/scale", norm),
        (p + r"self_attn\.q_proj\.weight", "layer_{0}/q/kernel", "linear"),
        (p + r"self_attn\.q_proj\.bias", "layer_{0}/q/bias", "direct"),
        (p + r"self_attn\.k_proj\.weight", "layer_{0}/k/kernel", "linear"),
        (p + r"self_attn\.k_proj\.bias", "layer_{0}/k/bias", "direct"),
        (p + r"self_attn\.v_proj\.weight", "layer_{0}/v/kernel", "linear"),
        (p + r"self_attn\.v_proj\.bias", "layer_{0}/v/bias", "direct"),
        (p + r"self_attn\.o_proj\.weight", "layer_{0}/o/kernel", "linear"),
        # Qwen3 per-head q/k RMSNorms (shape [head_dim]); absent elsewhere
        (p + r"self_attn\.q_norm\.weight", "layer_{0}/q_norm/scale", norm),
        (p + r"self_attn\.k_norm\.weight", "layer_{0}/k_norm/scale", norm),
        (p + r"input_layernorm\.weight", "layer_{0}/input_norm/scale", norm),
        (p + r"mlp\.gate_proj\.weight", "layer_{0}/gate/kernel", "linear"),
        (p + r"mlp\.up_proj\.weight", "layer_{0}/up/kernel", "linear"),
        (p + r"mlp\.down_proj\.weight", "layer_{0}/down/kernel", "linear"),
        # Ernie4.5 use_bias=True adds biases on every linear
        (p + r"self_attn\.o_proj\.bias", "layer_{0}/o/bias", "direct"),
        (p + r"mlp\.gate_proj\.bias", "layer_{0}/gate/bias", "direct"),
        (p + r"mlp\.up_proj\.bias", "layer_{0}/up/bias", "direct"),
        (p + r"mlp\.down_proj\.bias", "layer_{0}/down/bias", "direct"),
    ]
    if gemma:
        rules += [
            (p + r"post_attention_layernorm\.weight", "layer_{0}/post_attn_norm/scale", norm),
            (p + r"pre_feedforward_layernorm\.weight", "layer_{0}/pre_mlp_norm/scale", norm),
            (p + r"post_feedforward_layernorm\.weight", "layer_{0}/post_mlp_norm/scale", norm),
        ]
    else:
        rules.append(
            (p + r"post_attention_layernorm\.weight", "layer_{0}/pre_mlp_norm/scale", "direct")
        )
    return rules
