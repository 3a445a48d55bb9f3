"""Video VAE checkpoint importers (diffusers layouts -> our flax trees).

Covers the exact-import gap called out for round 2: real wan / ltx2
checkpoints must decode with their shipped VAEs, not random init.

- Wan 2.1/2.2(14B): diffusers ``AutoencoderKLWan`` layout
  (reference ``toolkit/models/wan21/wan21.py:456`` loads ``vae/`` from the
  HF dir). Key families: ``encoder.down_blocks.N...`` (flat mixed list),
  ``decoder.up_blocks.I.resnets.J...``/``upsamplers.0...``, mid blocks,
  ``quant_conv``/``post_quant_conv``.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ai_toolkit_tpu.io.torch_import import Rule, load_safetensors_dir, torch_to_tree


def _block_rules(prefix: str, path: str) -> list[Rule]:
    """Rules for one container of residual/attention/resample blocks where the
    torch index is regex group 0. ``prefix`` like ``encoder.down_blocks``,
    ``path`` like ``encoder/down_blocks_{0}``."""
    p, t = prefix.replace(".", r"\."), path
    return [
        # residual block
        (rf"{p}\.(\d+)\.norm(1|2)\.gamma", t + "/norm{1}/gamma", "flatten_c"),
        (rf"{p}\.(\d+)\.conv(1|2)\.weight", t + "/conv{1}/kernel", "conv3d"),
        (rf"{p}\.(\d+)\.conv(1|2)\.bias", t + "/conv{1}/bias", "direct"),
        (rf"{p}\.(\d+)\.conv_shortcut\.weight", t + "/conv_shortcut/kernel", "conv3d"),
        (rf"{p}\.(\d+)\.conv_shortcut\.bias", t + "/conv_shortcut/bias", "direct"),
        # attention block
        (rf"{p}\.(\d+)\.norm\.gamma", t + "/norm/gamma", "flatten_c"),
        (rf"{p}\.(\d+)\.to_qkv\.weight", t + "/to_qkv/kernel", "linear_or_conv1x1"),
        (rf"{p}\.(\d+)\.to_qkv\.bias", t + "/to_qkv/bias", "direct"),
        (rf"{p}\.(\d+)\.proj\.weight", t + "/proj/kernel", "linear_or_conv1x1"),
        (rf"{p}\.(\d+)\.proj\.bias", t + "/proj/bias", "direct"),
        # resample (torch nn.Sequential: [pad/upsample, conv] -> index 1)
        (rf"{p}\.(\d+)\.resample\.1\.weight", t + "/resample_conv/kernel", "conv2d"),
        (rf"{p}\.(\d+)\.resample\.1\.bias", t + "/resample_conv/bias", "direct"),
        (rf"{p}\.(\d+)\.time_conv\.weight", t + "/time_conv/kernel", "conv3d"),
        (rf"{p}\.(\d+)\.time_conv\.bias", t + "/time_conv/bias", "direct"),
    ]


def _mid_rules(side: str) -> list[Rule]:
    out = _block_rules(f"{side}.mid_block.resnets", f"{side}/mid_block/resnets_{{0}}")
    out += _block_rules(f"{side}.mid_block.attentions", f"{side}/mid_block/attentions_{{0}}")
    return out


def wan_vae_rules() -> list[Rule]:
    rules: list[Rule] = []
    for side in ("encoder", "decoder"):
        rules += [
            (rf"{side}\.conv_in\.weight", f"{side}/conv_in/kernel", "conv3d"),
            (rf"{side}\.conv_in\.bias", f"{side}/conv_in/bias", "direct"),
            (rf"{side}\.conv_out\.weight", f"{side}/conv_out/kernel", "conv3d"),
            (rf"{side}\.conv_out\.bias", f"{side}/conv_out/bias", "direct"),
            (rf"{side}\.norm_out\.gamma", f"{side}/norm_out/gamma", "flatten_c"),
        ]
        rules += _mid_rules(side)
    rules += _block_rules("encoder.down_blocks", "encoder/down_blocks_{0}")
    # wan2.2 residual down blocks: down_blocks.I.resnets.J + .downsampler
    for i in range(8):
        rules += _block_rules(
            f"encoder.down_blocks.{i}.resnets", f"encoder/down_blocks_{i}/resnets_{{0}}"
        )
        d = rf"encoder\.down_blocks\.{i}\.downsampler"
        t = f"encoder/down_blocks_{i}/downsampler"
        rules += [
            (d + r"\.resample\.1\.weight", t + "/resample_conv/kernel", "conv2d"),
            (d + r"\.resample\.1\.bias", t + "/resample_conv/bias", "direct"),
            (d + r"\.time_conv\.weight", t + "/time_conv/kernel", "conv3d"),
            (d + r"\.time_conv\.bias", t + "/time_conv/bias", "direct"),
        ]
    # decoder: up_blocks.I.resnets.J and up_blocks.I.upsamplers.0
    # (wan2.2 residual up blocks store a single .upsampler — accept both)
    for i in range(8):  # enough for any dim_mult depth
        rules += _block_rules(
            f"decoder.up_blocks.{i}.resnets", f"decoder/up_blocks_{i}/resnets_{{0}}"
        )
        for src, dst in ((r"\.upsamplers\.0", "/upsamplers_0"), (r"\.upsampler", "/upsampler")):
            u = rf"decoder\.up_blocks\.{i}" + src
            t = f"decoder/up_blocks_{i}" + dst
            rules += [
                (u + r"\.resample\.1\.weight", t + "/resample_conv/kernel", "conv2d"),
                (u + r"\.resample\.1\.bias", t + "/resample_conv/bias", "direct"),
                (u + r"\.time_conv\.weight", t + "/time_conv/kernel", "conv3d"),
                (u + r"\.time_conv\.bias", t + "/time_conv/bias", "direct"),
            ]
    rules += [
        (r"quant_conv\.weight", "quant_conv/kernel", "conv3d"),
        (r"quant_conv\.bias", "quant_conv/bias", "direct"),
        (r"post_quant_conv\.weight", "post_quant_conv/kernel", "conv3d"),
        (r"post_quant_conv\.bias", "post_quant_conv/bias", "direct"),
    ]
    return rules


def wan_vae_config_from_json(vae_dir: str):
    """Build a WanVAEConfig from the checkpoint's diffusers config.json
    (latents_mean/std and dims come from the file when present)."""
    from ai_toolkit_tpu.models.wan_vae import WanVAEConfig

    cfg_path = os.path.join(vae_dir, "config.json")
    if not os.path.isfile(cfg_path):
        return WanVAEConfig.wan21()
    with open(cfg_path) as f:
        c = json.load(f)
    base = WanVAEConfig.wan21()
    patch = int(c.get("patch_size") or 1)
    # wan2.2 configs report the *patchified* in_channels (12 = 3*2*2)
    in_ch = c.get("in_channels", 3 * patch * patch) // (patch * patch)
    return WanVAEConfig(
        base_dim=c.get("base_dim", base.base_dim),
        z_dim=c.get("z_dim", base.z_dim),
        dim_mult=tuple(c.get("dim_mult", base.dim_mult)),
        num_res_blocks=c.get("num_res_blocks", base.num_res_blocks),
        attn_scales=tuple(c.get("attn_scales", base.attn_scales)),
        temperal_downsample=tuple(c.get("temperal_downsample", base.temperal_downsample)),
        latents_mean=tuple(c.get("latents_mean", base.latents_mean)),
        latents_std=tuple(c.get("latents_std", base.latents_std)),
        in_channels=in_ch,
        patch_size=patch,
        is_residual=bool(c.get("is_residual", False)),
        decoder_base_dim=c.get("decoder_base_dim"),
        clip_output=bool(c.get("clip_output", True)),
    )


def load_wan_vae_tree(vae_dir: str) -> tuple[dict, list[str]]:
    """vae/ dir (or single safetensors) -> (flax param tree, unmatched keys)."""
    flat = load_safetensors_dir(vae_dir)
    return torch_to_tree(flat, wan_vae_rules())


def ltx_video_vae_rules() -> list[Rule]:
    """diffusers ``AutoencoderKLLTX2Video`` keys (converter rename target,
    ``convert_ltx2_to_diffusers.py:48-76``). LTX convs wrap nn.Conv3d in
    ``.conv``; norms are paramless."""
    rules: list[Rule] = []
    for side in ("encoder", "decoder"):
        rules += [
            (rf"{side}\.conv_in\.conv\.weight", f"{side}/conv_in/kernel", "conv3d"),
            (rf"{side}\.conv_in\.conv\.bias", f"{side}/conv_in/bias", "direct"),
            (rf"{side}\.conv_out\.conv\.weight", f"{side}/conv_out/kernel", "conv3d"),
            (rf"{side}\.conv_out\.conv\.bias", f"{side}/conv_out/bias", "direct"),
            (rf"{side}\.mid_block\.resnets\.(\d+)\.conv(1|2)\.conv\.weight",
             side + "/mid_block_resnets_{0}/conv{1}/kernel", "conv3d"),
            (rf"{side}\.mid_block\.resnets\.(\d+)\.conv(1|2)\.conv\.bias",
             side + "/mid_block_resnets_{0}/conv{1}/bias", "direct"),
        ]
    for grp, path in (
        ("encoder.down_blocks", "encoder/down_blocks_{0}"),
        ("decoder.up_blocks", "decoder/up_blocks_{0}"),
    ):
        g = grp.replace(".", r"\.")
        rules += [
            (rf"{g}\.(\d+)\.resnets\.(\d+)\.conv(1|2)\.conv\.weight",
             path + "_resnets_{1}/conv{2}/kernel", "conv3d"),
            (rf"{g}\.(\d+)\.resnets\.(\d+)\.conv(1|2)\.conv\.bias",
             path + "_resnets_{1}/conv{2}/bias", "direct"),
            (rf"{g}\.(\d+)\.resnets\.(\d+)\.conv_shortcut\.conv\.weight",
             path + "_resnets_{1}/conv_shortcut/kernel", "conv3d"),
            (rf"{g}\.(\d+)\.resnets\.(\d+)\.conv_shortcut\.conv\.bias",
             path + "_resnets_{1}/conv_shortcut/bias", "direct"),
            (rf"{g}\.(\d+)\.downsamplers\.0\.conv\.conv\.weight",
             path + "_downsamplers_0/conv/kernel", "conv3d"),
            (rf"{g}\.(\d+)\.downsamplers\.0\.conv\.conv\.bias",
             path + "_downsamplers_0/conv/bias", "direct"),
            (rf"{g}\.(\d+)\.upsamplers\.0\.conv\.conv\.weight",
             path + "_upsamplers_0/conv/kernel", "conv3d"),
            (rf"{g}\.(\d+)\.upsamplers\.0\.conv\.conv\.bias",
             path + "_upsamplers_0/conv/bias", "direct"),
        ]
    return rules


def ltx_audio_vae_rules() -> list[Rule]:
    """diffusers ``AutoencoderKLLTX2Audio`` keeps the original taming-style
    keys (the converter's rename map only touches latent statistics,
    ``convert_ltx2_to_diffusers.py:84-86``). Pixel norms are paramless."""

    rules: list[Rule] = []
    for side in ("encoder", "decoder"):
        grp = "down" if side == "encoder" else "up"
        rules += [
            (rf"{side}\.conv_in\.weight", f"{side}/conv_in/conv/kernel", "conv2d"),
            (rf"{side}\.conv_in\.bias", f"{side}/conv_in/conv/bias", "direct"),
            (rf"{side}\.conv_out\.weight", f"{side}/conv_out/conv/kernel", "conv2d"),
            (rf"{side}\.conv_out\.bias", f"{side}/conv_out/conv/bias", "direct"),
            # residual blocks inside levels: groups 0=level, 1=block, 2=conv#
            (rf"{side}\.{grp}\.(\d+)\.block\.(\d+)\.conv(1|2)\.weight",
             side + "/" + grp + "_{0}_block_{1}/conv{2}/conv/kernel", "conv2d"),
            (rf"{side}\.{grp}\.(\d+)\.block\.(\d+)\.conv(1|2)\.bias",
             side + "/" + grp + "_{0}_block_{1}/conv{2}/conv/bias", "direct"),
            (rf"{side}\.{grp}\.(\d+)\.block\.(\d+)\.nin_shortcut\.weight",
             side + "/" + grp + "_{0}_block_{1}/nin_shortcut/kernel", "conv2d"),
            (rf"{side}\.{grp}\.(\d+)\.block\.(\d+)\.nin_shortcut\.bias",
             side + "/" + grp + "_{0}_block_{1}/nin_shortcut/bias", "direct"),
            (rf"{side}\.mid\.block_(1|2)\.conv(1|2)\.weight",
             side + "/mid_block_{0}/conv{1}/conv/kernel", "conv2d"),
            (rf"{side}\.mid\.block_(1|2)\.conv(1|2)\.bias",
             side + "/mid_block_{0}/conv{1}/conv/bias", "direct"),
        ]
    rules += [
        (r"encoder\.down\.(\d+)\.downsample\.conv\.weight",
         "encoder/down_{0}_downsample/kernel", "conv2d"),
        (r"encoder\.down\.(\d+)\.downsample\.conv\.bias",
         "encoder/down_{0}_downsample/bias", "direct"),
        (r"decoder\.up\.(\d+)\.upsample\.conv\.weight",
         "decoder/up_{0}_upsample/conv/kernel", "conv2d"),
        (r"decoder\.up\.(\d+)\.upsample\.conv\.bias",
         "decoder/up_{0}_upsample/conv/bias", "direct"),
        (r"quant_conv\.weight", "quant_conv/kernel", "conv2d"),
        (r"quant_conv\.bias", "quant_conv/bias", "direct"),
        (r"post_quant_conv\.weight", "post_quant_conv/kernel", "conv2d"),
        (r"post_quant_conv\.bias", "post_quant_conv/bias", "direct"),
    ]
    return rules


def load_ltx_audio_vae(vae_dir: str):
    """audio_vae/ dir -> (LTXAudioVAEConfig with stats, tree, unmatched)."""
    import dataclasses

    from ai_toolkit_tpu.models.ltx_audio_vae import LTXAudioVAEConfig

    flat = load_safetensors_dir(vae_dir)
    mean = flat.pop("latents_mean", None)
    std = flat.pop("latents_std", None)
    cfg = dataclasses.replace(
        LTXAudioVAEConfig.ltx2(),
        latents_mean=tuple(float(v) for v in np.asarray(mean).reshape(-1))
        if mean is not None else None,
        latents_std=tuple(float(v) for v in np.asarray(std).reshape(-1))
        if std is not None else None,
    )
    tree, unmatched = torch_to_tree(flat, ltx_audio_vae_rules())
    return cfg, tree, unmatched


def load_ltx_video_vae(vae_dir: str):
    """vae/ dir -> (LTXVideoVAEConfig with checkpoint stats, param tree,
    unmatched). latents_mean/std are top-level buffers in the state dict."""
    from ai_toolkit_tpu.models.ltx_video_vae import LTXVideoVAEConfig

    flat = load_safetensors_dir(vae_dir)
    mean = flat.pop("latents_mean", None)
    std = flat.pop("latents_std", None)
    base = LTXVideoVAEConfig.ltx2()
    cfg_path = os.path.join(vae_dir, "config.json")
    kw = {}
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        if "latent_channels" in c:
            kw["latent_channels"] = c["latent_channels"]
        if "block_out_channels" in c:
            kw["block_out_channels"] = tuple(c["block_out_channels"])
        if "patch_size" in c:
            kw["patch_size"] = c["patch_size"]
    import dataclasses

    cfg = dataclasses.replace(
        base,
        latents_mean=tuple(float(v) for v in mean) if mean is not None else None,
        latents_std=tuple(float(v) for v in std) if std is not None else None,
        **kw,
    )
    tree, unmatched = torch_to_tree(flat, ltx_video_vae_rules())
    return cfg, tree, unmatched
