"""Full-model interop export (round-2 gap: reference toolkit/saving.py).

Export inverts the importer rule lists, so the checks are strict round
trips: export a random-init model to torch-layout safetensors, re-import
through the real import path, and require (a) zero unmatched keys both ways
and (b) numerically identical trees (fp16 write tolerance)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.io.full_export import export_full_model
from ai_toolkit_tpu.models.registry import get_model_class


def _flat_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat_paths(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


def _assert_trees_close(a, b, atol=2e-3):
    pa = dict(_flat_paths(a))
    pb = dict(_flat_paths(b))
    assert set(pa) == set(pb), (
        f"missing: {sorted(set(pa) - set(pb))[:5]} extra: {sorted(set(pb) - set(pa))[:5]}"
    )
    for k in pa:
        np.testing.assert_allclose(
            np.asarray(pa[k], np.float32), np.asarray(pb[k], np.float32),
            atol=atol, rtol=2e-3, err_msg=k,
        )


def test_flux_full_export_roundtrip(tmp_path):
    from safetensors import safe_open

    from ai_toolkit_tpu.io.flux_import import flux_dit_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    subdirs = {p.split(str(tmp_path) + os.sep)[1].split(os.sep)[0] for p in written}
    assert {"transformer", "vae", "text_encoder", "text_encoder_2"} <= subdirs

    with safe_open(os.path.join(tmp_path, "transformer",
                                "diffusion_pytorch_model.safetensors"), "np") as f:
        flat = {k: f.get_tensor(k) for k in f.keys()}
    tree, unmatched = torch_to_tree(flat, flux_dit_rules(model.dit_config.scan_blocks))
    assert not unmatched, unmatched[:5]
    _assert_trees_close(jax.tree.map(np.asarray, variables["dit"]), tree)

    # full checkpoint-dir reload through the real import path
    from ai_toolkit_tpu.io.flux_import import load_flux_checkpoint

    re = load_flux_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["vae"]), jax.tree.map(np.asarray, re["vae"])
    )


def test_wan_full_export_roundtrip(tmp_path):
    from safetensors import safe_open

    from ai_toolkit_tpu.io.dit_importers import wan_dit_tree

    model = get_model_class("wan21")(ModelConfig(arch="wan21", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    export_full_model(model, variables, str(tmp_path))
    with safe_open(os.path.join(tmp_path, "transformer",
                                "diffusion_pytorch_model.safetensors"), "np") as f:
        flat = {k: f.get_tensor(k) for k in f.keys()}
    tree, unmatched = wan_dit_tree(flat, model.dit_config)
    assert not unmatched, unmatched[:5]
    _assert_trees_close(jax.tree.map(np.asarray, variables["dit"]), tree)


def test_sd15_full_export_roundtrip(tmp_path):
    from safetensors import safe_open

    from ai_toolkit_tpu.io.sd_import import clip_rules, unet_rules, vae_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    export_full_model(model, variables, str(tmp_path))
    checks = [
        ("unet", "unet/diffusion_pytorch_model.safetensors",
         unet_rules(len(model.unet_config.block_out_channels))),
        ("vae", "vae/diffusion_pytorch_model.safetensors",
         vae_rules(len(model.vae_config.channel_multipliers),
                   model.vae_config.layers_per_block)),
        ("clip", "text_encoder/model.safetensors", clip_rules()),
    ]
    for comp, rel, rules in checks:
        with safe_open(os.path.join(tmp_path, rel), "np") as f:
            flat = {k: f.get_tensor(k) for k in f.keys()}
        tree, unmatched = torch_to_tree(flat, rules)
        assert not unmatched, (comp, unmatched[:5])
        _assert_trees_close(jax.tree.map(np.asarray, variables[comp]), tree)


def test_export_unsupported_arch_raises():
    model = get_model_class("anima")(
        ModelConfig(arch="anima", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    with pytest.raises(NotImplementedError, match="full-model export"):
        export_full_model(model, variables, "/tmp/should_not_be_written")


def test_hidream_full_export_roundtrip(tmp_path):
    """Inverse of the hand-written hidream_dit_tree: fused qkv split back to
    to_q/k/v(+_t), img+txt modulation re-fused into the 12d adaLN, MoE experts
    unstacked (txt_in has no torch slot on either path, so a same-seed
    re-import reproduces the full tree)."""
    from ai_toolkit_tpu.io.dit_importers import load_hidream_checkpoint

    model = get_model_class("hidream")(
        ModelConfig(arch="hidream", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    import safetensors.numpy as stnp
    flat = stnp.load_file(written[0])
    assert "double_stream_blocks.0.block.ff_i.experts.0.w1.weight" in flat
    assert "single_stream_blocks.0.block.attn1.to_q.weight" in flat
    re = load_hidream_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )


def test_qwen_full_export_roundtrip(tmp_path):
    """qwen export is the hand-written inverse of qwen_transformer_to_tree
    (fused qkv split back, final adaln halves swapped back)."""
    from ai_toolkit_tpu.io.qwen_import import load_qwen_checkpoint

    model = get_model_class("qwen_image")(
        ModelConfig(arch="qwen_image", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    re = load_qwen_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )


def test_flux2_full_export_roundtrip(tmp_path):
    """flux2's BFL layout holds ONE shared stream modulation; a random-init
    tree has divergent per-block mods, so the round-trip invariant is
    export->import (projects onto the flux2-representable set) followed by a
    second export->import being exact."""
    from ai_toolkit_tpu.io.dit_importers import load_flux2_checkpoint

    model = get_model_class("flux2")(
        ModelConfig(arch="flux2", model_kwargs={"size": "tiny"}))
    v0 = model.init_variables(jax.random.key(0))
    export_full_model(model, v0, str(tmp_path / "a"))
    v1 = load_flux2_checkpoint(str(tmp_path / "a"), model)
    export_full_model(model, v1, str(tmp_path / "b"))
    v2 = load_flux2_checkpoint(str(tmp_path / "b"), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, v1["dit"]), jax.tree.map(np.asarray, v2["dit"])
    )
    # the projection only touches modulation kernels + zero biases
    import safetensors.numpy as stnp
    flat = stnp.load_file(
        str(tmp_path / "b" / "transformer" / "diffusion_pytorch_model.safetensors"))
    assert "double_stream_modulation_img.lin.weight" in flat
    assert not any(".img_mod." in k or ".txt_mod." in k or ".modulation." in k
                   for k in flat)


def test_ltx2_full_export_roundtrip(tmp_path):
    from ai_toolkit_tpu.io.dit_importers import load_ltx2_checkpoint

    model = get_model_class("ltx2")(
        ModelConfig(arch="ltx2", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    import safetensors.numpy as stnp
    flat = stnp.load_file(written[0])
    assert "scale_shift_table" in flat
    assert "transformer_blocks.0.scale_shift_table" in flat
    assert any("text_encoder" in p for p in written)
    re = load_ltx2_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )
    # Gemma-3 caption tower round-trips through the new TE export + import
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["te"]), jax.tree.map(np.asarray, re["te"])
    )


def test_lumina2_full_export_roundtrip(tmp_path):
    from ai_toolkit_tpu.io.dit_importers import load_lumina2_checkpoint

    model = get_model_class("lumina2")(
        ModelConfig(arch="lumina2", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    import safetensors.numpy as stnp
    flat = stnp.load_file(written[0])
    assert "norm_out.linear_2.weight" in flat
    assert "layers.0.feed_forward.linear_1.weight" in flat
    assert any("text_encoder" in p for p in written)
    re = load_lumina2_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )
    # gemma2 TE round-trips through the new _llm_flat export
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["te"]), jax.tree.map(np.asarray, re["te"])
    )


def test_omnigen2_full_export_roundtrip(tmp_path):
    from ai_toolkit_tpu.io.dit_importers import load_omnigen2_checkpoint

    model = get_model_class("omnigen2")(
        ModelConfig(arch="omnigen2", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    import safetensors.numpy as stnp
    flat = stnp.load_file([p for p in written if "transformer" in p][0])
    assert "ref_image_patch_embedder.weight" in flat
    assert "image_index_embedding" in flat
    assert "ref_image_refiner.0.attn.to_q.weight" in flat
    re = load_omnigen2_checkpoint(str(tmp_path), model)
    _assert_trees_close(
        jax.tree.map(np.asarray, variables["dit"]), jax.tree.map(np.asarray, re["dit"])
    )


@pytest.mark.parametrize("arch,loader", [
    ("auraflow", "load_auraflow_checkpoint"),
    ("pixart", "load_pixart_checkpoint"),
    ("cogview4", "load_cogview4_checkpoint"),
])
def test_r5_arch_full_export_roundtrip(tmp_path, arch, loader):
    """r5 archs: export_full_model writes the diffusers transformer layout;
    re-importing through the REAL loader reproduces the dit tree exactly
    (fp16 write tolerance). Locks the export plans against rule drift."""
    import json

    import ai_toolkit_tpu.io.dit_importers as imps

    model = get_model_class(arch)(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path), components=["dit"])
    assert any("transformer" in p for p in written)
    # config.json so the loader can rebuild dims (tiny differs from defaults)
    cfg = model.dit_config
    if arch == "auraflow":
        c = {"in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
             "patch_size": cfg.patch_size, "num_attention_heads": cfg.num_heads,
             "attention_head_dim": cfg.head_dim, "num_mmdit_layers": cfg.n_double,
             "num_single_dit_layers": cfg.n_single,
             "joint_attention_dim": cfg.context_dim,
             "pos_embed_max_size": cfg.pos_embed_max_size}
    elif arch == "pixart":
        c = {"in_channels": cfg.in_channels, "patch_size": cfg.patch_size,
             "num_attention_heads": cfg.num_heads, "attention_head_dim": cfg.head_dim,
             "num_layers": cfg.n_layers, "caption_channels": cfg.caption_dim,
             "sample_size": cfg.sample_size,
             "interpolation_scale": cfg.interpolation_scale,
             "out_channels": cfg.out_channels}
    else:
        c = {"in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
             "patch_size": cfg.patch_size, "num_attention_heads": cfg.num_heads,
             "attention_head_dim": cfg.head_dim, "num_layers": cfg.n_layers,
             "text_embed_dim": cfg.text_embed_dim,
             "time_embed_dim": cfg.time_embed_dim,
             "condition_dim": cfg.condition_dim,
             "rope_axes_dim": list(cfg.rope_axes_dim)}
    json.dump(c, open(os.path.join(tmp_path, "transformer", "config.json"), "w"))

    model2 = get_model_class(arch)(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    back = getattr(imps, loader)(str(tmp_path), model2)
    _assert_trees_close(jax.tree.map(np.asarray, variables["dit"]),
                        jax.tree.map(np.asarray, back["dit"]))


@pytest.mark.parametrize("variant", ["plain", "gemma", "glm"])
def test_llm_te_export_roundtrip(variant):
    """_llm_flat is the hand-written inverse of sd_import.llm_rules (the
    (?:model.)? optional prefix defeats the generic rule inverter): tiny
    LLMEncoder params -> HF base-model state dict -> re-import == identity.
    glm re-fuses gate/up into gate_up_proj (inverse of glm_split_fused)."""
    from ai_toolkit_tpu.io.dit_importers import glm_split_fused
    from ai_toolkit_tpu.io.full_export import _llm_flat
    from ai_toolkit_tpu.io.sd_import import llm_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder

    gemma = variant == "gemma"
    import dataclasses

    cfg = LLMConfig.tiny()
    if gemma:
        cfg = dataclasses.replace(cfg, post_norms=True, gemma_gelu=True)
    enc = LLMEncoder(cfg)
    params = enc.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree.map(np.asarray, params)

    flat = _llm_flat(params, gemma=gemma, glm_fuse=variant == "glm")
    assert "embed_tokens.weight" in flat and "layers.0.self_attn.q_proj.weight" in flat
    if variant == "glm":
        assert "layers.0.mlp.gate_up_proj.weight" in flat
        assert not any("gate_proj" in k for k in flat)
        flat = glm_split_fused(flat)
    if gemma:
        assert "layers.0.pre_feedforward_layernorm.weight" in flat

    tree, unmatched = torch_to_tree(flat, llm_rules(gemma=gemma))
    assert not unmatched, unmatched[:5]
    _assert_trees_close(params, tree, atol=1e-6)
