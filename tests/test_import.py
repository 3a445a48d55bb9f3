"""Checkpoint import machinery: torch-layout <-> our-tree round trips."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.io.flux_import import flux_dit_rules, load_flux_checkpoint
from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), f"{path}: {set(a)} vs {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=path)


@pytest.mark.parametrize("scan", [False, True])
def test_flux_rules_roundtrip(scan):
    cfg = dataclasses.replace(FluxConfig.tiny(), scan_blocks=scan)
    model = FluxDiT(cfg)
    n_img, n_txt = 8, 4
    pe = jnp.zeros((1, n_txt + n_img, cfg.head_dim // 2, 2, 2))
    pe = pe.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, n_img, cfg.in_channels)), jnp.zeros((1, n_txt, cfg.context_dim)),
        jnp.zeros((1,)), jnp.zeros((1, cfg.vec_dim)), pe, jnp.zeros((1,)),
    )["params"]
    params = jax.tree.map(np.asarray, params)

    rules = flux_dit_rules(scan_blocks=scan)
    flat = tree_to_torch(params, rules)
    # torch layout sanity: linear weights are [out, in]
    key = "double_blocks.0.img_attn.qkv.weight"
    assert key in flat
    assert flat[key].shape == (cfg.hidden_size * 3, cfg.hidden_size)

    tree, unmatched = torch_to_tree(flat, rules)
    assert not unmatched
    _tree_equal(params, tree)


def test_load_flux_checkpoint_from_dir(tmp_path):
    """Write a BFL-layout file from random params, load through the model."""
    from safetensors.numpy import save_file

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(7))
    dit = jax.tree.map(np.asarray, variables["dit"])
    flat = tree_to_torch(dit, flux_dit_rules(scan_blocks=model.dit_config.scan_blocks))
    ckpt_dir = tmp_path / "flux"
    ckpt_dir.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              str(ckpt_dir / "flux1-dev.safetensors"))

    model2 = get_model_class("flux")(
        ModelConfig(arch="flux", name_or_path=str(ckpt_dir), model_kwargs={"size": "tiny"})
    )
    loaded = model2.load_variables(jax.random.key(0))
    _tree_equal(dit, jax.tree.map(np.asarray, loaded["dit"]))


def test_sd_unet_clip_vae_roundtrip():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.io.sd_import import clip_rules, unet_rules, vae_rules
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = jax.tree.map(np.asarray, model.init_variables(jax.random.key(3)))

    # unet
    rules = unet_rules(len(model.unet_config.block_out_channels))
    flat = tree_to_torch(variables["unet"], rules)
    assert "down_blocks.0.resnets.0.conv1.weight" in flat
    assert flat["down_blocks.0.resnets.0.conv1.weight"].ndim == 4  # torch conv layout
    tree, _ = torch_to_tree(flat, rules)
    _tree_equal(variables["unet"], tree)

    # clip
    flat = tree_to_torch(variables["clip"], clip_rules())
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in flat
    tree, _ = torch_to_tree(flat, clip_rules())
    _tree_equal(variables["clip"], tree)

    # vae
    vr = vae_rules(len(model.vae_config.channel_multipliers), model.vae_config.layers_per_block)
    flat = tree_to_torch(variables["vae"], vr)
    assert "encoder.conv_in.weight" in flat
    tree, _ = torch_to_tree(flat, vr)
    _tree_equal(variables["vae"], tree)


def test_t5_roundtrip():
    from ai_toolkit_tpu.io.sd_import import t5_rules
    from ai_toolkit_tpu.models.text_encoders import T5Config, T5Encoder

    t5 = T5Encoder(T5Config.tiny())
    params = jax.tree.map(np.asarray, t5.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))["params"])
    flat = tree_to_torch(params, t5_rules())
    assert "encoder.block.0.layer.0.SelfAttention.q.weight" in flat
    tree, _ = torch_to_tree(flat, t5_rules())
    _tree_equal(params, tree)
