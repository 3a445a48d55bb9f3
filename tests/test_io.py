import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.io.checkpoint import CheckpointManager
from ai_toolkit_tpu.io.lora_file import flatten_lora, load_lora_file, save_lora_file, unflatten_lora
from ai_toolkit_tpu.models.flux_dit import flux_lora_key_map
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.models.unet import unet_lora_key_map


@pytest.fixture(scope="module")
def flux_lora():
    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRASpec(rank=4, alpha=8.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(1))
    lora = jax.tree.map(lambda v: jax.random.normal(jax.random.key(2), v.shape), lora)
    return model, variables, lora


def test_flux_peft_key_layout(flux_lora, tmp_path):
    """Golden key-layout check: PEFT/diffusers-style flux LoRA keys."""
    model, variables, lora = flux_lora
    key_map = flux_lora_key_map(lora)
    flat = flatten_lora(lora, key_map, fmt="peft")
    assert "transformer.double_blocks.0.img_attn.qkv.lora_A.weight" in flat
    assert "transformer.single_blocks.1.linear1.lora_B.weight" in flat
    # torch orientation: lora_A is [r, in]
    a = flat["transformer.double_blocks.0.img_attn.qkv.lora_A.weight"]
    assert a.shape == (4, 64)
    b = flat["transformer.double_blocks.0.img_attn.qkv.lora_B.weight"]
    assert b.shape == (64 * 3, 4)


def test_flux_comfy_key_layout(flux_lora):
    model, variables, lora = flux_lora
    flat = flatten_lora(lora, flux_lora_key_map(lora), fmt="comfy")
    assert "diffusion_model.double_blocks.0.img_attn.qkv.lora_A.weight" in flat


def test_flux_kohya_roundtrip(flux_lora, tmp_path):
    model, variables, lora = flux_lora
    key_map = flux_lora_key_map(lora)
    p = str(tmp_path / "lora.safetensors")
    save_lora_file(lora, p, key_map=key_map, fmt="kohya", prefix="lora_transformer",
                   metadata={"step": 123}, dtype=np.float32)
    # kohya alpha tensor present
    from safetensors import safe_open

    with safe_open(p, framework="numpy") as f:
        keys = list(f.keys())
        assert any(k.endswith(".alpha") for k in keys)
        assert any(k.startswith("lora_transformer_double_blocks_0_img_attn_qkv.") for k in keys)

    inverse = {}
    for internal, ext in key_map.items():
        inverse[ext.replace(".", "_")] = internal
        inverse[ext] = internal
    loaded, meta = load_lora_file(p, inverse)
    assert meta["step"] == "123"
    assert sorted(lora_paths(loaded)) == sorted(lora_paths(lora))
    for path in lora_paths(lora):
        node_o, node_l = lora, loaded
        for k in path:
            node_o, node_l = node_o[k], node_l[k]
        np.testing.assert_allclose(np.asarray(node_o["a"]), node_l["a"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(node_o["b"]), node_l["b"], atol=1e-6)
        np.testing.assert_allclose(float(node_o["scale"]), float(node_l["scale"]), atol=1e-6)


def test_unet_key_map():
    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRASpec(rank=2, target_patterns=model.lora_targets())
    lora = build_lora(variables["unet"], spec, jax.random.key(1))
    km = unet_lora_key_map(lora, num_levels=len(model.unet_config.block_out_channels))
    exts = set(km.values())
    assert any(e.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q") for e in exts)
    assert any("ff.net.0.proj" in e for e in exts)
    assert any("attn2.to_out.0" in e for e in exts)
    # every lora module mapped
    assert len(km) == len(lora_paths(lora))


def test_checkpoint_manager_save_resume_rotation(flux_lora, tmp_path):
    model, variables, lora = flux_lora
    km = flux_lora_key_map(lora)
    inverse = {v: k for k, v in km.items()} | {v.replace(".", "_"): k for k, v in km.items()}
    mgr = CheckpointManager(str(tmp_path), "job1", max_step_saves_to_keep=2, fmt="peft",
                            key_map=km, dtype=np.float32)
    opt_state = {"nu": jax.tree.map(lambda x: jnp.zeros_like(x), lora)}
    for step in (100, 200, 300):
        mgr.save(lora, step, opt_state=opt_state)
    files = sorted(os.listdir(tmp_path))
    assert "job1_000000100.safetensors" not in files  # rotated away
    assert "job1_000000300.safetensors" in files
    assert "optimizer.msgpack" in files

    loaded, step = mgr.load_latest(inverse)
    assert step == 300
    assert sorted(lora_paths(loaded)) == sorted(lora_paths(lora))

    opt2, ema2, ostep = mgr.load_opt_state({"opt_state": opt_state, "ema": None, "step": np.int64(0)})
    assert ostep == 300
    assert opt2 is not None
