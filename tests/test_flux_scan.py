"""Scanned (nn.scan) flux layout: forward, LoRA on stacked params, export."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths, merge_lora
from ai_toolkit_tpu.io.lora_file import flatten_lora, load_lora_file, save_lora_file
from ai_toolkit_tpu.models.flux_dit import (
    FluxConfig,
    FluxDiT,
    flux_inverse_key_map,
    flux_lora_key_map,
    flux_lora_targets,
)
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope


@pytest.fixture(scope="module")
def scanned():
    cfg = dataclasses.replace(FluxConfig.tiny(), scan_blocks=True, depth_double=3, depth_single=2)
    model = FluxDiT(cfg)
    n_img, n_txt = 16, 8
    ids = image_position_ids(4, 4, text_len=n_txt)
    pe = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
    args = (
        jnp.zeros((1, n_img, cfg.in_channels)),
        jnp.zeros((1, n_txt, cfg.context_dim)),
        jnp.zeros((1,)),
        jnp.zeros((1, cfg.vec_dim)),
        pe,
        jnp.zeros((1,)),
    )
    variables = model.init(jax.random.key(0), *args)
    return cfg, model, variables, args


def test_scanned_params_stacked(scanned):
    cfg, model, variables, args = scanned
    p = variables["params"]
    assert "double_blocks" in p and "single_blocks" in p
    k = p["double_blocks"]["block"]["img_qkv"]["kernel"]
    assert k.shape == (3, cfg.hidden_size, cfg.hidden_size * 3)
    out = model.apply(variables, *args)
    assert out.shape == (1, 16, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_scanned_lora_and_overlay(scanned):
    cfg, model, variables, args = scanned
    spec = LoRASpec(rank=4, alpha=4.0, target_patterns=flux_lora_targets())
    lora = build_lora(variables["params"], spec, jax.random.key(1))
    a = lora["double_blocks"]["block"]["img_qkv"]["a"]
    assert a.shape == (3, cfg.hidden_size, 4)

    base = model.apply(variables, *args)
    out0 = model.apply({**variables, "lora": lora}, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-5)

    # randomize b -> output changes; merged equals overlay
    lora = jax.tree.map(lambda v: jax.random.normal(jax.random.key(2), v.shape) * 0.03, lora)
    out1 = model.apply({**variables, "lora": lora}, *args)
    assert not np.allclose(np.asarray(out1), np.asarray(base))
    merged = merge_lora(variables["params"], lora)
    out2 = model.apply({"params": merged}, *args)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-3, atol=2e-4)


def test_scanned_export_roundtrip(scanned, tmp_path):
    cfg, model, variables, args = scanned
    spec = LoRASpec(rank=4, alpha=8.0, target_patterns=flux_lora_targets())
    lora = build_lora(variables["params"], spec, jax.random.key(1))
    leaves, treedef = jax.tree.flatten(lora)
    lora = jax.tree.unflatten(
        treedef, [jax.random.normal(jax.random.key(i), l.shape) for i, l in enumerate(leaves)]
    )
    km = flux_lora_key_map(lora)
    flat = flatten_lora(lora, km, fmt="peft", dtype=np.float32)
    # per-layer keys materialized from the stacked leaves
    assert "transformer.double_blocks.0.img_attn.qkv.lora_A.weight" in flat
    assert "transformer.double_blocks.2.img_attn.qkv.lora_A.weight" in flat
    assert "transformer.single_blocks.1.linear1.lora_B.weight" in flat
    assert flat["transformer.double_blocks.1.img_attn.qkv.lora_A.weight"].shape == (4, cfg.hidden_size)

    p = str(tmp_path / "l.safetensors")
    save_lora_file(lora, p, key_map=km, fmt="peft", dtype=np.float32)
    inverse = flux_inverse_key_map(km, 3, 2)
    loaded, _ = load_lora_file(p, inverse)
    assert sorted(lora_paths(loaded)) == sorted(lora_paths(lora))
    la = loaded["double_blocks"]["block"]["img_qkv"]
    np.testing.assert_allclose(
        np.asarray(lora["double_blocks"]["block"]["img_qkv"]["a"]), la["a"], atol=1e-6
    )


def test_attn_masking(scanned):
    """Padded text tokens masked out change the output; valid tokens dominate."""
    cfg, model, variables, args = scanned
    img, txt, t, y, pe, g = args
    txt = jax.random.normal(jax.random.key(9), txt.shape)
    full = model.apply(variables, img, txt, t, y, pe, g)
    mask = jnp.ones((1, txt.shape[1]), bool).at[:, 4:].set(False)
    masked = model.apply(variables, img, txt, t, y, pe, g, mask)
    assert masked.shape == full.shape
    assert not np.allclose(np.asarray(masked), np.asarray(full))
    # masking everything-beyond-4 == replacing those tokens' effect entirely:
    # changing PADDED token values must not change the masked output
    txt2 = txt.at[:, 4:].set(123.0)
    masked2 = model.apply(variables, img, txt2, t, y, pe, g, mask)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(masked2), atol=2e-5)
