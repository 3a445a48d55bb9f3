"""wan / ltx2 / flux2 checkpoint importers: layout + numerics checks.

Fake torch-layout state dicts are synthesized at the tiny model's shapes
(this environment is offline — no real checkpoints), then imported and
checked for exact tensor placement, transform correctness (transpose /
conv3d-patchify equivalence), and a finite forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.io.dit_importers import (
    flux2_dit_tree,
    ltx2_dit_rules,
    ltx2_dit_tree,
    wan_dit_rules,
    wan_dit_tree,
)
from ai_toolkit_tpu.io.torch_import import tree_to_torch
from ai_toolkit_tpu.models.registry import get_model_class


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = v
    return out


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        out[k] = _merge(dst.get(k, {}), v) if isinstance(v, dict) else v
    return out


def _fake_wan_flat(model, variables, rng, i2v=False):
    """Synthesize a diffusers-layout wan dict at the tiny model's shapes."""
    cfg = model.dit_config
    flat = tree_to_torch(variables["dit"], wan_dit_rules(cfg.scan_blocks, i2v))
    flat = {k: rng.normal(size=v.shape).astype(np.float32) for k, v in flat.items()}
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    flat["patch_embedding.weight"] = rng.normal(
        size=(d, cfg.in_channels, pt, ph, pw)
    ).astype(np.float32)
    flat["patch_embedding.bias"] = rng.normal(size=(d,)).astype(np.float32)
    flat["scale_shift_table"] = rng.normal(size=(1, 2, d)).astype(np.float32)
    for i in range(cfg.num_layers):
        flat[f"blocks.{i}.scale_shift_table"] = rng.normal(size=(1, 6, d)).astype(np.float32)
    return flat


def test_wan_import_placement_and_forward():
    model = get_model_class("wan21")(ModelConfig(arch="wan21", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    flat = _fake_wan_flat(model, variables, rng)
    tree, unmatched = wan_dit_tree(flat, model.dit_config)
    assert unmatched == [], unmatched

    # exact placement + transpose
    got = _leaves(tree)
    np.testing.assert_array_equal(
        got["block_0/self_q/kernel"], flat["blocks.0.attn1.to_q.weight"].T
    )
    np.testing.assert_array_equal(
        got["block_1/cross_k_norm/scale"], flat["blocks.1.attn2.norm_k.weight"]
    )
    np.testing.assert_array_equal(got["block_0/modulation"],
                                  flat["blocks.0.scale_shift_table"][0])
    np.testing.assert_array_equal(got["head_modulation"], flat["scale_shift_table"][0])

    # every imported leaf must have a same-shape slot in the model tree
    init = _leaves(variables["dit"])
    for k, v in got.items():
        assert k in init, f"imported leaf {k} has no model slot"
        assert tuple(init[k].shape) == tuple(v.shape), (k, init[k].shape, v.shape)
    # full coverage: everything except the (randomly initialized) norm scales
    # the checkpoint also carries is imported
    missing = [k for k in init if k not in got]
    assert missing == [], f"model slots not covered by the importer: {missing}"

    # conv3d patchify equivalence: tokens @ kernel == Conv3d(x, w)
    from ai_toolkit_tpu.models.wan_dit import wan_patchify

    cfg = model.dit_config
    pt, ph, pw = cfg.patch_size
    x = rng.normal(size=(1, 2 * pt, 2 * ph, 2 * pw, cfg.in_channels)).astype(np.float32)
    tokens = wan_patchify(jnp.asarray(x), cfg.patch_size)
    ours = np.asarray(tokens @ got["patch_embedding/kernel"] + got["patch_embedding/bias"])
    w = flat["patch_embedding.weight"]  # [out, in, kt, kh, kw]
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 4, 1, 2, 3)), jnp.asarray(w),
        window_strides=(pt, ph, pw), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )  # [1, out, T', H', W']
    conv = np.asarray(conv).transpose(0, 2, 3, 4, 1).reshape(1, -1, cfg.dim)
    conv = conv + flat["patch_embedding.bias"]
    np.testing.assert_allclose(ours, conv, rtol=1e-4, atol=1e-4)

    # forward runs finite on imported weights
    merged = {**variables, "dit": _merge(variables["dit"], tree)}
    cond = model.encode_prompt(merged, ["x"])
    cond["pe"] = model.rope_table(pt, 2 * ph, 2 * pw)
    lat = jnp.asarray(rng.normal(size=(1, pt, 2 * ph, 2 * pw, cfg.in_channels)), jnp.float32)
    out = model.predict(merged, lat, jnp.full((1,), 0.4), cond)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_i2v_import_rules():
    model = get_model_class("wan21_i2v")(
        ModelConfig(arch="wan21_i2v", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    rng = np.random.default_rng(1)
    flat = _fake_wan_flat(model, variables, rng, i2v=True)
    tree, unmatched = wan_dit_tree(flat, model.dit_config, i2v=True)
    assert unmatched == []
    got = _leaves(tree)
    assert "block_0/cross_k_img/kernel" in got
    assert "img_emb_norm1/scale" in got
    init = _leaves(variables["dit"])
    for k, v in got.items():
        assert k in init and tuple(init[k].shape) == tuple(v.shape), k


def test_ltx2_import_placement():
    model = get_model_class("ltx2")(ModelConfig(arch="ltx2", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    cfg = model.dit_config
    rng = np.random.default_rng(2)
    flat = tree_to_torch(variables["dit"], ltx2_dit_rules(cfg.scan_blocks))
    flat = {k: rng.normal(size=v.shape).astype(np.float32) for k, v in flat.items()}
    flat["scale_shift_table"] = rng.normal(size=(2, cfg.dim)).astype(np.float32)
    for i in range(cfg.num_layers):
        flat[f"transformer_blocks.{i}.scale_shift_table"] = rng.normal(
            size=(6, cfg.dim)
        ).astype(np.float32)
    tree, unmatched = ltx2_dit_tree(flat, cfg)
    assert unmatched == []
    got = _leaves(tree)
    np.testing.assert_array_equal(
        got["block_0/ffn_in/kernel"], flat["transformer_blocks.0.ff.net.0.proj.weight"].T
    )
    np.testing.assert_array_equal(
        got["patch_embedding/kernel"], flat["proj_in.weight"].T
    )
    init = _leaves(variables["dit"])
    for k, v in got.items():
        assert k in init and tuple(init[k].shape) == tuple(v.shape), k


def test_hidream_import_moe_and_attention():
    from ai_toolkit_tpu.io.dit_importers import hidream_dit_tree

    model = get_model_class("hidream")(
        ModelConfig(arch="hidream", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    cfg = model.dit_config
    rng = np.random.default_rng(4)
    init = _leaves(variables["dit"])
    h = cfg.hidden_size
    mlp = int(h * cfg.mlp_ratio)
    sh = cfg.moe_shared_hidden or mlp // 2
    E = cfg.moe_experts

    flat = {}

    def lin(key, kern_path, bias=True):
        flat[key + ".weight"] = rng.normal(size=init[kern_path].shape[::-1]).astype(np.float32)
        if bias and kern_path.replace("/kernel", "/bias") in init:
            flat[key + ".bias"] = rng.normal(
                size=init[kern_path.replace("/kernel", "/bias")].shape
            ).astype(np.float32)

    lin("t_embedder.timestep_embedder.linear_1", "time_in/in_layer/kernel")
    lin("t_embedder.timestep_embedder.linear_2", "time_in/out_layer/kernel")
    lin("p_embedder.pooled_embedder.linear_1", "vector_in/in_layer/kernel")
    lin("p_embedder.pooled_embedder.linear_2", "vector_in/out_layer/kernel")
    lin("x_embedder.proj", "img_in/kernel")
    lin("final_layer.linear", "final_proj/kernel")
    lin("final_layer.adaLN_modulation.1", "final_mod/kernel")

    def swiglu(prefix, inner):
        flat[prefix + ".w1.weight"] = rng.normal(size=(inner, h)).astype(np.float32)
        flat[prefix + ".w2.weight"] = rng.normal(size=(h, inner)).astype(np.float32)
        flat[prefix + ".w3.weight"] = rng.normal(size=(inner, h)).astype(np.float32)

    for i in range(cfg.depth_double):
        p = f"double_stream_blocks.{i}.block."
        flat[p + "adaLN_modulation.1.weight"] = rng.normal(size=(12 * h, h)).astype(np.float32)
        flat[p + "adaLN_modulation.1.bias"] = rng.normal(size=(12 * h,)).astype(np.float32)
        for n in ("to_q", "to_k", "to_v", "to_q_t", "to_k_t", "to_v_t"):
            flat[p + f"attn1.{n}.weight"] = rng.normal(size=(h, h)).astype(np.float32)
            flat[p + f"attn1.{n}.bias"] = rng.normal(size=(h,)).astype(np.float32)
        for n in ("to_out", "to_out_t"):
            flat[p + f"attn1.{n}.weight"] = rng.normal(size=(h, h)).astype(np.float32)
            flat[p + f"attn1.{n}.bias"] = rng.normal(size=(h,)).astype(np.float32)
        for n in ("q_rms_norm", "k_rms_norm", "q_rms_norm_t", "k_rms_norm_t"):
            flat[p + f"attn1.{n}.weight"] = rng.normal(size=(h,)).astype(np.float32)
        flat[p + "ff_i.gate.weight"] = rng.normal(size=(E, h)).astype(np.float32)
        for e in range(E):
            swiglu(p + f"ff_i.experts.{e}", mlp)
        swiglu(p + "ff_i.shared_experts", sh)
        swiglu(p + "ff_t", mlp)
    for i in range(cfg.depth_single):
        p = f"single_stream_blocks.{i}.block."
        flat[p + "adaLN_modulation.1.weight"] = rng.normal(size=(6 * h, h)).astype(np.float32)
        flat[p + "adaLN_modulation.1.bias"] = rng.normal(size=(6 * h,)).astype(np.float32)
        for n in ("to_q", "to_k", "to_v", "to_out"):
            flat[p + f"attn1.{n}.weight"] = rng.normal(size=(h, h)).astype(np.float32)
            flat[p + f"attn1.{n}.bias"] = rng.normal(size=(h,)).astype(np.float32)
        for n in ("q_rms_norm", "k_rms_norm"):
            flat[p + f"attn1.{n}.weight"] = rng.normal(size=(h,)).astype(np.float32)
        flat[p + "ff_i.gate.weight"] = rng.normal(size=(E, h)).astype(np.float32)
        for e in range(E):
            swiglu(p + f"ff_i.experts.{e}", mlp)
        swiglu(p + "ff_i.shared_experts", sh)

    tree, unmatched = hidream_dit_tree(flat, cfg)
    assert unmatched == [], unmatched
    got = _leaves(tree)
    # fused qkv: q|k|v column order
    q = flat["double_stream_blocks.0.block.attn1.to_q.weight"].T
    np.testing.assert_array_equal(got["double_0/img_qkv/kernel"][:, :h], q)
    # adaLN split: first 6d -> img_mod, last 6d -> txt_mod
    w = flat["double_stream_blocks.0.block.adaLN_modulation.1.weight"].T
    np.testing.assert_array_equal(got["double_0/img_mod/mod/kernel"], w[:, : 6 * h])
    np.testing.assert_array_equal(got["double_0/txt_mod/mod/kernel"], w[:, 6 * h:])
    # expert stacking: [E, in, hidden]
    np.testing.assert_array_equal(
        got["double_0/img_mlp_moe/experts/w1/kernel"][2],
        flat["double_stream_blocks.0.block.ff_i.experts.2.w1.weight"].T,
    )
    # every imported leaf has a same-shape model slot; txt_in stays random
    for k, v in got.items():
        assert k in init, f"no slot for {k}"
        assert tuple(init[k].shape) == tuple(v.shape), (k, init[k].shape, v.shape)
    not_covered = [k for k in init if k not in got]
    assert all("txt_in" in k for k in not_covered), not_covered

    # forward finite on imported weights
    merged = {**variables, "dit": _merge(variables["dit"], tree)}
    cond = model.encode_prompt(merged, ["x"])
    lat = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 4, 4, cfg.in_channels // 4)), jnp.float32
    )
    cond["pe"] = model.rope_table(4, 4, int(cond["txt"].shape[1]))
    out = model.predict(merged, lat, jnp.full((1,), 0.3), cond)
    assert np.isfinite(np.asarray(out)).all()


def test_flux2_import_global_modulation_tiling():
    model = get_model_class("flux2")(ModelConfig(arch="flux2", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    cfg = model.dit_config
    rng = np.random.default_rng(3)
    from ai_toolkit_tpu.io.flux_import import flux_dit_rules

    flat = tree_to_torch(variables["dit"], flux_dit_rules(cfg.scan_blocks))
    # flux2 is bias-free and has no per-block modulation linears
    flat = {
        k: rng.normal(size=v.shape).astype(np.float32)
        for k, v in flat.items()
        if not k.endswith(".bias") and "_mod.lin" not in k and "modulation.lin" not in k
    }
    h = cfg.hidden_size
    flat["double_stream_modulation_img.lin.weight"] = rng.normal(size=(6 * h, h)).astype(np.float32)
    flat["double_stream_modulation_txt.lin.weight"] = rng.normal(size=(6 * h, h)).astype(np.float32)
    flat["single_stream_modulation.lin.weight"] = rng.normal(size=(3 * h, h)).astype(np.float32)
    tree, unmatched = flux2_dit_tree(flat, cfg)
    assert unmatched == []
    got = _leaves(tree)
    # tiled modulation: every double block shares the global kernel
    for i in range(cfg.depth_double):
        np.testing.assert_array_equal(
            got[f"double_{i}/img_mod/mod/kernel"],
            flat["double_stream_modulation_img.lin.weight"].T,
        )
        # bias-free checkpoint -> explicit zero bias (never random)
        assert not got[f"double_{i}/img_mod/mod/bias"].any()
    for i in range(cfg.depth_single):
        np.testing.assert_array_equal(
            got[f"single_{i}/mod/mod/kernel"],
            flat["single_stream_modulation.lin.weight"].T,
        )
    init = _leaves(variables["dit"])
    for k, v in got.items():
        assert k in init and tuple(init[k].shape) == tuple(v.shape), k

    # forward finite on imported weights
    merged = {**variables, "dit": _merge(variables["dit"], tree)}
    cond = model.encode_prompt(merged, ["x"])
    lat_h = lat_w = 4  # predict packs 2x2 -> token dim = 4 * latent C = in_channels
    lat = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, lat_h, lat_w, cfg.in_channels // 4)),
        jnp.float32,
    )
    cond["pe"] = model.rope_table(lat_h, lat_w, int(cond["txt"].shape[1]))
    cond["guidance"] = jnp.full((1,), 1.0)
    out = model.predict(merged, lat, jnp.full((1,), 0.3), cond)
    assert np.isfinite(np.asarray(out)).all()
