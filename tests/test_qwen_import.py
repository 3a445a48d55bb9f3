"""Qwen-Image importer: diffusers-layout state dict -> our scanned tree."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.io.qwen_import import qwen_transformer_to_tree
from ai_toolkit_tpu.models.registry import get_model_class


def _fake_diffusers_flat(ref_tree: dict, depth: int, rng) -> dict:
    """Build a random diffusers-layout dict whose shapes invert to ref_tree."""
    flat = {}

    def rnd(shape):
        return rng.normal(size=shape).astype(np.float32)

    def k_of(path):  # fetch leaf in ref tree
        node = ref_tree
        for p in path.split("/"):
            node = node[p]
        return node

    def lin(flat_key, tree_path, layer=None):
        kern = np.asarray(k_of(tree_path + "/kernel"))
        kern = kern[layer] if layer is not None else kern
        flat[flat_key + ".weight"] = rnd(kern.T.shape)
        try:
            b = np.asarray(k_of(tree_path + "/bias"))
            b = b[layer] if layer is not None else b
            flat[flat_key + ".bias"] = rnd(b.shape)
        except KeyError:
            pass

    lin("img_in", "img_in")
    lin("txt_in", "txt_in")
    lin("time_text_embed.timestep_embedder.linear_1", "time_in/in_layer")
    lin("time_text_embed.timestep_embedder.linear_2", "time_in/out_layer")
    lin("norm_out.linear", "final_mod")
    lin("proj_out", "final_proj")
    flat["txt_norm.weight"] = rnd((np.asarray(k_of("txt_in/kernel")).shape[0],))

    for i in range(depth):
        p = f"transformer_blocks.{i}."
        qkv = np.asarray(k_of("double_blocks/block/img_qkv/kernel"))[i]  # [in, 3h]
        h = qkv.shape[1] // 3
        for j, name in enumerate(("attn.to_q", "attn.to_k", "attn.to_v")):
            flat[p + name + ".weight"] = rnd((h, qkv.shape[0]))
            flat[p + name + ".bias"] = rnd((h,))
        for j, name in enumerate(("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj")):
            flat[p + name + ".weight"] = rnd((h, qkv.shape[0]))
            flat[p + name + ".bias"] = rnd((h,))
        hd = np.asarray(k_of("double_blocks/block/img_qknorm/query_norm/scale")).shape[-1]
        flat[p + "attn.norm_q.weight"] = rnd((hd,))
        flat[p + "attn.norm_k.weight"] = rnd((hd,))
        flat[p + "attn.norm_added_q.weight"] = rnd((hd,))
        flat[p + "attn.norm_added_k.weight"] = rnd((hd,))
        lin(p + "attn.to_out.0", "double_blocks/block/img_proj", i)
        lin(p + "attn.to_add_out", "double_blocks/block/txt_proj", i)
        lin(p + "img_mlp.net.0.proj", "double_blocks/block/img_mlp_in", i)
        lin(p + "img_mlp.net.2", "double_blocks/block/img_mlp_out", i)
        lin(p + "txt_mlp.net.0.proj", "double_blocks/block/txt_mlp_in", i)
        lin(p + "txt_mlp.net.2", "double_blocks/block/txt_mlp_out", i)
        lin(p + "img_mod.1", "double_blocks/block/img_mod/mod", i)
        lin(p + "txt_mod.1", "double_blocks/block/txt_mod/mod", i)
    return flat


def test_qwen_import_structure_and_forward():
    model = get_model_class("qwen_image")(
        ModelConfig(arch="qwen_image", model_kwargs={"size": "tiny"})
    )
    # the importer targets the scanned layout; build a scanned twin config
    from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT

    cfg = FluxConfig(**{**model.dit_config.__dict__, "scan_blocks": True})
    dit = FluxDiT(cfg)
    n_img, n_txt = 16, 8
    pe = jnp.zeros((1, n_txt + n_img, cfg.head_dim // 2, 2, 2))
    ref = dit.init(
        jax.random.key(0), jnp.zeros((1, n_img, cfg.in_channels)),
        jnp.zeros((1, n_txt, cfg.context_dim)), jnp.zeros((1,)),
        jnp.zeros((1, cfg.vec_dim)), pe, None,
    )["params"]

    rng = np.random.default_rng(0)
    flat = _fake_diffusers_flat(ref, cfg.depth_double, rng)
    tree, unmatched = qwen_transformer_to_tree(flat, cfg.depth_double)
    # only the txt_norm (no slot in our graph, documented) may be unmatched
    assert unmatched == ["txt_norm.weight"], unmatched

    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    # vector_in (pooled-text MLP) has no qwen equivalent: keep random init
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), tree)
    for key in ref_shapes:
        if key == "vector_in":
            assert key not in got_shapes
            continue
        assert got_shapes[key] == ref_shapes[key], key

    # forward with imported weights (vector_in grafted from init)
    tree["vector_in"] = ref["vector_in"]
    out = dit.apply(
        {"params": tree}, jnp.ones((1, n_img, cfg.in_channels)),
        jnp.ones((1, n_txt, cfg.context_dim)), jnp.full((1,), 0.5),
        jnp.zeros((1, cfg.vec_dim)), pe, None,
    )
    assert out.shape == (1, n_img, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    # qkv fusion order: q block of the fused kernel equals to_q.weight.T
    q_w = flat["transformer_blocks.0.attn.to_q.weight"]
    fused = np.asarray(tree["double_blocks"]["block"]["img_qkv"]["kernel"])[0]
    h = q_w.shape[0]
    np.testing.assert_allclose(fused[:, :h], q_w.T, atol=1e-7)
    # final_mod halves swapped (diffusers scale|shift -> ours shift|scale)
    w = flat["norm_out.linear.weight"]
    ours = np.asarray(tree["final_mod"]["kernel"])
    h2 = ours.shape[-1] // 2
    np.testing.assert_allclose(ours[:, :h2], w.T[:, h2:], atol=1e-7)


def test_mageflow_registers_on_qwen_path(tmp_path):
    """MageFlow (reference mageflow/src/transformer.py) shares the qwen-image
    block structure key-for-key; dims come from transformer/config.json."""
    import json

    from safetensors.numpy import save_file

    from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT

    # checkpoint-dir path: dims from config.json, weights via the importer
    tdir = tmp_path / "transformer"
    tdir.mkdir()
    cfg_json = {
        "in_channels": 16, "out_channels": 16, "context_in_dim": 32,
        "hidden_size": 64, "num_heads": 4, "depth": 2,
        "axes_dim": [4, 6, 6], "checkpoint": False, "patch_size": 1,
    }
    (tdir / "config.json").write_text(json.dumps(cfg_json))

    model = get_model_class("mageflow")(
        ModelConfig(arch="mageflow", name_or_path=str(tmp_path),
                    model_kwargs={"te_size": "tiny", "vae_size": "tiny"})
    )
    assert model.dit_config.hidden_size == 64
    assert model.dit_config.depth_double == 2 and model.dit_config.depth_single == 0
    assert model.dit_config.in_channels == 16

    scan_cfg = FluxConfig(**{**model.dit_config.__dict__, "scan_blocks": True})
    dit = FluxDiT(scan_cfg)
    pe = jnp.zeros((1, 24, scan_cfg.head_dim // 2, 2, 2))
    ref = dit.init(
        jax.random.key(0), jnp.zeros((1, 16, 16)), jnp.zeros((1, 8, 32)),
        jnp.zeros((1,)), jnp.zeros((1, scan_cfg.vec_dim)), pe, None,
    )["params"]
    rng = np.random.default_rng(1)
    flat = _fake_diffusers_flat(ref, 2, rng)
    save_file(flat, str(tdir / "diffusion_pytorch_model.safetensors"))

    variables = model.load_variables(jax.random.key(0))
    got = np.asarray(
        variables["dit"]["double_blocks"]["block"]["img_qkv"]["kernel"]
    ) if "double_blocks" in variables["dit"] else None
    assert got is not None and got.shape[0] == 2  # both layers imported
    # the merge casts imported leaves to the model's param dtype (bf16, same
    # as every other arch importer) — compare against the bf16-cast source
    q_w = flat["transformer_blocks.1.attn.to_q.weight"]
    expect = np.asarray(jnp.asarray(q_w.T, dtype=jnp.bfloat16), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(got[1][:, : q_w.shape[0]], dtype=np.float32), expect, atol=1e-6)


def test_extra_archs_refuse_silent_random_checkpoints(tmp_path):
    import pytest as _pytest

    # table-driven archs with no importer refuse outright
    model = get_model_class("nucleus_image")(
        ModelConfig(arch="nucleus_image", name_or_path=str(tmp_path),
                    model_kwargs={"size": "tiny"})
    )
    with _pytest.raises(NotImplementedError, match="no checkpoint importer"):
        model.load_variables(jax.random.key(0))

    # exact archs refuse a named path that contains no transformer/ to load
    model = get_model_class("boogu_image")(
        ModelConfig(arch="boogu_image", name_or_path=str(tmp_path),
                    model_kwargs={"size": "tiny"})
    )
    with _pytest.raises(FileNotFoundError, match="refusing to random-init"):
        model.load_variables(jax.random.key(0))
