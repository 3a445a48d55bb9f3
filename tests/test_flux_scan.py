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


def test_chroma_approximator_modulation():
    """Chroma arch: pruned time_in/vector_in, all modulation from the
    distilled-guidance Approximator (reference chroma/src/model.py:118-228),
    identical math for scanned and unrolled layouts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("chroma")(ModelConfig(arch="chroma", model_kwargs={"size": "tiny"}))
    cfg = model.dit_config
    assert cfg.chroma_mod and not cfg.guidance_embed
    variables = model.init_variables(jax.random.key(0))
    flat = set()

    def walk(tree, pre=""):
        for k, v in tree.items():
            (walk(v, pre + k + "/") if isinstance(v, dict) else flat.add(pre + k))

    walk(variables["dit"])
    assert not any(p.startswith(("time_in", "vector_in", "guidance_in", "final_mod"))
                   for p in flat), sorted(flat)[:5]
    assert any(p.startswith("distilled_guidance/") for p in flat)

    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a"])
    cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1])
    cond["guidance"] = jnp.zeros((1,))
    x = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out1 = model.predict(variables, x, jnp.full((1,), 0.3), cond)
    assert np.isfinite(np.asarray(out1)).all()
    # timestep feeds ONLY through the approximator — changing t changes out
    out2 = model.predict(variables, x, jnp.full((1,), 0.7), cond)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6

    # scanned == unrolled (same params restacked)
    base = FluxConfig(**{**cfg.__dict__, "scan_blocks": False})
    scan_cfg = FluxConfig(**{**cfg.__dict__, "scan_blocks": True})
    dit_u = FluxDiT(base)
    n_img, n_txt = 16, 4
    rng = jax.random.key(3)
    pe = model.rope_table(8, 8, n_txt)
    img = jax.random.normal(rng, (1, n_img, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(4), (1, n_txt, cfg.context_dim))
    t = jnp.full((1,), 0.4)
    y = jnp.zeros((1, cfg.vec_dim))
    params_u = dit_u.init(jax.random.key(5), img, txt, t, y, pe, jnp.zeros((1,)))["params"]
    out_u = dit_u.apply({"params": params_u}, img, txt, t, y, pe, jnp.zeros((1,)))
    # restack unrolled params into the scanned layout
    import numpy as _np

    def stack(keys, n):
        out = {}
        first = params_u[f"{keys}_0"]

        def rec(paths, sub):
            for k, v in sub.items():
                if isinstance(v, dict):
                    rec(paths + [k], v)
                else:
                    arrs = [params_u[f"{keys}_{i}"]
                            for i in range(n)]
                    for pth in paths:
                        arrs = [a[pth] for a in arrs]
                    arrs = [a[k] for a in arrs]
                    d = out
                    for pth in paths:
                        d = d.setdefault(pth, {})
                    d[k] = _np.stack(arrs)

        rec([], first)
        return out

    params_s = {k: v for k, v in params_u.items()
                if not k.startswith(("double_", "single_"))}
    params_s["double_blocks"] = {"block": stack("double", cfg.depth_double)}
    params_s["single_blocks"] = {"block": stack("single", cfg.depth_single)}
    dit_s = FluxDiT(scan_cfg)
    out_s = dit_s.apply({"params": params_s}, img, txt, t, y, pe, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), atol=2e-5, rtol=2e-5)
