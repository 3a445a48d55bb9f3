"""InstantLoRA + LLMAdapter CustomAdapter types.

Reference: toolkit/models/ilora.py (per-sample generated LoRA weights) and
toolkit/models/llm_adapter.py (LLM text path through a trainable
context_embedder)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from ai_toolkit_tpu.adapters.ilora import (
    ILoRAGenerator,
    build_ilora_spec,
    make_ilora_apply,
    vector_to_lora_tree,
)
from ai_toolkit_tpu.ops.layers import Linear


def _tiny_lora_tree():
    return {
        "attn": {"q": {"a": jnp.zeros((8, 2)), "b": jnp.zeros((2, 8)),
                       "scale": jnp.asarray(1.0)}},
        "blocks": {"mlp": {"a": jnp.zeros((3, 8, 2)), "b": jnp.zeros((3, 2, 8)),
                           "scale": jnp.full((3,), 0.5)}},
    }


def test_ilora_spec_and_vector_mapping():
    tree = _tiny_lora_tree()
    spec = build_ilora_spec(tree)
    assert spec.total == (8 * 2 + 2 * 8) + 3 * (8 * 2 + 2 * 8)
    vec = jnp.arange(2 * spec.total, dtype=jnp.float32).reshape(2, spec.total)
    out = vector_to_lora_tree(vec, spec, tree)
    assert out["attn"]["q"]["a"].shape == (2, 8, 2)
    assert out["attn"]["q"]["b"].shape == (2, 2, 8)
    # scanned: [L, B, in, r] so nn.scan slices the layer axis as usual
    assert out["blocks"]["mlp"]["a"].shape == (3, 2, 8, 2)
    assert out["blocks"]["mlp"]["b"].shape == (3, 2, 2, 8)
    # scale leaves untouched (alpha/rank semantics stay with the network)
    np.testing.assert_allclose(np.asarray(out["blocks"]["mlp"]["scale"]),
                               np.full((3,), 0.5))
    # slices land where the spec says: sample 0 entry 0 'a' is the first chunk
    np.testing.assert_allclose(
        np.asarray(out["attn"]["q"]["a"][0]).reshape(-1), np.arange(16.0)
    )


def test_batched_lora_delta_matches_per_sample():
    """ops.layers Linear with [B, in, r] lora factors == per-sample loop."""
    mod = Linear(8, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (3, 5, 8))
    params = mod.init(jax.random.key(1), x)["params"]
    a = jax.random.normal(jax.random.key(2), (3, 8, 2)) * 0.1
    b = jax.random.normal(jax.random.key(3), (3, 2, 8)) * 0.1
    scale = jnp.asarray(2.0)
    batched = mod.apply(
        {"params": params, "lora": {"a": a, "b": b, "scale": scale}}, x
    )
    for i in range(3):
        single = mod.apply(
            {"params": params, "lora": {"a": a[i], "b": b[i], "scale": scale}},
            x[i:i + 1],
        )
        np.testing.assert_allclose(np.asarray(batched[i:i + 1]),
                                   np.asarray(single), rtol=1e-5, atol=1e-5)


def test_ilora_generator_and_apply():
    tree = _tiny_lora_tree()
    spec = build_ilora_spec(tree)
    gen = ILoRAGenerator(total=spec.total, head_dim=32, num_heads=2)
    vt = jax.random.normal(jax.random.key(0), (2, 6, 16))
    params = gen.init(jax.random.key(1), vt)["params"]
    vec = gen.apply({"params": params}, vt)
    assert vec.shape == (2, spec.total)
    # different images -> different generated weights
    vec2 = gen.apply({"params": params},
                     jax.random.normal(jax.random.key(2), (2, 6, 16)))
    assert float(jnp.abs(vec - vec2).max()) > 1e-8
    # output heads are 0.01-scaled: generated deltas start tiny
    assert float(jnp.abs(vec).mean()) < 0.1

    apply = make_ilora_apply(spec, tree, gen)
    variables = {"adapter": params, "dit": {}}
    cond = {"txt": jnp.zeros((2, 5, 8)), "vision_tokens": vt}
    v2, c2 = apply(params, variables, cond)
    assert "vision_tokens" not in c2
    assert v2["lora"]["attn"]["q"]["a"].shape == (2, 8, 2)
    # CFG stacking: ctx batch 2x vision batch -> weights tiled
    cond_cfg = {"txt": jnp.zeros((4, 5, 8)), "vision_tokens": vt}
    v3, _ = apply(params, variables, cond_cfg)
    assert v3["lora"]["attn"]["q"]["a"].shape == (4, 8, 2)
    np.testing.assert_allclose(np.asarray(v3["lora"]["attn"]["q"]["a"][:2]),
                               np.asarray(v3["lora"]["attn"]["q"]["a"][2:]))


def test_llm_adapter_cond_replacement():
    from ai_toolkit_tpu.adapters.custom_adapter import init_custom_adapter

    ctx_dim, hidden = 32, 24
    params, runtime = init_custom_adapter(
        {"type": "llm_adapter", "_llm_hidden": hidden}, ctx_dim, "txt", 0,
        jax.random.key(0),
    )
    cond = {
        "txt": jnp.ones((2, 5, ctx_dim)),
        "llm_states": jax.random.normal(jax.random.key(1), (2, 9, hidden)),
        "llm_mask": jnp.ones((2, 9), jnp.int32),
    }
    out = runtime.apply_cond({"adapter": params}, cond)
    # text path fully replaced by the projected LLM states
    assert out["txt"].shape == (2, 9, ctx_dim)
    assert out["txt_mask"].shape == (2, 9)
    assert "llm_states" not in out and "llm_mask" not in out


def _train_cfg(tmp_path, folder, adapter, name):
    return {
        "job": "extension",
        "config": {
            "name": name,
            "process": [{
                "type": "sd_trainer",
                "training_folder": str(tmp_path / "output"),
                "adapter": adapter,
                "network": {"type": "lora", "linear": 2, "linear_alpha": 2},
                "save": {"save_every": 100},
                "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                              "resolution": 32}],
                "train": {"batch_size": 2, "steps": 3, "noise_scheduler": "flowmatch",
                          "timestep_type": "sigmoid", "optimizer": "adamw", "lr": 1e-3,
                          "dtype": "float32", "ema_config": {"use_ema": False}},
                "model": {"name_or_path": "", "arch": "flux",
                          "model_kwargs": {"size": "tiny"}},
                "sample": {"sample_every": 0, "prompts": []},
                "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
            }],
        },
    }


def _make_imgs(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"photo {i}")
    return folder


@pytest.mark.slow
def test_ilora_training_e2e(tmp_path):
    """Full trainer run: the generator trains, per-sample lora reaches the DiT."""
    folder = _make_imgs(tmp_path)
    cfg = _train_cfg(tmp_path, folder, {"type": "ilora", "head_dim": 32}, "ilora_e2e")
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    out_dir = tmp_path / "output" / "ilora_e2e"
    assert any(f.endswith(".safetensors") for f in os.listdir(out_dir))


@pytest.mark.slow
def test_llm_adapter_training_e2e(tmp_path):
    """LLM text path on tiny flux: context_embedder trains, loss finite."""
    folder = _make_imgs(tmp_path)
    cfg = _train_cfg(
        tmp_path, folder, {"type": "llm_adapter", "num_tokens": 16}, "llm_e2e"
    )
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
