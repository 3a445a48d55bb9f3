"""Round-3 knob tail: short/long dual captions (+SDXL encoder split),
unconditional_lora_path, and the reference's vestigial model_paths/in_context
keys (parsed-but-unconsumed upstream — accepted here without warning)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image


def _make_json_dataset(tmp_path, n=4, size=64):
    folder = tmp_path / "imgs"
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"im_{i}.png")
        (folder / f"im_{i}.json").write_text(json.dumps({
            "caption": f"a long detailed photo of thing {i} on a table",
            "caption_short": f"thing {i}",
        }))
    return str(folder)


def test_load_caption_pair_json(tmp_path):
    from ai_toolkit_tpu.data.captions import load_caption_pair

    folder = _make_json_dataset(tmp_path, n=1)
    img = os.path.join(folder, "im_0.png")
    cap, short = load_caption_pair(img, "json", default="dflt")
    assert cap.startswith("a long detailed")
    assert short == "thing 0"
    # txt fallback: short falls back to the default caption
    # (reference dataloader_mixins.py:359-360)
    cap2, short2 = load_caption_pair(str(tmp_path / "missing.png"), "txt", "dflt")
    assert cap2 == "dflt" and short2 == "dflt"


def test_use_short_captions_replaces_caption(tmp_path):
    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.dataset import FolderDataset

    folder = _make_json_dataset(tmp_path, n=2)
    dcfg = DatasetConfig.from_dict({
        "folder_path": folder, "caption_ext": "json", "resolution": 64,
        "use_short_captions": True,
    })
    ds = FolderDataset(dcfg, 8)
    assert all(it.caption == it.caption_short for it in ds.items)
    assert ds.items[0].caption.startswith("thing")


def test_double_short_long_batch():
    from ai_toolkit_tpu.jobs.train_process import double_short_long_batch

    raw = {
        "captions": ["long one", "long two"],
        "captions_short": ["s1", "s2"],
        "latents": np.arange(2 * 3, dtype=np.float32).reshape(2, 3),
        "noise_seed": np.asarray([7, 9], np.int32),
        "loss_multiplier": np.ones((2,), np.float32),
        "bucket": (64, 64),
        "is_reg": False,
    }
    out = double_short_long_batch(raw)
    assert out["captions"] == ["long one", "long two", "s1", "s2"]
    assert out["latents"].shape == (4, 3)
    np.testing.assert_array_equal(out["latents"][:2], out["latents"][2:])
    np.testing.assert_array_equal(out["noise_seed"], [7, 9, 7, 9])
    assert out["bucket"] == (64, 64)


@pytest.mark.slow
def test_short_long_captions_e2e(tmp_path):
    from tests.test_e2e import job_yaml

    folder = _make_json_dataset(tmp_path)
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=2,
                   extra_train={"short_and_long_captions": True})
    cfg["config"]["process"][0]["datasets"][0]["caption_ext"] = "json"
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    results = get_job(get_config(cfg_path)).run()
    assert np.isfinite(results[0]["final_loss"])


def test_sdxl_encoder_split_changes_te1_stream():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    cls = get_model_class("sdxl")
    model = cls(ModelConfig(arch="sdxl", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    same = model.encode_prompt(variables, ["a long caption"])
    split = model.encode_prompt(variables, ["a long caption"],
                                prompts_te1=["short"])
    # TE2 half of the context and the pooled output are unchanged; the TE1
    # half differs (short caption fed to CLIP-L only)
    ctx_a, ctx_b = np.asarray(same["context"]), np.asarray(split["context"])
    d1 = model.clip_config.hidden_size
    assert not np.allclose(ctx_a[..., :d1], ctx_b[..., :d1])
    np.testing.assert_allclose(ctx_a[..., d1:], ctx_b[..., d1:], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(same["pooled"]),
                               np.asarray(split["pooled"]), rtol=1e-5)


def test_concat_loras_is_exact_sum():
    from ai_toolkit_tpu.adapters.lora import (
        LoRASpec, build_lora, concat_loras, merge_lora,
    )

    params = {"blk": {"fc": {"kernel": jnp.zeros((8, 6)),
                             "bias": jnp.zeros((6,))}}}
    l1 = build_lora(params, LoRASpec(rank=2, alpha=4.0), jax.random.key(0))
    l2 = build_lora(params, LoRASpec(rank=3, alpha=3.0), jax.random.key(1))
    # give the zero-init 'b' sides real values so the deltas are nonzero
    l1["blk"]["fc"]["b"] = jax.random.normal(jax.random.key(2), (2, 6))
    l2["blk"]["fc"]["b"] = jax.random.normal(jax.random.key(3), (3, 6))

    both = merge_lora(merge_lora(params, l1), l2)["blk"]["fc"]["kernel"]
    combined = merge_lora(params, concat_loras(l1, l2))["blk"]["fc"]["kernel"]
    np.testing.assert_allclose(np.asarray(both), np.asarray(combined),
                               rtol=1e-5, atol=1e-6)
    # scanned stacks: [L, in, r] with scale [L]
    sparams = {"blocks": {"fc": {"kernel": jnp.zeros((3, 8, 6))}}}
    s1 = build_lora(sparams, LoRASpec(rank=2, alpha=2.0), jax.random.key(4))
    s2 = build_lora(sparams, LoRASpec(rank=2, alpha=6.0), jax.random.key(5))
    s1["blocks"]["fc"]["b"] = jax.random.normal(jax.random.key(6), (3, 2, 6))
    s2["blocks"]["fc"]["b"] = jax.random.normal(jax.random.key(7), (3, 2, 6))
    both = merge_lora(merge_lora(sparams, s1), s2)["blocks"]["fc"]["kernel"]
    comb = merge_lora(sparams, concat_loras(s1, s2))["blocks"]["fc"]["kernel"]
    np.testing.assert_allclose(np.asarray(both), np.asarray(comb),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_unconditional_lora_changes_uncond_pass_only(tmp_path):
    """Sampling with an uncond lora differs from without it ONLY when a real
    CFG pass runs (reference: inactive on the conditional branch)."""
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_sd
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    ul = build_lora(variables["unet"], LoRASpec(rank=2, alpha=16.0),
                    jax.random.key(1))
    # non-zero up-projections so the overlay actually changes the forward
    ul = jax.tree.map(lambda x: jax.random.normal(jax.random.key(2), x.shape) * 0.02, ul)

    gen = GenerateImageConfig(prompt="a thing", width=64, height=64, seed=3,
                              guidance_scale=3.0, sample_steps=2)
    base = generate_sd(model, variables, gen)
    with_ul = generate_sd(model, variables, gen, uncond_lora=ul)
    assert not np.array_equal(base, with_ul)

    gen_nocfg = GenerateImageConfig(prompt="a thing", width=64, height=64,
                                    seed=3, guidance_scale=1.0, sample_steps=2)
    a = generate_sd(model, variables, gen_nocfg)
    b = generate_sd(model, variables, gen_nocfg, uncond_lora=ul)
    np.testing.assert_array_equal(a, b)


def test_model_paths_and_in_context_accepted_silently(capsys):
    from ai_toolkit_tpu.config.modules import JobConfig

    raw = {"job": "extension", "config": {"name": "x", "process": [{
        "type": "sd_trainer",
        "train": {"steps": 1, "short_and_long_captions": True,
                  "short_and_long_captions_encoder_split": True},
        "model": {"arch": "sd1", "model_paths": {"vae": "/x"},
                  "in_context": True,
                  "unconditional_lora_path": None},
    }]}}
    proc = JobConfig.from_raw(raw).processes[0]
    assert "config warning" not in capsys.readouterr().out
    assert proc.model.model_paths == {"vae": "/x"}
    assert proc.model.in_context is True
    assert proc.train.short_and_long_captions is True
