"""End-to-end: config file -> job -> train -> save -> resume -> sample."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image


def make_dataset(tmp_path, n=4, size=64):
    folder = tmp_path / "imgs"
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text(f"photo of thing {i}")
    return str(folder)


def job_yaml(tmp_path, folder, arch="sd1", steps=4, extra_model=None, extra_train=None):
    return {
        "job": "extension",
        "config": {
            "name": "e2e_test",
            "process": [
                {
                    "type": "sd_trainer",
                    "training_folder": str(tmp_path / "output"),
                    "trigger_word": "zxc",
                    "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                    "save": {"dtype": "float16", "save_every": 2, "max_step_saves_to_keep": 2},
                    "datasets": [
                        {"folder_path": folder, "caption_ext": "txt", "resolution": 64,
                         "cache_latents_to_disk": True}
                    ],
                    "train": {
                        "batch_size": 2,
                        "steps": steps,
                        "gradient_accumulation_steps": 1,
                        "noise_scheduler": "ddpm" if arch == "sd1" else "flowmatch",
                        "optimizer": "adamw",
                        "lr": 1e-3,
                        "dtype": "float32",
                        "ema_config": {"use_ema": False},
                        **(extra_train or {}),
                    },
                    "model": {
                        "name_or_path": "",
                        "arch": arch,
                        "model_kwargs": {"size": "tiny"},
                        **(extra_model or {}),
                    },
                    "logging": {"log_every": 2},
                    "sample": {
                        "sampler": "ddpm" if arch == "sd1" else "flowmatch",
                        "sample_every": 0,
                        "width": 64,
                        "height": 64,
                        "sample_steps": 2,
                        "prompts": ["zxc thing --seed 1"],
                    },
                    "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
                }
            ],
        },
    }


@pytest.mark.slow
def test_sd1_e2e_train_save_resume(tmp_path):
    folder = make_dataset(tmp_path)
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(job_yaml(tmp_path, folder, steps=4)))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    raw = get_config(cfg_path)
    job = get_job(raw)
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])

    out_dir = tmp_path / "output" / "e2e_test"
    files = os.listdir(out_dir)
    assert "e2e_test.safetensors" in files  # final save
    assert any(f.startswith("e2e_test_0000000") for f in files)  # step save
    assert "optimizer.msgpack" in files
    assert (out_dir / "latent_cache").is_dir()
    assert any(f.endswith(".png") for f in os.listdir(out_dir / "samples"))
    assert (out_dir / "metrics.jsonl").exists()

    # resume: bump steps and rerun — should pick up from the step checkpoint
    raw2 = get_config(cfg_path)
    raw2["config"]["process"][0]["train"]["steps"] = 6
    job2 = get_job(raw2)
    res2 = job2.run()
    assert res2[0]["steps"] == 6


@pytest.mark.slow
def test_flux_tiny_e2e(tmp_path):
    folder = make_dataset(tmp_path, n=2, size=32)
    cfg = job_yaml(tmp_path, folder, arch="flux", steps=2)
    proc = cfg["config"]["process"][0]
    proc["datasets"][0]["resolution"] = 32
    proc["sample"] = {
        "sampler": "flowmatch", "sample_every": 0, "width": 32, "height": 32,
        "sample_steps": 2, "prompts": ["zxc thing"],
    }
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    out_dir = tmp_path / "output" / "e2e_test"
    assert (out_dir / "e2e_test.safetensors").exists()
    # exported keys are comfy/peft flux layout
    from safetensors import safe_open

    with safe_open(out_dir / "e2e_test.safetensors", framework="numpy") as f:
        keys = list(f.keys())
    assert any(k.startswith("transformer.double_blocks.") for k in keys)


@pytest.mark.slow
def test_extract_lora_job(tmp_path):
    """Extract job: tuned = base + known low-rank delta -> recovered LoRA."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from ai_toolkit_tpu.jobs.extract_process import ExtractLoraProcess
    from ai_toolkit_tpu.config.modules import ProcessConfig

    rng = np.random.default_rng(0)
    w = rng.normal(size=(32, 48)).astype(np.float32)
    delta = (rng.normal(size=(32, 2)) @ rng.normal(size=(2, 48))).astype(np.float32) * 0.1
    save_file({"blk.fc.kernel": w, "blk.fc.bias": np.zeros(48, np.float32)}, str(tmp_path / "base.safetensors"))
    save_file({"blk.fc.kernel": w + delta, "blk.fc.bias": np.zeros(48, np.float32)}, str(tmp_path / "tuned.safetensors"))

    proc_cfg = ProcessConfig.from_dict(
        {
            "type": "extract_lora",
            "training_folder": str(tmp_path),
            "base_weights": str(tmp_path / "base.safetensors"),
            "tuned_weights": str(tmp_path / "tuned.safetensors"),
            "rank": 4,
            "format": "peft",
            "output_path": str(tmp_path / "out.safetensors"),
        }
    )
    out = ExtractLoraProcess("extract_test", proc_cfg).run()
    assert out["modules"] == 1

    from ai_toolkit_tpu.io.lora_file import load_lora_file

    lora, meta = load_lora_file(str(tmp_path / "out.safetensors"))
    leaf = lora["blk"]["fc"]
    recon = (leaf["a"] @ leaf["b"]) * leaf["scale"]
    np.testing.assert_allclose(recon, delta, atol=5e-3)


@pytest.mark.slow
def test_textual_inversion_e2e(tmp_path):
    """TI: embedding bank trains, base TE untouched, a1111-format save."""
    folder = make_dataset(tmp_path, n=2, size=64)
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=3)
    proc = cfg["config"]["process"][0]
    proc.pop("network")
    proc["embedding"] = {"trigger": "zxc", "vectors": 2}
    proc["train"]["lr"] = 5e-3
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])

    out_dir = tmp_path / "output" / "e2e_test"
    from safetensors.numpy import load_file

    emb = load_file(out_dir / "e2e_test.safetensors")
    assert "emb_params" in emb
    assert emb["emb_params"].shape == (2, 64)  # tiny clip hidden 64


@pytest.mark.slow
def test_validation_loss_logged(tmp_path):
    folder = make_dataset(tmp_path, n=2, size=64)
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=2)
    cfg["config"]["process"][0]["validation"] = {"validate_every": 1, "seed": 7}
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    job.run()
    import json

    out_dir = tmp_path / "output" / "e2e_test"
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    assert any("val_loss" in l for l in lines)


@pytest.mark.slow
def test_vae_trainer_e2e(tmp_path):
    folder = make_dataset(tmp_path, n=2, size=32)
    cfg = {
        "job": "extension",
        "config": {
            "name": "vae_ft",
            "process": [{
                "type": "train_vae",
                "training_folder": str(tmp_path / "output"),
                "kl_weight": 1e-6, "mae_weight": 0.1, "critic_weight": 0.05,
                "lpips_weight": 0.2, "lpips_weights": "random",
                "datasets": [{"folder_path": folder, "resolution": 32}],
                "train": {"batch_size": 2, "steps": 3, "optimizer": "adamw", "lr": 1e-4,
                          "dtype": "float32"},
                "model": {"arch": "sd1", "model_kwargs": {"size": "tiny"}},
                "logging": {"log_every": 1},
            }],
        },
    }
    cfg_path = tmp_path / "vae.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    res = get_job(get_config(cfg_path)).run()
    assert np.isfinite(res[0]["final_loss"])
    assert os.path.isfile(res[0]["output"])


@pytest.mark.slow
def test_cli_run_py(tmp_path):
    """python run.py <config> end-to-end through the real CLI."""
    import subprocess
    import sys

    folder = make_dataset(tmp_path, n=2, size=64)
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=2)
    cfg["config"]["process"][0]["train"]["disable_sampling"] = True
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # AIT_PLATFORM is required too: jax is pre-imported by sitecustomize, so
    # the env var alone would still initialize the (possibly dead) TPU tunnel
    env = dict(os.environ, JAX_PLATFORMS="cpu", AIT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "run.py"), str(cfg_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "output" / "e2e_test" / "e2e_test.safetensors").exists()


@pytest.mark.slow
def test_slider_trainer_e2e(tmp_path):
    cfg = {
        "job": "extension",
        "config": {
            "name": "age_slider",
            "process": [{
                "type": "slider",
                "training_folder": str(tmp_path / "output"),
                "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                "slider": {
                    "targets": [{"target_class": "person", "positive": "old person",
                                 "negative": "young person", "weight": 1.0}],
                    "resolutions": [[64, 64]],
                },
                "train": {"steps": 4, "optimizer": "adamw", "lr": 1e-3,
                          "noise_scheduler": "ddpm", "dtype": "float32"},
                "model": {"arch": "sd1", "model_kwargs": {"size": "tiny"}},
                "logging": {"log_every": 2},
            }],
        },
    }
    cfg_path = tmp_path / "slider.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    res = get_job(get_config(cfg_path)).run()
    assert np.isfinite(res[0]["final_loss"])
    assert os.path.isfile(res[0]["output"])


@pytest.mark.slow
def test_merge_job_and_img2img(tmp_path):
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig, ProcessConfig
    from ai_toolkit_tpu.io.checkpoint import CheckpointManager
    from ai_toolkit_tpu.jobs.merge_process import MergeLoraProcess
    from ai_toolkit_tpu.jobs.train_process import SDTrainProcess
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    lora = build_lora(variables["unet"], LoRASpec(rank=2, target_patterns=model.lora_targets()),
                      jax.random.key(1))
    lora = jax.tree.map(lambda v: jnp.ones(v.shape) * 0.01, lora)
    km = SDTrainProcess._key_map(model, lora)
    ckpt = CheckpointManager(str(tmp_path), "l", fmt="kohya", prefix="lora_unet", key_map=km)
    lora_path = ckpt.save(jax.tree.map(np.asarray, lora), 10, final=True)

    proc = ProcessConfig.from_dict({
        "type": "merge_lora", "training_folder": str(tmp_path),
        "lora_path": lora_path, "multiplier": 1.0,
        "model": {"arch": "sd1", "model_kwargs": {"size": "tiny"}},
    })
    out = MergeLoraProcess("merge_test", proc).run()
    assert os.path.isfile(out["output"])

    # img2img runs end to end on tiny sd1
    from ai_toolkit_tpu.generation import generate_img2img

    init = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    gen = GenerateImageConfig(prompt="a cat", width=64, height=64, sample_steps=4,
                              guidance_scale=1.0, seed=3)
    img = generate_img2img(model, variables, gen, init, strength=0.5)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


@pytest.mark.slow
def test_image_pair_polarity_slider_e2e(tmp_path):
    """Image-pair slider: +w on positive images, -w on paired negatives."""
    folder = make_dataset(tmp_path, n=2, size=64)
    neg = tmp_path / "neg"
    neg.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            neg / f"im_{i}.png"
        )
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=2)
    proc = cfg["config"]["process"][0]
    proc["datasets"][0]["unconditional_path"] = str(neg)
    proc["datasets"][0]["cache_latents_to_disk"] = False
    proc["datasets"][0]["cache_latents"] = False
    proc["train"]["guidance_loss"] = "polarity"
    proc["train"]["disable_sampling"] = True
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    res = get_job(get_config(cfg_path)).run()
    assert np.isfinite(res[0]["final_loss"])


@pytest.mark.slow
def test_esrgan_trainer_e2e(tmp_path):
    folder = make_dataset(tmp_path, n=2, size=32)
    cfg = {
        "job": "extension",
        "config": {
            "name": "esrgan_ft",
            "process": [{
                "type": "train_esrgan",
                "training_folder": str(tmp_path / "output"),
                "size": "tiny", "critic_weight": 0.05,
                "datasets": [{"folder_path": folder, "resolution": 32}],
                "train": {"batch_size": 2, "steps": 3, "optimizer": "adamw", "lr": 1e-4},
                "logging": {"log_every": 1},
            }],
        },
    }
    cfg_path = tmp_path / "esr.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    res = get_job(get_config(cfg_path)).run()
    assert np.isfinite(res[0]["final_loss"])
    assert os.path.isfile(res[0]["output"])


@pytest.mark.slow
def test_ip_adapter_training_e2e(tmp_path):
    """IP-Adapter training: trainable ip K/V + image projection, std export."""
    folder = make_dataset(tmp_path, n=2, size=64)
    cfg = job_yaml(tmp_path, folder, arch="sd1", steps=2)
    proc = cfg["config"]["process"][0]
    proc.pop("network")
    proc["adapter"] = {"type": "ip_adapter", "num_tokens": 4}
    proc["train"]["disable_sampling"] = True
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    res = get_job(get_config(cfg_path)).run()
    assert np.isfinite(res[0]["final_loss"])
    out = tmp_path / "output" / "e2e_test" / "e2e_test.safetensors"
    from safetensors import safe_open

    with safe_open(str(out), framework="numpy") as f:
        keys = list(f.keys())
    assert "image_proj.proj.weight" in keys
    assert any(k.startswith("ip_adapter.") for k in keys)


def test_reference_and_img2img_generator_processes(tmp_path):
    """advanced_generator analogs: reference_generator (dataset -> depth
    control -> regenerate) and batch_img2img (dataset -> img2img), both
    through job dispatch."""
    from PIL import Image

    from ai_toolkit_tpu.jobs.dispatch import run_job

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            imgs / f"im_{i}.png"
        )
        (imgs / f"im_{i}.txt").write_text(f"a photo {i}")

    base = {
        "training_folder": str(tmp_path / "out"),
        "model": {"arch": "sd1", "name_or_path": "", "model_kwargs": {"size": "tiny"}},
        "datasets": [{"folder_path": str(imgs), "caption_ext": "txt", "resolution": [64]}],
        "generate": {"sample_steps": 2, "guidance_scale": 1.0, "seed": 3, "ext": "png"},
    }
    out1 = run_job({"job": "extension", "config": {"name": "refgen", "process": [{
        "type": "reference_generator",
        **{k: v for k, v in base.items() if k != "generate"},
        "output_folder": str(tmp_path / "refgen_out"),
        "control": "depth",
        "generate": base["generate"],
    }]}})
    assert len(out1[0]) == 2 and all(os.path.isfile(p) for p in out1[0])

    out2 = run_job({"job": "extension", "config": {"name": "i2i", "process": [{
        "type": "batch_img2img",
        **{k: v for k, v in base.items() if k != "generate"},
        "output_folder": str(tmp_path / "i2i_out"),
        "generate": {**base["generate"], "denoise_strength": 0.4},
    }]}})
    assert len(out2[0]) == 2
    for p in out2[0]:
        assert os.path.isfile(p) and os.path.isfile(os.path.splitext(p)[0] + ".txt")


def test_ultimate_slider_e2e(tmp_path):
    """Combined image-pair + prompt-CFG slider (reference
    ultimate_slider_trainer) trains and exports through dispatch."""
    from PIL import Image

    from ai_toolkit_tpu.jobs.dispatch import run_job

    pos = tmp_path / "pos"
    neg = tmp_path / "neg"
    pos.mkdir(); neg.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            pos / f"im_{i}.png"
        )
        (pos / f"im_{i}.txt").write_text("person")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            neg / f"im_{i}.png"
        )

    out = run_job({"job": "extension", "config": {"name": "ult", "process": [{
        "type": "ultimate_slider",
        "training_folder": str(tmp_path / "out"),
        "network": {"type": "lora", "linear": 2},
        "train": {"steps": 2, "batch_size": 2, "lr": 1e-3, "dtype": "float32",
                  "noise_scheduler": "ddpm", "optimizer": "adamw"},
        "model": {"arch": "sd1", "name_or_path": "", "model_kwargs": {"size": "tiny"}},
        "slider": {
            "targets": [{"target_class": "person", "positive": "smiling person",
                         "negative": "frowning person", "weight": 1.0}],
            "img_loss_weight": 1.0, "cfg_loss_weight": 0.5,
            "resolutions": [[64, 64]],
        },
        "datasets": [{"folder_path": str(pos), "unconditional_path": str(neg),
                      "caption_ext": "txt", "resolution": [64],
                      "cache_latents": False, "cache_latents_to_disk": False}],
    }]}})
    assert os.path.isfile(out[0]["output"])
    assert np.isfinite(out[0]["loss"])


@pytest.mark.slow
def test_ara_quantized_base_e2e(tmp_path):
    """qtype "<q>|<path>" loads an accuracy recovery adapter as a frozen lora
    on the quantized base; a trainable lora stacks with it (reference
    util/quantize.py:281-400, config_modules.py:741-743)."""
    folder = make_dataset(tmp_path, n=2, size=32)

    # 1) produce an adapter file to use as the ARA
    cfg = job_yaml(tmp_path, folder, arch="flux", steps=2)
    proc = cfg["config"]["process"][0]
    proc["datasets"][0]["resolution"] = 32
    proc["sample"]["sample_every"] = 0
    proc["sample"]["width"] = proc["sample"]["height"] = 32
    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(cfg_path))
    job.run()
    ara_path = tmp_path / "output" / "e2e_test" / "e2e_test.safetensors"
    assert ara_path.exists()

    # 2) train a fresh lora on a quantized base with the ARA active
    cfg2 = job_yaml(tmp_path, folder, arch="flux", steps=2, extra_model={
        "quantize": True, "qtype": f"int8|{ara_path}",
    })
    proc2 = cfg2["config"]["process"][0]
    proc2["config_name"] = "ara_run"
    cfg2["config"]["name"] = "ara_run"
    proc2["datasets"][0]["resolution"] = 32
    proc2["sample"] = {"sampler": "flowmatch", "sample_every": 2, "width": 32,
                       "height": 32, "sample_steps": 2, "prompts": ["zxc thing"]}
    cfg2_path = tmp_path / "job2.yaml"
    cfg2_path.write_text(yaml.safe_dump(cfg2))

    from ai_toolkit_tpu.config.modules import ModelConfig

    mc = ModelConfig.from_dict({"arch": "flux", "qtype": f"int8|{ara_path}"})
    assert mc.qtype == "int8"
    assert mc.accuracy_recovery_adapter == str(ara_path)

    job2 = get_job(get_config(cfg2_path))
    res = job2.run()
    assert np.isfinite(res[0]["final_loss"])
    out_dir = tmp_path / "output" / "ara_run"
    assert (out_dir / "ara_run.safetensors").exists()
    assert any(f.endswith(".png") for f in os.listdir(out_dir / "samples"))


@pytest.mark.slow
def test_extract_lora_from_full_checkpoints(tmp_path):
    """Reference ExtractJob contract: two full model checkpoints in (base +
    tuned), kohya/peft LoRA out — no manual flattening step."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.config.modules import ModelConfig, ProcessConfig
    from ai_toolkit_tpu.io.full_export import export_full_model
    from ai_toolkit_tpu.jobs.extract_process import ExtractLoraProcess
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    base_dir = tmp_path / "base"
    tuned_dir = tmp_path / "tuned"
    export_full_model(model, variables, str(base_dir))

    # perturb one attention kernel with a known low-rank delta
    rng = np.random.default_rng(0)

    def bump(tree):
        import copy

        import copy

        t = copy.deepcopy(jax.tree.map(np.asarray, tree))
        blk = np.asarray(t["dit"]["double_0"]["img_qkv"]["kernel"], np.float32).copy()
        cin, cout = blk.shape
        delta = (rng.normal(size=(cin, 2)) @ rng.normal(size=(2, cout))).astype(np.float32) * 0.05
        blk += delta
        t["dit"]["double_0"]["img_qkv"]["kernel"] = blk
        return t, delta

    tuned_vars, delta = bump(variables)
    export_full_model(model, tuned_vars, str(tuned_dir))

    proc_cfg = ProcessConfig.from_dict({
        "type": "extract_lora",
        "training_folder": str(tmp_path),
        "base_model": str(base_dir),
        "extract_model": str(tuned_dir),
        "arch": "flux",
        "model_kwargs": {"size": "tiny"},
        "rank": 4,
        "output_path": str(tmp_path / "out.safetensors"),
    })
    out = ExtractLoraProcess("extract_full", proc_cfg).run()
    assert out["modules"] >= 1

    from safetensors import safe_open

    with safe_open(str(tmp_path / "out.safetensors"), framework="numpy") as f:
        keys = list(f.keys())
    # peft flux layout with per-layer expansion of the scanned stack
    qkv = [k for k in keys if "attn" in k and "lora_A" in k]
    assert qkv, keys[:8]

    # recovered delta ~= injected delta (rank 4 >= true rank 2)
    from ai_toolkit_tpu.io.lora_file import load_lora_file

    inv = {"double_blocks.0.img_attn.qkv": "double_0/img_qkv"}
    tree, _ = load_lora_file(str(tmp_path / "out.safetensors"),
                             lambda ext: inv.get(ext))
    leaf = tree["double_0"]["img_qkv"]
    a, b, s = np.asarray(leaf["a"]), np.asarray(leaf["b"]), np.asarray(leaf["scale"])
    np.testing.assert_allclose((a @ b) * s, delta, atol=2e-2)

    # scanned-layout models stack [L, in, out] kernels: per-layer SVD
    from ai_toolkit_tpu.adapters.extract import extract_lora_from_diff

    w = rng.normal(size=(3, 16, 24)).astype(np.float32)
    d3 = np.zeros_like(w)
    d3[1] = (rng.normal(size=(16, 2)) @ rng.normal(size=(2, 24))).astype(np.float32) * 0.1
    got = extract_lora_from_diff({"m": {"kernel": w}}, {"m": {"kernel": w + d3}}, rank=4)
    lf = got["m"]
    r1 = (lf["a"][1] @ lf["b"][1]) * lf["scale"][1]
    np.testing.assert_allclose(r1, d3[1], atol=5e-3)
    assert np.abs((lf["a"][0] @ lf["b"][0]) * lf["scale"][0]).max() < 1e-4
