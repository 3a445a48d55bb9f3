"""DFE perceptual latent loss (reference diffusion_feature_extraction.py +
SDTrainer.py:623-683)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.models.dfe import DFEv1, DFEv2, load_dfe, make_dfe_loss


def test_dfe_v1_golden_vs_torch(tmp_path):
    """Import a torch-layout v1 checkpoint and match a torch functional
    forward exactly (conv 1x1 / 3x3 + GELU residual blocks)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from safetensors.torch import save_file

    rng = np.random.default_rng(0)
    in_ch, width, out_ch, n_blocks = 4, 16, 8, 2
    sd = {"conv_in.weight": rng.normal(size=(width, in_ch, 1, 1)),
          "conv_in.bias": rng.normal(size=(width,)),
          "conv_out.weight": rng.normal(size=(out_ch, width, 1, 1)),
          "conv_out.bias": rng.normal(size=(out_ch,))}
    for i in range(n_blocks):
        sd[f"blocks.{i}.conv1.weight"] = rng.normal(size=(width, width, 3, 3)) * 0.1
        sd[f"blocks.{i}.conv1.bias"] = rng.normal(size=(width,)) * 0.1
        sd[f"blocks.{i}.conv2.weight"] = rng.normal(size=(width, width, 3, 3)) * 0.1
        sd[f"blocks.{i}.conv2.bias"] = rng.normal(size=(width,)) * 0.1
        sd[f"blocks.{i}.proj.weight"] = rng.normal(size=(width, width, 1, 1)) * 0.1
        sd[f"blocks.{i}.proj.bias"] = rng.normal(size=(width,)) * 0.1
    sd = {k: torch.tensor(v, dtype=torch.float32) for k, v in sd.items()}
    p = str(tmp_path / "dfe_v1.safetensors")
    save_file(sd, p)

    x = rng.normal(size=(1, 8, 8, in_ch)).astype(np.float32)

    # torch functional forward (reference DiffusionFeatureExtractor semantics)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    h = F.conv2d(xt, sd["conv_in.weight"], sd["conv_in.bias"])
    for i in range(n_blocks):
        hin = h
        h = F.conv2d(h, sd[f"blocks.{i}.conv1.weight"], sd[f"blocks.{i}.conv1.bias"], padding=1)
        h = F.conv2d(h, sd[f"blocks.{i}.conv2.weight"], sd[f"blocks.{i}.conv2.bias"], padding=1)
        h = F.gelu(h)
        h = F.conv2d(h, sd[f"blocks.{i}.proj.weight"], sd[f"blocks.{i}.proj.bias"])
        h = h + hin
    h = F.conv2d(h, sd["conv_out.weight"], sd["conv_out.bias"])
    want = h.numpy().transpose(0, 2, 3, 1)

    module = DFEv1(out_channels=out_ch, width=width, num_blocks=n_blocks)
    params = module.init(jax.random.key(0), jnp.asarray(x))["params"]
    from ai_toolkit_tpu.models.dfe import _convert_dfe_flat
    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from safetensors import safe_open

    flat = {}
    with safe_open(p, framework="numpy") as f:
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    params = _merge_imported(params, _convert_dfe_flat(flat, 1), "dfe")
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dfe_v2_multiscale_shapes():
    module = DFEv2(width=8)
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)  # concat[rf_target, noise]
    params = module.init(jax.random.key(0), x)["params"]
    feats = module.apply({"params": params}, x)
    assert [f.shape for f in feats] == [
        (1, 64, 64, 8), (1, 32, 32, 16), (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 64),
    ]


def test_dfe_loss_fns():
    from ai_toolkit_tpu.samplers import get_schedule

    schedule = get_schedule("flowmatch", "flux")
    module, params, ver = load_dfe(None, in_channels=4, version=1)
    loss_fn = make_dfe_loss(module, params, 1, schedule, weight=0.5)
    rng = jax.random.key(0)
    lat = jax.random.normal(rng, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), lat.shape)
    t = jnp.asarray([0.3, 0.9])
    noisy = schedule.add_noise(lat, noise, t)
    pred = schedule.target(lat, noise, t)  # perfect prediction
    # perfect prediction -> stepped x0 == latents -> zero loss
    assert float(loss_fn(pred, noisy, lat, noise, t)) < 1e-6
    bad = pred + 1.0
    assert float(loss_fn(bad, noisy, lat, noise, t)) > 0

    module2, params2, _ = load_dfe(None, in_channels=4, version=2)
    loss2 = make_dfe_loss(module2, params2, 2, schedule, weight=1.0)
    assert float(loss2(pred, noisy, lat, noise, t)) < 1e-6
    assert float(loss2(bad, noisy, lat, noise, t)) > 0


@pytest.mark.slow
def test_dfe_e2e_train(tmp_path):
    import yaml
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"photo {i}")
    cfg = {
        "job": "extension",
        "config": {"name": "dfe", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt", "resolution": 64}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear",
                      "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                      "diffusion_feature_extractor_path": "__random__",
                      "diffusion_feature_extractor_weight": 0.5,
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "sd3", "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])


def test_dfe7_tipsv2_loss_e2e(tmp_path):
    """DFE v7 (TIPSv2 DPT pixel-space perceptual loss, reference
    diffusion_feature_extraction.py:848-1058) drives a training run via
    diffusion_feature_extractor_path: v7[-tiny]."""
    import yaml
    from PIL import Image

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {"job": "extension", "config": {"name": "dfe7", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64, "cache_latents": False,
                      "cache_latents_to_disk": False}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                  "optimizer": "adamw", "lr": 1e-4, "dtype": "float32",
                  "diffusion_feature_extractor_path": "v7-tiny",
                  "diffusion_feature_extractor_weight": 0.5,
                  "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "flux",
                  "model_kwargs": {"size": "tiny"}},
        "sample": {"sample_every": 0, "prompts": []},
    }]}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])


def test_dfe7_loss_fn_grads():
    """make_dfe7_loss: finite scalar, nonzero grads wrt the prediction."""
    import jax
    import jax.numpy as jnp

    from ai_toolkit_tpu.models.dfe import load_dfe7, make_dfe7_loss
    from ai_toolkit_tpu.samplers import FlowMatchSchedule

    module, params, partial = load_dfe7("v7-tiny")
    assert not partial

    def decode(lat):  # fake 8x upsample "vae" decode to [-1, 1]
        x = jnp.repeat(jnp.repeat(lat[..., :3], 8, axis=1), 8, axis=2)
        return jnp.tanh(x)

    loss_fn = make_dfe7_loss(module, params, FlowMatchSchedule(), 1.0, decode)
    k = jax.random.key(0)
    lat = jax.random.normal(k, (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.fold_in(k, 1), lat.shape)
    t = jnp.array([0.4])
    noisy = (1 - 0.4) * lat + 0.4 * noise
    pred = noise - lat

    val, g = jax.value_and_grad(
        lambda p: loss_fn(p, noisy, lat, noise, t))(pred)
    assert np.isfinite(float(val))
    assert float(jnp.sum(jnp.abs(g))) > 0

    # v8: partial-step variant also runs
    m8, p8, part8 = load_dfe7("v8-tiny")
    assert part8
    l8 = make_dfe7_loss(m8, p8, FlowMatchSchedule(), 1.0, decode,
                        partial_step=True)
    assert np.isfinite(float(l8(pred, noisy, lat, noise, t)))
