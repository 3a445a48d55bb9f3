import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.ops.layers import Linear
from ai_toolkit_tpu.samplers import DDPMSchedule, FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer, adamw8bit, _quantize_blockwise, _dequantize_blockwise
from ai_toolkit_tpu.train.state import TrainState, merge_variables
from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step


def test_blockwise_quant_roundtrip():
    x = jax.random.normal(jax.random.key(0), (37, 13)) * 3.0
    q = _quantize_blockwise(x)
    y = _dequantize_blockwise(q, x.shape)
    assert np.max(np.abs(np.asarray(x) - np.asarray(y))) < np.max(np.abs(np.asarray(x))) / 100


def _optimize(tx, steps=200):
    params = {"w": jnp.array([3.0, -2.0, 5.0])}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum(jnp.square(p["w"])))(params)
        updates, state = tx.update(grads, state, params)
        import optax

        return optax.apply_updates(params, updates), state

    for _ in range(steps):
        params, state = step(params, state)
    return float(jnp.sum(jnp.square(params["w"])))


def test_adamw8bit_optimizes():
    assert _optimize(adamw8bit(1e-1)) < 1e-3


@pytest.mark.parametrize("name", ["adamw", "adamw8bit", "lion", "adafactor", "prodigy", "automagic"])
def test_optimizer_factory_runs(name):
    tx = get_optimizer(name, 1e-2, max_grad_norm=1.0)
    final = _optimize(tx, steps=100)
    assert np.isfinite(final)
    if name in ("adamw", "adamw8bit", "lion"):
        assert final < 38.0  # initial value


class TinyDiT(nn.Module):
    """Stand-in model: predicts velocity from noisy latents + t."""

    @nn.compact
    def __call__(self, x, t, cond):
        b, h, w, c = x.shape
        emb = jnp.concatenate([x.reshape(b, -1), t[:, None]], axis=-1)
        y = Linear(64, dtype=jnp.float32, param_dtype=jnp.float32, name="fc1")(emb)
        y = nn.silu(y)
        y = Linear(h * w * c, dtype=jnp.float32, param_dtype=jnp.float32, name="fc2")(y)
        return y.reshape(x.shape)


def _make_state_and_step(cfg=None, use_ema=False, schedule=None):
    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    params = variables["params"]
    lora = build_lora(params, LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": params}, {"lora": lora}, tx, use_ema=use_ema)

    def predict_fn(variables, noisy, t, cond):
        return model.apply(variables, noisy, t, cond)

    schedule = schedule or FlowMatchSchedule()
    cfg = cfg or TrainStepConfig(timestep_type="sigmoid", ema_decay=0.9 if use_ema else None)
    step = jax.jit(make_train_step(predict_fn, schedule, cfg))
    return state, step


def test_train_step_reduces_loss():
    state, step = _make_state_and_step()
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    losses = []
    for i in range(60):
        state, metrics = step(state, batch, jax.random.key(42))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert np.isfinite(metrics["grad_norm"])


def test_train_step_ema_tracks():
    state, step = _make_state_and_step(use_ema=True)
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    state2, _ = step(state, batch, jax.random.key(0))
    # ema moved toward new trainable but not equal to it
    a0 = np.asarray(state.ema["lora"]["fc2"]["b"])
    a1 = np.asarray(state2.ema["lora"]["fc2"]["b"])
    at = np.asarray(state2.trainable["lora"]["fc2"]["b"])
    assert not np.array_equal(a0, a1)
    assert not np.allclose(a1, at)
    # ema = 0.9*old + 0.1*new exactly
    np.testing.assert_allclose(a1, 0.9 * a0 + 0.1 * at, rtol=1e-5, atol=1e-8)


def test_grad_accum_matches_big_batch():
    schedule = FlowMatchSchedule()
    state, step1 = _make_state_and_step(
        cfg=TrainStepConfig(timestep_type="linear", grad_accum=1), schedule=schedule
    )
    _, step4 = _make_state_and_step(
        cfg=TrainStepConfig(timestep_type="linear", grad_accum=4), schedule=schedule
    )
    lat = jax.random.normal(jax.random.key(7), (4, 2, 4, 4, 2))
    out_accum, m_accum = step4(state, {"latents": lat}, jax.random.key(3))
    assert np.isfinite(float(m_accum["loss"]))
    assert int(out_accum.step) == 1


def test_masked_and_weighted_paths_execute():
    cfg = TrainStepConfig(
        timestep_type="linear", use_timestep_weights=True, inverted_mask_prior=True,
        do_prior_pred=True,
    )
    state, step = _make_state_and_step(cfg=cfg)
    batch = {
        "latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2)),
        "mask": jnp.ones((2, 4, 4, 1)).at[:, :2].set(0.0),
        "loss_multiplier": jnp.array([1.0, 0.5]),
    }
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "prior_loss" in metrics


def test_eps_schedule_min_snr_path():
    cfg = TrainStepConfig(timestep_type="linear", min_snr_gamma=5.0)
    state, step = _make_state_and_step(cfg=cfg, schedule=DDPMSchedule())
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_wavelet_loss():
    from ai_toolkit_tpu.train.losses import compute_loss

    pred = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    loss_same, _ = compute_loss(pred, pred, loss_type="wavelet")
    assert float(loss_same) == 0.0
    loss_diff, _ = compute_loss(pred, jnp.zeros_like(pred), loss_type="wavelet")
    assert float(loss_diff) > 0
    # masked wavelet: mask pooled to subband resolution
    mask = jnp.ones((2, 8, 8, 1))
    loss_masked, _ = compute_loss(pred, jnp.zeros_like(pred), loss_type="wavelet", mask=mask)
    assert np.isfinite(float(loss_masked))


def test_do_cfg_path():
    cfg = TrainStepConfig(timestep_type="linear", do_cfg=True, cfg_scale=3.0)
    state, step = _make_state_and_step(cfg=cfg)
    lat = jax.random.normal(jax.random.key(5), (2, 4, 4, 2))
    batch = {"latents": lat, "cond": {}, "neg_cond": {}}
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_train_text_encoder_lora(tmp_path):
    """train_text_encoder: TE LoRA trains in-graph and exports kohya lora_te keys."""
    import yaml
    from PIL import Image
    from safetensors import safe_open

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"photo {i}")
    for arch in ("sd1", "sdxl"):
        cfg = {
            "job": "extension",
            "config": {"name": f"te_{arch}", "process": [{
                "type": "sd_trainer",
                "training_folder": str(tmp_path / "out"),
                "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                "save": {"save_every": 100},
                "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                              "resolution": 64}],
                "train": {"batch_size": 1, "steps": 3, "noise_scheduler": "ddpm",
                          "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                          "train_text_encoder": True,
                          "ema_config": {"use_ema": False}},
                "model": {"name_or_path": "", "arch": arch,
                          "model_kwargs": {"size": "tiny"}},
                "sample": {"sample_every": 0, "prompts": []},
                "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
            }]},
        }
        p = tmp_path / f"{arch}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        from ai_toolkit_tpu.config import get_config
        from ai_toolkit_tpu.jobs import get_job

        job = get_job(get_config(p))
        proc = job.processes[0]
        results = job.run()
        assert np.isfinite(results[0]["final_loss"])
        # TE lora trained (moved from zero-product init)
        te_keys = [k for k in proc._final_state.trainable if k.startswith("lora_te")]
        assert te_keys, arch
        with safe_open(str(tmp_path / "out" / f"te_{arch}" / f"te_{arch}.safetensors"),
                       "np") as f:
            keys = list(f.keys())
        te_file_keys = [k for k in keys if k.startswith("lora_te")]
        assert te_file_keys, (arch, keys[:5])
        assert any("text_model_encoder_layers_0_self_attn_q_proj" in k for k in te_file_keys)
        # unet lora present too
        assert any(k.startswith("lora_unet") for k in keys)


@pytest.mark.slow
def test_train_text_encoder_resume(tmp_path, capfd):
    """TE LoRA must survive a resume (reference resumes the whole network;
    our lora_te* collections are restored from the kohya entries)."""
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

    def make_cfg(steps):
        return {
            "job": "extension",
            "config": {"name": "te_resume", "process": [{
                "type": "sd_trainer",
                "training_folder": str(tmp_path / "out"),
                "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
                "save": {"save_every": 2},
                "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                              "resolution": 64}],
                "train": {"batch_size": 1, "steps": steps, "noise_scheduler": "ddpm",
                          "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                          "train_text_encoder": True,
                          "ema_config": {"use_ema": False}},
                "model": {"name_or_path": "", "arch": "sd1",
                          "model_kwargs": {"size": "tiny"}},
                "sample": {"sample_every": 0, "prompts": []},
                "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
            }]},
        }

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(make_cfg(2)))
    job = get_job(get_config(p))
    job.run()
    te1 = jax.tree.map(np.asarray, job.processes[0]._final_state.trainable["lora_te"])
    capfd.readouterr()

    p.write_text(yaml.safe_dump(make_cfg(4)))
    job2 = get_job(get_config(p))
    job2.run()
    out = capfd.readouterr().out
    assert "resumed lora_te (TE LoRA)" in out
    assert "resumed from step 2" in out
    # resumed TE lora kept training (differs from the step-2 values after 2 more steps)
    te2 = job2.processes[0]._final_state.trainable["lora_te"]
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), te1, te2)
    assert any(d > 0 for d in jax.tree.leaves(diffs))


@pytest.mark.slow
def test_concept_replacer_process(tmp_path):
    import yaml
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text(f"photo of a dog {i}")
    cfg = {
        "job": "extension",
        "config": {"name": "cr", "process": [{
            "type": "concept_replacer",
            "training_folder": str(tmp_path / "out"),
            "replacements": [{"concept": "a dog", "replacement": "a cat"}],
            "network": {"type": "lora", "linear": 4, "linear_alpha": 4},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt", "resolution": 64}],
            "train": {"batch_size": 1, "steps": 3, "noise_scheduler": "ddpm",
                      "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "sd1", "model_kwargs": {"size": "tiny"}},
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
    proc = job.processes[0]
    # lora moved toward the replacement target
    lora_leaves = jax.tree.leaves(proc._final_state.trainable["lora"])
    assert any(float(jnp.abs(x).max()) > 0 for x in lora_leaves)


def test_oom_skip_resilience(tmp_path, monkeypatch):
    """A device-OOM step skips the batch and training continues (reference
    BaseSDTrainProcess.py:2627-2648 skip/abort behavior)."""
    import yaml
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {
        "job": "extension",
        "config": {"name": "oomr", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "network": {"type": "lora", "linear": 2, "linear_alpha": 2},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64}],
            "train": {"batch_size": 1, "steps": 4, "noise_scheduler": "flowmatch",
                      "timestep_type": "linear", "optimizer": "adamw", "lr": 1e-3,
                      "dtype": "float32", "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "sd3", "model_kwargs": {"size": "tiny"}},
            "sample": {"sample_every": 0, "prompts": []},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job
    import ai_toolkit_tpu.train.step as step_mod

    orig_make = step_mod.make_jitted_train_step
    fired = {"n": 0}

    def flaky_make(*a, **kw):
        real = orig_make(*a, **kw)

        def stepper(state, batch, rng, image_seq_len=None):
            fired["n"] += 1
            if fired["n"] == 2:  # second step OOMs once
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 99 bytes")
            return real(state, batch, rng, image_seq_len=image_seq_len)

        return stepper

    monkeypatch.setattr(step_mod, "make_jitted_train_step", flaky_make)
    import ai_toolkit_tpu.jobs.train_process as tp_mod

    monkeypatch.setattr(tp_mod, "make_jitted_train_step", flaky_make)
    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    assert fired["n"] == 4  # every step invoked once; the OOM one skipped


def test_learnable_snr_gamma():
    """learnable_snr_gos (reference train_tools.LearnableSNRGamma): the four
    scalars self-optimize online and weight the DDPM loss."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class
    from ai_toolkit_tpu.samplers import DDPMSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import (
        TrainStepConfig,
        init_lsnr_state,
        make_jitted_train_step,
    )
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora

    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    lora = build_lora(
        variables["unet"], LoRASpec(rank=2, alpha=2.0, target_patterns=model.lora_targets()),
        jax.random.key(1),
    )
    trainable = {"lora": lora, "lsnr": init_lsnr_state()}
    tx = get_optimizer("adamw", 1e-3)
    state = TrainState.create(variables, trainable, tx)
    cond = model.encode_prompt(variables, ["x", "y"])
    h, w, c = model.latent_shape(64, 64)
    batch = {"latents": jax.random.normal(jax.random.key(2), (2, h, w, c)), "cond": cond}
    step = make_jitted_train_step(
        model.predict, DDPMSchedule(), TrainStepConfig(learnable_snr=True), tx
    )
    p0 = {k: float(v) for k, v in state.trainable["lsnr"]["params"].items()}
    for i in range(3):
        state, m = step(state, batch, jax.random.key(3 + i))
    assert np.isfinite(float(m["loss"]))
    lsnr = state.trainable["lsnr"]
    p1 = {k: float(v) for k, v in lsnr["params"].items()}
    assert int(lsnr["count"]) == 3  # float leaf, integral value
    assert any(abs(p1[k] - p0[k]) > 1e-6 for k in p1), (p0, p1)  # scalars moved
    assert all(np.isfinite(v) for v in p1.values())


def test_learnable_snr_survives_grad_accum():
    """Regression: with gradient_accumulation_steps > 1 the scan path must
    still thread the lsnr cell (sequential microbatch updates) and keep aux
    metrics; and learnable_snr must win over a simultaneously-set
    min_snr_gamma (reference branch order) without a trace-time NameError."""
    from ai_toolkit_tpu.samplers import DDPMSchedule
    from ai_toolkit_tpu.train.step import init_lsnr_state, make_train_step

    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    lora = build_lora(variables["params"], LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create(
        {"params": variables["params"]}, {"lora": lora, "lsnr": init_lsnr_state()}, tx
    )
    cfg = TrainStepConfig(
        timestep_type="linear", grad_accum=2, learnable_snr=True, min_snr_gamma=5.0
    )
    step = jax.jit(make_train_step(model.apply, DDPMSchedule(), cfg))
    p0 = {k: float(v) for k, v in state.trainable["lsnr"]["params"].items()}
    lat = jax.random.normal(jax.random.key(7), (2, 2, 4, 4, 2))  # [accum, micro_b, ...]
    state, metrics = step(state, {"latents": lat}, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_raw" in metrics  # aux survives the scan path
    lsnr = state.trainable["lsnr"]
    # two microbatches -> two sequential lsnr updates in one optimizer step
    assert int(lsnr["count"]) == 2
    p1 = {k: float(v) for k, v in lsnr["params"].items()}
    assert any(abs(p1[k] - p0[k]) > 1e-8 for k in p1), (p0, p1)
    assert all(np.isfinite(v) for v in p1.values())


def test_blended_blur_noise_changes_target():
    """blended_blur_noise blends a low-frequency latent residual into the
    noise (reference util/blended_blur_noise) — losses stay finite and the
    effective noise differs from the plain path."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_jitted_train_step
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora

    model = get_model_class("sd3")(ModelConfig(arch="sd3", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    lora = build_lora(
        variables["dit"], LoRASpec(rank=2, alpha=2.0, target_patterns=model.lora_targets()),
        jax.random.key(1),
    )
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["a", "b"])
    cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1])
    cond["guidance"] = jnp.ones((2,))
    batch = {"latents": jax.random.normal(jax.random.key(2), (2, h, w, c)), "cond": cond}
    tx = get_optimizer("adamw", 1e-3)

    losses = {}
    for flag in (False, True):
        state = TrainState.create(variables, {"lora": lora}, tx)
        step = make_jitted_train_step(
            model.predict, FlowMatchSchedule(),
            TrainStepConfig(timestep_type="linear", blended_blur_noise=flag), tx,
        )
        _, m = step(state, batch, jax.random.key(5))
        losses[flag] = float(m["loss"])
        assert np.isfinite(losses[flag])
    assert losses[True] != losses[False]
