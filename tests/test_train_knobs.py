"""Round-2 config-honesty knobs: warnings for unconsumed keys + semantics of
the newly implemented TrainConfig options (reference toolkit/config_modules.py
TrainConfig)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step


class TinyDiT(nn.Module):
    @nn.compact
    def __call__(self, x, t, cond):
        from ai_toolkit_tpu.ops.layers import Linear

        b = x.shape[0]
        h = x.reshape(b, -1)
        y = Linear(32, dtype=jnp.float32, param_dtype=jnp.float32, name="fc1")(h)
        y = nn.silu(y + t[:, None])
        y = Linear(h.shape[-1], dtype=jnp.float32, param_dtype=jnp.float32, name="fc2")(y)
        return y.reshape(x.shape)


def _state_and_step(cfg):
    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    lora = build_lora(variables["params"], LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": variables["params"]}, {"lora": lora}, tx)
    step = jax.jit(make_train_step(model.apply, FlowMatchSchedule(), cfg))
    return state, step


def test_config_warns_on_unconsumed_keys(capsys, monkeypatch):
    from ai_toolkit_tpu.config.modules import JobConfig

    raw = {"job": "extension", "config": {"name": "x", "process": [{
        "type": "sd_trainer",
        "train": {"steps": 1, "totally_made_up_knob": True},
        "model": {"arch": "sd1"},
    }]}}
    JobConfig.from_raw(raw)
    outp = capsys.readouterr().out
    assert "totally_made_up_knob" in outp and "IGNORED" in outp

    monkeypatch.setenv("AIT_STRICT_CONFIG", "1")
    with pytest.raises(ValueError, match="totally_made_up_knob"):
        JobConfig.from_raw(raw)


def test_tpu_na_keys_are_silent(capsys):
    from ai_toolkit_tpu.config.modules import JobConfig

    raw = {"job": "extension", "config": {"name": "x", "process": [{
        "type": "sd_trainer",
        "train": {"steps": 1, "xformers": True, "attention_backend": "sdp"},
        "model": {"arch": "sd1"},
    }]}}
    JobConfig.from_raw(raw)
    assert "config warning" not in capsys.readouterr().out


def test_max_loss_zeroes_outlier_updates():
    state, step = _state_and_step(
        TrainStepConfig(timestep_type="linear", max_loss=1e-9)
    )
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    state, m = step(state, batch, jax.random.key(0))
    # outlier batch -> zero loss and zero gradients (only optimizer weight
    # decay may still touch params, mirroring a skipped backward)
    assert float(m["loss"]) == 0.0
    assert float(m["grad_norm"]) == 0.0


def test_standardize_and_multipliers_change_loss():
    batch = {"latents": 3.0 + 2.0 * jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    base_state, base_step = _state_and_step(TrainStepConfig(timestep_type="linear"))
    _, l0 = base_step(base_state, batch, jax.random.key(0))
    knob_state, knob_step = _state_and_step(TrainStepConfig(
        timestep_type="linear", standardize_latents=True, noisy_multiplier=0.5,
    ))
    _, l1 = knob_step(knob_state, batch, jax.random.key(0))
    assert np.isfinite(float(l1["loss"]))
    assert float(l0["loss"]) != float(l1["loss"])


def test_random_cfg_rescale_and_pred_norm():
    cfg = TrainStepConfig(
        timestep_type="linear", do_cfg=True, do_random_cfg=True, max_cfg_scale=3.0,
        cfg_rescale=0.7, correct_pred_norm=True, correct_pred_norm_multiplier=0.5,
    )
    state, step = _state_and_step(cfg)
    lat = jax.random.normal(jax.random.key(5), (2, 4, 4, 2))
    batch = {"latents": lat, "neg_cond": {}}
    state, m = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["grad_norm"]))


def test_stage_switch_ranges():
    """switch_every alternates the sampled timestep range each step —
    losses stay finite and the step counter drives the phase."""
    cfg = TrainStepConfig(
        timestep_type="linear", stage_boundary=0.9, switch_every=1,
    )
    state, step = _state_and_step(cfg)
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2))}
    losses = []
    for i in range(2):
        state, m = step(state, batch, jax.random.key(7))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # same data rng but opposite phases -> different effective timesteps
    assert losses[0] != losses[1]


def test_full_ft_filter_tree():
    from ai_toolkit_tpu.jobs.train_process import _filter_param_tree

    tree = {
        "double_blocks": {"w": np.ones((2,))},
        "single_blocks": {"w": np.ones((2,))},
        "final_layer": {"w": np.ones((2,))},
    }
    out = _filter_param_tree(
        tree, ["transformer.transformer_blocks.", "transformer.single_transformer_blocks."],
        None,
    )
    assert set(out) == {"double_blocks", "single_blocks"}
    out2 = _filter_param_tree(tree, None, ["final_layer"])
    assert set(out2) == {"double_blocks", "single_blocks"}


def test_v_pred_and_num_timesteps_flow_into_schedule():
    from ai_toolkit_tpu.samplers import get_schedule

    s = get_schedule("ddpm", "sd1", prediction_type="v_prediction",
                     num_train_timesteps=500)
    assert s.prediction_type == "v_prediction"
    assert s.num_train_timesteps == 500


def test_automagic_packed_mask_and_swapping():
    """Automagic fidelity: uint8-packed lr mask (Auto8bitTensor analog) and
    rotating parameter-subset updates (do_paramiter_swapping)."""
    import optax  # noqa: F401

    from ai_toolkit_tpu.train.automagic import _unpack_lr, automagic

    params = {"w": jnp.ones((8, 16)), "b": jnp.zeros((16,))}
    tx = automagic(starting_lr=1e-5, lr_bump=1e-6, paramiter_swapping=0.25)
    state = tx.init(params)
    assert state.lr_mask["w"]["q"].dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(_unpack_lr(state.lr_mask["w"])), 1e-5, rtol=0.05
    )
    g = {"w": jnp.full((8, 16), 0.1), "b": jnp.full((16,), -0.2)}
    upd, state = tx.update(g, state, params)
    # swapping: exactly 1/4 of elements move this step
    moved = np.asarray(upd["w"]) != 0
    assert abs(moved.mean() - 0.25) < 0.05
    upd2, state = tx.update(g, state, params)
    moved2 = np.asarray(upd2["w"]) != 0
    # a different quarter rotates in
    assert not np.array_equal(moved, moved2)
    assert np.isfinite(np.asarray(upd2["w"])).all()

    # unpacked mode still works and bumps lrs on sign agreement
    tx2 = automagic(starting_lr=1e-5, lr_bump=1e-6, packed_lr_mask=False)
    s2 = tx2.init(params)
    for _ in range(3):  # step 1 flips polarity down; repeats then bump up
        _, s2 = tx2.update(g, s2, params)
    assert float(np.asarray(s2.lr_mask["w"]).max()) > 1e-5


def test_stepped_x0_exact_recovery():
    """Reference stepped_loss (toolkit/util/losses.py:50-93): a perfect
    velocity prediction recovers the clean latents exactly when t sits on a
    training-sigma table entry."""
    sch = FlowMatchSchedule(use_dynamic_shifting=True)
    sig = np.asarray(sch.training_sigmas())
    idx = np.array([100, 500, 900])
    t = jnp.asarray(sig[idx])
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (3, 4, 4, 2))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    noisy = sch.add_noise(x0, noise, t)
    pred = sch.target(x0, noise, t)  # exact velocity
    rec = sch.stepped_x0(pred, noisy, noise, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=2e-4)
    # garbage prediction does NOT recover x0
    bad = sch.stepped_x0(-pred, noisy, noise, t)
    assert float(jnp.mean((bad - x0) ** 2)) > 0.1


def test_stepped_loss_train_step():
    state, step = _state_and_step(
        TrainStepConfig(timestep_type="linear", loss_type="stepped")
    )
    batch = {"latents": jax.random.normal(jax.random.key(2), (2, 4, 4, 2))}
    state, m = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0


def test_stepped_requires_flow_schedule():
    from ai_toolkit_tpu.samplers import get_schedule

    with pytest.raises(ValueError, match="stepped"):
        make_train_step(
            lambda *a: None, get_schedule("ddpm", "sd1"),
            TrainStepConfig(loss_type="stepped"),
        )


def test_t0_loss_target_perfect_velocity_is_zero():
    """t0_loss_target regresses the stepped-to-zero latent against the clean
    latents (reference SDTrainer.py:846-858): an oracle velocity pred gives
    ~zero loss."""
    latents = jax.random.normal(jax.random.key(3), (2, 4, 4, 2))

    def oracle(variables, noisy, t, cond):
        tv = t.reshape(t.shape + (1,) * (noisy.ndim - t.ndim))
        return (noisy - latents) / tv  # == noise - x0 at sigma t

    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": {}}, {"lora": {"w": jnp.zeros((2,))}}, tx)
    cfg = TrainStepConfig(timestep_type="linear", t0_loss_target=True)
    step = jax.jit(make_train_step(oracle, FlowMatchSchedule(), cfg))
    _, m = step(state, {"latents": latents}, jax.random.key(0))
    assert float(m["loss"]) < 1e-6

    # velocity-equiv weighting scales low-t samples up but stays finite
    cfg2 = TrainStepConfig(
        timestep_type="linear", t0_loss_target=True, t0_velocity_equiv_weight=True
    )
    step2 = jax.jit(make_train_step(oracle, FlowMatchSchedule(), cfg2))
    _, m2 = step2(state, {"latents": latents}, jax.random.key(0))
    assert np.isfinite(float(m2["loss"]))


def test_fft_loss_metric_and_gradients():
    state, step = _state_and_step(
        TrainStepConfig(
            timestep_type="linear", do_fft_loss=True, do_fft_velocity_equiv_weight=True
        )
    )
    batch = {"latents": jax.random.normal(jax.random.key(4), (2, 4, 4, 2))}
    state, m = step(state, batch, jax.random.key(0))
    assert float(m["fft_loss"]) > 0 and float(m["grad_norm"]) > 0


def test_ddpm_timestep_distributions():
    """content/style cubic skews + stepped grids (BaseSDTrainProcess.py:
    1243-1313)."""
    from ai_toolkit_tpu.samplers import get_schedule

    s = get_schedule("ddpm", "sd1")
    k = jax.random.key(0)
    t_c = np.asarray(s.sample_timesteps(k, 4096, content_or_style="content"))
    t_s = np.asarray(s.sample_timesteps(k, 4096, content_or_style="style"))
    # content favors early (low-noise) timesteps, style favors late ones
    assert t_c.mean() < 300 < t_s.mean()
    assert t_c.min() >= 0 and t_s.max() <= 999

    two = np.asarray(s.sample_timesteps(k, 512, timestep_type="two_step"))
    assert set(np.unique(two)) == {0, 499}
    four = np.asarray(s.sample_timesteps(k, 512, timestep_type="four_step"))
    assert set(np.unique(four)) == {0, 250, 500, 750}
    eight = np.asarray(s.sample_timesteps(k, 2048, timestep_type="eight_step"))
    assert set(np.unique(eight)) == {0, 125, 250, 375, 500, 625, 750, 875}
    one = np.asarray(s.sample_timesteps(k, 8, timestep_type="one_step"))
    assert (one == 0).all()
    nxt = np.asarray(s.sample_timesteps(k, 4096, timestep_type="next_sample"))
    assert nxt.max() <= 997

    with pytest.raises(ValueError, match="content_or_style"):
        s.sample_timesteps(k, 4, content_or_style="bogus")


def test_content_or_style_reg_splits_timesteps():
    """reg batches draw from their own skew (is_reg_flag selects)."""
    state, _ = _state_and_step(TrainStepConfig(timestep_type="linear"))
    from ai_toolkit_tpu.samplers import get_schedule
    from ai_toolkit_tpu.train.step import make_train_step

    cfg = TrainStepConfig(
        content_or_style="content", content_or_style_reg="style"
    )
    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    lora = build_lora(variables["params"], LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": variables["params"]}, {"lora": lora}, tx)
    step = jax.jit(make_train_step(model.apply, get_schedule("ddpm", "sd1"), cfg))
    batch = {
        "latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2)),
        "is_reg_flag": jnp.asarray(1.0),
    }
    _, m = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_differential_guidance_amplifies_target():
    """do_differential_guidance (SDTrainer.py:788-791): target moves to
    pred + s*(target - pred); with an oracle pred == target the loss stays 0,
    with any other pred the loss scales by s^2."""
    state, step0 = _state_and_step(TrainStepConfig(timestep_type="linear"))
    state_d, step_d = _state_and_step(
        TrainStepConfig(timestep_type="linear", do_differential_guidance=True,
                        differential_guidance_scale=3.0)
    )
    batch = {"latents": jax.random.normal(jax.random.key(7), (2, 4, 4, 2))}
    _, m0 = step0(state, batch, jax.random.key(0))
    _, md = step_d(state_d, batch, jax.random.key(0))
    # same pred, target residual scaled by 3 -> mse scaled by ~9
    ratio = float(md["loss"]) / max(float(m0["loss"]), 1e-9)
    assert 8.0 < ratio < 10.0


def test_optimal_and_consistent_noise():
    """optimal_noise_pairing_samples picks the closest-of-K noise (loss drops
    vs plain sampling); force_consistent_noise reproduces identical noise for
    the same seed across steps."""
    latents = jax.random.normal(jax.random.key(9), (2, 4, 4, 2))

    def zero_pred(variables, noisy, t, cond):
        return jnp.zeros_like(noisy)

    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": {}}, {"lora": {"w": jnp.zeros((2,))}}, tx)
    # target = noise - x0; zero pred => loss = E[(noise - x0)^2]; picking the
    # noise closest to the latents shrinks that expectation
    base_cfg = TrainStepConfig(timestep_type="linear")
    opt_cfg = TrainStepConfig(timestep_type="linear", optimal_noise_pairing_samples=16)
    s0 = jax.jit(make_train_step(zero_pred, FlowMatchSchedule(), base_cfg))
    s1 = jax.jit(make_train_step(zero_pred, FlowMatchSchedule(), opt_cfg))
    l0 = np.mean([float(s0(state, {"latents": latents}, jax.random.key(i))[1]["loss"]) for i in range(8)])
    l1 = np.mean([float(s1(state, {"latents": latents}, jax.random.key(i))[1]["loss"]) for i in range(8)])
    assert l1 < l0

    cfg = TrainStepConfig(timestep_type="linear", force_consistent_noise=True)
    sc = jax.jit(make_train_step(zero_pred, FlowMatchSchedule(), cfg))
    batch = {"latents": latents, "noise_seed": jnp.asarray([3, 7], jnp.int32)}
    # same seeds + same t-rng -> identical loss; different rng (new t) differs
    m1 = sc(state, batch, jax.random.key(0))[1]
    m2 = sc(state, batch, jax.random.key(0))[1]
    assert float(m1["loss"]) == float(m2["loss"])


def test_noise_shaping_knobs_run_and_change_loss():
    """The noise-shaping family (dynamic offset / signal + batch correction /
    random shift + multiplier) and pred/target shaping knobs all compile and
    alter the objective."""
    latents = jax.random.normal(jax.random.key(11), (2, 4, 4, 2)) + 2.0
    batch = {"latents": latents}
    state, base_step = _state_and_step(TrainStepConfig(timestep_type="linear"))
    _, m0 = base_step(state, batch, jax.random.key(0))

    for kw in (
        dict(dynamic_noise_offset=True),
        dict(do_signal_correction_noise=True, signal_correction_noise_scale=0.5),
        dict(do_batch_noise_correction=True, batch_noise_correction_scale=0.5),
        dict(random_noise_shift=0.5),
        dict(random_noise_multiplier=0.5),
        dict(pred_scaler=2.0),
        dict(target_noise_multiplier=2.0),
        dict(target_norm_std=True, target_norm_std_value=1.0),
        dict(adaptive_scaling_factor=True),
    ):
        _, step = _state_and_step(TrainStepConfig(timestep_type="linear", **kw))
        _, m = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"])), kw
        assert float(m["loss"]) != float(m0["loss"]), kw


def test_min_max_denoising_steps_bound_ddpm():
    from ai_toolkit_tpu.samplers import get_schedule

    s = get_schedule("ddpm", "sd1")
    t = np.asarray(s.sample_timesteps(jax.random.key(0), 2048, min_t=200, max_t=400))
    assert t.min() >= 200 and t.max() < 400


def test_blank_prompt_preservation():
    state, _ = _state_and_step(TrainStepConfig(timestep_type="linear"))
    from ai_toolkit_tpu.train.step import make_train_step
    from ai_toolkit_tpu.samplers import FlowMatchSchedule

    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    lora = build_lora(variables["params"], LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    # non-zero lora b so the adapter actually shifts the blank-prompt output
    lora = jax.tree.map(lambda v: jnp.ones_like(v) * 0.05, lora)
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": variables["params"]}, {"lora": lora}, tx)
    cfg = TrainStepConfig(timestep_type="linear", blank_prompt_preservation=True,
                          blank_prompt_preservation_multiplier=2.0)
    step = jax.jit(make_train_step(model.apply, FlowMatchSchedule(), cfg))
    batch = {"latents": jax.random.normal(jax.random.key(5), (2, 4, 4, 2)),
             "blank_cond": {}}
    _, m = step(state, batch, jax.random.key(0))
    assert float(m["bpp_loss"]) > 0 and np.isfinite(float(m["loss"]))


def test_guidance_loss_target_extrapolation():
    """Target-side CFG (SDTrainer.py:695-752): with guidance_loss_target=g,
    the flow target becomes u + g*(target-u); cfg-zero projects the anchor."""
    latents = jax.random.normal(jax.random.key(13), (2, 4, 4, 2))
    batch = {"latents": latents, "uncond_cond": {}}
    state, base = _state_and_step(TrainStepConfig(timestep_type="linear"))
    _, m0 = base(state, {"latents": latents}, jax.random.key(0))
    for kw in (
        dict(guidance_loss_target=2.0),
        dict(guidance_loss_target=2.0, do_guidance_loss_cfg_zero=True),
        dict(guidance_loss_target=2.0, guidance_loss_schedule="sigma"),
    ):
        _, step = _state_and_step(TrainStepConfig(timestep_type="linear", **kw))
        _, m = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"])), kw
        assert float(m["loss"]) != float(m0["loss"]), kw


def test_signal_amplification_target():
    """do_signal_amplification: target = noise - latents*(1+(1-t)*s)."""
    latents = jax.random.normal(jax.random.key(15), (2, 4, 4, 2))
    state, base = _state_and_step(TrainStepConfig(timestep_type="linear"))
    _, m0 = base(state, {"latents": latents}, jax.random.key(0))
    _, step = _state_and_step(
        TrainStepConfig(timestep_type="linear", do_signal_amplification=True,
                        signal_amplification_strength=2.0)
    )
    _, m = step(state, {"latents": latents}, jax.random.key(0))
    assert np.isfinite(float(m["loss"])) and float(m["loss"]) != float(m0["loss"])


def test_per_group_learning_rates(tmp_path):
    """unet_lr / text_encoder_lr drive separate optimizer groups: with lr=0
    and text_encoder_lr>0 only the TE lora moves (e2e through the trainer)."""
    from PIL import Image

    from ai_toolkit_tpu.jobs.dispatch import run_job

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            imgs / f"im_{i}.png"
        )
        (imgs / f"im_{i}.txt").write_text(f"thing {i}")
    out = run_job({"job": "extension", "config": {"name": "grouplr", "process": [{
        "type": "sd_trainer",
        "training_folder": str(tmp_path / "out"),
        "network": {"type": "lora", "linear": 2},
        "train": {"steps": 2, "batch_size": 2, "lr": 1e-3, "unet_lr": 1e-5,
                  "dtype": "float32", "noise_scheduler": "ddpm",
                  "optimizer": "adamw"},
        "model": {"arch": "sd1", "name_or_path": "", "model_kwargs": {"size": "tiny"}},
        "datasets": [{"folder_path": str(imgs), "caption_ext": "txt",
                      "resolution": [64]}],
        "sample": {"sample_every": 0},
    }]}})
    assert out is not None  # runs through with the multi_transform optimizer


def test_train_turbo_pixel_loss_and_outputs():
    """train_turbo (SDTrainer.process_output_for_turbo): euler-ancestral one
    big step + residual removal + in-graph decode; pixel-space loss, SNR
    weighting skipped, show_turbo_outputs surfaces the decoded image."""
    from ai_toolkit_tpu.samplers import DDPMSchedule

    model = TinyDiT()
    x = jnp.zeros((2, 4, 4, 2))
    variables = model.init(jax.random.key(0), x, jnp.zeros((2,)), {})
    lora = build_lora(variables["params"], LoRASpec(rank=4, alpha=4.0), jax.random.key(1))
    tx = get_optimizer("adamw", 1e-2)
    state = TrainState.create({"params": variables["params"]}, {"lora": lora}, tx)

    def decode_fn(vars_, lats):
        # stand-in vae decode: nearest-upsample 2x, 3 "pixel" channels
        up = jnp.repeat(jnp.repeat(lats, 2, axis=1), 2, axis=2)
        return jnp.tanh(up[..., :1].repeat(3, axis=-1))

    cfg = TrainStepConfig(train_turbo=True, show_turbo_outputs=True,
                          min_snr_gamma=5.0, ema_decay=None)
    step = jax.jit(make_train_step(model.apply, DDPMSchedule(), cfg,
                                   decode_fn=decode_fn))
    rng = np.random.default_rng(3)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32),
        "pixel_values": jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)), jnp.float32),
        "mask": jnp.ones((2, 4, 4, 1), jnp.float32),
        "loss_multiplier": jnp.ones((2,), jnp.float32),
    }
    s2, m = step(state, batch, jax.random.key(5))
    assert np.isfinite(float(m["loss"]))
    assert m["turbo_pixels"].shape == (2, 8, 8, 3)
    # grads actually flowed into the lora
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.trainable["lora"], s2.trainable["lora"])
    assert max(jax.tree.leaves(diff)) > 0

    # flow-matching schedules refuse turbo loudly
    with pytest.raises(ValueError, match="eps-pred"):
        make_train_step(model.apply, FlowMatchSchedule(),
                        TrainStepConfig(train_turbo=True), decode_fn=decode_fn)
    with pytest.raises(ValueError, match="decode"):
        make_train_step(model.apply, DDPMSchedule(), TrainStepConfig(train_turbo=True))


def test_sdxl_refiner_split_routing():
    """refiner_name_or_path builds a second UNet; 'split' mode routes the
    batch halves base/refiner (stable_diffusion_model.py:1985-2015), 'all'
    sends everything through the refiner."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sdxl")(ModelConfig(
        arch="sdxl", model_kwargs={"size": "tiny"},
        refiner_name_or_path="/nonexistent_refiner"))
    assert model.refiner is not None
    v = model.load_variables(jax.random.key(0))
    assert "refiner" in v
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([100.0, 800.0])
    cond = {"context": jnp.zeros((2, 8, model.unet_config.cross_attention_dim)),
            "added_cond": {"time_ids": jnp.zeros((2, 6)),
                           "text_embeds": jnp.zeros((2, 64))}}
    model.refiner_mode = None
    base_out = model.predict(v, lat, t, cond)
    model.refiner_mode = "split"
    split_out = model.predict(v, lat, t, cond)
    # first half comes from the base unet: identical to the no-refiner path
    np.testing.assert_allclose(np.asarray(split_out[:1]), np.asarray(base_out[:1]),
                               rtol=1e-5, atol=1e-5)
    # second half routed elsewhere
    assert float(jnp.abs(split_out[1:] - base_out[1:]).max()) > 1e-4
    model.refiner_mode = "all"
    all_out = model.predict(v, lat, t, cond)
    np.testing.assert_allclose(np.asarray(all_out[1:]), np.asarray(split_out[1:]),
                               rtol=1e-5, atol=1e-5)
    model.refiner_mode = None


def test_hidream_e1_width_concat_edit_conditioning():
    """hidream_e1 conditions by WIDTH-concat of source latents with the
    prediction sliced back (pipeline_hidream_image_editing.py:1123,1147) —
    regression for the round-3 fix away from sequence-concat."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    m = get_model_class("hidream_e1")(
        ModelConfig(arch="hidream_e1", model_kwargs={"size": "tiny"}))
    v = m.init_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, m.vae_config.latent_channels)), jnp.float32)
    ctrl = jnp.asarray(rng.normal(size=(1, 8, 8, m.vae_config.latent_channels)), jnp.float32)
    cond = m.encode_prompt(v, ["edit it"])
    cond["pe"] = m.rope_table(8, 8, cond["txt"].shape[1])
    # pe covers txt + the widened (2x wide) image grid
    assert cond["pe"].shape[1] == cond["txt"].shape[1] + (8 // 2) * (16 // 2)
    out = m.predict(v, lat, jnp.asarray([0.4]), {**cond, "control_latents": ctrl})
    assert out.shape == lat.shape
    # the control content must influence the prediction
    out2 = m.predict(v, lat, jnp.asarray([0.4]), {**cond, "control_latents": ctrl * -1.0})
    assert float(jnp.abs(out - out2).max()) > 1e-6
