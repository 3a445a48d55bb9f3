import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.samplers import DDPMSchedule, FlowMatchSchedule, calculate_flux_shift, get_schedule


def test_flowmatch_add_noise_endpoints():
    s = FlowMatchSchedule()
    x0 = jnp.ones((2, 4, 4, 3))
    eps = jnp.zeros_like(x0) + 5.0
    np.testing.assert_allclose(s.add_noise(x0, eps, jnp.array([0.0, 0.0])), np.asarray(x0))
    np.testing.assert_allclose(s.add_noise(x0, eps, jnp.array([1.0, 1.0])), np.asarray(eps))
    # velocity target steps x_t to x0 exactly
    t = jnp.array([0.3, 0.7])
    xt = s.add_noise(x0, eps, t)
    v = s.target(x0, eps, t)
    np.testing.assert_allclose(np.asarray(s.pred_to_x0(v, xt, t)), np.asarray(x0), atol=1e-5)


@pytest.mark.parametrize(
    "tt", ["linear", "sigmoid", "shift", "flux_shift", "lognorm_blend", "weighted"]
)
def test_timestep_distributions_in_range(tt):
    s = FlowMatchSchedule()
    t = s.sample_timesteps(jax.random.key(0), 4096, timestep_type=tt, image_seq_len=1024)
    t = np.asarray(t)
    assert t.shape == (4096,)
    assert (t > 0).all() and (t <= 1).all()
    if tt == "sigmoid":
        # biased to the middle
        assert 0.4 < t.mean() < 0.6
    if tt in ("shift", "flux_shift"):
        # shifted toward noise (higher t)
        assert t.mean() > 0.55


def test_flux_shift_value():
    # seq 256 -> base_shift, seq 4096 -> max_shift
    assert calculate_flux_shift(256) == pytest.approx(0.5)
    assert calculate_flux_shift(4096) == pytest.approx(1.16)


def test_bell_loss_weights_mean_one():
    s = FlowMatchSchedule()
    t = jnp.linspace(1e-3, 1.0, 1000)
    w = s.loss_weights(t)
    assert np.asarray(w).mean() == pytest.approx(1.0, rel=0.02)
    # center weighted higher than edges
    assert w[500] > w[10] and w[500] > w[990]


def test_ddpm_snr_and_targets():
    s = DDPMSchedule()
    assert s.betas.shape == (1000,)
    t = jnp.array([10, 500, 990])
    snr = np.asarray(s.snr(t))
    assert snr[0] > snr[1] > snr[2]
    # min-snr weight capped at gamma/snr <= 1 for eps pred
    w = np.asarray(s.min_snr_weight(t, gamma=5.0))
    assert (w <= 1.0 + 1e-6).all()

    x0 = jax.random.normal(jax.random.key(0), (3, 8, 8, 4))
    eps = jax.random.normal(jax.random.key(1), (3, 8, 8, 4))
    xt = s.add_noise(x0, eps, t)
    np.testing.assert_allclose(np.asarray(s.pred_to_x0(eps, xt, t)), np.asarray(x0), atol=1e-4)

    sv = DDPMSchedule(prediction_type="v_prediction")
    v = sv.target(x0, eps, t)
    np.testing.assert_allclose(np.asarray(sv.pred_to_x0(v, xt, t)), np.asarray(x0), atol=1e-4)


def test_ddim_denoises_linear_model():
    """DDIM with a perfect eps-oracle recovers x0."""
    s = DDPMSchedule()
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    ts = s.ddim_timesteps(50)
    x = s.add_noise(x0, eps, jnp.array([int(ts[0])]))
    for i in range(len(ts)):
        t = jnp.array([int(ts[i])])
        t_prev = jnp.array([int(ts[i + 1])]) if i + 1 < len(ts) else jnp.array([-1])
        # oracle eps prediction
        acp = s.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        eps_hat = (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)
        x = s.ddim_step(x, eps_hat, t, t_prev)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-2)


def test_flowmatch_euler_integrates_to_x0():
    """Euler over inference sigmas with a perfect velocity oracle lands on x0."""
    s = FlowMatchSchedule(use_dynamic_shifting=False, shift=1.0)
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 4, 2))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    sigmas = s.inference_sigmas(20)
    x = eps  # start at pure noise
    for i in range(20):
        v = eps - x0  # constant true velocity
        x = s.euler_step(x, v, sigmas[i], sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_factory():
    assert isinstance(get_schedule("flowmatch", "flux"), FlowMatchSchedule)
    assert get_schedule("flowmatch", "sd3").shift == 3.0
    assert isinstance(get_schedule("ddim", "sd1"), DDPMSchedule)
    assert get_schedule("ddpm", "sd2").prediction_type == "v_prediction"


def test_inference_sampler_zoo():
    """euler_a and dpm++2m produce valid, distinct generations (tiny sd1)."""
    import jax
    import numpy as np

    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_sd
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd1")(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    outs = {}
    for sampler in ("ddim", "euler_a", "dpmpp_2m"):
        gen = GenerateImageConfig(
            prompt="a cat", width=64, height=64, sample_steps=4, seed=7,
            guidance_scale=1.0, sampler=sampler,
        )
        img = generate_sd(model, variables, gen)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        outs[sampler] = img
    # different solvers integrate differently
    assert np.abs(outs["ddim"].astype(int) - outs["euler_a"].astype(int)).max() > 0
    assert np.abs(outs["dpmpp_2m"].astype(int) - outs["euler_a"].astype(int)).max() > 0


def test_ddpm_sigma_helpers_consistency():
    import numpy as np

    from ai_toolkit_tpu.samplers import DDPMSchedule

    s = DDPMSchedule()
    sig = s.inference_sigmas(10)
    assert len(sig) == 11 and sig[-1] == 0.0
    assert all(sig[i] > sig[i + 1] for i in range(len(sig) - 1))
    # timestep_for_sigma inverts sigma_table
    table = s.sigma_table()
    for t in (0, 250, 999):
        assert abs(s.timestep_for_sigma(float(table[t])) - t) <= 1


def test_weighted_timestep_table(tmp_path):
    """User weighting table: file + list forms, mean-normalized lookup."""
    import json

    import numpy as np

    from ai_toolkit_tpu.samplers import get_schedule

    table = (np.linspace(0.5, 2.0, 1000) ** 2).tolist()
    p = tmp_path / "w.json"
    p.write_text(json.dumps(table))
    for src in (table, str(p)):
        s = get_schedule("flowmatch", weighting_table=src)
        t = jnp.asarray([0.01, 0.5, 0.99])
        w = s.loss_weights(t, timestep_type="weighted")
        assert w.shape == (3,)
        assert float(w[2]) > float(w[0])  # increasing table
        full = s.loss_weights(jnp.linspace(0.001, 0.999, 1000), timestep_type="weighted")
        np.testing.assert_allclose(float(jnp.mean(full)), 1.0, atol=0.02)
