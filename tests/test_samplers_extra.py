"""Real heun / lms / lcm / pndm samplers (round-2 fix: these names used to
silently alias ddim/euler — reference toolkit/sampler.py:120-177).

Verification strategy without diffusers in the env: (a) analytic — with a
self-consistent oracle model (eps derived from a known x0), every sampler must
converge to that x0; (b) mirrors — the PNDM transfer formula and LMS
coefficients are checked against independently hand-written numpy
implementations of the diffusers/k-diffusion math; (c) e2e — each sampler runs
through generate() on a tiny SD model and unknown names fail loudly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.samplers import DDPMSchedule


def _oracle_eps(schedule, x, t, x0):
    """The eps consistent with `x = sqrt(acp) x0 + sqrt(1-acp) eps`."""
    acp = float(schedule.alphas_cumprod[t])
    return (x - np.sqrt(acp) * x0) / np.sqrt(1.0 - acp)


def test_ddim_and_pndm_recover_oracle_x0():
    schedule = DDPMSchedule()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    for sampler in ("ddim", "pndm"):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        if sampler == "ddim":
            ts = schedule.ddim_timesteps(20)
            for i in range(len(ts)):
                t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
                eps = _oracle_eps(schedule, x, int(ts[i]), x0)
                x = schedule.ddim_step(
                    x, eps, jnp.full((1,), int(ts[i]), jnp.int32),
                    jnp.full((1,), t_prev, jnp.int32),
                )
        else:
            base = schedule.pndm_timesteps(20)
            step_sz = schedule.num_train_timesteps // 20
            seq = [int(base[0])] + [int(base[1])] * 2 + [int(t) for t in base[2:]]
            ets, cur = [], None
            for counter, t in enumerate(seq):
                eps = _oracle_eps(schedule, x, int(t), x0)
                t_use, t_prev = t, t - step_sz
                if counter != 1:
                    ets = ets[-3:] + [eps]
                else:
                    t_prev, t_use = t, t + step_sz
                if len(ets) == 1 and counter == 0:
                    eff, cur = eps, x
                elif len(ets) == 1 and counter == 1:
                    eff, x = (eps + ets[-1]) / 2, cur
                elif len(ets) == 2:
                    eff = (3 * ets[-1] - ets[-2]) / 2
                elif len(ets) == 3:
                    eff = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
                else:
                    eff = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
                x = schedule.pndm_prev_sample(x, int(t_use), int(t_prev), eff)
        err = float(jnp.max(jnp.abs(x - x0)))
        assert err < 0.15, (sampler, err)


def test_heun_and_lms_solve_linear_ode_exactly():
    """denoised == const x0 => dx/dsigma = (x-x0)/sigma is linear in x; Heun
    and LMS (like Euler) integrate it to machine precision at sigma=0."""
    schedule = DDPMSchedule()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    sigmas = schedule.inference_sigmas(12)

    # heun
    x = x0 + 3.0 * float(sigmas[0])  # on the exact solution ray
    denoised_at = lambda xx, s: x0
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        x = schedule.heun_step(x, x0, s, sn, denoised_at)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    # lms
    x = x0 + 3.0 * float(sigmas[0])
    ds, sig64 = [], np.asarray(sigmas, np.float64)
    for i in range(len(sigmas) - 1):
        s = float(sigmas[i])
        ds.insert(0, (x - x0) / s)
        ds = ds[:4]
        x = schedule.lms_step(x, ds, schedule.lms_coefficients(len(ds), sig64, i))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_lms_order1_coefficient_is_sigma_delta():
    schedule = DDPMSchedule()
    sigmas = np.asarray(schedule.inference_sigmas(10), np.float64)
    (c,) = schedule.lms_coefficients(1, sigmas, 0)
    np.testing.assert_allclose(c, sigmas[1] - sigmas[0], rtol=1e-6)


def test_pndm_prev_sample_matches_mirror():
    """Independent numpy mirror of diffusers PNDMScheduler._get_prev_sample."""
    schedule = DDPMSchedule()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    acp = schedule.alphas_cumprod
    for t, t_prev in ((801, 751), (51, 1), (41, -1)):
        a_t = float(acp[t])
        a_p = float(acp[t_prev]) if t_prev >= 0 else 1.0
        mirror = (a_p / a_t) ** 0.5 * x - (a_p - a_t) * eps / (
            a_t * (1 - a_p) ** 0.5 + (a_t * (1 - a_t) * a_p) ** 0.5
        )
        ours = np.asarray(schedule.pndm_prev_sample(jnp.asarray(x), t, t_prev, jnp.asarray(eps)))
        np.testing.assert_allclose(ours, mirror, rtol=1e-5, atol=1e-6)


def test_lcm_boundary_conditions_and_convergence():
    schedule = DDPMSchedule()
    ts = schedule.lcm_timesteps(4)
    assert len(ts) == 4 and all(ts[i] > ts[i + 1] for i in range(3))
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32)) * 0.3
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    key = jax.random.key(0)
    for i, t in enumerate(ts):
        t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
        eps = _oracle_eps(schedule, x, int(t), x0)
        key, sub = jax.random.split(key)
        x = schedule.lcm_step(x, eps, int(t), t_prev, sub)
    # consistency step at the final (small) timestep collapses close to x0;
    # c_skip>0 leaves a small residual of the re-noised trajectory
    assert float(jnp.mean(jnp.abs(x - x0))) < 0.2


@pytest.mark.slow
def test_generate_sd_all_samplers(tmp_path):
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_sd
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    for sampler in ("heun", "lms", "lcm", "pndm"):
        gen = GenerateImageConfig(prompt="x", width=64, height=64, sample_steps=4,
                                  guidance_scale=1.0, seed=1, sampler=sampler)
        img = generate_sd(model, variables, gen)
        assert img.shape[-1] == 3 and np.isfinite(img).all(), sampler
    with pytest.raises(ValueError, match="unknown sampler"):
        generate_sd(model, variables, GenerateImageConfig(
            prompt="x", width=64, height=64, sample_steps=2, guidance_scale=1.0,
            sampler="made_up"))


def test_dpm2_family_recovers_oracle_x0():
    """dpm_2 / dpm_2_a / dpmsingle (2S) with the self-consistent oracle model
    must converge to the oracle x0 (second-order steppers; the ODE solution
    is exact for this model)."""
    schedule = DDPMSchedule()
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)

    def denoised_at(x, s):
        # oracle: eps consistent with x -> denoised estimate equals x0 exactly
        t = schedule.timestep_for_sigma(s)
        eps = _oracle_eps(schedule, np.asarray(x) * np.sqrt(
            float(schedule.alphas_cumprod[t])), t, x0)
        return jnp.asarray(x0)

    for name, step in (
        ("dpm_2", lambda x, den, s, sn, k: schedule.dpm_2_step(x, den, s, sn, denoised_at)),
        ("dpmsingle", lambda x, den, s, sn, k: schedule.dpmpp_2s_step(x, den, s, sn, denoised_at)),
        ("dpm_2_a", lambda x, den, s, sn, k: schedule.dpm_2_a_step(x, den, s, sn, k, denoised_at)),
    ):
        sigmas = schedule.inference_sigmas(12)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32)) * float(sigmas[0])
        key = jax.random.key(0)
        for i in range(len(sigmas) - 1):
            key, sub = jax.random.split(key)
            x = step(x, denoised_at(x, float(sigmas[i])), float(sigmas[i]),
                     float(sigmas[i + 1]), sub)
        # in the oracle model denoised == x0 identically, so all three land on x0
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-3, err_msg=name)


def test_karras_sigma_ramp():
    schedule = DDPMSchedule()
    sig = schedule.inference_sigmas(10, karras=True)
    table = schedule.sigma_table()
    assert sig[0] == pytest.approx(float(table[-1]), rel=1e-6)  # starts at sigma_max
    assert sig[-1] == 0.0 and sig[-2] == pytest.approx(float(table[0]), rel=1e-6)
    assert np.all(np.diff(sig) < 0)  # strictly descending


def test_generate_sd_dpm2_family_samplers():
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_sd
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    for sampler in ("dpm_2", "dpm_2_a", "dpmsingle", "k_dpm_2", "k_lms", "heun_karras"):
        gen = GenerateImageConfig(prompt="x", width=64, height=64, sample_steps=4,
                                  guidance_scale=1.0, seed=1, sampler=sampler)
        img = generate_sd(model, variables, gen)
        assert img.shape[-1] == 3 and np.isfinite(img).all(), sampler
