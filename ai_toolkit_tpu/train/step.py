"""The jitted train step — the heart of the framework.

The reference's per-step call chain (preprocess -> encode -> noise ->
forward -> loss -> backward -> clip -> step -> EMA,
``/root/reference/extensions_built_in/sd_trainer/SDTrainer.py:1345-2265``)
collapses here into one pure function ``(state, batch, rng) -> (state,
metrics)`` built by ``make_train_step`` and compiled once under jit/pjit with
mesh shardings. Gradient accumulation is a ``lax.scan`` over a leading
microbatch axis — no Python-side loop, no optimizer no-op steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.config.modules import TrainConfig
from ai_toolkit_tpu.train.losses import compute_loss, diff_output_preservation_loss
from ai_toolkit_tpu.train.state import TrainState, merge_variables


@dataclass(frozen=True)
class TrainStepConfig:
    timestep_type: str = "sigmoid"
    timestep_bias: float = 1.0
    loss_type: str = "mse"
    huber_c: float = 0.001
    min_snr_gamma: float | None = None
    use_timestep_weights: bool = False  # linear_timesteps / weighted
    timestep_weights_v2: bool = False
    noise_offset: float = 0.0
    noise_multiplier: float = 1.0
    # blend a low-frequency latent residual into the noise (reference
    # util/blended_blur_noise.get_blended_blur_noise)
    blended_blur_noise: bool = False
    ema_decay: float | None = None
    grad_accum: int = 1
    diff_output_preservation: bool = False
    dop_multiplier: float = 1.0
    inverted_mask_prior: bool = False
    inverted_mask_prior_multiplier: float = 0.5
    do_prior_pred: bool = False  # run an adapter-off forward (DOP / prior losses)
    do_cfg: bool = False  # train the CFG-combined prediction (baked guidance)
    cfg_scale: float = 1.0
    do_random_cfg: bool = False  # cfg_scale ~ U(1, max_cfg_scale) per step
    max_cfg_scale: float = 4.0
    cfg_rescale: float = 0.0  # blend toward the std-matched combined pred
    noisy_multiplier: float = 1.0  # scales the noised model input
    standardize_latents: bool = False  # per-sample mean0/std1 latents
    max_loss: float | None = None  # zero the update when loss exceeds this
    audio_loss_multiplier: float = 1.0
    correct_pred_norm: bool = False  # rescale pred toward target norm
    correct_pred_norm_multiplier: float = 1.0
    # multistage expert training (wan22): alternate the trained expert every
    # `switch_every` steps, sampling t from that expert's noise range
    stage_boundary: float | None = None
    switch_every: int = 0
    # SDXL refiner double-up (BaseSDTrainProcess.py:1434-1450): first half of
    # the batch samples base-range timesteps, second half refiner-range; the
    # model wrapper routes the halves to unet/refiner (refiner_mode='split')
    refiner_double: bool = False
    refiner_start_at: float = 0.5
    # turbo one-big-step training (SDTrainer.process_output_for_turbo:398-470):
    # euler-ancestral step to a random later sigma, residual noise removed,
    # decoded to pixels, pixel-space loss; DDPM (eps-pred) schedules only
    train_turbo: bool = False
    show_turbo_outputs: bool = False
    # learnable SNR gamma (reference train_tools.LearnableSNRGamma): four
    # scalars adapt online so |gamma / ((snr+o1)*scale+o2)| balances the
    # per-timestep loss against a rolling mean target. DDPM schedules only.
    learnable_snr: bool = False
    # x-prediction archs (PRX pixel): the model outputs the clean x0, so the
    # regression target is the clean latents, not the schedule's velocity/eps
    # (reference prx_pixel_t2i.get_loss_target)
    x0_target: bool = False
    # arch-defined noise std multiplier (PRX noise_scale=2.0,
    # prx_pixel_t2i.get_latent_noise_from_latents); composes with the user's
    # noise_multiplier knob
    model_noise_scale: float = 1.0
    # x0-space losses (reference SDTrainer.py:836-870): replace the regression
    # with (stepped-to-t0 pred, clean latents); optional 1/t^2 velocity-equiv
    # weight rescales it to flow-matching loss magnitude
    t0_loss_target: bool = False
    t0_velocity_equiv_weight: bool = False
    do_fft_loss: bool = False
    do_fft_velocity_equiv_weight: bool = False
    # reference TrainConfig.loss_target (SDTrainer.py:803-833): 'source' /
    # 'unaugmented' regress the one-shot denoised latent against the clean
    # (or pre-augmentation) latents with sigma^-2 weighting
    loss_target_mode: str = "noise"
    # DDPM timestep skew (BaseSDTrainProcess.py:1243-1313): cubic
    # content/style distributions; the _reg variant applies to reg batches
    content_or_style: str = "balanced"
    content_or_style_reg: str = "balanced"
    # push the target away from the current prediction along the residual
    # (reference do_differential_guidance, SDTrainer.py:788-791)
    do_differential_guidance: bool = False
    differential_guidance_scale: float = 3.0
    # noise selection (reference get_noise, BaseSDTrainProcess.py:992-1028)
    optimal_noise_pairing_samples: int = 1
    force_consistent_noise: bool = False
    # noise shaping (BaseSDTrainProcess.py:1324-1385) — all per-(sample,
    # channel) elementwise ops
    dynamic_noise_offset: bool = False
    do_signal_correction_noise: bool = False
    signal_correction_noise_scale: float = 1.0
    do_batch_noise_correction: bool = False
    batch_noise_correction_scale: float = 1.0
    random_noise_shift: float = 0.0
    random_noise_multiplier: float = 0.0
    # output/target shaping (SDTrainer.py:520-526, 995-999)
    pred_scaler: float = 1.0
    target_noise_multiplier: float = 1.0
    target_norm_std: bool = False
    target_norm_std_value: float = 1.0
    # per-sample/channel latent renorm (BaseSDTrainProcess.py:1074-1082)
    adaptive_scaling_factor: bool = False
    # DDPM timestep window
    min_denoising_steps: int = 0
    max_denoising_steps: int | None = None
    # regress the adapter's blank-prompt prediction toward the base model's
    # (reference blank_prompt_preservation, SDTrainer.py:2116-2151)
    blank_prompt_preservation: bool = False
    blank_prompt_preservation_multiplier: float = 1.0
    # target-side CFG extrapolation (SDTrainer.py:695-760): anchor the flow
    # target at the model's own unconditional prediction and extrapolate
    guidance_loss_target: float = 1.0
    do_guidance_loss_cfg_zero: bool = False  # CFG-Zero* alpha on the anchor
    guidance_loss_schedule: str = "constant"  # constant | sigma
    # probability the DOP/prior forward keeps the assist adapter's residuals
    # (reference match_adapter_chance; default 0 = prior runs adapter-free)
    match_adapter_chance: float = 0.0
    # flow target amplifies the signal term as sigma falls
    # (reference do_signal_amplification, SDTrainer.py:594-603)
    do_signal_amplification: bool = False
    signal_amplification_strength: float = 1.0
    next_sample_timesteps: int | None = None  # K-step ladder for next_sample

    @classmethod
    def from_train_config(cls, tc: TrainConfig) -> "TrainStepConfig":
        return cls(
            timestep_type="linear" if tc.linear_timesteps or tc.linear_timesteps2 else tc.timestep_type,
            timestep_bias=tc.timestep_bias,
            loss_type=tc.loss_type
            if tc.loss_type in ("mse", "mae", "pseudo_huber", "wavelet", "stepped")
            else "mse",
            huber_c=tc.pseudo_huber_c,
            min_snr_gamma=tc.min_snr_gamma,
            use_timestep_weights=bool(
                tc.linear_timesteps or tc.linear_timesteps2 or tc.timestep_type == "weighted"
            ),
            timestep_weights_v2=bool(tc.linear_timesteps2),
            noise_offset=tc.noise_offset,
            noise_multiplier=tc.noise_multiplier,
            blended_blur_noise=bool(getattr(tc, "blended_blur_noise", False)),
            ema_decay=tc.ema_config.ema_decay if tc.ema_config.use_ema else None,
            grad_accum=max(1, tc.gradient_accumulation_steps),
            diff_output_preservation=tc.diff_output_preservation,
            dop_multiplier=tc.diff_output_preservation_multiplier,
            inverted_mask_prior=tc.inverted_mask_prior,
            inverted_mask_prior_multiplier=tc.inverted_mask_prior_multiplier,
            do_prior_pred=tc.diff_output_preservation or tc.inverted_mask_prior,
            do_cfg=tc.do_cfg,
            cfg_scale=tc.cfg_scale,
            do_random_cfg=bool(getattr(tc, "do_random_cfg", False)),
            max_cfg_scale=float(getattr(tc, "max_cfg_scale", 4.0)),
            cfg_rescale=float(getattr(tc, "cfg_rescale", 0.0)),
            noisy_multiplier=float(getattr(tc, "noisy_latent_multiplier", 1.0)),
            standardize_latents=bool(getattr(tc, "standardize_latents", False)),
            max_loss=getattr(tc, "max_loss", None),
            audio_loss_multiplier=float(getattr(tc, "audio_loss_multiplier", 1.0)),
            correct_pred_norm=bool(getattr(tc, "correct_pred_norm", False)),
            correct_pred_norm_multiplier=float(
                getattr(tc, "correct_pred_norm_multiplier", 1.0)
            ),
            learnable_snr=bool(getattr(tc, "learnable_snr_gos", False)),
            t0_loss_target=bool(getattr(tc, "t0_loss_target", False)),
            t0_velocity_equiv_weight=bool(getattr(tc, "t0_velocity_equiv_weight", False)),
            do_fft_loss=bool(getattr(tc, "do_fft_loss", False)),
            do_fft_velocity_equiv_weight=bool(
                getattr(tc, "do_fft_velocity_equiv_weight", False)
            ),
            loss_target_mode=getattr(tc, "loss_target", None) or "noise",
            content_or_style=getattr(tc, "content_or_style", "balanced"),
            content_or_style_reg=getattr(tc, "content_or_style_reg", None)
            or getattr(tc, "content_or_style", "balanced"),
            do_differential_guidance=bool(getattr(tc, "do_differential_guidance", False)),
            differential_guidance_scale=float(
                getattr(tc, "differential_guidance_scale", 3.0)
            ),
            optimal_noise_pairing_samples=int(
                getattr(tc, "optimal_noise_pairing_samples", 1) or 1
            ),
            force_consistent_noise=bool(getattr(tc, "force_consistent_noise", False)),
            dynamic_noise_offset=bool(getattr(tc, "dynamic_noise_offset", False)),
            do_signal_correction_noise=bool(
                getattr(tc, "do_signal_correction_noise", False)
            ),
            signal_correction_noise_scale=float(
                getattr(tc, "signal_correction_noise_scale", 1.0)
            ),
            do_batch_noise_correction=bool(
                getattr(tc, "do_batch_noise_correction", False)
            ),
            batch_noise_correction_scale=float(
                getattr(tc, "batch_noise_correction_scale", 1.0)
            ),
            random_noise_shift=float(getattr(tc, "random_noise_shift", 0.0)),
            random_noise_multiplier=float(getattr(tc, "random_noise_multiplier", 0.0)),
            pred_scaler=float(getattr(tc, "pred_scaler", 1.0)),
            target_noise_multiplier=float(getattr(tc, "target_noise_multiplier", 1.0)),
            target_norm_std=bool(getattr(tc, "target_norm_std", False)),
            target_norm_std_value=float(getattr(tc, "target_norm_std_value", 1.0)),
            adaptive_scaling_factor=bool(getattr(tc, "adaptive_scaling_factor", False)),
            min_denoising_steps=int(getattr(tc, "min_denoising_steps", 0) or 0),
            max_denoising_steps=getattr(tc, "max_denoising_steps", None),
            blank_prompt_preservation=bool(
                getattr(tc, "blank_prompt_preservation", False)
            ),
            blank_prompt_preservation_multiplier=float(
                getattr(tc, "blank_prompt_preservation_multiplier", 1.0)
            ),
            guidance_loss_target=float(getattr(tc, "guidance_loss_target", 1.0)),
            do_guidance_loss_cfg_zero=bool(
                getattr(tc, "do_guidance_loss_cfg_zero", False)
            ),
            guidance_loss_schedule=str(
                getattr(tc, "guidance_loss_schedule", "constant") or "constant"
            ),
            match_adapter_chance=float(getattr(tc, "match_adapter_chance", 0.0)),
            do_signal_amplification=bool(getattr(tc, "do_signal_amplification", False)),
            signal_amplification_strength=float(
                getattr(tc, "signal_amplification_strength", 1.0)
            ),
            next_sample_timesteps=getattr(tc, "next_sample_timesteps", None),
            train_turbo=bool(getattr(tc, "train_turbo", False)),
            show_turbo_outputs=bool(getattr(tc, "show_turbo_outputs", False)),
        )




_LSNR_KEYS = ("offset_1", "offset_2", "scale", "gamma")


def init_lsnr_state() -> dict:
    """Reference LearnableSNRGamma init values + AdamW(0.01) slots + the
    rolling loss buffer (max 20)."""
    params = {"offset_1": jnp.asarray(0.0), "offset_2": jnp.asarray(0.777),
              "scale": jnp.asarray(4.14), "gamma": jnp.asarray(2.03)}
    zeros = {k: jnp.zeros(()) for k in _LSNR_KEYS}
    # count is float so the outer value_and_grad (which sees the whole
    # trainable tree) never meets an integer leaf
    return {"params": params, "m": zeros, "v": zeros,
            "buffer": jnp.zeros((20,)), "count": jnp.zeros(())}


def _lsnr_weight(params: dict, snr: jax.Array) -> jax.Array:
    adj = (snr + params["offset_1"]) * params["scale"] + params["offset_2"]
    return jnp.abs(params["gamma"] / adj)


def _lsnr_update(lsnr: dict, per_sample_loss: jax.Array, snr: jax.Array) -> dict:
    """One AdamW step of the local objective
    mean((loss * w(params) - rolling_target)^2) — reference forward()."""
    per = jax.lax.stop_gradient(per_sample_loss.astype(jnp.float32))
    buf = jnp.roll(lsnr["buffer"], -1).at[-1].set(per.mean())
    count = jnp.minimum(lsnr["count"] + 1.0, float(buf.shape[0]))
    # mean over the filled tail of the buffer
    idx = jnp.arange(buf.shape[0], dtype=jnp.float32)
    filled = idx >= (buf.shape[0] - count)
    target = jnp.sum(jnp.where(filled, buf, 0.0)) / jnp.maximum(count, 1.0)

    def local(params):
        w = _lsnr_weight(params, jax.lax.stop_gradient(snr))
        return jnp.mean((per * w - target) ** 2)

    g = jax.grad(local)(lsnr["params"])
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    new_p, new_m, new_v = {}, {}, {}
    for k in _LSNR_KEYS:
        m = b1 * lsnr["m"][k] + (1 - b1) * g[k]
        v = b2 * lsnr["v"][k] + (1 - b2) * g[k] ** 2
        new_m[k], new_v[k] = m, v
        new_p[k] = lsnr["params"][k] - lr * m / (jnp.sqrt(v) + eps)
    return {"params": new_p, "m": new_m, "v": new_v, "buffer": buf, "count": count}


def make_train_step(
    predict_fn: Callable[..., jax.Array],
    schedule: Any,
    cfg: TrainStepConfig,
    aux_loss_fn: Callable[..., jax.Array] | None = None,
    decode_fn: Callable[..., jax.Array] | None = None,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """Build the train step.

    predict_fn(variables, noisy_latents, t, cond) -> model prediction, where
    ``cond`` is the model-specific conditioning dict from the batch
    (prompt embeds, pooled embeds, position ids, ...). ``variables`` carries
    the 'lora' collection when training an adapter — predict_fn must pass it
    through to apply().

    aux_loss_fn(pred, noisy, latents, noise, t) -> scalar adds an extra loss
    term inside the grad (e.g. the DFE perceptual latent loss).
    """

    is_flow = hasattr(schedule, "euler_step")
    if cfg.loss_type == "stepped" and not is_flow:
        raise ValueError("loss_type='stepped' requires a flow-matching schedule")
    if (cfg.t0_loss_target or cfg.do_fft_loss) and not (is_flow or cfg.x0_target):
        raise ValueError(
            "t0_loss_target/do_fft_loss need a flow-matching schedule (or an x0-pred arch)"
        )
    if cfg.loss_target_mode not in ("noise", "source", "unaugmented"):
        raise ValueError(f"unknown loss_target: {cfg.loss_target_mode!r}")
    if cfg.loss_target_mode != "noise" and not (is_flow or cfg.x0_target):
        raise ValueError(
            f"loss_target='{cfg.loss_target_mode}' needs a flow-matching schedule"
        )
    if cfg.train_turbo:
        if is_flow:
            raise ValueError(
                "train_turbo is an eps-pred/DDPM feature (the reference "
                "implements it for euler_a schedules) — not flow matching")
        if decode_fn is None:
            raise ValueError(
                "train_turbo requires the VAE decode in-graph and raw pixels "
                "in the batch — set cache_latents: false")

    def microbatch_loss(trainable, model_variables, batch, rng, seq_len, t_range=None):
        latents = batch["latents"]
        b = latents.shape[0]
        rng_t, rng_n, rng_o = jax.random.split(rng, 3)

        if cfg.standardize_latents:
            ax = tuple(range(1, latents.ndim))
            mu = jnp.mean(latents, axis=ax, keepdims=True)
            sd = jnp.std(latents.astype(jnp.float32), axis=ax, keepdims=True)
            latents = ((latents - mu) / jnp.maximum(sd, 1e-6).astype(latents.dtype))
        if cfg.adaptive_scaling_factor:
            # per-(sample, channel) std renorm replaces the static
            # latent_multiplier (BaseSDTrainProcess.py:1074-1082)
            sp = tuple(range(1, latents.ndim - 1))
            sd = jnp.std(latents.astype(jnp.float32), axis=sp, keepdims=True)
            latents = (latents.astype(jnp.float32) / (sd + 1e-6)).astype(latents.dtype)

        if is_flow:
            t = schedule.sample_timesteps(
                rng_t, b, timestep_type=cfg.timestep_type,
                image_seq_len=seq_len, timestep_bias=cfg.timestep_bias,
            )
            if t_range is not None:
                # multistage: squeeze into the active expert's noise range
                lo, hi = t_range
                t = lo + t * (hi - lo)
        else:
            tt = cfg.timestep_type if cfg.timestep_type in (
                "two_step", "four_step", "eight_step", "one_step", "next_sample"
            ) else None
            lo_t = cfg.min_denoising_steps
            hi_t = cfg.max_denoising_steps
            if cfg.refiner_double:
                # refiner double-up (BaseSDTrainProcess.py:1434-1450): base
                # half below the split, refiner half above
                n_train = int(getattr(schedule, "num_train_timesteps", 1000))
                split = int(round((hi_t or n_train) * cfg.refiner_start_at))
                half = b // 2
                t1 = schedule.sample_timesteps(
                    rng_t, half, min_t=lo_t, max_t=split,
                    content_or_style=cfg.content_or_style, timestep_type=tt,
                    next_sample_timesteps=cfg.next_sample_timesteps,
                )
                t2 = schedule.sample_timesteps(
                    jax.random.fold_in(rng_t, 13), b - half, min_t=split, max_t=hi_t,
                    content_or_style=cfg.content_or_style, timestep_type=tt,
                    next_sample_timesteps=cfg.next_sample_timesteps,
                )
                t = jnp.concatenate([t1, t2])
            else:
                t = schedule.sample_timesteps(
                    rng_t, b, min_t=lo_t, max_t=hi_t,
                    content_or_style=cfg.content_or_style, timestep_type=tt,
                    next_sample_timesteps=cfg.next_sample_timesteps,
                )
            if cfg.content_or_style_reg != cfg.content_or_style:
                t_reg = schedule.sample_timesteps(
                    rng_t, b, min_t=lo_t, max_t=hi_t,
                    content_or_style=cfg.content_or_style_reg, timestep_type=tt,
                    next_sample_timesteps=cfg.next_sample_timesteps,
                )
                t = jnp.where(batch.get("is_reg_flag", jnp.zeros(())) > 0, t_reg, t)

        if cfg.optimal_noise_pairing_samples > 1:
            # pick the candidate noise closest to the latents per sample
            # (BaseSDTrainProcess.get_optimal_noise) — one vectorized draw
            # + argmin instead of the reference's per-sample python loop
            kk = cfg.optimal_noise_pairing_samples
            cands = jax.random.normal(rng_n, (kk,) + latents.shape, latents.dtype)
            mse = jnp.mean(
                (cands.astype(jnp.float32) - latents[None].astype(jnp.float32)) ** 2,
                axis=tuple(range(2, latents.ndim + 1)),
            )  # [K, B]
            noise = cands[jnp.argmin(mse, axis=0), jnp.arange(b)]
        elif cfg.force_consistent_noise and "noise_seed" in batch:
            # per-image deterministic noise keyed by the file path hash
            # (get_consistent_noise) — constant across steps by construction
            base = jax.random.key(0)
            noise = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.fold_in(base, s), latents.shape[1:], latents.dtype
                )
            )(batch["noise_seed"])
        else:
            noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
        if cfg.model_noise_scale != 1.0:
            noise = noise * cfg.model_noise_scale
        if cfg.noise_multiplier != 1.0:
            noise = noise * cfg.noise_multiplier
        if cfg.noise_offset:
            # per-channel offset noise (reference get_noise, BaseSDTrainProcess.py:992)
            offs = jax.random.normal(rng_o, latents.shape[:1] + (1,) * (latents.ndim - 2) + latents.shape[-1:])
            noise = noise + cfg.noise_offset * offs.astype(latents.dtype)
        if cfg.blended_blur_noise and latents.ndim == 4:
            # down-4x/up bilinear blur residual of the clean latents, blended
            # at a per-sample U(0,2) strength (reference blended_blur_noise)
            bb, hh_, ww_, cc_ = latents.shape
            lat32 = latents.astype(jnp.float32)
            small = jax.image.resize(
                lat32, (bb, max(1, hh_ // 4), max(1, ww_ // 4), cc_), "bilinear"
            )
            blur = jax.image.resize(small, latents.shape, "bilinear") - lat32
            strength = jax.random.uniform(
                jax.random.fold_in(rng_o, 7), (bb, 1, 1, 1)
            ) * 2.0
            noise = noise + (blur * strength).astype(noise.dtype)

        # noise shaping (BaseSDTrainProcess.py:1324-1385); `cs` = one random
        # scalar per (sample, channel), channels-last
        cs_shape = latents.shape[:1] + (1,) * (latents.ndim - 2) + latents.shape[-1:]
        if cfg.dynamic_noise_offset:
            # offset the noise toward the latents' channelwise mean / 2
            sp = tuple(range(1, latents.ndim - 1))
            noise = noise + (jnp.mean(latents, axis=sp, keepdims=True) / 2).astype(noise.dtype)
        if cfg.do_signal_correction_noise:
            scn = jax.random.normal(jax.random.fold_in(rng_o, 21), cs_shape)
            noise = noise + latents * (scn * cfg.signal_correction_noise_scale).astype(noise.dtype)
        if cfg.do_batch_noise_correction and b > 1:
            shift = jax.random.randint(jax.random.fold_in(rng_o, 22), (), 1, b)
            rolled = jnp.roll(latents, shift, axis=0)
            bns = jax.random.normal(jax.random.fold_in(rng_o, 23), cs_shape)
            noise = noise + rolled * (bns * cfg.batch_noise_correction_scale).astype(noise.dtype)
        if cfg.random_noise_shift > 0.0:
            ns = jax.random.normal(jax.random.fold_in(rng_o, 24), cs_shape)
            noise = noise + (ns * cfg.random_noise_shift).astype(noise.dtype)
        if cfg.random_noise_multiplier > 0.0:
            nm = jax.random.normal(jax.random.fold_in(rng_o, 25), cs_shape)
            noise = noise * jnp.exp(nm * cfg.random_noise_multiplier).astype(noise.dtype)

        noisy = schedule.add_noise(latents, noise, t)
        target_noise = (
            noise * cfg.target_noise_multiplier
            if cfg.target_noise_multiplier != 1.0
            else noise
        )
        target = latents if cfg.x0_target else schedule.target(latents, target_noise, t)
        if cfg.do_signal_amplification and is_flow:
            # amplify the signal term toward low sigma: target becomes
            # noise - latents*(1 + (1-t)*strength)
            nas = ((1.0 - t) * cfg.signal_amplification_strength).reshape(
                t.shape + (1,) * (latents.ndim - t.ndim)
            ).astype(latents.dtype)
            target = target_noise - (latents + latents * nas)
        if cfg.noisy_multiplier != 1.0:
            noisy = noisy * cfg.noisy_multiplier

        variables = merge_variables(model_variables, trainable)
        cond = batch.get("cond", {})

        # joint audio-video stream (LTX-2 a2v, reference ltx2.py:945-1079):
        # audio latents get their own noise at the SAME sigma; the model
        # returns (video_pred, audio_pred) and both streams hit the target.
        audio_target = None
        if "audio_latents" in batch:
            a_lat = batch["audio_latents"]
            noise_a = jax.random.normal(jax.random.fold_in(rng_n, 1), a_lat.shape, a_lat.dtype)
            noisy_a = schedule.add_noise(a_lat, noise_a, t)
            audio_target = schedule.target(a_lat, noise_a, t)
            cond = {**cond, "noisy_audio": noisy_a}

        pred = predict_fn(variables, noisy, t, cond)
        if cfg.pred_scaler != 1.0:
            pred = pred * cfg.pred_scaler
        audio_pred = None
        if audio_target is not None:
            pred, audio_pred = pred
        if cfg.do_cfg and "neg_cond" in batch:
            # CFG-trained negatives (reference train.do_cfg): regress the
            # guidance-combined prediction so sampling at cfg_scale is baked in
            pred_neg = predict_fn(variables, noisy, t, batch["neg_cond"])
            if cfg.do_random_cfg:
                scale = jax.random.uniform(
                    jax.random.fold_in(rng_o, 13), (), minval=1.0,
                    maxval=cfg.max_cfg_scale,
                )
            else:
                scale = cfg.cfg_scale
            pred_pos = pred
            pred = pred_neg + scale * (pred - pred_neg)
            if cfg.cfg_rescale > 0.0:
                # std-matching rescale (reference cfg_rescale; Lin et al. 2023)
                ax = tuple(range(1, pred.ndim))
                std_pos = jnp.std(pred_pos.astype(jnp.float32), axis=ax, keepdims=True)
                std_cfg = jnp.std(pred.astype(jnp.float32), axis=ax, keepdims=True)
                rescaled = pred * (std_pos / jnp.maximum(std_cfg, 1e-6)).astype(pred.dtype)
                pred = cfg.cfg_rescale * rescaled + (1.0 - cfg.cfg_rescale) * pred

        prior_pred = None
        if cfg.do_prior_pred:
            base_vars = {k: v for k, v in variables.items() if k != "lora"}
            pcond = cond
            if "adapter_residuals" in cond:
                # reference match_adapter_chance (SDTrainer.py:1407-1416 +
                # 1292-1296): the prior normally runs WITHOUT the assist
                # adapter's residuals; with probability `chance` it keeps
                # them. Residuals are additive, so zeroing == popping.
                mflag = (
                    jax.random.uniform(jax.random.fold_in(rng_o, 31), ())
                    < cfg.match_adapter_chance
                ).astype(jnp.float32)
                pcond = {
                    **cond,
                    "adapter_residuals": jax.tree.map(
                        lambda r: r * mflag.astype(r.dtype), cond["adapter_residuals"]
                    ),
                }
            prior_pred = jax.lax.stop_gradient(predict_fn(base_vars, noisy, t, pcond))

        tw = None
        if cfg.use_timestep_weights and is_flow:
            tw = schedule.loss_weights(
                t, timestep_type=cfg.timestep_type, v2=cfg.timestep_weights_v2
            )
        elif cfg.learnable_snr and not is_flow and "lsnr" in trainable \
                and not cfg.train_turbo:
            # learnable SNR takes priority over min_snr_gamma, matching the
            # reference branch order (SDTrainer.py:970-979); turbo skips SNR
            # weighting entirely (SDTrainer.py:969)
            tw = jax.lax.stop_gradient(
                _lsnr_weight(trainable["lsnr"]["params"], schedule.snr(t))
            )
        elif cfg.min_snr_gamma and not is_flow and not cfg.train_turbo:
            tw = schedule.min_snr_weight(t, cfg.min_snr_gamma)

        if cfg.correct_pred_norm:
            # rescale pred toward the target's per-(sample,channel) spatial
            # norm (reference SDTrainer correct_pred_norm), stop-grad factor
            ax = tuple(range(1, pred.ndim - 1))
            tn = jnp.linalg.norm(target.astype(jnp.float32), axis=ax, keepdims=True)
            pn = jnp.linalg.norm(pred.astype(jnp.float32), axis=ax, keepdims=True)
            factor = (tn / jnp.maximum(pn, 1e-6)) ** cfg.correct_pred_norm_multiplier
            pred = pred * jax.lax.stop_gradient(factor).astype(pred.dtype)

        if cfg.guidance_loss_target != 1.0 and "uncond_cond" in batch:
            # target-side CFG: anchor at the model's unconditional prediction
            # and extrapolate the flow target away from it (SDTrainer.py:695-752)
            u_all = predict_fn(variables, noisy, t, batch["uncond_cond"])
            u_audio = None
            if audio_target is not None:
                u_all, u_audio = u_all

            def _extrapolate(tgt, anchor):
                anchor = jax.lax.stop_gradient(anchor).astype(jnp.float32)
                tf = tgt.astype(jnp.float32)
                if cfg.do_guidance_loss_cfg_zero:
                    # CFG-Zero*: project the anchor onto the target direction
                    axes = tuple(range(1, anchor.ndim))
                    dot = jnp.sum(tf * anchor, axis=axes, keepdims=True)
                    sq = jnp.sum(anchor * anchor, axis=axes, keepdims=True) + 1e-8
                    anchor = anchor * (dot / sq)
                g = jnp.asarray(cfg.guidance_loss_target, jnp.float32)
                if cfg.guidance_loss_schedule == "sigma" and is_flow:
                    # the extrapolation direction carries fresh noise nothing
                    # can predict at low sigma — decay toward a plain target
                    sig = t.reshape(t.shape + (1,) * (tf.ndim - t.ndim)).astype(jnp.float32)
                    g = 1.0 + (g - 1.0) * sig
                return (anchor + g * (tf - anchor)).astype(tgt.dtype)

            target = _extrapolate(target, u_all)
            if audio_target is not None and u_audio is not None:
                # audio stream trains contrastively too (SDTrainer.py:754-786)
                audio_target = _extrapolate(audio_target, u_audio)

        if cfg.do_differential_guidance:
            # amplify the residual the model still has to learn
            # (SDTrainer.py:788-791), stop-grad so only pred carries grads
            target = jax.lax.stop_gradient(
                pred + cfg.differential_guidance_scale * (target.astype(jnp.float32) - pred)
            ).astype(target.dtype)

        # x0-space loss shaping (reference SDTrainer.py:836-870 + stepped_loss)
        loss_pred, loss_target, loss_kind = pred, target, cfg.loss_type
        fft_loss = None
        loss_mask = batch.get("mask")
        turbo_pixels = None
        if cfg.train_turbo:
            # one-big-step turbo (SDTrainer.process_output_for_turbo:398-470):
            # euler-ancestral step from sigma(t) to a random later sigma,
            # residual noise removed, decoded to pixels; pixel-space mse
            # against the batch images with the mask nearest-resized
            ac = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
            sig_tab = jnp.sqrt((1.0 - ac) / ac)
            ti = t.astype(jnp.int32)
            shape1 = t.shape + (1,) * (pred.ndim - 1)
            s_from = sig_tab[ti].reshape(shape1)
            u = jax.random.uniform(jax.random.fold_in(rng_o, 31), t.shape)
            end_i = (u * ti.astype(jnp.float32)).astype(jnp.int32)
            s_to = sig_tab[end_i].reshape(shape1)
            a_t = ac[ti].reshape(shape1)
            # our add_noise is alphas-space; euler schedulers live in
            # sigma-space: x_sig = x / sqrt(acp) = x0 + sigma * eps
            x_sig = noisy.astype(jnp.float32) / jnp.sqrt(a_t)
            eps = pred.astype(jnp.float32)
            var_up = s_to**2 * (s_from**2 - s_to**2) / jnp.maximum(s_from**2, 1e-8)
            s_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
            s_down = jnp.sqrt(jnp.maximum(s_to**2 - s_up**2, 0.0))
            z = jax.random.normal(jax.random.fold_in(rng_o, 32), noisy.shape)
            x_end = x_sig + eps * (s_down - s_from) + z.astype(jnp.float32) * s_up
            x_clean = x_end - noise.astype(jnp.float32) * s_to
            turbo_pixels = decode_fn(variables, x_clean)
            loss_pred = turbo_pixels.astype(jnp.float32)
            loss_target = jax.lax.stop_gradient(
                batch["pixel_values"].astype(jnp.float32))
            loss_kind = "mse"
            if loss_mask is not None:
                loss_mask = jax.image.resize(
                    loss_mask.astype(jnp.float32),
                    loss_mask.shape[:1] + loss_pred.shape[1:-1] + loss_mask.shape[-1:],
                    method="nearest")
        if cfg.loss_target_mode in ("source", "unaugmented"):
            # one-shot denoise + sigma^-2 weighting (reference SDTrainer.py:
            # 803-833, after the diffusers t2i-adapter recipe); 'unaugmented'
            # swaps the regression target for the pre-augmentation latents
            sig_min = 1.0 / getattr(schedule, "num_train_timesteps", 1000)
            tv = jnp.clip(t, sig_min, None)
            tvx = tv.reshape(t.shape + (1,) * (pred.ndim - t.ndim))
            denoised = (
                pred.astype(jnp.float32)
                if cfg.x0_target
                else noisy.astype(jnp.float32) - tvx * pred.astype(jnp.float32)
            )
            tgt_lat = latents
            if cfg.loss_target_mode == "unaugmented" and "unaugmented_latents" in batch:
                tgt_lat = batch["unaugmented_latents"]
            loss_pred = denoised
            loss_target = jax.lax.stop_gradient(tgt_lat.astype(jnp.float32))
            loss_kind = "mse"
            w = tv.astype(jnp.float32) ** -2.0  # [B]
            tw = w if tw is None else tw * w
        elif cfg.loss_type == "stepped":
            # Euler-step 50 table indices ahead, invert the forward process,
            # and regress the recovered x0 against the clean latents
            loss_pred = schedule.stepped_x0(pred, noisy, noise, t)
            loss_target = jax.lax.stop_gradient(latents.astype(jnp.float32))
            loss_kind = "mse"
        elif cfg.t0_loss_target or cfg.do_fft_loss:
            tv = jnp.clip(t, 0.001, None).reshape(t.shape + (1,) * (pred.ndim - t.ndim))
            t0 = (
                pred.astype(jnp.float32)
                if cfg.x0_target
                else noisy.astype(jnp.float32) - tv * pred.astype(jnp.float32)
            )
            if cfg.t0_loss_target:
                loss_pred = t0
                loss_target = jax.lax.stop_gradient(latents.astype(jnp.float32))
                if cfg.t0_velocity_equiv_weight:
                    # rescale toward flow-matching loss magnitude: 1/t^2
                    vw = 1.0 / jnp.clip(t, 0.1, None) ** 2  # [B]
                    tw = vw if tw is None else tw * vw
            if cfg.do_fft_loss and latents.ndim >= 4:
                # spectral-magnitude mse on the t=0 prediction (ortho rfft2
                # over the spatial dims; channels-last layout -> axes -3,-2)
                tmag = jnp.abs(
                    jnp.fft.rfft2(latents.astype(jnp.float32), axes=(-3, -2), norm="ortho")
                )
                pmag = jnp.abs(jnp.fft.rfft2(t0, axes=(-3, -2), norm="ortho"))
                fft_elem = (pmag - jax.lax.stop_gradient(tmag)) ** 2
                if cfg.do_fft_velocity_equiv_weight:
                    fvw = 1.0 / jnp.clip(tv, 0.1, None) ** 2
                    fft_elem = fft_elem * fvw
                fft_loss = jnp.mean(fft_elem)

        loss, aux = compute_loss(
            loss_pred,
            loss_target,
            loss_type=loss_kind,
            huber_c=cfg.huber_c,
            timestep_weights=tw,
            loss_multiplier=batch.get("loss_multiplier"),
            mask=loss_mask,
            prior_pred=prior_pred if (cfg.inverted_mask_prior and not cfg.train_turbo) else None,
            inverted_mask_prior_multiplier=cfg.inverted_mask_prior_multiplier,
        )
        if turbo_pixels is not None and cfg.show_turbo_outputs:
            aux = {**aux, "turbo_pixels": jax.lax.stop_gradient(turbo_pixels)}
        if fft_loss is not None:
            loss = loss + fft_loss
            aux = {**aux, "fft_loss": fft_loss}
        if cfg.target_norm_std:
            # keep the prediction's spatial std near a target value
            # (SDTrainer.py:995-999)
            sp = tuple(range(1, pred.ndim - 1))
            pred_std = jnp.std(pred.astype(jnp.float32), axis=sp, keepdims=True)
            loss = loss + jnp.mean(jnp.abs(cfg.target_norm_std_value - pred_std))
        if cfg.diff_output_preservation and prior_pred is not None:
            loss = loss + diff_output_preservation_loss(pred, prior_pred, cfg.dop_multiplier)
        if cfg.blank_prompt_preservation and "blank_cond" in batch:
            # the adapter must not drift on the empty prompt: regress its
            # blank-cond prediction toward the base model's
            bcond = batch["blank_cond"]
            base_vars = {k: v for k, v in variables.items() if k != "lora"}
            blank_prior = jax.lax.stop_gradient(predict_fn(base_vars, noisy, t, bcond))
            blank_pred = predict_fn(variables, noisy, t, bcond)
            bpp = jnp.mean(
                (blank_pred.astype(jnp.float32) - blank_prior.astype(jnp.float32)) ** 2
            )
            loss = loss + cfg.blank_prompt_preservation_multiplier * bpp
            aux = {**aux, "bpp_loss": bpp}
        if audio_pred is not None:
            audio_loss, _ = compute_loss(
                audio_pred, audio_target, loss_type=cfg.loss_type, huber_c=cfg.huber_c,
                timestep_weights=tw, loss_multiplier=batch.get("loss_multiplier"),
            )
            loss = loss + cfg.audio_loss_multiplier * audio_loss
            aux = {**aux, "audio_loss": audio_loss}
        if aux_loss_fn is not None:
            extra = aux_loss_fn(pred, noisy, latents, noise, t)
            loss = loss + extra
            aux = {**aux, "aux_loss": extra}
        if cfg.learnable_snr and not is_flow and "lsnr" in trainable:
            per = jnp.mean(
                (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                axis=tuple(range(1, pred.ndim)),
            )
            aux = {**aux, "new_lsnr": _lsnr_update(trainable["lsnr"], per, schedule.snr(t))}
        if cfg.max_loss is not None:
            # reference train.max_loss: outlier batches produce no update
            aux = {**aux, "max_loss_skipped": (loss >= cfg.max_loss).astype(jnp.float32)}
            loss = jnp.where(loss < cfg.max_loss, loss, jnp.zeros_like(loss))
        return loss, aux

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(
        state: TrainState, batch: dict, rng: jax.Array, image_seq_len: int | None = None
    ) -> tuple[TrainState, dict]:
        # image_seq_len is STATIC (drives the host-side dynamic-shift mu);
        # jit with static_argnames=("image_seq_len",) — one compile per bucket.
        rng = jax.random.fold_in(rng, state.step)

        t_range = None
        if cfg.switch_every > 0 and cfg.stage_boundary is not None:
            # alternate the trained expert every switch_every steps
            # (reference multistage switch_boundary_every, SDTrainer.py:2199)
            phase = (state.step // cfg.switch_every) % 2
            lo = jnp.where(phase == 0, cfg.stage_boundary, 0.0)
            hi = jnp.where(phase == 0, 1.0, cfg.stage_boundary)
            t_range = (lo, hi)

        if cfg.grad_accum <= 1:
            (loss, aux), grads = grad_fn(state.trainable, state.model_variables, batch, rng,
                                         image_seq_len, t_range)
        else:
            # batch leaves have a leading [accum, micro_b, ...] axis. Aux
            # metrics are averaged across microbatches; the lsnr cell is
            # threaded sequentially through the carry (each microbatch sees
            # the previous one's update, mirroring the reference's
            # per-backward LearnableSNRGamma.forward calls).
            micro0 = jax.tree.map(lambda x: x[0], batch)
            aux_shapes = jax.eval_shape(
                lambda tr: grad_fn(tr, state.model_variables, micro0, rng, image_seq_len,
                                   t_range)[0][1],
                state.trainable,
            )
            has_lsnr = "new_lsnr" in aux_shapes
            aux0 = {
                k: jnp.zeros(v.shape, jnp.float32)
                for k, v in aux_shapes.items() if k != "new_lsnr"
            }
            lsnr0 = state.trainable["lsnr"] if has_lsnr else None

            def scan_body(carry, xs):
                g_acc, loss_acc, lsnr_c, aux_acc = carry
                micro, r = xs
                trainable = (
                    state.trainable if lsnr_c is None
                    else {**state.trainable, "lsnr": lsnr_c}
                )
                (l, a), g = grad_fn(trainable, state.model_variables, micro, r,
                                    image_seq_len, t_range)
                if has_lsnr:
                    lsnr_c = a.pop("new_lsnr")
                aux_acc = {k: aux_acc[k] + a[k].astype(jnp.float32) for k in aux_acc}
                return (
                    jax.tree.map(lambda x, y: x + y, g_acc, g),
                    loss_acc + l,
                    lsnr_c,
                    aux_acc,
                ), None

            zero = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable)
            rngs = jax.random.split(rng, cfg.grad_accum)
            (grads, loss_sum, lsnr_f, aux_sum), _ = jax.lax.scan(
                scan_body, (zero, 0.0, lsnr0, aux0), (batch, rngs)
            )
            grads = jax.tree.map(lambda g: g / cfg.grad_accum, grads)
            loss = loss_sum / cfg.grad_accum
            aux = {k: v / cfg.grad_accum for k, v in aux_sum.items()}
            if has_lsnr:
                aux["new_lsnr"] = lsnr_f

        new_state = state.apply_gradients(grads, ema_decay=cfg.ema_decay)
        new_lsnr = aux.pop("new_lsnr", None)
        if new_lsnr is not None:
            # the lsnr cell has its own optimizer — overwrite whatever the
            # main tx did to it (its grads are zero; adamw wd would decay it)
            new_state = new_state.replace(
                trainable={**new_state.trainable, "lsnr": new_lsnr}
            )
        metrics = {"loss": loss, "grad_norm": optax_global_norm(grads), **aux}
        return new_state, metrics

    return train_step


def make_eval_step(predict_fn, schedule, cfg: TrainStepConfig):
    """Validation loss: same loss path, fixed rng, no gradient/update.

    Reference: fixed-seed validation over cached latents/sigmas
    (``BaseSDTrainProcess.setup_validation/validate:1583-1737``).
    """
    base = make_train_step(predict_fn, schedule, cfg)

    @partial(jax.jit, static_argnames=("image_seq_len",))
    def eval_step(model_variables, trainable, batch, rng, image_seq_len=None):
        # reuse the microbatch loss via value-only grad trick is wasteful; call
        # the loss directly through a zero-step state
        def loss_only(trainable):
            state = TrainState(
                step=jnp.zeros((), jnp.int32), model_variables=model_variables,
                trainable=trainable, opt_state=None, ema=None, tx=None,
            )
            # reconstruct the loss exactly as the train step does
            return _eval_loss(predict_fn, schedule, cfg, state, batch, rng, image_seq_len)

        return loss_only(trainable)

    return eval_step


def _eval_loss(predict_fn, schedule, cfg, state, batch, rng, seq_len):
    from ai_toolkit_tpu.train.losses import compute_loss

    latents = batch["latents"]
    b = latents.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    is_flow = hasattr(schedule, "euler_step")
    if is_flow:
        t = schedule.sample_timesteps(
            rng_t, b, timestep_type=cfg.timestep_type, image_seq_len=seq_len
        )
    else:
        t = schedule.sample_timesteps(rng_t, b)
    noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
    if cfg.model_noise_scale != 1.0:
        noise = noise * cfg.model_noise_scale
    noisy = schedule.add_noise(latents, noise, t)
    target = latents if cfg.x0_target else schedule.target(latents, noise, t)
    variables = merge_variables(state.model_variables, state.trainable)
    cond = batch.get("cond", {})
    audio_target = None
    if "audio_latents" in batch:
        # joint AV validation mirrors the train loss: both streams at the
        # shared sigma (reference validate() runs the full training loss)
        a_lat = batch["audio_latents"]
        noise_a = jax.random.normal(jax.random.fold_in(rng_n, 1), a_lat.shape, a_lat.dtype)
        cond = {**cond, "noisy_audio": schedule.add_noise(a_lat, noise_a, t)}
        audio_target = schedule.target(a_lat, noise_a, t)
    pred = predict_fn(variables, noisy, t, cond)
    if audio_target is not None:
        pred, audio_pred = pred
    loss, _ = compute_loss(pred, target, loss_type=cfg.loss_type, huber_c=cfg.huber_c)
    if audio_target is not None:
        a_loss, _ = compute_loss(
            audio_pred, audio_target, loss_type=cfg.loss_type, huber_c=cfg.huber_c
        )
        loss = loss + a_loss
    return loss


def make_jitted_train_step(predict_fn, schedule, cfg: TrainStepConfig, tx,
                           aux_loss_fn=None, decode_fn=None):
    """Production jit wrapper: frozen model variables are an INPUT ONLY.

    Returning the (multi-GB) frozen params from a non-donated jit makes XLA
    allocate an output copy — instant OOM next to activations. Here the jitted
    function returns only the small state (trainable/opt/ema/step), which is
    also donated; the caller-side stepper reassembles a TrainState.
    """
    base = make_train_step(predict_fn, schedule, cfg, aux_loss_fn=aux_loss_fn,
                           decode_fn=decode_fn)

    # NOTE: donation of the small state is disabled — the axon PJRT backend
    # rejects aliased buffers (InvalidArgument); the small state is tiny anyway.
    @partial(jax.jit, static_argnames=("image_seq_len",))
    def _inner(model_variables, trainable, opt_state, ema, step, batch, rng, image_seq_len=None):
        state = TrainState(
            step=step, model_variables=model_variables, trainable=trainable,
            opt_state=opt_state, ema=ema, tx=tx,
        )
        new_state, metrics = base(state, batch, rng, image_seq_len)
        return (new_state.trainable, new_state.opt_state, new_state.ema, new_state.step), metrics

    def stepper(state: TrainState, batch: dict, rng: jax.Array, image_seq_len: int | None = None):
        (tr, opt, ema, st), metrics = _inner(
            state.model_variables, state.trainable, state.opt_state, state.ema, state.step,
            batch, rng, image_seq_len=image_seq_len,
        )
        return state.replace(trainable=tr, opt_state=opt, ema=ema, step=st), metrics

    stepper._inner = _inner  # exposed for AOT lowering (bench cost_analysis)
    return stepper


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
