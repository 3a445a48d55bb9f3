"""Image generation (sampling) pipelines.

Replaces the reference's per-model ``generate_single_image`` diffusion loops
(``/root/reference/toolkit/models/base_model.py:386``, model plugins) with
pure JAX loops: one jitted denoise step re-used across all sigmas (static
shapes per resolution), CFG for eps models, guidance-embedding for flux.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import GenerateImageConfig
from ai_toolkit_tpu.samplers import DDPMSchedule, FlowMatchSchedule
from ai_toolkit_tpu.train.state import merge_variables


def generate_flux(
    model,
    variables: dict,
    gen: GenerateImageConfig,
    lora: dict | None = None,
    schedule: FlowMatchSchedule | None = None,
    uncond_lora: dict | None = None,
) -> np.ndarray:
    """Returns a uint8 HWC image.

    ``uncond_lora`` is a LoRA overlay active ONLY on the unconditional CFG
    pass (reference ideogram4 src/pipeline.py:381-395) — on that branch it
    stacks with any trained ``lora`` via an exact rank-concat."""
    schedule = schedule or FlowMatchSchedule()
    h, w, c = model.latent_shape(gen.height, gen.width)
    cond = model.encode_prompt(variables, [gen.prompt])
    ctrl_paths = [p for p in (gen.ctrl_img, getattr(gen, "ctrl_img_2", None),
                              getattr(gen, "ctrl_img_3", None)) if p]
    if getattr(model, "multi_control", False):
        # multi-reference edit: the rope table sizes to the reference count
        model._n_ctrl = max(1, len(ctrl_paths))
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    cond = {**cond, "pe": pe, "guidance": jnp.full((1,), gen.guidance_scale)}
    if getattr(gen, "ip_embeds", None) is not None:
        # IP-Adapter / vision_direct reference conditioning at sample time
        # (reference generates with the adapter image active); the trainer
        # pre-encodes --ctrl_img through its vision tower
        cond["ip_embeds"] = jnp.asarray(gen.ip_embeds)
    if getattr(gen, "ip_tokens", None) is not None:
        cond["ip_tokens"] = jnp.asarray(gen.ip_tokens)
    if getattr(getattr(model, "dit_config", None), "control_channels", 0):
        # control/edit archs expect concat control latents; the model hook
        # handles arch-specific layouts (flex2 [inpaint, mask, control])
        if hasattr(model, "sampling_control_latents"):
            cond["control_latents"] = model.sampling_control_latents(
                variables, h, w, getattr(gen, "ctrl_img", None), gen.width, gen.height
            )
        elif getattr(gen, "ctrl_img", None):
            from PIL import Image

            im = Image.open(gen.ctrl_img).convert("RGB").resize((gen.width, gen.height))
            px = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0)[None]
            cond["control_latents"] = model.encode_images(variables, px)
        else:
            cond["control_latents"] = jnp.zeros((1, h, w, c), jnp.float32)
    elif getattr(model, "is_edit", False):
        # sequence/width-concat edit conditioning (qwen_image_edit(+plus),
        # hidream_e1, kontext-class extra archs): the rope table already
        # reserves slots for the reference tokens, so the control latents must
        # ALWAYS be present — zeros when no --ctrl_img is given (matches the
        # reference pipelines' blank-reference behavior)
        if ctrl_paths:
            from PIL import Image

            lats = []
            for p in ctrl_paths:
                im = Image.open(p).convert("RGB").resize((gen.width, gen.height))
                px = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0)[None]
                lats.append(model.encode_images(variables, px))
        else:
            lats = [jnp.zeros((1, h, w, c), jnp.float32)]
        if getattr(model, "multi_control", False):
            cond["control_latents"] = jnp.stack(lats, axis=1)  # [1, N, h, w, C]
        else:
            cond["control_latents"] = lats[0]
    base_variables = variables
    if lora:
        variables = merge_variables(variables, {"lora": lora})
    variables_uncond = variables
    if uncond_lora:
        from ai_toolkit_tpu.adapters.lora import concat_loras

        variables_uncond = merge_variables(
            base_variables, {"lora": concat_loras(lora, uncond_lora)}
        )

    # x-prediction archs (PRX pixel): the model outputs x0; CFG is applied on
    # x0 and the velocity the euler step consumes is (x_t - x0) / max(t, .05)
    # (reference prx src/pipeline.py:136-143). Initial noise is scaled by the
    # arch's trained noise std.
    x0_pred = bool(getattr(model, "x0_prediction", False))
    # real-CFG flow archs: either a negative-prompt pass (PRX) or an
    # image-only zero-text pass (ideogram4's asymmetric CFG)
    neg_cond = None
    if gen.guidance_scale and gen.guidance_scale != 1.0:
        if getattr(model, "cfg_uncond", None) == "zero_text":
            neg_cond = {
                **cond,
                "txt": jnp.zeros_like(cond["txt"]),
                "txt_mask": jnp.zeros_like(cond["txt_mask"]),
            }
        elif x0_pred or getattr(model.config, "use_flux_cfg", False):
            # real negative-prompt CFG pass (x0-pred archs, or a guidance-
            # distilled flux forced into true CFG via use_flux_cfg)
            neg = model.encode_prompt(variables, [gen.negative_prompt or ""])
            neg_cond = {**cond, **neg, "pe": pe}

    rng = jax.random.key(gen.seed)
    x = jax.random.normal(rng, (1, h, w, c), jnp.float32)
    x = x * float(getattr(model, "noise_scale", 1.0))
    seq_len = model.image_seq_len(gen.height, gen.width)
    if hasattr(model, "inference_sigmas"):
        # arch-specific schedule (ideogram4 resolution-aware logit-normal)
        sigmas = jnp.asarray(model.inference_sigmas(gen.sample_steps, gen.height, gen.width))
        x = x * sigmas[0]
    else:
        sigmas = schedule.inference_sigmas(gen.sample_steps, image_seq_len=seq_len)

    @jax.jit
    def denoise(x, sigma, sigma_next):
        pred = model.predict(variables, x, jnp.full((1,), sigma), cond)
        if neg_cond is not None:
            pred_n = model.predict(variables_uncond, x, jnp.full((1,), sigma), neg_cond)
            pred = pred_n + gen.guidance_scale * (pred - pred_n)
        if x0_pred:
            v = (x - pred.astype(jnp.float32)) / jnp.maximum(sigma, 0.05)
        else:
            v = pred
        return schedule.euler_step(x, v, sigma, sigma_next)

    for i in range(gen.sample_steps):
        x = denoise(x, sigmas[i], sigmas[i + 1])

    img = model.decode_latents(variables, x)
    return _to_uint8(img)


def generate_sd(
    model,
    variables: dict,
    gen: GenerateImageConfig,
    lora: dict | None = None,
    schedule: DDPMSchedule | None = None,
    uncond_lora: dict | None = None,
) -> np.ndarray:
    """DDIM with classifier-free guidance (uncond + cond batch of 2)."""
    schedule = schedule or DDPMSchedule()
    h, w, c = model.latent_shape(gen.height, gen.width)
    do_cfg = gen.guidance_scale > 1.0
    prompts = [gen.prompt]
    if do_cfg:
        prompts = [gen.negative_prompt, gen.prompt]
    cond = model.encode_prompt(variables, prompts)
    if hasattr(model, "added_cond") and "pooled" in cond:
        cond = {
            "context": cond["context"],
            "added_cond": model.added_cond(cond["pooled"], gen.height, gen.width),
        }
    base_variables = variables
    if lora:
        variables = merge_variables(variables, {"lora": lora})

    rng = jax.random.key(gen.seed)
    x = jax.random.normal(rng, (1, h, w, c), jnp.float32)

    if do_cfg and uncond_lora:
        # uncond-pass LoRA: the two CFG branches need different weights, so
        # run them as separate calls instead of the batch-of-2 trick
        # (reference ideogram4 src/pipeline.py:381-395)
        from ai_toolkit_tpu.adapters.lora import concat_loras

        variables_uncond = merge_variables(
            base_variables, {"lora": concat_loras(lora, uncond_lora)}
        )
        cond_u = jax.tree.map(lambda a: a[:1], cond)
        cond_c = jax.tree.map(lambda a: a[1:], cond)

        @jax.jit
        def predict_cfg(x_in, t):
            tin = jnp.full((x_in.shape[0],), t, jnp.float32)
            pu = model.predict(variables_uncond, x_in, tin, cond_u)
            pc = model.predict(variables, x_in, tin, cond_c)
            return pu + gen.guidance_scale * (pc - pu)
    else:

        @jax.jit
        def predict_cfg(x_in, t):
            xin = jnp.concatenate([x_in, x_in]) if do_cfg else x_in
            tin = jnp.full((xin.shape[0],), t, jnp.float32)
            pred = model.predict(variables, xin, tin, cond)
            if do_cfg:
                uncond, text = jnp.split(pred, 2)
                pred = uncond + gen.guidance_scale * (text - uncond)
            return pred

    sampler = (gen.sampler or "ddim").lower()
    karras = sampler.startswith("k_") or sampler.endswith("_karras")
    sampler = sampler.removeprefix("k_").removesuffix("_karras")
    if sampler in ("dpm_2", "dpm_2_a", "dpmsingle"):
        # second-order steppers needing an extra mid-sigma model call
        # (reference KDPM2 / KDPM2Ancestral / DPMSolverSinglestep)
        sigmas = schedule.inference_sigmas(gen.sample_steps, karras=karras)
        x = x * float(sigmas[0])

        def denoised_at(xx, s):
            eps = predict_cfg(
                schedule.scale_model_input(xx, s), schedule.timestep_for_sigma(s)
            )
            return schedule.denoised_from_eps(xx, eps, s)

        for i in range(len(sigmas) - 1):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            den = denoised_at(x, s)
            if sampler == "dpm_2":
                x = schedule.dpm_2_step(x, den, s, sn, denoised_at)
            elif sampler == "dpm_2_a":
                rng, sub = jax.random.split(rng)
                x = schedule.dpm_2_a_step(x, den, s, sn, sub, denoised_at)
            else:
                x = schedule.dpmpp_2s_step(x, den, s, sn, denoised_at)
    elif sampler in ("euler_a", "euler_ancestral", "dpm", "dpmpp", "dpm++", "dpmpp_2m", "dpmpp_2m_karras", "dpmsolver", "dpmsolver++"):
        # k-diffusion sigma-space samplers (reference sampler zoo)
        sigmas = schedule.inference_sigmas(gen.sample_steps, karras=karras)
        x = x * float(sigmas[0])
        prev_denoised, sigma_prev = None, None
        for i in range(len(sigmas) - 1):
            sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
            t = schedule.timestep_for_sigma(sigma)
            eps = predict_cfg(schedule.scale_model_input(x, sigma), t)
            denoised = schedule.denoised_from_eps(x, eps, sigma)
            if sampler.startswith(("dpm",)):
                new_x = schedule.dpmpp_2m_step(x, denoised, prev_denoised, sigma_prev, sigma, sigma_next)
                prev_denoised, sigma_prev = denoised, sigma
                x = new_x
            else:
                rng, sub = jax.random.split(rng)
                x = schedule.euler_ancestral_step(x, denoised, sigma, sigma_next, sub)
    elif sampler in ("heun", "lms"):
        sigmas = schedule.inference_sigmas(gen.sample_steps, karras=karras)
        x = x * float(sigmas[0])

        def denoised_at(xx, s):
            eps = predict_cfg(
                schedule.scale_model_input(xx, s), schedule.timestep_for_sigma(s)
            )
            return schedule.denoised_from_eps(xx, eps, s)

        if sampler == "heun":
            for i in range(len(sigmas) - 1):
                s, sn = float(sigmas[i]), float(sigmas[i + 1])
                x = schedule.heun_step(x, denoised_at(x, s), s, sn, denoised_at)
        else:
            ds: list = []
            sig64 = np.asarray(sigmas, np.float64)
            for i in range(len(sigmas) - 1):
                s = float(sigmas[i])
                den = denoised_at(x, s)
                ds.insert(0, (x.astype(jnp.float32) - den.astype(jnp.float32)) / s)
                ds = ds[:4]
                coeffs = schedule.lms_coefficients(len(ds), sig64, i)
                x = schedule.lms_step(x, ds, coeffs)
    elif sampler == "lcm":
        ts = schedule.lcm_timesteps(gen.sample_steps)
        for i, t in enumerate(ts):
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            pred = predict_cfg(x, int(t))
            rng, sub = jax.random.split(rng)
            x = schedule.lcm_step(x, pred, int(t), t_prev, sub)
    elif sampler == "pndm":
        # plms multistep (diffusers PNDMScheduler skip_prk path): the second
        # timestep runs twice (predictor/corrector warmup), then 1-4 step
        # Adams-Bashforth on the eps history
        base = schedule.pndm_timesteps(gen.sample_steps)
        step_sz = schedule.num_train_timesteps // gen.sample_steps
        seq = [int(base[0])] + [int(t) for t in base[1:2]] * 2 + [int(t) for t in base[2:]]
        ets: list = []
        cur_sample = None
        for counter, t in enumerate(seq):
            eps = predict_cfg(x, int(t))
            t_use, t_prev = t, t - step_sz
            if counter != 1:
                ets = ets[-3:] + [eps]
            else:
                t_prev, t_use = t, t + step_sz
            if len(ets) == 1 and counter == 0:
                eff, cur_sample = eps, x
            elif len(ets) == 1 and counter == 1:
                eff = (eps + ets[-1]) / 2
                x, cur_sample = cur_sample, None
            elif len(ets) == 2:
                eff = (3 * ets[-1] - ets[-2]) / 2
            elif len(ets) == 3:
                eff = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
            else:
                eff = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
            x = schedule.pndm_prev_sample(x, int(t_use), int(t_prev), eff)
    elif sampler in ("ddim", "ddpm", "flowmatch"):
        ts = schedule.ddim_timesteps(gen.sample_steps)
        for i in range(len(ts)):
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            pred = predict_cfg(x, int(ts[i]))
            x = schedule.ddim_step(
                x, pred, jnp.full((1,), int(ts[i]), jnp.int32), jnp.full((1,), t_prev, jnp.int32)
            )
    else:
        raise ValueError(
            f"unknown sampler '{sampler}' — supported: ddim, ddpm, euler_a, "
            f"dpmpp_2m, dpm_2, dpm_2_a, dpmsingle, heun, lms, lcm, pndm "
            f"(k_ prefix / _karras suffix for karras sigmas)"
        )

    img = model.decode_latents(variables, x)
    return _to_uint8(img)


def generate_img2img(
    model,
    variables: dict,
    gen: GenerateImageConfig,
    init_image: np.ndarray,  # [H, W, 3] uint8 or [-1,1] float
    strength: float = 0.6,
    lora: dict | None = None,
    schedule: FlowMatchSchedule | None = None,
) -> np.ndarray:
    """Image-to-image (reference Img2ImgGenerator): encode init image, start
    the flow/diffusion from an intermediate noise level."""
    import numpy as _np

    schedule = schedule or (FlowMatchSchedule() if model.is_flow_matching else DDPMSchedule())
    img = _np.asarray(init_image, _np.float32)
    if img.max() > 1.5:
        img = img / 127.5 - 1.0
    lat = model.encode_images(variables, jnp.asarray(img)[None])
    if lora:
        variables = merge_variables(variables, {"lora": lora})
    rng = jax.random.key(gen.seed)
    noise = jax.random.normal(rng, lat.shape, lat.dtype)

    if model.is_flow_matching:
        h, w = lat.shape[1], lat.shape[2]
        cond = model.encode_prompt(variables, [gen.prompt])
        pe = model.rope_table(h, w, cond["txt"].shape[1])
        cond = {**cond, "pe": pe, "guidance": jnp.full((1,), gen.guidance_scale)}
        sigmas = schedule.inference_sigmas(
            gen.sample_steps, image_seq_len=model.image_seq_len(gen.height, gen.width)
        )
        start = int(round((1.0 - strength) * gen.sample_steps))
        x = schedule.add_noise(lat, noise, jnp.full((1,), float(sigmas[start])))

        @jax.jit
        def denoise(x, sigma, sigma_next):
            v = model.predict(variables, x, jnp.full((1,), sigma), cond)
            return schedule.euler_step(x, v, sigma, sigma_next)

        for i in range(start, gen.sample_steps):
            x = denoise(x, sigmas[i], sigmas[i + 1])
    else:
        cond = model.encode_prompt(variables, [gen.prompt])
        ts = schedule.ddim_timesteps(gen.sample_steps)
        start = int(round((1.0 - strength) * len(ts)))
        x = schedule.add_noise(lat, noise, jnp.array([int(ts[start])]))

        @jax.jit
        def denoise(x, t, t_prev):
            pred = model.predict(variables, x, jnp.full((1,), t, jnp.float32), cond)
            return schedule.ddim_step(x, pred, jnp.full((1,), t, jnp.int32),
                                      jnp.full((1,), t_prev, jnp.int32))

        for i in range(start, len(ts)):
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            x = denoise(x, int(ts[i]), t_prev)

    return _to_uint8(model.decode_latents(variables, x))


def generate_video(
    model,
    variables: dict,
    gen: GenerateImageConfig,
    lora: dict | None = None,
    schedule: FlowMatchSchedule | None = None,
    audio_sample_rate: int = 48_000,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Video (wan/ltx2) sampling; joint audio-video for ltx2 AV models.

    Returns (frames uint8 [T, H, W, 3], waveform float32 [S, C] | None).
    Replaces the reference's WanGenerationPipeline / LTX2 pipeline
    ``__call__`` loops (extensions_built_in/diffusion_models/wan22,
    ltx2/ltx2_pipeline.py) with one jitted euler step over both streams
    (shared sigma — the reference's default AV schedule).
    """
    schedule = schedule or FlowMatchSchedule()
    nf = model.frame_count_snapper(max(gen.num_frames, 1))
    t_lat, h, w, c = model.latent_shape(gen.height, gen.width, nf)
    cond = model.encode_prompt(variables, [gen.prompt])
    cond["pe"] = model.rope_table(t_lat, h, w)
    if getattr(gen, "ctrl_img", None) and hasattr(model, "encode_image_cond"):
        # i2v: first-frame conditioning image -> clip-vision tokens (wan i2v)
        from PIL import Image

        im = Image.open(gen.ctrl_img).convert("RGB").resize((gen.width, gen.height))
        px = jnp.asarray(np.asarray(im, np.float32) / 127.5 - 1.0)[None]
        cond["img_cond"] = model.encode_image_cond(variables, px)
    pt, ph, pw = model.dit_config.patch_size
    seq_len = (t_lat // pt) * (h // ph) * (w // pw)
    if lora:
        variables = merge_variables(variables, {"lora": lora})

    rng = jax.random.key(gen.seed)
    x = jax.random.normal(rng, (1, t_lat, h, w, c), jnp.float32)
    joint = bool(getattr(model, "joint_audio", False))
    xa = None
    if joint:
        secs = nf / float(gen.fps or 16)
        na = max(1, int(round(secs * audio_sample_rate / model.audio_vae_config.downscale)))
        cond["pe_audio"] = model.audio_rope_table(na)
        xa = jax.random.normal(
            jax.random.fold_in(rng, 1), (1, na, model.av_config.audio_in_channels), jnp.float32
        )
    sigmas = schedule.inference_sigmas(gen.sample_steps, image_seq_len=seq_len)

    @jax.jit
    def denoise(x, xa, sigma, sigma_next):
        if joint:
            v, va = model.predict(
                variables, x, jnp.full((1,), sigma), {**cond, "noisy_audio": xa}
            )
            return (
                schedule.euler_step(x, v, sigma, sigma_next),
                schedule.euler_step(xa, va, sigma, sigma_next),
            )
        v = model.predict(variables, x, jnp.full((1,), sigma), cond)
        return schedule.euler_step(x, v, sigma, sigma_next), xa

    for i in range(gen.sample_steps):
        x, xa = denoise(x, xa, sigmas[i], sigmas[i + 1])

    frames = model.decode_latents(variables, x)  # [1, T, H, W, 3]
    arr = np.asarray(frames[0], np.float32)
    frames_u8 = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    waveform = None
    if joint:
        waveform = np.asarray(model.decode_audio(variables, xa)[0], np.float32)
    return frames_u8, waveform


def generate_audio(
    model,
    variables: dict,
    gen: GenerateImageConfig,
    lora: dict | None = None,
    schedule: FlowMatchSchedule | None = None,
) -> np.ndarray:
    """Text-to-audio sampling (ace_step family): euler flow over audio
    latent tokens -> waveform [S, C] float32 in [-1, 1].

    Duration/sample-rate come from ``gen.extras`` (``duration_sec``,
    ``sample_rate``; defaults 10s @ 44.1kHz, the reference ace_step default).
    """
    schedule = schedule or FlowMatchSchedule()
    sr = int(gen.extras.get("sample_rate", 44_100))
    secs = float(gen.extras.get("duration_sec", 10.0))
    n_lat, c = model.latent_shape_audio(int(secs * sr))
    n_lat = max(n_lat, 1)
    cond = model.encode_prompt(variables, [gen.prompt])
    cond["pe"] = model.rope_table(n_lat)
    if lora:
        variables = merge_variables(variables, {"lora": lora})
    x = jax.random.normal(jax.random.key(gen.seed), (1, n_lat, c), jnp.float32)
    sigmas = schedule.inference_sigmas(gen.sample_steps)

    @jax.jit
    def denoise(x, sigma, sigma_next):
        v = model.predict(variables, x, jnp.full((1,), sigma), cond)
        return schedule.euler_step(x, v, sigma, sigma_next)

    for i in range(gen.sample_steps):
        x = denoise(x, sigmas[i], sigmas[i + 1])
    return np.asarray(model.decode_latents(variables, x)[0], np.float32)


def generate(model, variables, gen: GenerateImageConfig, lora=None, schedule=None,
             uncond_lora=None):
    if hasattr(model, "frame_count_snapper"):  # video family (wan/ltx2)
        return generate_video(model, variables, gen, lora, schedule)
    if hasattr(model, "latent_shape_audio"):  # audio family (ace_step)
        return generate_audio(model, variables, gen, lora, schedule)
    if model.is_flow_matching:
        return generate_flux(model, variables, gen, lora, schedule,
                             uncond_lora=uncond_lora)
    return generate_sd(model, variables, gen, lora, schedule,
                       uncond_lora=uncond_lora)


def _to_uint8(img: jax.Array) -> np.ndarray:
    arr = np.asarray(img[0], np.float32)
    return np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_atomic(img: np.ndarray, path: str) -> None:
    """Write-then-rename (reference save_image_atomic, config_modules.py:1244)."""
    import os

    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.png"
    Image.fromarray(img).save(tmp)
    os.replace(tmp, path)


def save_video_atomic(frames: np.ndarray, path: str, fps: int = 16) -> None:
    """[T, H, W, 3] uint8 -> animated webp (T>1) or still image (T==1).

    The reference writes mp4 via imageio/ffmpeg (video_utils); animated webp
    keeps the host pipeline ffmpeg-free with the same in-browser playback.
    """
    import os

    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ims = [Image.fromarray(f) for f in frames]
    tmp = path + ".tmp" + os.path.splitext(path)[1]
    if len(ims) == 1:
        ims[0].save(tmp)
    else:
        ims[0].save(
            tmp, save_all=True, append_images=ims[1:],
            duration=max(1, int(round(1000 / max(fps, 1)))), loop=0,
        )
    os.replace(tmp, path)


def save_wav_atomic(waveform: np.ndarray, path: str, sample_rate: int = 48_000) -> None:
    """[S, C] float in [-1, 1] -> 16-bit wav (joint-AV sample sidecar)."""
    import os

    from scipy.io import wavfile

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pcm = (np.clip(waveform, -1.0, 1.0) * 32767.0).astype(np.int16)
    tmp = path + ".tmp.wav"
    wavfile.write(tmp, sample_rate, pcm)
    os.replace(tmp, path)
