"""Concept-slider training process (reference TrainSliderProcess,
``/root/reference/jobs/process/TrainSliderProcess.py:39-346``): train a LoRA
whose +/- multiplier steers a concept, from paired positive/negative prompts
(no image dataset needed — targets come from adapter-off prior predictions
shifted by the prompt-pair CFG difference)."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.io.checkpoint import CheckpointManager
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.samplers import get_schedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.slider import concept_slider_loss
from ai_toolkit_tpu.utils.logging import RunLogger


class TrainSliderProcess:
    """uid 'slider' / 'concept_slider'. config.slider:
    {targets: [{target_class, positive, negative, weight}], resolutions}."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg
        self.save_root = os.path.join(cfg.training_folder, job_name)
        os.makedirs(self.save_root, exist_ok=True)

    def run(self) -> dict:
        cfg = self.cfg
        tc = cfg.train
        slider = cfg.slider or cfg.extras.get("slider") or {}
        targets = slider.get("targets", [])
        if not targets:
            raise ValueError("slider config needs targets: [{positive, negative, ...}]")
        res = (slider.get("resolutions") or [[512, 512]])[0]
        strength = float(slider.get("guidance_strength", 3.0))

        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(42))
        schedule = get_schedule(tc.noise_scheduler, cfg.model.arch)
        logger = RunLogger(cfg.logging, self.save_root, self.job_name)

        net = cfg.network
        spec = LoRASpec.from_network_config(net, target_patterns=model.lora_targets()) \
            if net else LoRASpec(rank=8, alpha=8, target_patterns=model.lora_targets())
        main = "dit" if "dit" in variables else "unet"
        lora = build_lora(variables[main], spec, jax.random.key(1))
        tx = get_optimizer(tc.optimizer, tc.lr, tc.optimizer_params, tc.max_grad_norm)
        opt_state = tx.init(lora)

        # precompute prompt conditionings per target
        conds = []
        h, w, c = model.latent_shape(res[1], res[0])
        for tgt in targets:
            neutral = model.encode_prompt(variables, [tgt.get("target_class", "")])
            pos = model.encode_prompt(variables, [tgt["positive"]])
            neg = model.encode_prompt(variables, [tgt["negative"]])
            extra = {}
            if hasattr(model, "rope_table"):
                pe = model.rope_table(h, w, neutral[next(iter(neutral))].shape[1])
                extra = {"pe": pe, "guidance": jnp.ones((1,))}
            conds.append((
                {**neutral, **extra}, {**pos, **extra}, {**neg, **extra},
                float(tgt.get("weight", 1.0)),
            ))

        is_flow = model.is_flow_matching

        def loss_fn(lora, noisy, t, cond_n, cond_p, cond_g, mult):
            return concept_slider_loss(
                model.predict, variables, {"lora": lora}, noisy, t,
                cond_p, cond_n, cond_g, guidance_strength=strength, multiplier=mult,
            )

        @jax.jit
        def step_fn(lora, opt_state, noisy, t, cond_n, cond_p, cond_g, mult):
            loss, grads = jax.value_and_grad(loss_fn)(lora, noisy, t, cond_n, cond_p, cond_g, mult)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        # partial denoising (reference diffuse_some_steps,
        # TrainSliderProcess.py:400-426): start each step from a latent the
        # slider network itself denoised a random number of steps, not pure
        # noise — the targets then steer realistic intermediate states.
        # Flow-matching only; eps-pred archs keep the pure-noise start.
        max_dn = int(slider.get("max_denoising_steps", 40))
        from ai_toolkit_tpu.train.slider import scale_lora as _scale_lora
        from ai_toolkit_tpu.train.state import merge_variables as _merge_vars

        sig_tab = jnp.asarray(schedule.inference_sigmas(max_dn)) if is_flow else None

        @jax.jit
        def partial_denoise(lora, rng, steps_to, cond, mult):
            x = jax.random.normal(rng, (1, h, w, c), jnp.float32)
            lv = _merge_vars(variables, {"lora": _scale_lora(lora, mult)})

            def body(i, x):
                s0 = sig_tab[i]
                v = model.predict(lv, x, jnp.full((1,), s0), cond)
                return x + (sig_tab[i + 1] - s0) * v.astype(x.dtype)

            x = jax.lax.fori_loop(0, steps_to, body, x)
            return jax.lax.stop_gradient(x), jnp.full((1,), sig_tab[steps_to])

        host_rng = np.random.default_rng(0)
        rng = jax.random.key(0)
        final_loss = None
        for step in range(tc.steps):
            cond_n, cond_p, cond_g, weight = conds[step % len(conds)]
            rng, r1, r2 = jax.random.split(rng, 3)
            if is_flow:
                steps_to = int(host_rng.integers(1, max_dn - 1))
                mult0 = weight if step % 2 == 0 else -weight
                noisy, t = partial_denoise(lora, r1, steps_to, cond_n, mult0)
            else:
                noisy = jax.random.normal(r1, (1, h, w, c), jnp.float32)
                t = schedule.sample_timesteps(r2, 1)
            # alternate polarity: +weight enhances, -weight suppresses
            mult = weight if step % 2 == 0 else -weight
            if mult < 0:
                cond_p, cond_g = cond_g, cond_p
            lora, opt_state, loss = step_fn(
                lora, opt_state, noisy, t, cond_n, cond_p, cond_g, abs(mult)
            )
            final_loss = float(loss)
            if (step + 1) % cfg.logging.log_every == 0 or step == 0:
                logger.log({"loss": final_loss}, step + 1)
                print(f"slider step {step + 1}/{tc.steps} loss={final_loss:.5f}")

        from ai_toolkit_tpu.jobs.train_process import SDTrainProcess

        key_map = SDTrainProcess._key_map(model, lora)
        ckpt = CheckpointManager(
            self.save_root, self.job_name, fmt="peft" if is_flow else "kohya",
            prefix="lora_transformer" if is_flow else "lora_unet", key_map=key_map,
        )
        path = ckpt.save(jax.tree.map(np.asarray, lora), tc.steps, final=True)
        logger.finish()
        return {"final_loss": final_loss, "output": path}
