"""Ultimate slider: image-pair + prompt-CFG slider losses in one LoRA.

Analog of the reference's ultimate_slider_trainer extension
(``/root/reference/extensions_built_in/ultimate_slider_trainer/
UltimateSliderTrainerProcess.py``): every step combines

- an image-reference loss over paired positive/negative images (the
  image_reference_slider objective, weighted by ``img_loss_weight``) and
- the prompt-pair CFG slider objective (weighted by ``cfg_loss_weight``)

into one gradient. TPU redesign: both losses live inside ONE jitted step
(one backward pass) instead of the reference's two sequential
``loss.backward()`` calls.

Config::

    type: ultimate_slider
    network: {type: lora, linear: 8}
    slider:
      targets: [{target_class: "", positive: "smiling", negative: "frowning", weight: 1}]
      img_loss_weight: 1.0
      cfg_loss_weight: 1.0
      guidance_strength: 3.0
      resolutions: [[512, 512]]
    datasets: [{folder_path: pos_images, unconditional_path: neg_images, ...}]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, scale_lora
from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.io.checkpoint import CheckpointManager
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.samplers import get_schedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.slider import concept_slider_loss
from ai_toolkit_tpu.train.state import merge_variables
from ai_toolkit_tpu.utils.logging import RunLogger


class UltimateSliderProcess:
    """uid 'ultimate_slider'."""

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
            raise ValueError("ultimate_slider needs slider.targets")
        if not cfg.datasets:
            raise ValueError("ultimate_slider needs paired-image datasets "
                             "(folder_path + unconditional_path)")
        img_w = float(slider.get("img_loss_weight", 1.0))
        cfg_w = float(slider.get("cfg_loss_weight", 1.0))
        strength = float(slider.get("guidance_strength", 3.0))
        net_weight = float(slider.get("network_weight", 1.0))
        # per-step uniform jitter of the slider multiplier (reference
        # ImageReferenceSliderTrainerProcess.py:94-99)
        weight_jitter = float(slider.get("weight_jitter", 0.0))

        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(42))
        schedule = get_schedule(tc.noise_scheduler, cfg.model.arch)
        is_flow = model.is_flow_matching
        logger = RunLogger(cfg.logging, self.save_root, self.job_name)

        net = cfg.network
        spec = (
            LoRASpec.from_network_config(net, target_patterns=model.lora_targets())
            if net
            else LoRASpec(rank=8, alpha=8, target_patterns=model.lora_targets())
        )
        main = "dit" if "dit" in variables else "unet"
        lora = build_lora(variables[main], spec, jax.random.key(1))
        tx = get_optimizer(tc.optimizer, tc.lr, tc.optimizer_params, tc.max_grad_norm)
        opt_state = tx.init(lora)

        # paired-image data (positive folder + unconditional negatives)
        from ai_toolkit_tpu.data.loader import build_dataloader

        encode_jit = jax.jit(lambda imgs: model.encode_images(variables, imgs))
        loader = build_dataloader(
            cfg.datasets, tc.batch_size, model.bucket_divisibility,
            trigger_word=cfg.trigger_word,
            encode_fn=lambda imgs: np.asarray(encode_jit(jnp.asarray(imgs))),
        )
        data_iter = iter(loader)

        # prompt-pair conditionings (shared latent geometry with the dataset
        # bucket of each batch would vary; use the configured resolution)
        res = (slider.get("resolutions") or [[512, 512]])[0]
        h, w, c = model.latent_shape(res[1], res[0])
        conds = []
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

        def img_pair_loss(lora_t, batch, rng):
            pos, neg = batch["latents"], batch["unconditional_latents"]
            b = pos.shape[0]
            rng_t, rng_n, rng_j = jax.random.split(rng, 3)
            w = net_weight
            if weight_jitter > 0.0:
                w = w + jax.random.uniform(
                    rng_j, (), minval=-weight_jitter, maxval=weight_jitter
                )
            if is_flow:
                t = schedule.sample_timesteps(rng_t, b, timestep_type="sigmoid")
            else:
                t = schedule.sample_timesteps(rng_t, b)
            noise = jax.random.normal(rng_n, pos.shape, pos.dtype)
            lats = jnp.concatenate(
                [schedule.add_noise(pos, noise, t), schedule.add_noise(neg, noise, t)], 0
            )
            tt = jnp.concatenate([t, t])
            mult = jnp.concatenate([jnp.full((b,), 1.0) * w, jnp.full((b,), -1.0) * w])
            lv = merge_variables(variables, {"lora": scale_lora(lora_t, mult)})
            from ai_toolkit_tpu.train.slider import _double

            cond = {k: _double(v) for k, v in batch.get("cond", {}).items()}
            pred = predict(lv, lats, tt, cond)
            tgt = jnp.concatenate(
                [schedule.target(pos, noise, t), schedule.target(neg, noise, t)], 0
            )
            return jnp.mean(jnp.square(pred.astype(jnp.float32) - tgt.astype(jnp.float32)))

        predict = model.predict

        def total_loss(lora_t, batch, noisy, t, cond_n, cond_p, cond_g, mult, rng):
            l_img = img_pair_loss(lora_t, batch, rng)
            l_cfg = concept_slider_loss(
                predict, variables, {"lora": lora_t}, noisy, t,
                cond_p, cond_n, cond_g, guidance_strength=strength, multiplier=mult,
            )
            return img_w * l_img + cfg_w * l_cfg, (l_img, l_cfg)

        @jax.jit
        def step_fn(lora_t, opt_state, batch, noisy, t, cond_n, cond_p, cond_g, mult, rng):
            (loss, (l_img, l_cfg)), grads = jax.value_and_grad(total_loss, has_aux=True)(
                lora_t, batch, noisy, t, cond_n, cond_p, cond_g, mult, rng
            )
            updates, opt_state = tx.update(grads, opt_state, lora_t)
            return optax.apply_updates(lora_t, updates), opt_state, loss, l_img, l_cfg

        rng = jax.random.key(0)
        final_loss = None
        for step in range(tc.steps):
            raw = next(data_iter)
            if "unconditional_pixels" in raw:
                raw["unconditional_latents"] = np.asarray(
                    encode_jit(jnp.asarray(raw["unconditional_pixels"]))
                )
            if "unconditional_latents" not in raw:
                raise ValueError(
                    "ultimate_slider datasets need unconditional_path pair images"
                )
            bh, bw_, cc = raw["latents"].shape[1:]
            cond_img = model.encode_prompt(variables, raw["captions"])
            if hasattr(model, "rope_table"):
                cond_img = {
                    **cond_img,
                    "pe": model.rope_table(bh, bw_, cond_img[next(iter(cond_img))].shape[1]),
                    "guidance": jnp.ones((raw["latents"].shape[0],)),
                }
            batch = {
                "latents": jnp.asarray(raw["latents"]),
                "unconditional_latents": jnp.asarray(raw["unconditional_latents"]),
                "cond": cond_img,
            }

            cond_n, cond_p, cond_g, weight = conds[step % len(conds)]
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            noisy = jax.random.normal(r1, (1, h, w, c), jnp.float32)
            t = schedule.sample_timesteps(
                r2, 1, timestep_type="sigmoid"
            ) if is_flow else schedule.sample_timesteps(r2, 1)
            mult = weight if step % 2 == 0 else -weight
            if mult < 0:
                cond_p, cond_g = cond_g, cond_p
            lora, opt_state, loss, l_img, l_cfg = step_fn(
                lora, opt_state, batch, noisy, t, cond_n, cond_p, cond_g, abs(mult), r3
            )
            final_loss = float(loss)
            if (step + 1) % cfg.logging.log_every == 0 or step == 0:
                logger.log(
                    {"loss": final_loss, "img_loss": float(l_img), "cfg_loss": float(l_cfg)},
                    step + 1,
                )
                print(f"ultimate_slider {step + 1}/{tc.steps} "
                      f"loss={final_loss:.5f} img={float(l_img):.5f} cfg={float(l_cfg):.5f}")

        from ai_toolkit_tpu.jobs.train_process import SDTrainProcess

        key_map = SDTrainProcess._key_map(model, lora)
        ckpt = CheckpointManager(
            self.save_root, self.job_name, fmt="peft" if is_flow else "kohya",
            prefix="lora_transformer" if is_flow else "lora_unet", key_map=key_map,
        )
        path = ckpt.save(jax.tree.map(np.asarray, lora), tc.steps, final=True)
        logger.finish()
        return {"output": path, "loss": final_loss}
