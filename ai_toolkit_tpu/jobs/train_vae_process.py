"""VAE fine-tuning process (reference TrainVAEProcess,
``/root/reference/jobs/process/TrainVAEProcess.py``, 1,142 LoC): reconstruction
(MSE+MAE) + KL + optional PatchGAN critic, decoder-only by default.

TPU-first: generator and critic updates are two jitted steps; the critic is a
small conv net (the reference's vgg19 critic depends on torchvision weights,
unavailable offline — the adversarial term works the same way).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.data.loader import build_dataloader
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.models.vae import AutoencoderKL
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.utils.logging import RunLogger


class PatchCritic(nn.Module):
    """Small PatchGAN discriminator."""

    base: int = 32

    @nn.compact
    def __call__(self, x):
        from ai_toolkit_tpu.ops.layers import Conv

        h = Conv(self.base, (4, 4), strides=(2, 2), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="c1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.base * 2, (4, 4), strides=(2, 2), dtype=jnp.float32,
                 param_dtype=jnp.float32, name="c2")(h)
        h = nn.leaky_relu(h, 0.2)
        return Conv(1, (4, 4), dtype=jnp.float32, param_dtype=jnp.float32, name="out")(h)


class VAETrainProcess:
    """uid 'train_vae' / 'vae_trainer'."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg
        self.save_root = os.path.join(cfg.training_folder, job_name)
        os.makedirs(self.save_root, exist_ok=True)

    def run(self) -> dict:
        cfg = self.cfg
        tc = cfg.train
        ex = cfg.extras
        kl_weight = float(ex.get("kl_weight", 1e-6))
        mae_weight = float(ex.get("mae_weight", 0.0))
        critic_weight = float(ex.get("critic_weight", 0.0))
        lpips_weight = float(ex.get("lpips_weight", 0.0))
        train_encoder = bool(ex.get("train_encoder", False))

        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(42))
        vae: AutoencoderKL = model.vae
        vae_params = variables["vae"]
        logger = RunLogger(cfg.logging, self.save_root, self.job_name)

        loader = build_dataloader(
            cfg.datasets, tc.batch_size, model.bucket_divisibility,
            encode_fn=lambda imgs: np.zeros((imgs.shape[0], 1, 1, 1), np.float32),
        )
        # we train on pixels; bypass latent path by reading items directly
        from ai_toolkit_tpu.data.dataset import load_pixels

        tx = get_optimizer(tc.optimizer, tc.lr, tc.optimizer_params, tc.max_grad_norm)
        # trainable subtree: decoder only (default) or whole vae
        trainable = vae_params if train_encoder else {"decoder": vae_params["decoder"]}
        opt_state = tx.init(trainable)

        # LPIPS perceptual term (reference TrainVAEProcess.py:942-946); weights
        # come from a local file — no network egress (models/lpips.py)
        lpips_mod = lpips_params = None
        if lpips_weight > 0:
            from ai_toolkit_tpu.models.lpips import load_lpips

            lpips_mod, lpips_params = load_lpips(
                ex.get("lpips_weights"), jax.random.key(7)
            )

        critic = PatchCritic()
        critic_params = None
        critic_opt = None
        critic_tx = None
        if critic_weight > 0:
            critic_params = critic.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
            critic_tx = get_optimizer("adamw", tc.lr)
            critic_opt = critic_tx.init(critic_params)

        def merge(trainable):
            if train_encoder:
                return trainable
            return {**vae_params, "decoder": trainable["decoder"]}

        def g_loss_fn(trainable, images, rng, critic_params):
            params = merge(trainable)
            moments = vae.apply({"params": params}, images, method=AutoencoderKL.encode_moments)
            mean, logvar = jnp.split(moments, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
            z = (z - vae.cfg.shift_factor) * vae.cfg.scaling_factor
            recon = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
            mse = jnp.mean(jnp.square(recon - images))
            mae = jnp.mean(jnp.abs(recon - images))
            kl = -0.5 * jnp.mean(1 + logvar - jnp.square(mean) - jnp.exp(logvar))
            loss = mse + mae_weight * mae + kl_weight * kl
            adv = jnp.zeros(())
            if critic_params is not None:
                score = critic.apply({"params": critic_params}, recon)
                adv = -jnp.mean(score)
                loss = loss + critic_weight * adv
            lp = jnp.zeros(())
            if lpips_params is not None:
                lp = jnp.mean(lpips_mod.apply({"params": lpips_params}, recon, images))
                loss = loss + lpips_weight * lp
            return loss, {"mse": mse, "kl": kl, "adv": adv, "lpips": lp, "recon": recon}

        @jax.jit
        def g_step(trainable, opt_state, images, rng, critic_params):
            (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                trainable, images, rng, critic_params
            )
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss, aux

        @jax.jit
        def d_step(critic_params, critic_opt, real, fake):
            def loss_fn(cp):
                real_s = critic.apply({"params": cp}, real)
                fake_s = critic.apply({"params": cp}, jax.lax.stop_gradient(fake))
                # hinge loss
                return jnp.mean(nn.relu(1.0 - real_s)) + jnp.mean(nn.relu(1.0 + fake_s))

            loss, grads = jax.value_and_grad(loss_fn)(critic_params)
            updates, critic_opt = critic_tx.update(grads, critic_opt, critic_params)
            return optax.apply_updates(critic_params, updates), critic_opt, loss

        # pixel batches straight from the dataset items
        ds = loader.datasets[0]
        batches = ds.build_batches(tc.batch_size, shuffle=True)
        step = 0
        rng = jax.random.key(0)
        final_loss = None
        while step < tc.steps:
            for b in batches:
                if step >= tc.steps:
                    break
                images = jnp.asarray(np.stack([load_pixels(it) for it in b]))
                rng, r = jax.random.split(rng)
                trainable, opt_state, loss, aux = g_step(
                    trainable, opt_state, images, r, critic_params
                )
                if critic_params is not None:
                    critic_params, critic_opt, d_loss = d_step(
                        critic_params, critic_opt, images, aux["recon"]
                    )
                step += 1
                final_loss = float(loss)
                if step % cfg.logging.log_every == 0 or step == 1:
                    logger.log({"loss": final_loss, "mse": float(aux["mse"]),
                                "kl": float(aux["kl"])}, step)
                    print(f"vae step {step}/{tc.steps} loss={final_loss:.5f}")
            batches = ds.build_batches(tc.batch_size, shuffle=True)

        # save full vae as flat safetensors
        from safetensors.numpy import save_file

        from ai_toolkit_tpu.jobs.train_process import _flatten_params

        out = os.path.join(self.save_root, f"{self.job_name}_vae.safetensors")
        save_file(_flatten_params(jax.tree.map(np.asarray, merge(trainable))), out,
                  metadata={"step": str(step), "software": "ai_toolkit_tpu"})
        logger.finish()
        print(f"saved: {out}")
        return {"final_loss": final_loss, "steps": step, "output": out}
