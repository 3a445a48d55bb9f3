"""ESRGAN upscaler training (reference TrainESRGANProcess,
``/root/reference/jobs/process/TrainESRGANProcess.py``, 657 LoC): RRDB net on
(LR, HR) pairs — LR synthesized by downscaling — L1 + MSE + optional PatchGAN
critic, jitted G/D steps."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ai_toolkit_tpu.config.modules import ProcessConfig
from ai_toolkit_tpu.data.dataset import FolderDataset, load_pixels
from ai_toolkit_tpu.jobs.train_vae_process import PatchCritic
from ai_toolkit_tpu.models.rrdb import RRDBConfig, RRDBNet
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.utils.logging import RunLogger


class ESRGANTrainProcess:
    """uid 'train_esrgan'. extras: {scale, num_blocks, critic_weight, pretrained}."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg
        self.save_root = os.path.join(cfg.training_folder, job_name)
        os.makedirs(self.save_root, exist_ok=True)

    def run(self) -> dict:
        cfg = self.cfg
        tc = cfg.train
        ex = cfg.extras
        if ex.get("size") == "tiny":
            net_cfg = RRDBConfig.tiny()
        else:
            net_cfg = RRDBConfig(
                scale=int(ex.get("scale", 4)), num_blocks=int(ex.get("num_blocks", 23))
            )
        critic_weight = float(ex.get("critic_weight", 0.0))
        net = RRDBNet(net_cfg)
        logger = RunLogger(cfg.logging, self.save_root, self.job_name)

        ds = FolderDataset(cfg.datasets[0], bucket_divisibility=net_cfg.scale * 4)
        hr_sample = load_pixels(ds.items[0])
        params = net.init(
            jax.random.key(0),
            jnp.zeros((1, hr_sample.shape[0] // net_cfg.scale,
                       hr_sample.shape[1] // net_cfg.scale, 3)),
        )["params"]
        tx = get_optimizer(tc.optimizer, tc.lr, tc.optimizer_params, tc.max_grad_norm)
        opt_state = tx.init(params)

        critic = PatchCritic()
        critic_params = critic_opt = critic_tx = None
        if critic_weight > 0:
            critic_params = critic.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
            critic_tx = get_optimizer("adamw", tc.lr)
            critic_opt = critic_tx.init(critic_params)

        def downscale(hr):
            b, h, w, c = hr.shape
            s = net_cfg.scale
            return jax.image.resize(hr, (b, h // s, w // s, c), "linear")

        def g_loss(params, hr, critic_params):
            lr = downscale(hr)
            sr = net.apply({"params": params}, lr)
            l1 = jnp.mean(jnp.abs(sr - hr))
            mse = jnp.mean(jnp.square(sr - hr))
            loss = l1 + 0.5 * mse
            if critic_params is not None:
                loss = loss - critic_weight * jnp.mean(
                    critic.apply({"params": critic_params}, sr)
                )
            return loss, sr

        @jax.jit
        def g_step(params, opt_state, hr, critic_params):
            (loss, sr), grads = jax.value_and_grad(g_loss, has_aux=True)(params, hr, critic_params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, sr

        @jax.jit
        def d_step(cp, copt, real, fake):
            def loss_fn(cp):
                from flax import linen as nn

                return jnp.mean(nn.relu(1 - critic.apply({"params": cp}, real))) + jnp.mean(
                    nn.relu(1 + critic.apply({"params": cp}, jax.lax.stop_gradient(fake)))
                )

            loss, grads = jax.value_and_grad(loss_fn)(cp)
            updates, copt = critic_tx.update(grads, copt, cp)
            return optax.apply_updates(cp, updates), copt, loss

        batches = ds.build_batches(tc.batch_size, shuffle=True)
        step, final_loss = 0, None
        while step < tc.steps:
            for b in batches:
                if step >= tc.steps:
                    break
                hr = jnp.asarray(np.stack([load_pixels(it) for it in b]))
                params, opt_state, loss, sr = g_step(params, opt_state, hr, critic_params)
                if critic_params is not None:
                    critic_params, critic_opt, _ = d_step(critic_params, critic_opt, hr, sr)
                step += 1
                final_loss = float(loss)
                if step % cfg.logging.log_every == 0 or step == 1:
                    logger.log({"loss": final_loss}, step)
                    print(f"esrgan step {step}/{tc.steps} loss={final_loss:.5f}")
            batches = ds.build_batches(tc.batch_size, shuffle=True)

        from safetensors.numpy import save_file

        from ai_toolkit_tpu.jobs.train_process import _flatten_params

        out = os.path.join(self.save_root, f"{self.job_name}_esrgan.safetensors")
        save_file(_flatten_params(jax.tree.map(np.asarray, params)), out,
                  metadata={"step": str(step), "scale": str(net_cfg.scale)})
        logger.finish()
        return {"final_loss": final_loss, "steps": step, "output": out}
