import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


def test_pixart_forward_and_eps_step():
    model = get_model_class("pixart")(ModelConfig(arch="pixart", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a castle"])
    cond = {**cond, "pe": model.rope_table(h, w)}
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([500]), cond)
    assert out.shape == noisy.shape

    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.samplers import DDPMSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    lora = build_lora(variables["dit"], LoRASpec(rank=4, target_patterns=model.lora_targets()),
                      jax.random.key(2))
    assert lora
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, DDPMSchedule(), TrainStepConfig(min_snr_gamma=5.0)))
    state, m = step(state, {"latents": noisy, "cond": cond}, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
