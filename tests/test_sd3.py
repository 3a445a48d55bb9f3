import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


def test_sd3_tiny_forward_and_flow_step():
    model = get_model_class("sd3")(ModelConfig(arch="sd3", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a cat"])
    assert cond["txt"].shape[-1] == model.dit_config.context_dim
    assert cond["y"].shape[-1] == model.dit_config.vec_dim
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.4]), {**cond, "pe": pe})
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()

    from ai_toolkit_tpu.samplers import get_schedule

    sched = get_schedule("flowmatch", "sd3")
    assert sched.shift == 3.0 and sched.use_dynamic_shifting is False
