"""Guided-loss family (reference toolkit/guidance.py:716 dispatcher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.samplers import FlowMatchSchedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.slider import make_guided_train_step
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig


@pytest.fixture(scope="module")
def flux_pair_setup():
    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRASpec(rank=4, alpha=4.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(1))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a face"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, h, w, c)),
        "unconditional_latents": jax.random.normal(jax.random.key(3), (1, h, w, c)),
        "cond": {**cond, "pe": pe, "guidance": jnp.ones((1,))},
    }
    return model, variables, lora, batch


@pytest.mark.parametrize("kind", ["targeted", "targeted_polarity", "direct", "tnt",
                                  "targeted_flow"])
def test_guided_kinds_train_and_update_lora(flux_pair_setup, kind):
    model, variables, lora, batch = flux_pair_setup
    state = TrainState.create(variables, {"lora": jax.tree.map(jnp.copy, lora)},
                              get_optimizer("adamw", 1e-3))
    step = jax.jit(make_guided_train_step(
        kind, model.predict, FlowMatchSchedule(), TrainStepConfig(timestep_type="sigmoid"),
        network_weight=1.0,
    ))
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), (kind, losses)
    assert float(m["grad_norm"]) > 0.0, kind
    # lora actually moved
    before = jax.tree.leaves(lora)[0]
    after = jax.tree.leaves(state.trainable["lora"])[0]
    assert float(jnp.abs(jnp.asarray(after) - jnp.asarray(before)).max()) > 0.0
