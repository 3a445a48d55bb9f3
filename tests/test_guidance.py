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


def test_mean_flow_step_and_sampler(flux_pair_setup):
    """MeanFlow identity training via jax.jvp + few-step average-velocity sampling."""
    from ai_toolkit_tpu.adapters.custom_adapter import init_custom_adapter
    from ai_toolkit_tpu.train.mean_flow import make_mean_flow_train_step, mean_flow_sample

    model, variables, lora, batch = flux_pair_setup
    ctx_dim = model.dit_config.context_dim
    params, runtime = init_custom_adapter(
        {"type": "mean_flow", "num_tokens": 1}, ctx_dim, "txt", 0, jax.random.key(0)
    )

    def predict_fn(vars_, noisy, t, cond):
        return model.predict(vars_, noisy, t, runtime.apply_cond(vars_, cond))

    # rope table must cover the appended r token
    h, w, c = model.latent_shape(32, 32)
    cond = dict(batch["cond"])
    cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1] + 1)
    mf_batch = {"latents": batch["latents"], "cond": cond}

    state = TrainState.create(
        variables, {"adapter": params, "lora": jax.tree.map(jnp.copy, lora)},
        get_optimizer("adamw", 1e-3),
    )
    step = jax.jit(make_mean_flow_train_step(
        predict_fn, FlowMatchSchedule(), TrainStepConfig(timestep_type="sigmoid"),
        flow_ratio=0.5,
    ))
    for _ in range(3):
        state, m = step(state, mf_batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0.0
    # both the time encoder and the lora got gradients
    moved = lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) > 0
    assert moved(jax.tree.leaves(state.trainable["adapter"])[0], jax.tree.leaves(params)[0])
    assert moved(jax.tree.leaves(state.trainable["lora"])[0], jax.tree.leaves(lora)[0])

    # one-step sampler jump runs and keeps shape
    from ai_toolkit_tpu.train.state import merge_variables
    z = jax.random.normal(jax.random.key(7), batch["latents"].shape)
    out = mean_flow_sample(
        predict_fn, merge_variables(variables, state.trainable), z, cond, steps=2
    )
    assert out.shape == z.shape and np.isfinite(np.asarray(out)).all()
