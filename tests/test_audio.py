import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


@pytest.fixture(scope="module")
def audio_tiny():
    model = get_model_class("ace_step_15")(
        ModelConfig(arch="ace_step_15", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    return model, variables


def test_audio_vae_roundtrip(audio_tiny):
    model, variables = audio_tiny
    d = model.vae_config.downscale
    wav = jax.random.uniform(jax.random.key(0), (1, 8 * d, 2)) * 2 - 1
    lat = model.encode_audio(variables, wav)
    assert lat.shape == (1, 8, model.vae_config.latent_channels)
    dec = model.decode_latents(variables, lat)
    assert dec.shape == wav.shape


def test_audio_train_step(audio_tiny):
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model, variables = audio_tiny
    cond = model.encode_prompt(variables, ["upbeat electronic music"])
    n = 8
    cond = {**cond, "pe": model.rope_table(n)}
    lat = jax.random.normal(jax.random.key(1), (1, n, model.vae_config.latent_channels))
    out = model.predict(variables, lat, jnp.array([0.5]), cond)
    assert out.shape == lat.shape

    lora = build_lora(variables["dit"], LoRASpec(rank=4, target_patterns=model.lora_targets()),
                      jax.random.key(2))
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, FlowMatchSchedule(), TrainStepConfig()))
    state, m = step(state, {"latents": lat, "cond": cond}, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_audio_generation(tmp_path):
    """Text-to-audio euler sampler (reference ace_step pipeline __call__)."""
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate, save_wav_atomic
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("ace_step")(
        ModelConfig(arch="ace_step", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    gen = GenerateImageConfig(
        prompt="a tiny melody", sample_steps=2, seed=5,
        extras={"duration_sec": 0.05, "sample_rate": 1024},
    )
    wav = generate(model, variables, gen)
    assert wav.ndim == 2 and np.isfinite(wav).all() and wav.shape[0] >= 1
    save_wav_atomic(wav, str(tmp_path / "a.wav"), sample_rate=1024)
    from scipy.io import wavfile

    sr, data = wavfile.read(tmp_path / "a.wav")
    assert sr == 1024 and data.shape == wav.shape
