import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


@pytest.fixture(scope="module")
def flux_tiny():
    cls = get_model_class("flux")
    model = cls(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    return model, variables


@pytest.fixture(scope="module")
def sd_tiny():
    cls = get_model_class("sd1")
    model = cls(ModelConfig(arch="sd1", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    return model, variables


def test_flux_tiny_forward(flux_tiny):
    model, variables = flux_tiny
    h, w, c = model.latent_shape(32, 32)
    assert (h, w, c) == (16, 16, 4)  # tiny vae: downscale 2, 4ch... see config
    cond = model.encode_prompt(variables, ["a cat", "a dog"])
    assert cond["txt"].shape[0] == 2
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    cond = {**cond, "pe": pe, "guidance": jnp.ones((2,)) * 4}
    noisy = jax.random.normal(jax.random.key(1), (2, h, w, c))
    t = jnp.array([0.3, 0.8])
    out = model.predict(variables, noisy, t, cond)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flux_vae_roundtrip_shapes(flux_tiny):
    model, variables = flux_tiny
    img = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3)) * 2 - 1
    lat = model.encode_images(variables, img)
    h, w, c = model.latent_shape(32, 32)
    assert lat.shape == (1, h, w, c)
    dec = model.decode_latents(variables, lat)
    assert dec.shape == img.shape


def test_flux_lora_train_step(flux_tiny):
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model, variables = flux_tiny
    spec = LoRASpec(rank=4, alpha=4.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(1))
    paths = lora_paths(lora)
    assert len(paths) > 0
    assert all(p[0].startswith(("double_", "single_")) for p in paths)

    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["x"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, h, w, c)),
        "cond": {**cond, "pe": pe},
    }

    def predict_fn(vars_, noisy, t, cond):
        return model.predict(vars_, noisy, t, cond)

    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 1e-3))
    step = jax.jit(
        make_train_step(predict_fn, FlowMatchSchedule(), TrainStepConfig(timestep_type="sigmoid"))
    )
    losses = []
    for i in range(20):
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # base params untouched
    np.testing.assert_array_equal(
        np.asarray(state.model_variables["dit"]["img_in"]["kernel"]),
        np.asarray(variables["dit"]["img_in"]["kernel"]),
    )


def test_sd_tiny_forward_and_step(sd_tiny):
    model, variables = sd_tiny
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["a cat"])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([500.0]), cond)
    assert out.shape == noisy.shape


def test_sdxl_tiny_forward():
    cls = get_model_class("sdxl")
    model = cls(ModelConfig(arch="sdxl", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    cond = model.encode_prompt(variables, ["hello world"])
    assert cond["context"].shape[-1] == 128  # concat of two tiny TEs (64+64)
    added = model.added_cond(cond["pooled"], 64, 64)
    h, w, c = model.latent_shape(64, 64)
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(
        variables, noisy, jnp.array([10.0]), {"context": cond["context"], "added_cond": added}
    )
    assert out.shape == noisy.shape


def test_t5_and_clip_shapes():
    from ai_toolkit_tpu.models.text_encoders import (
        CLIPTextConfig,
        CLIPTextModel,
        T5Config,
        T5Encoder,
    )

    t5 = T5Encoder(T5Config.tiny())
    ids = jnp.zeros((2, 16), jnp.int32)
    v = t5.init(jax.random.key(0), ids)
    out = t5.apply(v, ids)
    assert out.shape == (2, 16, 64)

    clip = CLIPTextModel(CLIPTextConfig.tiny())
    v = clip.init(jax.random.key(0), jnp.zeros((2, 77), jnp.int32))
    out = clip.apply(v, jnp.zeros((2, 77), jnp.int32))
    assert out["last_hidden_state"].shape == (2, 77, 64)
    assert out["pooled_output"].shape == (2, 64)


def test_flux_control_conditioning():
    """flux-kontext/control: packed control latents concat into img tokens."""
    cls = get_model_class("flux")
    model = cls(ModelConfig(arch="flux", model_kwargs={"size": "tiny", "control": True}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["edit this"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    ctrl = jax.random.normal(jax.random.key(1), (1, h, w, c))
    noisy = jax.random.normal(jax.random.key(2), (1, h, w, c))
    out = model.predict(
        variables, noisy, jnp.array([0.5]),
        {**cond, "pe": pe, "control_latents": ctrl, "guidance": jnp.ones((1,))},
    )
    assert out.shape == noisy.shape
    # different control -> different prediction
    out2 = model.predict(
        variables, noisy, jnp.array([0.5]),
        {**cond, "pe": pe, "control_latents": ctrl * 0, "guidance": jnp.ones((1,))},
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_pack_latents_orders_match_reference_formulas():
    """Channel-major == reference 'b c (h ph) (w pw) -> b (h w) (c ph pw)'
    (stable_diffusion_model.py:2144); patch-major == hidream patchify
    '(p1 p2 C)'. Real-checkpoint token layouts depend on this — regression
    for the round-3 channel-scramble fix."""
    import numpy as np
    from ai_toolkit_tpu.models.flux_dit import (
        pack_latents, pack_latents_cmajor, unpack_latents, unpack_latents_cmajor,
    )

    rng = np.random.default_rng(0)
    lat = rng.normal(size=(2, 4, 6, 3)).astype(np.float32)  # [B,H,W,C]
    b, h, w, c = lat.shape
    # torch-side latents are [B,C,H,W]
    tl = lat.transpose(0, 3, 1, 2)
    # reference einops: b c (h ph) (w pw) -> b (h w) (c ph pw)
    ref_c = tl.reshape(b, c, h // 2, 2, w // 2, 2).transpose(0, 2, 4, 1, 3, 5)
    ref_c = ref_c.reshape(b, (h // 2) * (w // 2), c * 4)
    got_c = np.asarray(pack_latents_cmajor(lat))
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_allclose(np.asarray(unpack_latents_cmajor(got_c, h, w)), lat)

    # hidream einops: B C (H p1) (W p2) -> B (H W) (p1 p2 C)
    ref_p = tl.reshape(b, c, h // 2, 2, w // 2, 2).transpose(0, 2, 4, 3, 5, 1)
    ref_p = ref_p.reshape(b, (h // 2) * (w // 2), 4 * c)
    got_p = np.asarray(pack_latents(lat))
    np.testing.assert_array_equal(got_p, ref_p)
    np.testing.assert_allclose(np.asarray(unpack_latents(got_p, h, w)), lat)

    # channel-major composes over channel concat (flex2 49-ch composite)
    two = np.concatenate([lat, lat * 2.0], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(pack_latents_cmajor(two)),
        np.concatenate([got_c, np.asarray(pack_latents_cmajor(lat * 2.0))], axis=-1),
    )
