"""Exact flex2 conditioning (reference extensions_built_in/flex2): the
49-latent-channel input layout [noisy | masked-latents+inpaint-mask | control],
train-time assembly with dropouts, and the inference blank layout."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


def _model(**mk):
    return get_model_class("flex2")(
        ModelConfig(arch="flex2", name_or_path="", model_kwargs={"size": "tiny", **mk})
    )


def test_flex2_channel_geometry():
    m = _model()
    base = m.dit_config.out_channels  # packed latent channels
    # packed input = noisy + (inpaint latents + 4 mask) + control
    assert m.dit_config.in_channels == base * 3 + 4
    assert m.dit_config.control_channels == base * 2 + 4


def test_flex2_assembly_and_predict():
    m = _model()
    v = m.load_variables(jax.random.key(0))
    rng = np.random.default_rng(0)
    c = m.vae_config.latent_channels
    lat = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
    keep = np.ones((2, 64, 64, 1), np.float32)
    keep[:, 32:] = 0.0  # inpaint the bottom half
    ctrl = m.assemble_flex2_control(lat, keep, lat.copy(), rng)
    assert ctrl.shape == (2, 8, 8, 2 * c + 1)
    # kept area carries the clean latents; inpaint area is zeroed, mask=1
    np.testing.assert_allclose(ctrl[:, :4, :, :c], lat[:, :4], atol=1e-5)
    np.testing.assert_allclose(ctrl[:, 4:, :, :c], 0.0, atol=1e-5)
    np.testing.assert_allclose(ctrl[:, 4:, :, c], 1.0, atol=1e-5)
    np.testing.assert_allclose(ctrl[:, :4, :, c], 0.0, atol=1e-5)
    # control slot carries the control latents
    np.testing.assert_allclose(ctrl[..., c + 1 :], lat, atol=1e-5)

    cond = m.encode_prompt(v, ["a", "b"])
    cond["pe"] = m.rope_table(8, 8, cond["txt"].shape[1])
    cond["guidance"] = jnp.ones((2,))
    cond["control_latents"] = jnp.asarray(ctrl)
    out = m.predict(v, jnp.asarray(lat), jnp.full((2,), 0.5), cond)
    assert out.shape == lat.shape and bool(jnp.isfinite(out).all())


def test_flex2_dropouts_and_random_inpainting():
    m = _model(inpaint_dropout=1.0)
    rng = np.random.default_rng(0)
    c = m.vae_config.latent_channels
    lat = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    ctrl = m.assemble_flex2_control(lat, np.ones((1, 64, 64, 1), np.float32), None, rng)
    # full dropout: zero latents + all-ones mask ("inpaint everything")
    np.testing.assert_allclose(ctrl[..., :c], 0.0, atol=1e-6)
    np.testing.assert_allclose(ctrl[..., c], 1.0, atol=1e-6)

    m2 = _model(do_random_inpainting=True)
    ctrl2 = m2.assemble_flex2_control(lat, None, None, np.random.default_rng(3))
    mask = ctrl2[..., c]
    assert 0.0 < mask.mean() < 1.0  # random blobs actually inpaint something

    m3 = _model(control_dropout=1.0)
    ctrl3 = m3.assemble_flex2_control(lat, None, lat.copy(), np.random.default_rng(0))
    np.testing.assert_allclose(ctrl3[..., c + 1 :], 0.0, atol=1e-6)


def test_flex2_sampling_blank_layout():
    m = _model()
    v = m.load_variables(jax.random.key(0))
    c = m.vae_config.latent_channels
    cl = m.sampling_control_latents(v, 8, 8, None, 64, 64)
    assert cl.shape == (1, 8, 8, 2 * c + 1)
    assert float(cl[..., c].mean()) == 1.0  # mask channel all ones
    assert float(jnp.abs(cl[..., :c]).max()) == 0.0
