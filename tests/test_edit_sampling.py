"""Edit-arch SAMPLING regression: every sequence/width-concat edit arch must
generate both with and without a control image (round-3 bug: the rope table
reserves control slots, but generate_flux never supplied control latents for
seq-concat edit archs -> shape crash)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
from ai_toolkit_tpu.generation import generate_flux
from ai_toolkit_tpu.models.registry import get_model_class

EDIT_ARCHS = ["qwen_image_edit", "hidream_e1", "boogu_image_edit"]


@pytest.mark.parametrize("arch", EDIT_ARCHS)
def test_edit_arch_sampling_with_and_without_ctrl(arch, tmp_path):
    cls = get_model_class(arch)
    model = cls(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    gen = GenerateImageConfig(prompt="edit it", width=64, height=64, seed=1,
                              sample_steps=1, guidance_scale=1.0)
    out0 = generate_flux(model, variables, gen)
    assert out0.shape == (64, 64, 3)

    rng = np.random.default_rng(0)
    p = tmp_path / "ctrl.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(p)
    gen.ctrl_img = str(p)
    out1 = generate_flux(model, variables, gen)
    assert out1.shape == (64, 64, 3)
    # the reference image must actually condition the result
    assert not np.array_equal(out0, out1)


def test_qwen_edit_plus_multi_reference(tmp_path):
    """edit_plus: each reference image gets its own frame index and sequence
    block (reference qwen_image_edit_plus get_noise_prediction img_shapes
    accumulation)."""
    cls = get_model_class("qwen_image_edit_plus")
    model = cls(ModelConfig(arch="qwen_image_edit_plus", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["merge these"])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    ctrl = jax.random.normal(jax.random.key(2), (1, 2, h, w, c))

    model._n_ctrl = 2
    pe = model.rope_table(h, w, int(cond["txt"].shape[1]))
    out = model.predict(variables, noisy, jnp.array([0.5]),
                        {**cond, "pe": pe, "control_latents": ctrl})
    assert out.shape == noisy.shape
    # each reference must condition the output independently
    out_a = model.predict(variables, noisy, jnp.array([0.5]),
                          {**cond, "pe": pe,
                           "control_latents": ctrl.at[:, 0].multiply(-1.0)})
    out_b = model.predict(variables, noisy, jnp.array([0.5]),
                          {**cond, "pe": pe,
                           "control_latents": ctrl.at[:, 1].multiply(-1.0)})
    assert not np.allclose(np.asarray(out), np.asarray(out_a))
    assert not np.allclose(np.asarray(out), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    # sampling with two reference images
    rng = np.random.default_rng(0)
    p1, p2 = tmp_path / "c1.png", tmp_path / "c2.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(p1)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(p2)
    gen = GenerateImageConfig(prompt="merge --seed 1", width=64, height=64,
                              seed=1, sample_steps=1, guidance_scale=1.0,
                              ctrl_img=str(p1), ctrl_img_2=str(p2))
    img = generate_flux(model, variables, gen)
    assert img.shape == (64, 64, 3)
    # single-reference sampling also works (rope resizes to 1 block)
    gen1 = GenerateImageConfig(prompt="merge", width=64, height=64, seed=1,
                               sample_steps=1, guidance_scale=1.0,
                               ctrl_img=str(p1))
    img1 = generate_flux(model, variables, gen1)
    assert img1.shape == (64, 64, 3)


def test_multi_control_loader(tmp_path):
    """Two control dirs -> control_pixels_multi [B, 2, H, W, 3]."""
    import yaml

    from ai_toolkit_tpu.config.modules import DatasetConfig
    from ai_toolkit_tpu.data.dataset import FolderDataset
    from ai_toolkit_tpu.data.loader import build_dataloader

    rng = np.random.default_rng(0)
    imgs = tmp_path / "imgs"
    c1 = tmp_path / "ctrl1"
    c2 = tmp_path / "ctrl2"
    for d in (imgs, c1, c2):
        d.mkdir()
    for i in range(2):
        for d in (imgs, c1, c2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
                d / f"im_{i}.png")
        (imgs / f"im_{i}.txt").write_text("x")
    dcfg = DatasetConfig.from_dict({
        "folder_path": str(imgs), "caption_ext": "txt", "resolution": 64,
        "control_path": [str(c1), str(c2)], "cache_latents": False,
        "cache_latents_to_disk": False,
    })
    loader = build_dataloader(
        [dcfg], 2, 8, encode_fn=lambda x: x[:, ::8, ::8, :],
    )
    raw = next(iter(loader))
    assert raw["control_pixels_multi"].shape == (2, 2, 64, 64, 3)
    assert raw["control_pixels"].shape == (2, 64, 64, 3)


def test_qwen_edit_plus_padded_slot_masked():
    """A padded (blank) reference slot with ctrl_counts masking must be
    attention-invisible: base-token output equals a run with only the real
    reference (reference varies per-item img_shapes so short items never
    attend to phantom refs)."""
    cls = get_model_class("qwen_image_edit_plus")
    model = cls(ModelConfig(arch="qwen_image_edit_plus", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["edit"])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    real = jax.random.normal(jax.random.key(2), (1, 1, h, w, c))
    blank = jnp.zeros((1, 1, h, w, c))

    model._n_ctrl = 2
    pe2 = model.rope_table(h, w, int(cond["txt"].shape[1]))
    out_masked = model.predict(
        variables, noisy, jnp.array([0.5]),
        {**cond, "pe": pe2,
         "control_latents": jnp.concatenate([real, blank], axis=1),
         "ctrl_counts": jnp.array([1])})

    model._n_ctrl = 1
    pe1 = model.rope_table(h, w, int(cond["txt"].shape[1]))
    out_solo = model.predict(
        variables, noisy, jnp.array([0.5]),
        {**cond, "pe": pe1, "control_latents": real})
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_solo), atol=2e-4)

    # and WITHOUT the mask the blank slot visibly contaminates the output
    model._n_ctrl = 2
    out_unmasked = model.predict(
        variables, noisy, jnp.array([0.5]),
        {**cond, "pe": pe2,
         "control_latents": jnp.concatenate([real, blank], axis=1)})
    assert not np.allclose(np.asarray(out_unmasked), np.asarray(out_solo),
                           atol=2e-4)
