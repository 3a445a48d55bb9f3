"""New arch families: qwen_image(+edit), auraflow, lumina2, hidream (MoE).

Mirrors the reference's coverage of its plugin archs
(extensions_built_in/diffusion_models/{qwen_image,hidream}/ and the
auraflow/lumina2 paths of toolkit/stable_diffusion_model.py): forward shape,
LoRA training convergence, and the arch-specific conditioning paths
(sequence-concat edit control, MoE expert routing, txt attention mask).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


def _make(arch):
    cls = get_model_class(arch)
    model = cls(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    return model, model.init_variables(jax.random.key(0))


@pytest.mark.parametrize("arch", ["qwen_image", "auraflow", "lumina2", "hidream"])
def test_new_arch_forward(arch):
    model, variables = _make(arch)
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a cat", "a dog"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (2, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.3, 0.8]), {**cond, "pe": pe})
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()


def test_qwen_edit_sequence_concat_control():
    model, variables = _make("qwen_image_edit")
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["make it blue"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    # rope table covers txt + img + ctrl tokens
    assert pe.shape[1] == cond["txt"].shape[1] + 2 * (h // 2) * (w // 2)
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    ctrl = jax.random.normal(jax.random.key(2), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe, "control_latents": ctrl})
    assert out.shape == noisy.shape
    # control actually conditions the output
    out2 = model.predict(
        variables, noisy, jnp.array([0.5]), {**cond, "pe": pe, "control_latents": ctrl * -1.0}
    )
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_hidream_moe_routing_is_input_dependent():
    """MoE gates must vary with tokens: two different inputs route differently."""
    from ai_toolkit_tpu.models.flux_dit import FluxConfig, MoEFFN

    cfg = FluxConfig.tiny()
    ffn = MoEFFN(cfg.hidden_size, 2 * cfg.hidden_size, 4, 2, jnp.float32, jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 8, cfg.hidden_size))
    v = ffn.init(jax.random.key(1), x)
    y1 = ffn.apply(v, x)
    y2 = ffn.apply(v, -x)
    assert y1.shape == x.shape
    assert float(jnp.abs(y1 - y2).max()) > 1e-6
    # expert bank params are stacked [E, ...]
    assert v["params"]["experts"]["w1"]["kernel"].shape[0] == 4


def test_hidream_lora_train_step():
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model, variables = _make("hidream")
    spec = LoRASpec(rank=4, alpha=4.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(1))
    paths = lora_paths(lora)
    assert paths, "hidream lora targeting matched nothing"
    # MoE expert kernels must NOT be targeted (extra leading expert axis)
    assert not any("experts" in "/".join(p) or "moe" in "/".join(p) for p in paths)

    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["x"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    batch = {"latents": jax.random.normal(jax.random.key(2), (1, h, w, c)), "cond": {**cond, "pe": pe}}

    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 3e-3))
    step = jax.jit(
        make_train_step(model.predict, FlowMatchSchedule(), TrainStepConfig(timestep_type="sigmoid"))
    )
    losses = []
    for _ in range(40):
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_lumina2_txt_mask_changes_output():
    model, variables = _make("lumina2")
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a"])
    assert "txt_mask" in cond
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out_masked = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe})
    cond_nomask = {k: v for k, v in cond.items() if k != "txt_mask"}
    out_full = model.predict(variables, noisy, jnp.array([0.5]), {**cond_nomask, "pe": pe})
    # 'a' + eos then padding: masking the pad tokens must change attention
    assert float(jnp.abs(out_masked - out_full).max()) > 1e-7


def test_llm_encoder_families():
    from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder

    ids = jnp.ones((2, 12), jnp.int32)
    for kw in [dict(), dict(post_norms=True, gemma_gelu=True, scale_embeddings=True),
               dict(qkv_bias=True)]:
        cfg = LLMConfig.tiny(**kw)
        enc = LLMEncoder(cfg)
        out = enc.apply(enc.init(jax.random.key(0), ids), ids)
        assert out.shape == (2, 12, cfg.d_model)
    # collect_layers returns stacked per-layer states (hidream consumption)
    cfg = LLMConfig.tiny(collect_layers=(0, 1))
    enc = LLMEncoder(cfg)
    out = enc.apply(enc.init(jax.random.key(0), ids), ids)
    assert out["collected"].shape == (2, 2, 12, cfg.d_model)

    # causality: changing a later token must not affect earlier positions
    cfg = LLMConfig.tiny()
    enc = LLMEncoder(cfg)
    v = enc.init(jax.random.key(0), ids)
    a = enc.apply(v, ids)
    b = enc.apply(v, ids.at[:, -1].set(7))
    np.testing.assert_allclose(np.asarray(a[:, :-1]), np.asarray(b[:, :-1]), atol=1e-5)
    assert float(jnp.abs(a[:, -1] - b[:, -1]).max()) > 1e-6


@pytest.mark.parametrize("arch", ["cogview4", "omnigen2"])
def test_single_stream_archs_forward(arch):
    model, variables = _make(arch)
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a cat"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe})
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()


def test_omnigen2_incontext_reference_image():
    model, variables = _make("omnigen2")
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["replace the sky"])
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    ref = jax.random.normal(jax.random.key(2), (1, h, w, c))
    out1 = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe, "control_latents": ref})
    out2 = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe, "control_latents": -ref})
    assert out1.shape == noisy.shape
    assert float(jnp.abs(out1 - out2).max()) > 1e-6  # reference image conditions output


def test_sdxl_refiner_forward():
    model, variables = _make("sdxl_refiner")
    cond = model.encode_prompt(variables, ["a photo"])
    assert cond["context"].shape[-1] == 64  # single OpenCLIP-G tower only
    added = model.added_cond(cond["pooled"], 64, 64, aesthetic_score=6.0)
    assert added["time_ids"].shape[-1] == 5  # [h, w, top, left, aesthetic]
    h, w, c = model.latent_shape(64, 64)
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(
        variables, noisy, jnp.array([300.0]), {"context": cond["context"], "added_cond": added}
    )
    assert out.shape == noisy.shape


def test_ltx2_video_forward_and_geometry():
    model, variables = _make("ltx2")
    t, h, w, c = model.latent_shape(32, 32, num_frames=4)
    cond = model.encode_prompt(variables, ["a video"])
    pe = model.rope_table(t, h, w)
    noisy = jax.random.normal(jax.random.key(1), (1, t, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), {**cond, "pe": pe})
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()
    # frame snapping follows the VAE temporal grid (causal: td*k+1)
    td = model.vae_config.temporal_downscale
    assert model.frame_count_snapper(17) % td == 1
    assert model.frame_count_snapper(17) <= 17


def test_flux2_forward_and_conditioning():
    model, variables = _make("flux2")
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a cat"])
    # context = concat of collected LLM layers on the feature dim
    assert cond["txt"].shape[-1] == model.dit_config.context_dim
    pe = model.rope_table(h, w, cond["txt"].shape[1])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(
        variables, noisy, jnp.array([0.5]), {**cond, "pe": pe, "guidance": jnp.ones((1,))}
    )
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()
    assert model.lora_key_layout() == "comfy"


@pytest.mark.parametrize("arch", ["chroma_radiance", "boogu_image", "mageflow"])
def test_long_tail_arch_forward(arch):
    """Long-tail archs run end-to-end; the chroma-family entries use the
    Approximator modulation path. (zeta_chroma/zimage left the extra_archs
    table in r3 — exact in zimage_dit.py; chroma_radiance left it in r4 —
    exact in flux_model.ChromaRadianceModel, tests/test_radiance_golden.py.)"""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class(arch)(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    if arch in ("chroma_radiance",):
        assert model.dit_config.chroma_mod
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a cat"])
    cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1])
    cond["guidance"] = jnp.zeros((1,))
    if getattr(model, "is_edit", False):
        cond["control_latents"] = jnp.zeros((1, h, w, c))
        cids = model.rope_table(h, w, 0)
        cond["pe"] = jnp.concatenate([cond["pe"], cids], axis=1)
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape and np.isfinite(np.asarray(out)).all()
