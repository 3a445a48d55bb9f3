"""LoRM (low-rank module replacement, reference toolkit/lorm.py): SVD
factorization replaces targeted kernels, base kernels are deleted from
params, the factors train, merge_lorm reconstructs kernels for export."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.adapters.lorm import (
    LoRMSpec,
    build_lorm,
    count_lorm_params,
    merge_lorm,
)
from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


def _tiny_sd():
    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    return model, model.init_variables(jax.random.key(0))


def test_full_rank_factorization_is_exact_and_kernels_removed():
    model, variables = _tiny_sd()
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["a cat"])
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    base_out = model.predict(variables, noisy, jnp.array([100]), cond)

    # rank = out/2 cap makes 'fixed 9999' the max exact-ish rank; use a tiny
    # threshold instead so every singular value is kept -> exact
    spec = LoRMSpec(extract_mode="threshold", extract_mode_param=0.0,
                    target_patterns=model.lora_targets())
    lorm, slim, stats = build_lorm(variables["unet"], spec)
    assert stats["modules"] > 0
    # kernels are gone from the slim tree wherever a factor pair exists
    def kernels_under(node):
        out = 0
        for k, v in node.items():
            if isinstance(v, dict):
                out += ("kernel" in v) + kernels_under(v)
        return out
    n_kernels_before = kernels_under(variables["unet"])
    n_kernels_after = kernels_under(slim)
    assert n_kernels_after == n_kernels_before - stats["modules"]

    v2 = {**variables, "unet": jax.tree.map(jnp.asarray, slim)}
    v2["lorm"] = jax.tree.map(jnp.asarray, lorm)
    # NOTE: predict must thread the 'lorm' collection
    out = model.predict(v2, noisy, jnp.array([100]), cond)
    # the out/2 rank cap (reference lorm.py:196) always truncates; on a
    # RANDOM-init model the spectrum is flat so half-rank keeps ~"half" the
    # energy — strong-but-not-exact correlation is the expected behavior
    # (trained weights compress far better). merge/factor consistency below
    # is the exactness check.
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(base_out).ravel())[0, 1]
    assert corr > 0.85, corr

    # merge back -> kernels reconstructed with the same factored approximation
    merged = merge_lorm(slim, lorm)
    assert kernels_under(merged) == n_kernels_before
    v3 = {**variables, "unet": jax.tree.map(jnp.asarray, merged)}
    out3 = model.predict(v3, noisy, jnp.array([100]), cond)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out), atol=5e-3)


def test_ratio_mode_compresses():
    model, variables = _tiny_sd()
    spec = LoRMSpec(extract_mode="ratio", extract_mode_param=0.25,
                    target_patterns=model.lora_targets())
    lorm, slim, stats = build_lorm(variables["unet"], spec)
    assert stats["params_after"] < stats["params_before"]
    assert count_lorm_params(lorm) > 0
    # proj_in / proj_out stay untouched
    flatpaths = ["/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in jax.tree_util.tree_leaves_with_path(lorm)]
    assert not any("proj_in" in p or "proj_out" in p for p in flatpaths)


def test_lorm_trains_end_to_end():
    from ai_toolkit_tpu.samplers import DDPMSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model, variables = _tiny_sd()
    spec = LoRMSpec(extract_mode="fixed", extract_mode_param=4,
                    target_patterns=model.lora_targets())
    lorm, slim, _ = build_lorm(variables["unet"], spec)
    variables["unet"] = jax.tree.map(jnp.asarray, slim)
    h, w, c = model.latent_shape(64, 64)
    cond = model.encode_prompt(variables, ["a cat"])
    state = TrainState.create(variables, {"lorm": jax.tree.map(jnp.asarray, lorm)},
                              get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, DDPMSchedule(), TrainStepConfig()))
    noisy = jax.random.normal(jax.random.key(2), (1, h, w, c))
    losses = []
    st = state
    for i in range(3):
        st, m = step(st, {"latents": noisy, "cond": cond}, jax.random.key(3 + i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # factors actually moved
    d0 = jax.tree.leaves(state.trainable["lorm"])[0]
    d1 = jax.tree.leaves(st.trainable["lorm"])[0]
    assert float(jnp.abs(d0 - d1).max()) > 0


def test_lorm_on_scanned_flux():
    """Review fix r5: scanned DiTs need 'lorm' in nn.scan variable_axes and
    [L]-shaped scale leaves; tiny flux with scan_blocks=True must forward and
    train through the factored stacks."""
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRMSpec(extract_mode="fixed", extract_mode_param=4,
                    target_patterns=model.lora_targets())
    lorm, slim, stats = build_lorm(variables["dit"], spec)
    assert stats["modules"] > 0
    # scanned stacks carry [L] scales (nn.scan slices every lorm leaf)
    stacked = [v for v in jax.tree.leaves(
        jax.tree.map(lambda x: x, lorm)) if np.ndim(v) == 3]
    if stacked:
        scales = []
        def collect(node):
            for k, v in node.items():
                if isinstance(v, dict) and "a" in v:
                    if np.ndim(v["a"]) == 3:
                        scales.append(np.shape(v["scale"]))
                elif isinstance(v, dict):
                    collect(v)
        collect(lorm)
        assert all(len(s) == 1 for s in scales), scales
    variables["dit"] = jax.tree.map(jnp.asarray, slim)
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["x"])
    cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1])
    cond["guidance"] = jnp.ones((1,))
    state = TrainState.create(variables, {"lorm": jax.tree.map(jnp.asarray, lorm)},
                              get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, FlowMatchSchedule(), TrainStepConfig()))
    noisy = jax.random.normal(jax.random.key(2), (1, h, w, c))
    st, m = step(state, {"latents": noisy, "cond": cond}, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_pixart_and_cogview4_lora_key_maps():
    """Review fix r5: scanned pixart patterns used to IndexError (ff_in has
    no regex groups); cogview4 gained diffusers-layout maps."""
    from ai_toolkit_tpu.models.cogview4_dit import (
        cogview4_inverse_key_map,
        cogview4_lora_key_map,
    )
    from ai_toolkit_tpu.models.pixart_dit import pixart_lora_key_map

    fake = {"blocks": {"block": {"ff_in": {"kernel": np.zeros((2, 2))},
                                 "attn1": {"to_q": {"kernel": np.zeros((2, 2))}}}}}
    km = pixart_lora_key_map(fake)
    assert km["blocks/block/ff_in"] == "transformer_blocks.{L}.ff.net.0.proj"
    assert km["blocks/block/attn1/to_q"] == "transformer_blocks.{L}.attn1.to_q"

    km2 = cogview4_lora_key_map({"blocks": {"block": {
        "adaln": {"kernel": np.zeros((2, 2))},
        "attn1": {"to_out": {"kernel": np.zeros((2, 2))}}}}})
    assert km2["blocks/block/adaln"] == "transformer_blocks.{L}.norm1.linear"
    inv = cogview4_inverse_key_map(km2, 2)
    assert inv["transformer_blocks.1.norm1.linear"] == "blocks/block/adaln#1"
