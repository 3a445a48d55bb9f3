import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ai_toolkit_tpu.adapters.lora import (
    LoRASpec,
    build_lora,
    lora_paths,
    merge_lora,
    scale_lora,
    unmerge_lora,
)
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.layers import Conv, GroupNorm, LayerNorm, Linear, RMSNorm
from ai_toolkit_tpu.ops.rope import apply_rope, image_position_ids, multi_axis_rope


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Linear(32, dtype=jnp.float32, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.silu(x)
        x = Linear(16, dtype=jnp.float32, param_dtype=jnp.float32, name="fc2")(x)
        return x


def test_linear_lora_overlay_matches_manual():
    net = TinyNet()
    x = jax.random.normal(jax.random.key(0), (4, 24))
    params = net.init(jax.random.key(1), x)["params"]
    base_out = net.apply({"params": params}, x)

    spec = LoRASpec(rank=4, alpha=8.0)
    lora = build_lora(params, spec, jax.random.key(2))
    assert set(lora.keys()) == {"fc1", "fc2"}
    # b starts at zero -> output unchanged
    out0 = net.apply({"params": params, "lora": lora}, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base_out), rtol=1e-6)

    # set b nonzero, check against manual computation for fc2 only
    lora2 = {"fc2": dict(lora["fc2"])}
    lora2["fc2"]["b"] = jnp.ones_like(lora["fc2"]["b"]) * 0.1
    out = net.apply({"params": params, "lora": lora2}, x)
    h = nn.silu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    manual = (
        h @ params["fc2"]["kernel"]
        + params["fc2"]["bias"]
        + (h @ lora2["fc2"]["a"]) @ lora2["fc2"]["b"] * (8.0 / 4)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), rtol=1e-5)


def test_merge_unmerge_roundtrip():
    net = TinyNet()
    x = jax.random.normal(jax.random.key(0), (2, 24))
    params = net.init(jax.random.key(1), x)["params"]
    lora = build_lora(params, LoRASpec(rank=4, alpha=4.0), jax.random.key(2))
    # randomize b so the delta is nonzero
    lora = jax.tree.map(lambda v: jax.random.normal(jax.random.key(3), v.shape) * 0.05, lora)

    overlay_out = net.apply({"params": params, "lora": lora}, x)
    merged = merge_lora(params, lora)
    merged_out = net.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(overlay_out), np.asarray(merged_out), rtol=2e-4, atol=2e-5)

    restored = unmerge_lora(merged, lora)
    for path, orig in jax.tree_util.tree_flatten_with_path(params)[0]:
        pass
    np.testing.assert_allclose(
        np.asarray(restored["fc1"]["kernel"]), np.asarray(params["fc1"]["kernel"]), atol=1e-6
    )


def test_per_sample_multiplier():
    net = TinyNet()
    x = jax.random.normal(jax.random.key(0), (4, 24))
    params = net.init(jax.random.key(1), x)["params"]
    # only the last layer so the output is exactly linear in the multiplier
    lora = build_lora(params, LoRASpec(rank=4, only_if_contains=["fc2"]), jax.random.key(2))
    lora = jax.tree.map(lambda v: jnp.ones(v.shape) * 0.1, lora)

    base = net.apply({"params": params}, x)
    full = net.apply({"params": params, "lora": scale_lora(lora, 1.0)}, x)
    # per-sample multipliers [1, 0, -1, 0.5]
    mult = jnp.asarray([1.0, 0.0, -1.0, 0.5])
    out = net.apply({"params": params, "lora": scale_lora(lora, mult)}, x)
    delta = np.asarray(full) - np.asarray(base)
    expected = np.asarray(base) + delta * np.asarray(mult)[:, None]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_lora_targeting_filters():
    net = TinyNet()
    x = jnp.zeros((1, 24))
    params = net.init(jax.random.key(0), x)["params"]
    lora = build_lora(params, LoRASpec(only_if_contains=["fc1"]), jax.random.key(1))
    assert list(lora.keys()) == ["fc1"]
    lora = build_lora(params, LoRASpec(ignore_if_contains=["fc1"]), jax.random.key(1))
    assert list(lora.keys()) == ["fc2"]
    lora = build_lora(params, LoRASpec(target_patterns=[r"fc\d"]), jax.random.key(1))
    assert len(lora_paths(lora)) == 2


def test_conv_lora():
    class C(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv(8, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="conv")(x)

    net = C()
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    params = net.init(jax.random.key(1), x)["params"]
    lora = build_lora(params, LoRASpec(rank=4, conv_rank=2), jax.random.key(2))
    assert lora["conv"]["a"].shape == (3, 3, 4, 2)
    assert lora["conv"]["b"].shape == (1, 1, 2, 8)
    lora = jax.tree.map(lambda v: jnp.ones(v.shape) * 0.05, lora)
    overlay = net.apply({"params": params, "lora": lora}, x)
    merged_out = net.apply({"params": merge_lora(params, lora)}, x)
    np.testing.assert_allclose(np.asarray(overlay), np.asarray(merged_out), rtol=1e-4, atol=1e-5)


def test_quantized_linear_matches_fp():
    """int8 weight-only quant collection reproduces the fp matmul within tolerance."""

    class L(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Linear(64, dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(x)

    net = L()
    x = jax.random.normal(jax.random.key(0), (4, 32))
    params = net.init(jax.random.key(1), x)["params"]
    w = params["fc"]["kernel"]
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    qv = jnp.round(w / scale).astype(jnp.int8)
    quant = {"fc": {"qvalue": qv, "qscale": scale}}
    params_now = {"fc": {"bias": params["fc"]["bias"]}}
    out_q = net.apply({"params": params_now, "quant": quant}, x)
    out_f = net.apply({"params": params}, x)
    assert np.max(np.abs(np.asarray(out_q) - np.asarray(out_f))) < 0.05


def test_norms_shapes_and_dtype():
    x = jax.random.normal(jax.random.key(0), (2, 5, 16), jnp.float32)
    for mod in (RMSNorm(dtype=jnp.float32), LayerNorm(dtype=jnp.float32), GroupNorm(4, dtype=jnp.float32)):
        p = mod.init(jax.random.key(1), x)
        y = mod.apply(p, x)
        assert y.shape == x.shape
    # rmsnorm normalizes
    y = RMSNorm(dtype=jnp.float32, use_scale=False).apply({}, x)
    rms = np.sqrt(np.mean(np.square(np.asarray(y)), axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_attention_xla_matches_reference():
    k = jax.random.key(0)
    q, kk, v = (
        jax.random.normal(jax.random.key(i), (2, 10, 4, 16), jnp.float32) for i in range(3)
    )
    out_xla = dot_product_attention(q, kk, v, implementation="xla")
    out_ref = dot_product_attention(q, kk, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_ref), atol=2e-5)


def test_rope_rotation_preserves_norm():
    ids = jnp.asarray(image_position_ids(4, 4, text_len=3))[None]
    freqs = multi_axis_rope(ids, [8, 28, 28])
    x = jax.random.normal(jax.random.key(0), (1, ids.shape[1], 2, 64), jnp.float32)
    y = apply_rope(x, freqs)
    assert y.shape == x.shape
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-4
    )
    # position 0 (text tokens) should be identity rotation
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, 0]), atol=1e-5)
