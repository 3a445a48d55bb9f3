import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(shape, key):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_flash_forward_matches_reference():
    b, s, h, d = 2, 256, 4, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_forward_rect_kv():
    b, s, t, h, d = 1, 128, 256, 2, 32
    q = _rand((b, s, h, d), 0)
    k, v = _rand((b, t, h, d), 1), _rand((b, t, h, d), 2)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_matches_reference():
    b, s, h, d = 1, 128, 2, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, 128, 128)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, implementation="reference")))

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4)


def test_flash_d64_fwd_bwd_and_gate():
    """head_dim 64 (SDXL self-attention): the kernel path must be numerically
    exact (r5 — the auto gate's d%128 check used to reject d=64, silently
    dropping SDXL to the logits-materializing XLA path)."""
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, 128, 128)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, implementation="reference")))

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_flash_streamed_matches_reference():
    """KV-streaming variant (long-sequence/video path): fwd + grads match the
    einsum oracle; rectangular K/V too. Small shapes here — the dispatcher
    routes to it only past _RESIDENT_MAX_SEQ, but numerics are shape-blind."""
    from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention_streamed

    b, s, t, h, d = 1, 256, 384, 2, 32
    q = _rand((b, s, h, d), 6)
    k, v = _rand((b, t, h, d), 7), _rand((b, t, h, d), 8)
    out = flash_attention_streamed(q, k, v, None, 128, 128)
    ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_streamed(q, k, v, None, 128, 128)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, implementation="reference")))

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_streamed_equals_resident():
    """Same inputs -> streamed and resident kernels agree bit-for-bit-ish
    (both f32 online softmax, same block math)."""
    from ai_toolkit_tpu.ops.pallas.flash_attention import (
        flash_attention,
        flash_attention_streamed,
    )

    b, s, h, d = 1, 512, 2, 32
    q, k, v = _rand((b, s, h, d), 9), _rand((b, s, h, d), 10), _rand((b, s, h, d), 11)
    a = flash_attention(q, k, v, None, 128, 128)
    bb = flash_attention_streamed(q, k, v, None, 128, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-6)


def test_flash_any_odd_lengths():
    """Pad+mask path for non-lane-divisible video buckets: odd S and T match
    the einsum oracle exactly, fwd and grads (padded KV columns masked in
    kernel; padded Q rows contribute zero via the zero cotangent)."""
    from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention_any

    b, s, t, h, d = 1, 250, 190, 2, 32
    q = _rand((b, s, h, d), 12)
    k, v = _rand((b, t, h, d), 13), _rand((b, t, h, d), 14)
    out = flash_attention_any(q, k, v)
    ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention_any(q, k, v)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, implementation="reference")))

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
