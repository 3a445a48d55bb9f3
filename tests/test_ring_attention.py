import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ai_toolkit_tpu.config.modules import MeshConfig
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.ring_attention import ring_attention_sharded
from ai_toolkit_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def sp_mesh():
    return make_mesh(MeshConfig(axes={"dp": 1, "sp": 8}))


def test_ring_attention_matches_full(sp_mesh):
    b, s, h, d = 2, 64, 4, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.float32)

    out_ring = ring_attention_sharded(q, k, v, sp_mesh, axis="sp")
    out_ref = dot_product_attention(q, k, v, implementation="reference")
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref), atol=2e-5)


def test_ring_attention_grads_flow(sp_mesh):
    b, s, h, d = 1, 32, 2, 8
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring_attention_sharded(q, k, v, sp_mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, implementation="reference")))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_ring_attention_composes_with_jit_train_fn(sp_mesh):
    """Ring attention inside a jitted loss/grad over an sp mesh — the pattern a
    sequence-parallel video train step uses."""
    b, s, h, d = 1, 64, 2, 16
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.float32)
    kv_w = jax.random.normal(jax.random.key(1), (d, d), jnp.float32) * 0.1

    @jax.jit
    def loss(kv_w, q):
        k = q @ kv_w
        v = q @ kv_w.T
        out = ring_attention_sharded(q, k, v, sp_mesh)
        return jnp.mean(jnp.square(out))

    g = jax.jit(jax.grad(loss))(kv_w, q)
    # reference via plain attention
    def loss_ref(kv_w, q):
        k = q @ kv_w
        v = q @ kv_w.T
        out = dot_product_attention(q, k, v, implementation="reference")
        return jnp.mean(jnp.square(out))

    g_ref = jax.grad(loss_ref)(kv_w, q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
    assert np.isfinite(float(loss(kv_w, q)))
