"""Ring attention: sequence/context parallelism over a mesh axis.

SURVEY §5 "Long-context / sequence parallelism": the reference has nothing to
port — long videos are handled by VAE compression + offload on one GPU. Here
sequence parallelism is first-class: Q/K/V are sharded over an ``sp`` mesh
axis; each device holds a sequence shard, K/V shards rotate around the ring
(``jax.lax.ppermute``) while a running online-softmax (max/sum/accumulator)
merges partial attention — exact full attention with O(S/n) memory per device
and comm overlapped across ring steps by XLA.

Use under ``shard_map`` (see ``ring_attention_sharded``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_attention_part(q, k, v, scale):
    """Unnormalized block attention: returns (acc, m, l) online-softmax stats.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D].
    """
    logits = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    m = jnp.max(logits, axis=-1)  # [B, H, Sq]
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)  # [B, H, Sq]
    acc = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))  # [B, Sq, H, D]
    return acc, m, l


def ring_attention(q, k, v, axis_name: str = "sp", scale: float | None = None):
    """Exact attention over sequence shards; call inside shard_map.

    All inputs are the LOCAL shard [B, S_local, H, D]. Each ring step attends
    to the K/V shard currently held, then passes it to the next device.
    """
    n = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)

    def body(carry, _):
        k_cur, v_cur, acc, m, l = carry
        acc_i, m_i, l_i = _local_attention_part(q, k_cur, v_cur, scale)
        # merge online-softmax partials
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        alpha_i = jnp.exp(m_i - m_new)
        l_new = l * alpha + l_i * alpha_i
        acc_new = (
            acc * alpha.transpose(0, 2, 1)[..., None]
            + acc_i * alpha_i.transpose(0, 2, 1)[..., None]
        )
        # rotate K/V around the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc_new, m_new, l_new), None

    b, s, h, dd = q.shape
    # fresh constants are "unvarying" under shard_map's vma check while the
    # loop outputs vary over the ring axis — mark the inits as varying too
    def _vary(x):
        try:
            return jax.lax.pcast(x, axis_name, to="varying")
        except Exception:
            try:
                return jax.lax.pvary(x, axis_name)
            except Exception:
                return x

    init = (
        k,
        v,
        _vary(jnp.zeros((b, s, h, dd), jnp.float32)),
        _vary(jnp.full((b, h, s), -jnp.inf, jnp.float32)),
        _vary(jnp.zeros((b, h, s), jnp.float32)),
    )
    (k_f, v_f, acc, m, l), _ = jax.lax.scan(body, init, None, length=n)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh, axis: str = "sp",
    scale: float | None = None,
) -> jax.Array:
    """Convenience wrapper: shard the sequence axis over ``axis`` and run the
    ring. Inputs are full (replicated/global) arrays [B, S, H, D]."""
    from jax.experimental.shard_map import shard_map

    spec = P(None, axis, None, None)
    fn = shard_map(
        partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
