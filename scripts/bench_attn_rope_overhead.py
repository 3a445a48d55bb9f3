"""Bound the win of fusing rope+qknorm into the flash kernel (ONE process).

Measures, on the bench-model attention shape, (a) flash alone on pre-rotated
q/k, (b) qk-RMSNorm + rope + flash — the delta is the UPPER BOUND on what a
fused kernel could save on the forward (the bwd chain through rope/norm would
stay outside the kernel either way). Run fwd and fwd+bwd legs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention
from ai_toolkit_tpu.ops.rope import apply_rope, image_position_ids, multi_axis_rope

b, s, h, d = 1, 4608, 24, 128
q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
qs = jnp.ones((d,), jnp.float32)
ks = jnp.ones((d,), jnp.float32)
ids = image_position_ids(48, 48, text_len=s - 48 * 48)
pe = multi_axis_rope(jnp.asarray(ids)[None], [16, 56, 56], 10_000)


def rms(x, scale):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    return (n * scale).astype(x.dtype)


def chain(q, k, v, qs, ks):
    qn = apply_rope(rms(q, qs), pe)
    kn = apply_rope(rms(k, ks), pe)
    return flash_attention(qn, kn, v)


def flash_only(q, k, v, qs, ks):
    return flash_attention(q, k, v)


def time_it(name, f, grad=False):
    if grad:
        f_ = jax.grad(lambda *a: jnp.sum(f(*a).astype(jnp.float32)), argnums=(0, 1, 2))
        red = lambda r: sum(jnp.sum(x.astype(jnp.float32)) for x in r)
    else:
        f_ = f
        red = lambda r: jnp.sum(r.astype(jnp.float32))

    def many(q, k, v, qs, ks):
        def body(c, _):
            return c + red(f_(q, k, v, qs, ks)), None
        r, _ = jax.lax.scan(body, 0.0, None, length=20)
        return r

    mj = jax.jit(many)
    float(mj(q, k, v, qs, ks))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(mj(q, k, v, qs, ks))
        best = min(best, (time.time() - t0) / 20)
    print(f"{name}: {best * 1000:.3f} ms/call", flush=True)
    return best


f0 = time_it("fwd  flash-only        ", flash_only)
f1 = time_it("fwd  norm+rope+flash   ", chain)
print(f"fwd overhead: {(f1 - f0) * 1000:.3f} ms ({(f1 / f0 - 1) * 100:.1f}%)")
g0 = time_it("fwdbwd flash-only      ", flash_only, grad=True)
g1 = time_it("fwdbwd norm+rope+flash ", chain, grad=True)
print(f"fwdbwd overhead: {(g1 - g0) * 1000:.3f} ms ({(g1 / g0 - 1) * 100:.1f}%)")
# per-step estimate: 19 scanned double blocks + 38 single-block attn calls in
# the 2.4B bench model => overhead * n_attn is the ceiling on a fused win
print(f"step ceiling estimate @19 attn calls: {(g1 - g0) * 19 * 1000:.1f} ms")
