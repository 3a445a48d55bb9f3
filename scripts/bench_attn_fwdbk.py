"""A/B the fwd-only large block_k preference in ONE process (shared-queue noise)."""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention

b, s, h, d = 1, 4608, 24, 128
q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)

import os as _os
if _os.environ.get("AIT_AB_FULL"):
    variants = [
        ("default(auto)", None),   # new path: fwd picks 1536
        ("bk=768", 768),
        ("bk=512", 512),
        ("bk=1536", 1536),
    ]
else:
    variants = [
        ("default(auto)", None),   # new path: fwd picks 1536
        ("bk=768", 768),
    ]

ref = None
for name, bk in variants:
    if bk is None:
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    else:
        f = jax.jit(lambda q, k, v, _bk=bk: flash_attention(q, k, v, None, 512, _bk))
    o = f(q, k, v)
    of = o.astype(jnp.float32)
    if ref is None:
        ref = of
    else:
        print(f"{name} max err vs first: {float(jnp.max(jnp.abs(of - ref))):.3e}")

    def many(q, k, v, _f=f):
        def body(c, _):
            return c + jnp.sum(_f(q, k, v).astype(jnp.float32)), None
        r, _ = jax.lax.scan(body, 0.0, None, length=20)
        return r
    mj = jax.jit(many)
    float(mj(q, k, v))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(mj(q, k, v)); dt = (time.time() - t0) / 20
        best = min(best, dt)
    flops = 4 * s * s * h * d * b
    print(f"{name}: {best*1000:.2f} ms/call  {flops/best/1e12:.1f} TF/s", flush=True)

if _os.environ.get("AIT_AB_BWD"):
    # bwd sanity: default path must still compile (small bk prefs) and not OOM
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32)), argnums=(0, 1, 2)))
    t0 = time.time()
    gs = g(q, k, v)
    tot = float(sum(jnp.sum(x.astype(jnp.float32)) for x in gs))
    print(f"bwd default ok (compile+run {time.time()-t0:.1f}s, sum {tot:.3f})", flush=True)
