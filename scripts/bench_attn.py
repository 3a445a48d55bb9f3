import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.pallas.flash_attention import flash_attention

b, s, h, d = 1, 4608, 24, 128
q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)

xla = jax.jit(lambda q,k,v: dot_product_attention(q,k,v,implementation="xla"))
pal = jax.jit(lambda q,k,v: flash_attention(q,k,v,None,512,512))

o1 = xla(q,k,v); s1=float(jnp.sum(o1.astype(jnp.float32)))
o2 = pal(q,k,v); s2=float(jnp.sum(o2.astype(jnp.float32)))
err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32))))
print("max err:", err, "sums:", s1, s2, flush=True)

for name, f in [("xla", xla), ("pallas", pal)]:
    # time 10 iterations in one scanned jit to amortize dispatch
    def many(q,k,v):
        def body(c,_):
            o=f(q,k,v)
            return c + jnp.sum(o.astype(jnp.float32)), None
        r,_ = jax.lax.scan(body, 0.0, None, length=10)
        return r
    mj = jax.jit(many)
    r = float(mj(q,k,v))
    t0=time.time(); r=float(mj(q,k,v)); dt=(time.time()-t0)/10
    flops = 4*s*s*h*d*b
    print(f"{name}: {dt*1000:.2f} ms/call  {flops/dt/1e12:.1f} TF/s", flush=True)

# backward too
for name, f in [("xla", xla), ("pallas", pal)]:
    g = jax.jit(jax.grad(lambda q,k,v: jnp.sum(f(q,k,v).astype(jnp.float32)), argnums=(0,1,2)))
    def many(q,k,v):
        def body(c,_):
            gs=g(q,k,v)
            return c + sum(jnp.sum(x.astype(jnp.float32)) for x in gs), None
        r,_ = jax.lax.scan(body, 0.0, None, length=5)
        return r
    mj = jax.jit(many)
    r=float(mj(q,k,v))
    t0=time.time(); r=float(mj(q,k,v)); dt=(time.time()-t0)/5
    print(f"{name} fwd+bwd: {dt*1000:.2f} ms/call", flush=True)
