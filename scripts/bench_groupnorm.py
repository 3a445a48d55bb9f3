"""GroupNorm(+SiLU) A/B microbench on TPU — is the op worth a Pallas kernel?

Times the current two-pass-var GroupNorm, a one-pass (E[x^2]-E[x]^2) variant,
and (when present) the Pallas fused kernel, fwd and fwd+bwd, at the SDXL
resnet activation shapes. Prints achieved GB/s against the analytic byte
floor (fwd: 2R+1W bf16; bwd: ~3R+1W)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ai_toolkit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np

SHAPES = [(1, 128, 128, 320), (1, 64, 64, 640), (1, 32, 32, 1280), (1, 64, 64, 1920)]
G = 32
ITERS = 30


def gn_twopass(x, scale, bias):
    c = x.shape[-1]
    g = min(G, c)
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[:-1] + (g, c // g))
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=red, keepdims=True)
    var = jnp.var(xg, axis=red, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
    y = y * scale + bias
    return jax.nn.silu(y).astype(x.dtype)


def gn_onepass(x, scale, bias):
    c = x.shape[-1]
    g = min(G, c)
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[:-1] + (g, c // g))
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=red, keepdims=True)
    msq = jnp.mean(jnp.square(xg), axis=red, keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
    y = y * scale + bias
    return jax.nn.silu(y).astype(x.dtype)


N_SHORT, N_LONG = 50, 450


def _delta_time(make_run, x):
    """The axon relay costs ~25ms per dispatch+fetch roundtrip — time scans
    of two lengths and use the delta so the constant cancels."""
    times = {}
    for n in (N_SHORT, N_LONG):
        run = make_run(n)
        out = run(x)
        _ = float(out.reshape(-1)[0].astype(jnp.float32))  # warm compile
        best = 1e9
        for _i in range(2):
            t0 = time.time()
            out = run(x)
            _ = float(out.reshape(-1)[0].astype(jnp.float32))
            best = min(best, time.time() - t0)
        times[n] = best
    return (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)


def timeit(fn, x, scale, bias):
    def make_run(n):
        @jax.jit
        def run(x):
            def body(carry, _):
                return fn(carry, scale, bias).astype(carry.dtype), ()

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out

        return run

    return _delta_time(make_run, x)


def timeit_grad(fn, x, scale, bias):
    def loss(x):
        return jnp.sum(fn(x, scale, bias).astype(jnp.float32) ** 2)

    g = jax.grad(loss)

    def make_run(n):
        @jax.jit
        def run(x):
            def body(carry, _):
                return (carry - 1e-6 * g(carry).astype(carry.dtype)), ()

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out

        return run

    return _delta_time(make_run, x)


def main():
    variants = {"twopass": gn_twopass, "onepass": gn_onepass}
    try:
        from ai_toolkit_tpu.ops.pallas.groupnorm import groupnorm_silu

        variants["pallas"] = lambda x, s, b: groupnorm_silu(x, s, b, G, 1e-5)
    except ImportError:
        pass
    for shape in SHAPES:
        c = shape[-1]
        x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        nbytes = np.prod(shape) * 2
        print(f"-- {shape} ({nbytes/1e6:.1f} MB bf16)")
        for name, fn in variants.items():
            dt = timeit(fn, x, scale, bias)
            gb = 3 * nbytes / dt / 1e9  # 2R+1W floor convention
            print(f"  fwd  {name:8s} {dt*1e3:7.3f} ms  ({gb:6.0f} GB/s @2R1W)", flush=True)
            dt = timeit_grad(fn, x, scale, bias)
            gb = 7 * nbytes / dt / 1e9  # fwd 2R1W + bwd ~3R1W
            print(f"  f+b  {name:8s} {dt*1e3:7.3f} ms  ({gb:6.0f} GB/s @7x)", flush=True)


if __name__ == "__main__":
    main()
