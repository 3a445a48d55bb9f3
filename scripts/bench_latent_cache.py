"""Latent-cache throughput (BASELINE north-star #2): imgs/sec through the
full-size flux VAE encoder @1024px on one chip, plus host decode throughput."""
import os, sys, time, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig

cfg = VAEConfig.flux()
vae = AutoencoderKL(cfg)
enc_in = jnp.zeros((4, 1024, 1024, 3), jnp.float32)
t0 = time.time()
params = jax.jit(lambda r, x: vae.init(r, x, method=AutoencoderKL.encode_moments))(
    jax.random.key(0), enc_in[:1]
)["params"]
print(f"vae init {time.time()-t0:.1f}s", flush=True)

enc = jax.jit(lambda x: vae.apply({"params": params}, x, method=AutoencoderKL.encode))
lat = enc(enc_in); _ = float(jnp.sum(lat))
t0 = time.time()
iters = 5
for _ in range(iters):
    lat = enc(enc_in)
    _ = float(jnp.sum(lat))
dt = (time.time() - t0) / iters
print(f"VAE encode @1024 bs4: {dt*1000:.0f} ms -> {4/dt:.1f} imgs/sec (device)", flush=True)

# host decode+resize throughput via the native loader
from PIL import Image
d = tempfile.mkdtemp()
rng = np.random.default_rng(0)
paths = []
for i in range(32):
    arr = rng.integers(0, 255, (1400, 1900, 3), dtype=np.uint8)
    p = os.path.join(d, f"x{i}.jpg")
    Image.fromarray(arr).save(p, quality=92)
    paths.append(p)
from ai_toolkit_tpu.data.native import load_image_batch
out = load_image_batch(paths[:4], 1024, 1024)
t0 = time.time()
out = load_image_batch(paths, 1024, 1024)
dt_host = time.time() - t0
n_cpus = len(os.sched_getaffinity(0))
print(f"native decode+resize @1024: {32/dt_host:.1f} imgs/sec on {n_cpus} cpu(s)", flush=True)
print(f"=> end-to-end cache rate ~= min(device, host-overlapped) imgs/sec", flush=True)
