"""Prewarm the persistent XLA compile cache for the heavy production graphs.

First run on a fresh machine pays the full remote-compile cost (flux-class
train step ~5-15 min, SDXL UNet backward 5-17 min on the shared queue) — but
with progress lines instead of silence, and every later process (bench.py,
run.py training at the same shapes) starts in ~2 min. VERDICT r3 #6.

Usage:  python scripts/precompile.py [flux|sdxl|vae ...]   (default: all)
        python -m ai_toolkit_tpu.manager precompile
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ai_toolkit_tpu.utils.compile_cache import enable_persistent_cache


def _entries(path):
    try:
        return len(os.listdir(path))
    except OSError:
        return 0


def main(targets=None):
    targets = targets or ["flux", "vae", "sdxl"]
    cache = enable_persistent_cache()
    if cache is None:
        print("persistent cache disabled (CPU platform or AIT_NO_COMPILE_CACHE)")
        return 1
    n0 = _entries(cache)
    print(f"compile cache: {cache} ({n0} entries)", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "AIT_BENCH_ONLY": "flux"}
    rc = 0
    for t in targets:
        t0 = time.time()
        print(f"[{t}] compiling (first time on a machine can take 5-17 min)...",
              flush=True)
        if t == "flux":
            cmd = [sys.executable, os.path.join(root, "bench.py")]
        elif t == "sdxl":
            cmd = [sys.executable, os.path.join(root, "scripts", "bench_sdxl.py")]
        elif t == "vae":
            cmd = [sys.executable, "-c",
                   "import sys; sys.path.insert(0, %r); " % root
                   + "from bench import bench_latent_cache; bench_latent_cache(1e9)"]
        else:
            print(f"[{t}] unknown target (flux|sdxl|vae)")
            rc = 1
            continue
        r = subprocess.run(cmd, env=env)
        state = "ok" if r.returncode == 0 else f"FAILED rc={r.returncode}"
        print(f"[{t}] {state} in {time.time()-t0:.0f}s "
              f"(cache now {_entries(cache)} entries)", flush=True)
        rc = rc or r.returncode
    print(f"prewarmed {_entries(cache) - n0} new cache entries", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
