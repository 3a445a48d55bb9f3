"""Native C++ loader vs PIL decode+resize throughput (VERDICT r4 item 6).

Measures the disk->[-1,1]float32 pipeline both ways on THIS host and prints
imgs/s + which path `data/caching.py` would pick. The bench host has 1 CPU
core, so the threaded native loader can't show its fan-out; numbers are
recorded honestly per host.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

N_IMGS = 24
SRC_PX = 1536
BUCKET = 1024


def make_jpegs(d: str) -> list[str]:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    base = rng.integers(0, 255, (SRC_PX, SRC_PX, 3), np.uint8)
    for i in range(N_IMGS):
        arr = np.roll(base, i * 7, axis=0)
        p = os.path.join(d, f"im_{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def pil_batch(paths: list[str]) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), BUCKET, BUCKET, 3), np.float32)
    for i, p in enumerate(paths):
        im = Image.open(p).convert("RGB").resize((BUCKET, BUCKET), Image.BICUBIC)
        out[i] = np.asarray(im, np.float32) / 127.5 - 1.0
    return out


def main():
    from ai_toolkit_tpu.data.native import get_lib, load_image_batch

    with tempfile.TemporaryDirectory() as d:
        paths = make_jpegs(d)
        results = {}

        t0 = time.time()
        _ = pil_batch(paths)
        results["pil"] = N_IMGS / (time.time() - t0)

        if get_lib() is not None:
            for threads in (1, 0):  # 0 = auto (hardware_concurrency)
                t0 = time.time()
                out = load_image_batch(paths, BUCKET, BUCKET, n_threads=threads)
                assert out is not None and out.shape == (N_IMGS, BUCKET, BUCKET, 3)
                key = f"native_t{threads or 'auto'}"
                results[key] = N_IMGS / (time.time() - t0)
        else:
            print("native loader unavailable (build failed)", file=sys.stderr)

        ncpu = os.cpu_count()
        for k, v in results.items():
            print(f"{k}: {v:.2f} imgs/s  ({ncpu} cpu cores)")
        best_native = max((v for k, v in results.items() if k.startswith("native")),
                          default=0.0)
        picked = "native" if best_native > 0 else "pil"
        print(f"caching.py picks: {picked} "
              f"({'wins' if best_native > results['pil'] else 'PIL faster on this host'})")


if __name__ == "__main__":
    main()
