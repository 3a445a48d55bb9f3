"""Latent & text-embed caching.

TPU-first version of the reference's caching mixins
(``/root/reference/toolkit/dataloader_mixins.py:1692-2177``): VAE-encode each
file once (batched per bucket so the encode itself is one big jitted op),
store one safetensors file per item keyed by content+bucket+encoder-version
hash, and memoize text embeddings per processed caption. On TPU this is the
default path — it keeps the input pipeline entirely off the train-step
critical path.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Iterable

import numpy as np

from ai_toolkit_tpu.data.dataset import FileItem, load_pixels


def _cache_key(item: FileItem, version: str) -> str:
    st = os.stat(item.path)
    raw = (f"{item.path}|{st.st_mtime_ns}|{st.st_size}|{item.bucket}|{item.flip}|"
           f"{item.num_frames}|{item.num_samples}|{version}")
    return hashlib.md5(raw.encode()).hexdigest()


def _use_native_loader() -> bool:
    """The C++ batch decoder wins by fanning out over cores; on a 1-core host
    PIL is measurably faster (scripts/bench_loader.py: 3.2 vs 2.8 imgs/s).
    AIT_NATIVE_LOADER=1/0 overrides the heuristic either way."""
    env = os.environ.get("AIT_NATIVE_LOADER")
    if env is not None:
        return env not in ("0", "false", "no")
    return (os.cpu_count() or 1) > 1


def latent_cache_path(item: FileItem, cache_dir: str, version: str = "v1") -> str:
    return os.path.join(cache_dir, f"{_cache_key(item, version)}.safetensors")


def cache_latents(
    items: Iterable[FileItem],
    encode_fn: Callable[[np.ndarray], np.ndarray],
    cache_dir: str,
    batch_size: int = 8,
    version: str = "v1",
    to_disk: bool = True,
) -> dict[str, np.ndarray]:
    """Encode all uncached items; returns {cache_path_or_key: latent [h,w,c]}.

    Items are grouped by bucket so every encode_fn call has one static shape.
    """
    from safetensors.numpy import save_file, load_file

    os.makedirs(cache_dir, exist_ok=True)
    memory: dict[str, np.ndarray] = {}
    by_bucket: dict[tuple[int, int], list[FileItem]] = {}
    for it in items:
        by_bucket.setdefault(it.bucket, []).append(it)

    for bucket, bucket_items in sorted(by_bucket.items()):
        pending: list[FileItem] = []
        for it in bucket_items:
            p = latent_cache_path(it, cache_dir, version)
            if to_disk and os.path.isfile(p):
                continue
            pending.append(it)
        for i in range(0, len(pending), batch_size):
            chunk = pending[i : i + batch_size]
            imgs = None
            if all(it.kind == "image" for it in chunk) and _use_native_loader():
                from ai_toolkit_tpu.data.native import load_image_batch

                bw, bh = chunk[0].bucket
                imgs = load_image_batch(
                    [it.path for it in chunk], bw, bh, [it.flip for it in chunk]
                )
            if imgs is None:
                imgs = np.stack([load_pixels(it) for it in chunk])
            lats = np.asarray(encode_fn(imgs))
            for it, lat in zip(chunk, lats):
                p = latent_cache_path(it, cache_dir, version)
                if to_disk:
                    save_file({"latent": lat.astype(np.float16)}, p)
                memory[p] = lat
    return memory


def load_cached_latent(item: FileItem, cache_dir: str, version: str = "v1") -> np.ndarray:
    from safetensors.numpy import load_file

    p = latent_cache_path(item, cache_dir, version)
    return load_file(p)["latent"].astype(np.float32)


class TextEmbedCache:
    """Memoized prompt -> conditioning dict (reference TextEmbeddingCachingMixin)."""

    def __init__(self, encode_fn: Callable[[list[str]], dict], max_items: int = 100_000):
        self.encode_fn = encode_fn
        self.cache: dict[str, dict] = {}
        self.max_items = max_items

    def get(self, prompts: list[str]) -> dict:
        missing = [p for p in prompts if p not in self.cache]
        if missing:
            uniq = list(dict.fromkeys(missing))
            out = self.encode_fn(uniq)
            for i, p in enumerate(uniq):
                if len(self.cache) < self.max_items:
                    self.cache[p] = {
                        k: np.asarray(v[i]) for k, v in out.items() if v is not None
                    }
        first = self.cache[prompts[0]]
        return {
            k: np.stack([self.cache[p][k] for p in prompts]) for k in first
        }


def clip_vision_cache_path(item: FileItem, cache_dir: str, version: str = "v1") -> str:
    return os.path.join(cache_dir, f"clipv_{_cache_key(item, version)}.safetensors")


def cache_clip_vision(
    items: Iterable[FileItem],
    encode_fn: Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]],
    cache_dir: str,
    batch_size: int = 16,
    version: str = "v1",
) -> int:
    """CLIP-vision embed caching (reference CLIPCachingMixin,
    dataloader_mixins.py:2177): encode each image once, store tokens +
    pooled to disk. encode_fn(pixels [B,H,W,3] in [-1,1]) -> (tokens, pooled).
    Returns the number of newly cached items."""
    from safetensors.numpy import save_file

    os.makedirs(cache_dir, exist_ok=True)
    pending = [
        it for it in items
        if it.kind == "image" and not os.path.isfile(clip_vision_cache_path(it, cache_dir, version))
    ]
    done = 0
    for i in range(0, len(pending), batch_size):
        chunk = pending[i : i + batch_size]
        imgs = np.stack([load_pixels(it) for it in chunk])
        tokens, pooled = encode_fn(imgs)
        tokens, pooled = np.asarray(tokens), np.asarray(pooled)
        for j, it in enumerate(chunk):
            save_file(
                {"tokens": tokens[j].astype(np.float16), "pooled": pooled[j].astype(np.float16)},
                clip_vision_cache_path(it, cache_dir, version),
            )
            done += 1
    return done


def load_cached_clip_vision(item: FileItem, cache_dir: str, version: str = "v1"):
    from safetensors.numpy import load_file

    d = load_file(clip_vision_cache_path(item, cache_dir, version))
    return d["tokens"].astype(np.float32), d["pooled"].astype(np.float32)
