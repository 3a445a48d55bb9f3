"""Batch captioning job (reference ``extensions_built_in/captioner/``).

Parity target: ``BaseCaptioner`` (config surface ``BaseCaptioner.py:22-47``,
run loop ``:91-129``) and its subclasses (Qwen3VLCaptioner /
Ideogram4Captioner / AceStepCaptioner): walk ``path_to_caption``, produce a
``.txt`` caption beside each media file, skipping existing captions unless
``recaption``, reporting progress to the UI job bridge.

Backends:
- ``vlm``       a real VLM decode loop (``jobs/vlm_captioner.py``): CLIP-vision
                patches -> projector -> soft prefix tokens -> greedy causal-LM
                decode with the tied-embedding head. Loads local weights from
                ``model_name_or_path`` (vision_tower/ + language_model/ +
                projector.safetensors, goldened import rules); without a path
                it runs a deterministic random-init tiny VLM (test/dev).
- ``heuristic`` deterministic offline captioner: dominant-color + luminance
                + aspect description, prefixed by ``caption_prompt``-derived
                style. Keeps the job, the UI contract, and dataset tooling
                exercisable end-to-end without weights; NOT a VLM.
- ``template``  writes ``default_caption`` (optionally with the filename
                stem) — the bulk-initialize mode.
"""

from __future__ import annotations

import os
import time

import numpy as np

MEDIA_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

_COLOR_NAMES = [
    ((255, 0, 0), "red"), ((0, 160, 0), "green"), ((40, 60, 255), "blue"),
    ((250, 250, 40), "yellow"), ((250, 140, 20), "orange"), ((160, 40, 200), "purple"),
    ((240, 240, 240), "white"), ((20, 20, 20), "black"), ((128, 128, 128), "gray"),
    ((150, 90, 40), "brown"), ((250, 150, 190), "pink"), ((60, 220, 220), "cyan"),
]


def _dominant_color_name(arr: np.ndarray) -> str:
    mean = arr.reshape(-1, 3).mean(0)
    dists = [float(((mean - np.array(c)) ** 2).sum()) for c, _ in _COLOR_NAMES]
    return _COLOR_NAMES[int(np.argmin(dists))][1]


def heuristic_caption(path: str, max_res: int = 512) -> str:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img.thumbnail((max_res, max_res))
    arr = np.asarray(img, np.float32)
    lum = float((arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114).mean())
    tone = "dark" if lum < 70 else ("bright" if lum > 180 else "medium-lit")
    w, h = img.size
    shape = "wide" if w > 1.3 * h else ("tall" if h > 1.3 * w else "square")
    color = _dominant_color_name(arr)
    contrast = float(arr.std())
    detail = "high-contrast" if contrast > 70 else ("soft" if contrast < 35 else "balanced")
    return f"a {tone}, {detail} {shape} image with dominant {color} tones"


class CaptionProcess:
    """process types: captioner / qwen3_vl_captioner / ideogram4_captioner /
    ace_step_captioner (all share this loop; backend per config)."""

    def __init__(self, job_name: str, cfg):
        self.job_name = job_name
        self.cfg = cfg
        c = cfg.extras.get("caption", {}) if hasattr(cfg, "extras") else dict(cfg)
        self.caption_cfg = c
        self.path = c.get("path_to_caption")
        if not self.path:
            raise ValueError("caption.path_to_caption is required")
        self.extensions = tuple(
            e if e.startswith(".") else f".{e}" for e in c.get("extensions", ["png", "jpg", "jpeg", "webp"])
        )
        self.caption_ext = c.get("caption_extension", "txt").lstrip(".")
        self.recaption = bool(c.get("recaption", False))
        self.prompt = c.get("caption_prompt", "Describe this image in detail.")
        self.max_res = int(c.get("max_res", 512))
        self.backend = c.get("backend", "heuristic")
        self.default_caption = c.get("default_caption", "")
        self.model_path = c.get("model_name_or_path")
        self._vlm = None

    def _find_files(self) -> list[str]:
        out = []
        for root, dirs, files in os.walk(self.path):
            dirs[:] = [d for d in dirs if d != "_controls"]
            for f in sorted(files):
                if f.lower().endswith(self.extensions):
                    out.append(os.path.join(root, f))
        return out

    def _caption_one(self, path: str) -> str:
        if self.backend == "vlm":
            if self._vlm is None:
                from ai_toolkit_tpu.jobs.vlm_captioner import VLMCaptioner

                self._vlm = VLMCaptioner(
                    model_path=self.model_path,
                    size=self.caption_cfg.get("model_size", "tiny"),
                    prompt=self.prompt,
                    max_new_tokens=int(self.caption_cfg.get("max_new_tokens", 24)),
                    seed=int(self.caption_cfg.get("seed", 0)),
                )
            return self._vlm.caption(path)
        if self.backend == "template":
            stem = os.path.splitext(os.path.basename(path))[0].replace("_", " ")
            return self.default_caption.replace("[name]", stem) if self.default_caption else stem
        return heuristic_caption(path, self.max_res)

    def run(self) -> dict:
        from ai_toolkit_tpu.jobs.ui_bridge import UIJobBridge

        if self.backend == "vlm" and self.model_path and not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"backend 'vlm': caption.model_name_or_path '{self.model_path}' "
                f"is not a local directory (this environment has no network); "
                f"omit it to run the random-init tiny VLM (test/dev only)"
            )
        files = self._find_files()
        bridge = UIJobBridge()
        bridge.start(total_steps=len(files))
        written = skipped = 0
        t0 = time.time()
        for i, f in enumerate(files):
            cap_path = os.path.splitext(f)[0] + f".{self.caption_ext}"
            if os.path.exists(cap_path) and not self.recaption:
                skipped += 1
            else:
                try:
                    caption = self._caption_one(f)
                    with open(cap_path, "w") as fh:
                        fh.write(caption)
                    written += 1
                except Exception as e:  # reference run loop continues on error
                    print(f"error captioning {f}: {e}")
            bridge.on_step(i + 1, 0.0, (time.time() - t0) / max(i + 1, 1))
            if bridge.should_stop():
                break
        print(f"captioned {written} files ({skipped} skipped)")
        return {"written": written, "skipped": skipped, "total": len(files)}
