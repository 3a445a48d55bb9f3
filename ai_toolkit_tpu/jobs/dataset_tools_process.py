"""Dataset tools job (reference ``extensions_built_in/dataset_tools/``).

Parity target: ``DatasetTools`` / ``SuperTagger`` — bulk dataset maintenance
operations run as a job process. Offline-capable steps:

- ``convert``      re-encode every image to a target format/max size
- ``dedupe``       remove exact-duplicate files (content hash)
- ``prune_small``  drop images below a min dimension
- ``caption``      run the captioner backend over the folder (SuperTagger's
                   tagging loop; heuristic backend offline, VLM with local
                   weights)
- ``trigger``      prepend/ensure a trigger word in every caption file

Config surface::

    process:
      - type: dataset_tools
        dataset_path: /path
        steps: [convert, dedupe, prune_small, caption, trigger]
        convert: {format: jpg, max_size: 2048}
        prune_small: {min_size: 256}
        caption: {backend: heuristic, caption_extension: txt}
        trigger: {word: "zxc"}
"""

from __future__ import annotations

import hashlib
import os


class DatasetToolsProcess:
    def __init__(self, job_name: str, cfg):
        self.job_name = job_name
        self.cfg = cfg
        ex = cfg.extras if hasattr(cfg, "extras") else {}
        self.path = ex.get("dataset_path")
        if not self.path:
            raise ValueError("dataset_tools needs dataset_path")
        self.steps = ex.get("steps", ["convert"])
        self.ex = ex

    def _images(self) -> list[str]:
        out = []
        for root, dirs, files in os.walk(self.path):
            dirs[:] = [d for d in dirs if d != "_controls"]
            for f in sorted(files):
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp")):
                    out.append(os.path.join(root, f))
        return out

    def run(self) -> dict:
        from PIL import Image

        stats: dict = {}
        for step in self.steps:
            if step == "convert":
                c = self.ex.get("convert", {})
                fmt = c.get("format", "jpg").lstrip(".")
                max_size = int(c.get("max_size", 0))
                n = 0
                for p in self._images():
                    img = Image.open(p).convert("RGB")
                    if max_size and max(img.size) > max_size:
                        img.thumbnail((max_size, max_size))
                    out = os.path.splitext(p)[0] + f".{fmt}"
                    img.save(out)
                    if out != p:
                        os.remove(p)
                    n += 1
                stats["convert"] = n
            elif step == "dedupe":
                seen: dict[str, str] = {}
                removed = 0
                for p in self._images():
                    h = hashlib.md5(open(p, "rb").read()).hexdigest()
                    if h in seen:
                        os.remove(p)
                        cap = os.path.splitext(p)[0] + ".txt"
                        if os.path.exists(cap):
                            os.remove(cap)
                        removed += 1
                    else:
                        seen[h] = p
                stats["dedupe_removed"] = removed
            elif step == "prune_small":
                ms = int(self.ex.get("prune_small", {}).get("min_size", 256))
                removed = 0
                for p in self._images():
                    w, h = Image.open(p).size
                    if min(w, h) < ms:
                        os.remove(p)
                        removed += 1
                stats["pruned"] = removed
            elif step == "caption":
                from ai_toolkit_tpu.jobs.caption_process import CaptionProcess

                class _C:  # minimal cfg shim
                    extras = {"caption": {**self.ex.get("caption", {}),
                                          "path_to_caption": self.path}}

                stats["caption"] = CaptionProcess(self.job_name, _C()).run()
            elif step == "trigger":
                word = self.ex.get("trigger", {}).get("word", "")
                n = 0
                for p in self._images():
                    cap = os.path.splitext(p)[0] + ".txt"
                    if not os.path.exists(cap):
                        continue
                    text = open(cap).read()
                    if word and word not in text:
                        open(cap, "w").write(f"{word}, {text}")
                        n += 1
                stats["trigger_added"] = n
            else:
                raise ValueError(f"unknown dataset_tools step '{step}'")
        print(f"dataset_tools done: {stats}")
        return stats
