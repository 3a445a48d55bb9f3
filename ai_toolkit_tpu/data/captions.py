"""Caption processing: triggers, dropout, shuffle, keep_tokens.

Behavior parity with the reference's CaptionMixin / CaptionProcessingDTOMixin
(``/root/reference/toolkit/dataloader_mixins.py:128,313``): ``[trigger]`` tag
replacement, trigger injection when absent, comma-split token shuffle and
dropout with ``keep_tokens`` pinned, full-caption dropout to "".
"""

from __future__ import annotations

import random


def load_caption_for(path: str, caption_ext: str = "txt", default: str = "") -> str:
    return load_caption_pair(path, caption_ext, default)[0]


def load_caption_pair(
    path: str, caption_ext: str = "txt", default: str = ""
) -> tuple[str, str]:
    """(caption, caption_short) for an image path.

    The short caption comes from a json caption file's ``caption_short`` key
    (reference dataloader_mixins.py:333-362); when absent it falls back to the
    dataset default caption, exactly like the reference (line 359-360).
    """
    import os

    base, _ = os.path.splitext(path)
    cap_path = f"{base}.{caption_ext}"
    if os.path.isfile(cap_path):
        text = open(cap_path, encoding="utf-8").read().strip()
        short = default
        if caption_ext == "json":
            import json

            try:
                data = json.loads(text)
                text = data.get("caption", data.get("text", ""))
                short = data.get("caption_short", default)
            except Exception:
                pass
        return text, short
    return default, default


def process_caption(
    caption: str,
    *,
    trigger_word: str | None = None,
    caption_dropout_rate: float = 0.0,
    token_dropout_rate: float = 0.0,
    shuffle_tokens: bool = False,
    keep_tokens: int = 0,
    rng: random.Random | None = None,
) -> str:
    rng = rng or random
    if trigger_word:
        if "[trigger]" in caption:
            caption = caption.replace("[trigger]", trigger_word)
        elif trigger_word not in caption:
            caption = f"{trigger_word}, {caption}" if caption else trigger_word
    if caption_dropout_rate > 0 and rng.random() < caption_dropout_rate:
        return ""
    if shuffle_tokens or token_dropout_rate > 0:
        tokens = [t.strip() for t in caption.split(",") if t.strip()]
        head, tail = tokens[:keep_tokens], tokens[keep_tokens:]
        if token_dropout_rate > 0:
            tail = [t for t in tail if rng.random() >= token_dropout_rate]
        if shuffle_tokens:
            tail = list(tail)
            rng.shuffle(tail)
        caption = ", ".join(head + tail)
    return caption


def parse_ace_caption(text: str) -> dict:
    """ACE-Step tagged caption -> dict (reference parse_ace_step_caption,
    ace_step_15_model.py:49-66). Untagged text becomes the caption."""
    import re

    def tag(name):
        m = re.search(rf"<{name}>(.*?)</{name}>", text, re.DOTALL)
        return m.group(1).strip() if m else ""

    def num(v, default):
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    if "<CAPTION>" not in text:
        return {"caption": text.strip(), "lyrics": "", "bpm": 120,
                "keyscale": "", "timesignature": "", "duration": 10.0,
                "language": "en"}
    return {
        "caption": tag("CAPTION"),
        "lyrics": tag("LYRICS"),
        "bpm": num(tag("BPM"), 120),
        "keyscale": tag("KEYSCALE"),
        "timesignature": tag("TIMESIGNATURE"),
        "duration": num(tag("DURATION"), 10.0),
        "language": tag("LANGUAGE") or "en",
    }
