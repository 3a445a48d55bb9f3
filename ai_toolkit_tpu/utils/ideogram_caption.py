"""Ideogram-4 structured-JSON caption schema helpers.

Parity target: ``/root/reference/toolkit/ideogram_caption.py`` — the single
source of truth for the Ideogram-4 caption schema shared by the captioner,
the prompt upsampler, the dataloader, and the model encoder. Behavior
re-implemented from the documented rules:

- top-level keys in order: high_level_description (opt), style_description
  (opt), compositional_deconstruction (req); input-only ``aspect_ratio`` is
  dropped.
- style_description carries exactly one of ``photo`` / ``art_style`` with
  branch-dependent strict key order (photo: aesthetics, lighting, photo,
  medium, color_palette; art: aesthetics, lighting, medium, art_style,
  color_palette); medium canonicalized to one of photograph / illustration /
  3d_render / painting / graphic_design (custom mediums preserved).
- palettes: unique UPPERCASE #RRGGBB (``#RGB`` expanded), capped at 16 per
  image / 5 per element; invalid entries dropped, empty palettes removed.
- elements in strict order (obj: type, bbox, desc, color_palette; text:
  type, bbox, text, desc, color_palette); unknown keys preserved at the end.
- bboxes are STORED as [y_min, x_min, y_max, x_max] in 0-1000; captioners
  emit [x1, y1, x2, y2] — ``swap_bbox_xy_in_text`` rewrites them in raw
  (possibly malformed) model output via regex, clamping and axis-sorting.
- model-ready serialization is compact json (``separators=(",", ":")``,
  ensure_ascii=False); old-format captions (photo-always, palette-first,
  "Title." mediums, 3-digit hex) are migrated on digest.
"""

from __future__ import annotations

import json
import re

MAX_IMAGE_PALETTE = 16
MAX_ELEMENT_PALETTE = 5

MEDIUM_OPTIONS = ["photograph", "illustration", "3d_render", "painting",
                  "graphic_design"]

_MEDIUM_ALIASES = {
    "photograph": "photograph", "photo": "photograph",
    "illustration": "illustration",
    "3d render": "3d_render", "3d_render": "3d_render",
    "3d-render": "3d_render", "3drender": "3d_render",
    "render": "3d_render", "3d": "3d_render",
    "painting": "painting",
    "graphic design": "graphic_design", "graphic_design": "graphic_design",
    "graphic-design": "graphic_design", "graphic": "graphic_design",
}

_HEX6 = re.compile(r"^#[0-9a-fA-F]{6}$")
_HEX3 = re.compile(r"^#[0-9a-fA-F]{3}$")


def canon_medium(medium):
    if not isinstance(medium, str):
        return medium
    key = medium.strip().rstrip(".").strip().lower()
    return _MEDIUM_ALIASES.get(key, medium.strip())


def is_photo_medium(medium) -> bool:
    return canon_medium(medium) == "photograph"


def normalize_hex(color):
    if not isinstance(color, str):
        return None
    s = color.strip()
    if _HEX6.match(s):
        return "#" + s[1:].upper()
    if _HEX3.match(s):
        return "#" + "".join(ch * 2 for ch in s[1:]).upper()
    return None


def sanitize_palette(palette, max_len):
    if not isinstance(palette, (list, tuple)):
        return None
    out, seen = [], set()
    for c in palette:
        h = normalize_hex(c)
        if h is None or h in seen:
            continue
        seen.add(h)
        out.append(h)
        if len(out) >= max_len:
            break
    return out or None


_STYLE_KEYS = ("aesthetics", "lighting", "photo", "art_style", "medium",
               "color_palette")


def normalize_style(style):
    if not isinstance(style, dict):
        return style
    raw = style.get("medium")
    medium = canon_medium(raw) if raw is not None else None
    has_photo = bool(style.get("photo"))
    has_art = bool(style.get("art_style"))
    if medium in MEDIUM_OPTIONS:
        photo_branch = medium == "photograph"
    elif has_art and not has_photo:
        photo_branch = False
    else:
        photo_branch = True

    out: dict = {}
    for k in ("aesthetics", "lighting"):
        if k in style:
            out[k] = style[k]
    render_val = (style.get("photo") if has_photo else None,
                  style.get("art_style") if has_art else None)
    if photo_branch:
        val = render_val[0] if render_val[0] is not None else render_val[1]
        if val is not None:
            out["photo"] = val
        if medium is not None:
            out["medium"] = medium
    else:
        if medium is not None:
            out["medium"] = medium
        val = render_val[1] if render_val[1] is not None else render_val[0]
        if val is not None:
            out["art_style"] = val
    pal = sanitize_palette(style.get("color_palette"), MAX_IMAGE_PALETTE)
    if pal is not None:
        out["color_palette"] = pal
    for k, v in style.items():
        if k not in _STYLE_KEYS:
            out[k] = v
    return out


def normalize_element(el):
    if not isinstance(el, dict):
        return el
    etype = el.get("type", "obj")
    out: dict = {"type": etype}
    if el.get("bbox") is not None:
        out["bbox"] = el["bbox"]
    if etype == "text" and "text" in el:
        out["text"] = el["text"]
    if "desc" in el:
        out["desc"] = el["desc"]
    pal = sanitize_palette(el.get("color_palette"), MAX_ELEMENT_PALETTE)
    if pal is not None:
        out["color_palette"] = pal
    for k, v in el.items():
        if k not in out and k != "color_palette":
            out[k] = v
    return out


def normalize_caption_dict(data):
    if not isinstance(data, dict):
        return data
    data = dict(data)
    data.pop("aspect_ratio", None)
    out: dict = {}
    if "high_level_description" in data:
        out["high_level_description"] = data["high_level_description"]
    if "style_description" in data:
        out["style_description"] = normalize_style(data["style_description"])
    decon = data.get("compositional_deconstruction")
    if isinstance(decon, dict):
        nd: dict = {}
        if "background" in decon:
            nd["background"] = decon["background"]
        els = decon.get("elements")
        if isinstance(els, list):
            nd["elements"] = [normalize_element(e) for e in els]
        for k, v in decon.items():
            if k not in ("background", "elements"):
                nd[k] = v
        out["compositional_deconstruction"] = nd
    elif decon is not None:
        out["compositional_deconstruction"] = decon
    for k, v in data.items():
        if k not in ("high_level_description", "style_description",
                     "compositional_deconstruction"):
            out.setdefault(k, v)
    return out


_BBOX_TEXT = re.compile(
    r'"bbox"\s*:\s*\[\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*,\s*'
    r"(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*\]"
)


def _clamp_1000(v) -> int:
    return max(0, min(1000, round(float(v))))


def swap_bbox_xy_in_text(text):
    """[x1,y1,x2,y2] -> stored [y1,x1,y2,x2] on the RAW model output (regex,
    no JSON parse needed): clamps 0-1000, sorts each axis pair."""
    if not isinstance(text, str):
        return text

    def repl(m):
        x1, y1, x2, y2 = m.groups()
        cx1, cx2 = sorted((_clamp_1000(x1), _clamp_1000(x2)))
        cy1, cy2 = sorted((_clamp_1000(y1), _clamp_1000(y2)))
        return f'"bbox":[{cy1},{cx1},{cy2},{cx2}]'

    return _BBOX_TEXT.sub(repl, text)


def to_model_string(data) -> str:
    return json.dumps(data, ensure_ascii=False, separators=(",", ":"))


def is_ideogram_caption_str(text) -> bool:
    t = (text or "").strip()
    if not t.startswith("{"):
        return False
    try:
        d = json.loads(t)
    except Exception:
        return False
    return isinstance(d, dict) and isinstance(
        d.get("compositional_deconstruction"), dict)


def digest_caption_string(text):
    """Parse + normalize (migrating the old shape) + compact-serialize; plain
    text or non-caption JSON passes through unchanged (reference
    ``digest_caption_string``, consumed at ideogram4.py:522)."""
    t = (text or "").strip()
    if not t.startswith("{"):
        return text
    try:
        data = json.loads(t)
    except Exception:
        return text
    if not (isinstance(data, dict)
            and isinstance(data.get("compositional_deconstruction"), dict)):
        return text
    return to_model_string(normalize_caption_dict(data))
