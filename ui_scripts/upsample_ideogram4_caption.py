"""Upsample a short user idea into a full Ideogram-4 structured-JSON caption.

Parity target: ``/root/reference/ui_scripts/upsample_ideogram4_caption.py``
("magic prompt": idea -> schema-complete caption JSON on stdout, logs on
stderr, nothing written to disk). Contract preserved:

- ``--prompt`` idea text (or positional), ``--aspect-ratio`` (input-only
  context, stripped from the output), ``--creative`` directive flag,
  ``--instructions`` extra guidance.
- output is ONE compact JSON object (``to_model_string``), normalized by the
  shared schema helper (``ai_toolkit_tpu.utils.ideogram_caption``): bboxes
  clamped/sorted [y1,x1,y2,x2] 0-1000, photo/art_style branch, palette caps.

Backends: ``--model <local HF dir>`` runs a local LLM (no-egress env: the
reference's Qwen3-VL call is only possible with local weights); without one,
a deterministic template expansion fills the schema from the idea — honest
offline behavior, same output contract.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from ai_toolkit_tpu.utils.ideogram_caption import (  # noqa: E402
    normalize_caption_dict,
    swap_bbox_xy_in_text,
    to_model_string,
)

FAITHFUL_DIRECTIVE = ("Stay faithful to the user's idea; add only what the "
                      "schema requires.")
CREATIVE_DIRECTIVE = ("Creatively expand the idea with styles, lighting and "
                      "composition choices.")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def extract_json(raw: str):
    text = raw.strip()
    fence = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
    if fence:
        text = fence.group(1).strip()
    start, end = text.find("{"), text.rfind("}")
    if start == -1 or end <= start:
        return None
    try:
        return json.loads(text[start:end + 1])
    except json.JSONDecodeError:
        return None


def sanitize_bbox(bbox):
    if not isinstance(bbox, (list, tuple)) or len(bbox) != 4:
        return None
    try:
        y1, x1, y2, x2 = [float(v) for v in bbox]
    except (TypeError, ValueError):
        return None
    cl = lambda v: max(0, min(1000, round(v)))
    y1, y2 = sorted((cl(y1), cl(y2)))
    x1, x2 = sorted((cl(x1), cl(x2)))
    if y2 <= y1 or x2 <= x1:
        return None
    return [y1, x1, y2, x2]


def sanitize_caption(data: dict) -> dict:
    decon = data.get("compositional_deconstruction", {})
    els = decon.get("elements", []) if isinstance(decon, dict) else []
    if isinstance(els, list):
        for el in els:
            if isinstance(el, dict) and "bbox" in el:
                cleaned = sanitize_bbox(el["bbox"])
                if cleaned is None:
                    el.pop("bbox", None)
                else:
                    el["bbox"] = cleaned
    return normalize_caption_dict(data)


def template_caption(idea: str, creative: bool) -> dict:
    """Deterministic schema-complete expansion for the offline path."""
    idea = idea.strip().rstrip(".")
    subjects = [s.strip() for s in re.split(r",| and | with ", idea) if s.strip()]
    elements = [{"type": "obj", "desc": s} for s in subjects[:4]] or [
        {"type": "obj", "desc": idea}]
    style = {"aesthetics": "clean, balanced composition",
             "lighting": "soft natural light",
             "photo": "35mm photograph, shallow depth of field",
             "medium": "photograph"}
    if creative:
        style["color_palette"] = ["#1B263B", "#E0E1DD", "#F4A261"]
    return {
        "high_level_description": f"{idea}.",
        "style_description": style,
        "compositional_deconstruction": {
            "background": "unobtrusive setting that supports the subject",
            "elements": elements,
        },
    }


def llm_caption(model_dir: str, prompt: str) -> dict | None:
    """Greedy decode through a local HF-layout causal LM (reference runs
    Qwen3-VL text-only; here any LLMEncoder-importable dir works)."""
    from ai_toolkit_tpu.utils.llm_generate import generate_text

    raw = generate_text(model_dir, prompt, max_new_tokens=512)
    raw = swap_bbox_xy_in_text(raw)
    return extract_json(raw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prompt", nargs="?", default=None)
    ap.add_argument("--prompt", dest="prompt_opt", default=None)
    ap.add_argument("--aspect-ratio", default="1:1")
    ap.add_argument("--creative", action="store_true")
    ap.add_argument("--instructions", default="")
    ap.add_argument("--model", default=None, help="local HF dir for the LLM")
    args = ap.parse_args()
    idea = args.prompt_opt or args.prompt
    if not idea:
        ap.error("an idea prompt is required")

    directive = CREATIVE_DIRECTIVE if args.creative else FAITHFUL_DIRECTIVE
    data = None
    if args.model and os.path.isdir(args.model):
        log(f"upsampling via local model {args.model}")
        full = (f"{directive}\nUser instructions: {args.instructions or 'None.'}\n"
                f"Aspect ratio: {args.aspect_ratio}\nIdea: {idea}\n"
                f"Respond with ONLY the Ideogram-4 caption JSON object.")
        data = llm_caption(args.model, full)
        if data is None:
            log("model output was not parseable JSON; using the template")
    if data is None:
        data = template_caption(idea, args.creative)
    data["aspect_ratio"] = args.aspect_ratio  # dropped by the normalizer
    print(to_model_string(sanitize_caption(data)))


if __name__ == "__main__":
    main()
