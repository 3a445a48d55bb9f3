"""Model registry: arch id -> model class.

Equivalent of the reference's ``AI_TOOLKIT_MODELS`` registry
(``/root/reference/toolkit/util/get_model.py:20-50``), minus the import-time
plugin scan: archs register explicitly (extensions can call
``register_model`` from their own package import).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Type

MODEL_REGISTRY: dict[str, type] = {}


def register_model(cls):
    for arch in getattr(cls, "archs", [getattr(cls, "arch", None)]):
        if arch:
            MODEL_REGISTRY[arch] = cls
    return cls


def get_model_class(arch: str):
    _ensure_builtin_models()
    if arch not in MODEL_REGISTRY:
        raise KeyError(f"unknown model arch '{arch}'; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[arch]


def _ensure_builtin_models():
    # lazy import to avoid heavy imports at config-parse time
    import ai_toolkit_tpu.models.flux_model  # noqa: F401
    import ai_toolkit_tpu.models.sd_model  # noqa: F401
    import ai_toolkit_tpu.models.wan_model  # noqa: F401
    import ai_toolkit_tpu.models.audio_model  # noqa: F401
    import ai_toolkit_tpu.models.sd3_model  # noqa: F401
    import ai_toolkit_tpu.models.pixart_model  # noqa: F401
    import ai_toolkit_tpu.models.qwen_model  # noqa: F401
    import ai_toolkit_tpu.models.auraflow_model  # noqa: F401
    import ai_toolkit_tpu.models.lumina2_model  # noqa: F401
    import ai_toolkit_tpu.models.hidream_model  # noqa: F401
    import ai_toolkit_tpu.models.ltx2_model  # noqa: F401
    import ai_toolkit_tpu.models.cogview4_model  # noqa: F401
    import ai_toolkit_tpu.models.omnigen2_model  # noqa: F401
    import ai_toolkit_tpu.models.flux2_model  # noqa: F401
    import ai_toolkit_tpu.models.f_lite  # noqa: F401
    import ai_toolkit_tpu.models.boogu_dit  # noqa: F401
    import ai_toolkit_tpu.models.prx_dit  # noqa: F401
    import ai_toolkit_tpu.models.ideogram_dit  # noqa: F401
    import ai_toolkit_tpu.models.ernie_dit  # noqa: F401
    import ai_toolkit_tpu.models.krea_dit  # noqa: F401
    import ai_toolkit_tpu.models.zimage_dit  # noqa: F401
    import ai_toolkit_tpu.models.extra_archs  # noqa: F401
