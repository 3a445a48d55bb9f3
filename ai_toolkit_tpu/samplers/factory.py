"""Schedule factory (reference ``toolkit/sampler.py:get_sampler``)."""

from __future__ import annotations

from typing import Any

from .ddpm import DDPMSchedule
from .flowmatch import FlowMatchSchedule


def get_schedule(name: str, arch: str | None = None, **overrides: Any):
    """name: 'flowmatch' | 'ddpm' | 'ddim' (+ per-arch defaults)."""
    name = (name or "flowmatch").lower()
    # weighting_table may arrive as a file path (npy/json of 1000 floats)
    wt = overrides.get("weighting_table")
    if isinstance(wt, str):
        import json
        import os

        import numpy as np

        if wt.endswith(".npy"):
            overrides["weighting_table"] = tuple(np.load(wt).tolist())
        elif os.path.isfile(wt):
            overrides["weighting_table"] = tuple(json.load(open(wt)))
    elif isinstance(wt, list):
        overrides["weighting_table"] = tuple(wt)
    if name in ("flowmatch", "flowmatch_euler", "mean_flow"):
        defaults: dict[str, Any] = {}
        if arch in ("sd3", "prx_pixel", "prx", "zimage", "zimage_l2p",
                    "zeta_chroma"):
            # zimage family: scheduler_config shift 3.0 (z_image.py:42-46,
            # zeta_chroma_model.py:31-35)
            # prx: released scheduler_config.json (prx_pixel_t2i.py:66-70)
            defaults = {"shift": 3.0, "use_dynamic_shifting": False}
        elif arch in ("lumina2",):
            defaults = {"shift": 6.0, "use_dynamic_shifting": False}
        elif arch in ("ideogram4",):
            # released scheduler_config (ideogram4.py:41-53): plain flow times
            defaults = {"shift": 1.0, "use_dynamic_shifting": False}
        elif arch in ("flux", "flex1", "flex2", "flux_kontext", "chroma"):
            defaults = {"use_dynamic_shifting": True}
        elif arch in ("cogview4",):
            # vendored scheduler_config (toolkit/models/cogview4.py:45-59)
            defaults = {"use_dynamic_shifting": True, "base_shift": 0.25,
                        "max_shift": 0.75, "time_shift_type": "linear"}
        defaults.update(overrides)
        return FlowMatchSchedule(**defaults)
    if name in ("ddpm", "ddim", "euler", "euler_a", "dpm", "dpm++", "dpmpp_2m",
                "dpm++ 2m", "pndm", "lms", "heun", "lcm", "custom_lcm"):
        defaults = {}
        if arch in ("sd2", "sd2_v"):
            defaults = {"prediction_type": "v_prediction"}
        defaults.update(overrides)
        return DDPMSchedule(**defaults)
    raise ValueError(f"unknown noise scheduler '{name}'")
