"""BaseModel protocol — the per-arch interface contract.

Mirror of the reference's ``BaseModel`` API surface
(``/root/reference/toolkit/models/base_model.py:98-1631``: arch,
is_flow_matching, load_model, get_prompt_embeds, get_noise_prediction,
encode_images/decode_latents, bucket divisibility, LoRA key conversion),
reshaped for JAX: models hold *no tensors* — they build modules, init/load
variable pytrees, and expose pure functions over them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig


class BaseTpuModel:
    arch: str = "base"
    archs: list[str] = []
    is_flow_matching: bool = True
    bucket_divisibility: int = 16  # pixel divisibility for bucketed resolutions
    # False on structural-only archs (no checkpoint importer: they train from
    # random init and refuse name_or_path loudly); surfaced via /api/archs
    checkpoint_importable: bool = True

    def __init__(self, config: ModelConfig):
        if config.name_or_path and "civitai.com" in str(config.name_or_path):
            # civitai urls resolve to a cached local file (reference
            # stable_diffusion_model.py:308-311)
            from ai_toolkit_tpu.io.civitai import maybe_resolve_civitai

            config.name_or_path = maybe_resolve_civitai(config.name_or_path)
        self.config = config

    # ---- construction ----

    def init_variables(self, rng: jax.Array) -> dict:
        """Random-init the full variable tree (test/bench path)."""
        raise NotImplementedError

    def load_variables(self, rng: jax.Array) -> dict:
        """Load from ``config.name_or_path`` if it exists locally, else random init."""
        raise NotImplementedError

    def refuse_or_init(self, rng: jax.Array) -> dict:
        """load_variables for archs without a weight importer yet: loud
        refusal beats silently training against random weights (the same
        contract extra_archs uses). Empty name_or_path = train from scratch."""
        path = self.config.name_or_path
        if path:
            raise NotImplementedError(
                f"arch '{self.config.arch}': no checkpoint importer exists yet — "
                f"refusing to silently random-init a model named '{path}'. "
                f"Set name_or_path: '' to train from scratch, or use an arch "
                f"with import support."
            )
        return self.init_variables(rng)

    def refuse_bad_layout(self, expected: str):
        """Raise when ``name_or_path`` is non-empty but matches no importable
        local layout — a non-local repo id or an unexpected directory shape
        must never silently fall through to random init."""
        raise FileNotFoundError(
            f"arch '{self.config.arch}': name_or_path "
            f"'{self.config.name_or_path}' is not an importable local layout "
            f"(expected {expected}). Refusing to silently random-init. Set "
            f"name_or_path: '' to train from scratch."
        )

    # ---- pure functions ----

    def predict(self, variables: dict, noisy_latents: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        """The model forward used by the train step and samplers."""
        raise NotImplementedError

    def encode_prompt(self, te_variables: dict, prompts: list[str]) -> dict:
        """Text -> conditioning dict (host-callable; jit inside)."""
        raise NotImplementedError

    def encode_images(self, vae_variables: dict, images: jax.Array, rng=None) -> jax.Array:
        raise NotImplementedError

    def decode_latents(self, vae_variables: dict, latents: jax.Array) -> jax.Array:
        raise NotImplementedError

    # ---- adapter wiring ----

    def lora_targets(self) -> list[str]:
        """Regex patterns for default LoRA targeting."""
        return []

    def partition_rules(self) -> list:
        return []

    # ---- geometry ----

    def latent_shape(self, height: int, width: int) -> tuple[int, int, int]:
        raise NotImplementedError

    def image_seq_len(self, height: int, width: int) -> int:
        """Token count for dynamic timestep shifting."""
        h, w, _ = self.latent_shape(height, width)
        return h * w

    # ---- persistence ----

    def lora_key_layout(self) -> str:
        """'kohya' | 'comfy' | arch-specific — used by io/lora_file."""
        return "kohya"
