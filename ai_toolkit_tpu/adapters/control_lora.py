"""Control-LoRA adapter: train a new control LoRA on a base (flux-class) DiT.

Reference: ``/root/reference/toolkit/models/control_lora_adapter.py`` — the
control image is VAE-encoded, packed, and channel-concatenated with the noisy
latents; ``img_in``/``x_embedder`` grows a *full-rank* expansion over the new
input channels (ImgEmbedder, :28-113, init ``randn * 0.01``); a standard LoRA
covers the rest of the DiT (``x_embedder`` excluded, :140-144). Dispatch:
``toolkit/custom_adapter.py:127,258``; latent concat (+ optional inpainting
layout ``[masked latents, mask]``): ``custom_adapter.py:624-700``.

TPU-native design: no forward hijack. The expansion weight lives in a
``ctrl`` variable collection read by ``ops/layers.Linear`` at apply time
(``y = x_base @ kernel + x_extra @ w`` — numerically identical to the
reference's ``linear(x, cat([orig_w, new_w], dim=1))``), so the whole thing
stays inside the one jitted train step and XLA fuses both matmuls.

Save layout matches the reference (``get_state_dict``, :259-268): LoRA keys
in the flux transformer layout plus ``transformer.x_embedder.weight``
([out, extra_in], torch orientation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

X_EMBEDDER_KEY = "transformer.x_embedder.weight"


def init_control_lora(
    hidden: int,
    base_packed_channels: int,
    rng: jax.Array,
    num_control_images: int = 1,
    has_inpainting_input: bool = False,
    img_in_name: str = "img_in",
) -> dict:
    """Build the ``ctrl`` collection tree for the img_in expansion.

    extra_in mirrors the reference channel math (control_lora_adapter.py:52-59,
    packed units): ``base * num_controls``, or ``base + 4`` when the single
    control is the inpainting input ``[masked latents, keep-mask]``.
    """
    if has_inpainting_input and num_control_images != 1:
        raise ValueError(
            "control_lora: has_inpainting_input requires num_control_images=1 "
            "(the inpaint latent is the control — reference "
            "custom_adapter.py:688-693)"
        )
    extra_in = control_lora_extra_channels(
        base_packed_channels, num_control_images, has_inpainting_input
    )
    w = jax.random.normal(rng, (extra_in, hidden), jnp.float32) * 0.01
    return {img_in_name: {"w": w}}


def control_lora_extra_channels(
    base_packed_channels: int, num_control_images: int, has_inpainting_input: bool
) -> int:
    if has_inpainting_input:
        # [masked latents (base), keep-mask (1 latent ch -> 4 packed)]
        return base_packed_channels + 4
    return base_packed_channels * num_control_images


def assemble_inpaint_control(
    latents: np.ndarray,  # clean latents [B, h, w, C]
    keep_mask_px: np.ndarray | None,  # pixel-res keep mask [B, H, W, 1]
    host_rng,
    control_image_dropout: float = 0.0,
    invert_inpaint_mask_chance: float = 0.0,
) -> np.ndarray:
    """Train-time inpainting control [B, h, w, C+1]: [masked latents, mask]
    (mask 1 = area to inpaint). Reference custom_adapter.py:634-693 incl. the
    random-blob fallback when no mask is provided and the dropout layout
    (zero latents + all-ones mask). Host-side numpy (loader thread)."""
    b, h, w, c = latents.shape
    lat = np.asarray(latents, np.float32)
    do_dropout = host_rng.random() < float(control_image_dropout)

    keep = None
    if keep_mask_px is not None and not do_dropout:
        import cv2

        keep = np.stack([
            cv2.resize(m[..., 0], (w, h), interpolation=cv2.INTER_LINEAR)
            for m in np.asarray(keep_mask_px, np.float32)
        ])[..., None]
    if keep is None and not do_dropout:
        # random blobs, inverted (reference: 1 - generate_random_mask)
        from ai_toolkit_tpu.models.flux_model import _random_blob_mask

        keep = 1.0 - _random_blob_mask(b, h, w, host_rng)
    if keep is not None and not do_dropout:
        if invert_inpaint_mask_chance > 0.0 and host_rng.random() < float(
            invert_inpaint_mask_chance
        ):
            keep = 1.0 - keep
        return np.concatenate([lat * keep, 1.0 - keep], axis=-1)
    return np.concatenate(
        [np.zeros_like(lat), np.ones((b, h, w, 1), np.float32)], axis=-1
    )


def control_lora_extra_flat(ctrl: dict) -> dict:
    """The expansion weight in the reference save layout (torch [out, in])."""
    (entry,) = ctrl.values()
    out = {X_EMBEDDER_KEY: np.ascontiguousarray(np.asarray(entry["w"]).T)}
    if "b" in entry:
        out["transformer.x_embedder.bias"] = np.asarray(entry["b"])
    return out


def load_control_lora_expansion(path: str, img_in_name: str = "img_in") -> dict | None:
    """Read the x_embedder expansion back from a save file -> ctrl tree.

    Returns None when the file has no expansion key (plain LoRA file)."""
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        keys = set(f.keys())
        if X_EMBEDDER_KEY not in keys:
            return None
        entry = {"w": np.ascontiguousarray(f.get_tensor(X_EMBEDDER_KEY).T)}
        if "transformer.x_embedder.bias" in keys:
            entry["b"] = f.get_tensor("transformer.x_embedder.bias")
    return {img_in_name: entry}


def upgrade_expansion(loaded_w: np.ndarray, extra_in: int) -> np.ndarray:
    """Reference load_weights upgrade path (control_lora_adapter.py:247-256):
    tile the input dim up (doubling) / truncate down to the configured size."""
    w = np.asarray(loaded_w)
    while w.shape[0] < extra_in:
        w = np.concatenate([w, w], axis=0)
    return w[:extra_in]
