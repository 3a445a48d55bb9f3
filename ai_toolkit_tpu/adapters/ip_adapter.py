"""IP-Adapter: image-prompt conditioning as a functional overlay.

Reference: ``/root/reference/toolkit/ip_adapter.py`` (1,302 LoC torch class).
Here the adapter is two pure pieces:

1. ``ImageProjModel`` — CLIP-vision pooled embed -> N context tokens in the
   UNet cross-attention dim (the "ip tokens").
2. an ``ip`` variable collection ``{ip_k, ip_v, scale}`` per cross-attention
   block (built by ``build_ip_collection``, initialized from the existing
   attn2 K/V kernels) — consumed by ``models/unet.TransformerBlock`` as
   decoupled attention.

Training: trainable = {"ip": collection, "ip_proj": proj params}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import LayerNorm, Linear


class ImageProjModel(nn.Module):
    """pooled CLIP embed [B, E] -> [B, n_tokens, cross_dim]."""

    cross_dim: int
    n_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds: jax.Array) -> jax.Array:
        b = embeds.shape[0]
        x = Linear(self.cross_dim * self.n_tokens, dtype=self.dtype, param_dtype=self.dtype,
                   name="proj")(embeds.astype(self.dtype))
        x = x.reshape(b, self.n_tokens, self.cross_dim)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


def build_ip_collection(unet_params: dict, cross_dim: int, scale: float = 1.0) -> dict:
    """Create {ip_k, ip_v, scale} beside every attn2 module, initialized from
    the frozen attn2 K/V kernels (the reference initializes from them too)."""
    out: dict = {}

    def walk(node, path, dst):
        made = False
        if isinstance(node, dict) and "attn2_k" in node and "kernel" in node.get("attn2_k", {}):
            k = np.asarray(node["attn2_k"]["kernel"], np.float32)  # [ctx_dim, dim]
            v = np.asarray(node["attn2_v"]["kernel"], np.float32)
            if k.shape[0] == cross_dim:
                dst["ip_k"] = jnp.asarray(k.copy())
                dst["ip_v"] = jnp.asarray(v.copy())
                dst["scale"] = jnp.asarray(scale, jnp.float32)
                made = True
        for key, child in (node.items() if isinstance(node, dict) else []):
            if isinstance(child, dict):
                sub: dict = {}
                walk(child, path + (key,), sub)
                if sub:
                    dst[key] = sub
        return made

    walk(unet_params, (), out)
    return out


def init_ip_adapter(
    unet_params: dict, cross_dim: int, clip_embed_dim: int, n_tokens: int, rng: jax.Array,
) -> tuple[dict, dict, ImageProjModel]:
    """Returns (ip_collection, proj_params, proj_module)."""
    proj = ImageProjModel(cross_dim=cross_dim, n_tokens=n_tokens)
    proj_params = proj.init(rng, jnp.zeros((1, clip_embed_dim)))["params"]
    ip = build_ip_collection(unet_params, cross_dim)
    return ip, proj_params, proj


def save_ip_adapter(ip: dict, proj_params: dict, path: str, metadata: dict | None = None):
    """Standard ip-adapter file layout: image_proj.* + ip_adapter.N.to_k_ip.weight."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}
    flat["image_proj.proj.weight"] = np.ascontiguousarray(np.asarray(proj_params["proj"]["kernel"]).T)
    flat["image_proj.proj.bias"] = np.asarray(proj_params["proj"]["bias"])
    flat["image_proj.norm.weight"] = np.asarray(proj_params["norm"]["scale"])
    flat["image_proj.norm.bias"] = np.asarray(proj_params["norm"]["bias"])

    idx = 0

    def walk(node):
        nonlocal idx
        if isinstance(node, dict):
            if "ip_k" in node:
                flat[f"ip_adapter.{idx}.to_k_ip.weight"] = np.ascontiguousarray(
                    np.asarray(node["ip_k"]).T
                )
                flat[f"ip_adapter.{idx}.to_v_ip.weight"] = np.ascontiguousarray(
                    np.asarray(node["ip_v"]).T
                )
                idx += 1
                return
            for k in sorted(node.keys()):
                walk(node[k])

    walk(ip)
    save_file(flat, path, metadata={str(k): str(v) for k, v in (metadata or {}).items()})
