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


class Resampler(nn.Module):
    """IP-Adapter-plus perceiver resampler (reference toolkit/ip_adapter.py
    Resampler): learned query latents cross-attend CLIP patch tokens, N
    perceiver layers, projected to the cross-attention dim."""

    cross_dim: int
    n_tokens: int = 16
    dim: int = 768
    depth: int = 4
    heads: int = 12
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: [B, S, E] penultimate CLIP-vision states -> [B, n, cross]."""
        dt = self.dtype
        b = tokens.shape[0]
        hd = self.dim // self.heads
        lat = self.param("latents", nn.initializers.normal(self.dim ** -0.5),
                         (1, self.n_tokens, self.dim), dt)
        lat = jnp.tile(lat, (b, 1, 1))
        x = Linear(self.dim, dtype=dt, param_dtype=dt, name="proj_in")(tokens.astype(dt))
        for i in range(self.depth):
            xl = LayerNorm(dtype=dt, name=f"layer_{i}_norm_x")(x)
            ql = LayerNorm(dtype=dt, name=f"layer_{i}_norm_q")(lat)
            q = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=dt,
                       name=f"layer_{i}_to_q")(ql)
            kv_in = jnp.concatenate([xl, ql], axis=1)
            kv = Linear(2 * self.dim, use_bias=False, dtype=dt, param_dtype=dt,
                        name=f"layer_{i}_to_kv")(kv_in)
            k, v = jnp.split(kv, 2, axis=-1)

            def heads_(y):
                return y.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

            attn = jax.nn.softmax(
                (heads_(q) @ heads_(k).transpose(0, 1, 3, 2)) * hd ** -0.5, axis=-1
            )
            o = (attn @ heads_(v)).transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
            o = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=dt,
                       name=f"layer_{i}_to_out")(o)
            lat = lat + o
            h = LayerNorm(dtype=dt, name=f"layer_{i}_norm_ff")(lat)
            h = Linear(self.dim * self.ff_mult, use_bias=False, dtype=dt,
                       param_dtype=dt, name=f"layer_{i}_ff_in")(h)
            h = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=dt,
                       name=f"layer_{i}_ff_out")(nn.gelu(h, approximate=False))
            lat = lat + h
        out = Linear(self.cross_dim, dtype=dt, param_dtype=dt, name="proj_out")(lat)
        return LayerNorm(dtype=dt, name="norm_out")(out)


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
    plus: bool = False, resampler_dim: int = 768, resampler_depth: int = 4,
    resampler_heads: int = 12,
) -> tuple[dict, dict, ImageProjModel | Resampler]:
    """Returns (ip_collection, proj_params, proj_module). ``plus`` selects the
    patch-token perceiver resampler (ip-adapter-plus); the base variant
    projects the pooled embed."""
    if plus:
        proj: ImageProjModel | Resampler = Resampler(
            cross_dim=cross_dim, n_tokens=n_tokens, dim=resampler_dim,
            depth=resampler_depth, heads=resampler_heads,
        )
        proj_params = proj.init(rng, jnp.zeros((1, 5, clip_embed_dim)))["params"]
    else:
        proj = ImageProjModel(cross_dim=cross_dim, n_tokens=n_tokens)
        proj_params = proj.init(rng, jnp.zeros((1, clip_embed_dim)))["params"]
    ip = build_ip_collection(unet_params, cross_dim)
    return ip, proj_params, proj


def save_ip_adapter(ip: dict, proj_params: dict, path: str, metadata: dict | None = None):
    """Standard ip-adapter file layout: image_proj.* + ip_adapter.N.to_k_ip.weight."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}
    if "proj" in proj_params and "kernel" in proj_params.get("proj", {}):
        flat["image_proj.proj.weight"] = np.ascontiguousarray(np.asarray(proj_params["proj"]["kernel"]).T)
        flat["image_proj.proj.bias"] = np.asarray(proj_params["proj"]["bias"])
        flat["image_proj.norm.weight"] = np.asarray(proj_params["norm"]["scale"])
        flat["image_proj.norm.bias"] = np.asarray(proj_params["norm"]["bias"])
    else:
        # plus-variant resampler: generic torch-layout flatten
        def wp(node, prefix):
            for k in sorted(node.keys()):
                v = node[k]
                if isinstance(v, dict):
                    wp(v, f"{prefix}{k}.")
                elif k == "kernel":
                    flat[f"image_proj.{prefix}weight"] = np.ascontiguousarray(np.asarray(v).T)
                elif k == "scale":
                    flat[f"image_proj.{prefix}weight"] = np.asarray(v)
                else:
                    flat[f"image_proj.{prefix}{k}"] = np.asarray(v)

        wp(proj_params, "")

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
