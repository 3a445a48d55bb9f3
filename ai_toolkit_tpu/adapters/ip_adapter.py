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


def build_flux_ip_collection(
    dit_params: dict,
    mid_dim: int,
    rng: jax.Array,
    init: str = "from_qkv",  # 'from_qkv' (vision_direct) | 'random' (ip)
    only_double: bool = False,
    scale: float = 1.0,
) -> dict:
    """Per-block decoupled-KV 'ip' collection for the flux DiT family
    (reference vd_adapter.py:514-700 / ip_adapter.py CustomIPFluxAttnProcessor).

    Leaves {to_k [mid, hidden], to_v, scale} per double (and, unless
    ``only_double`` — the reference's flux_only_double — single) block;
    scanned layouts get stacked [L, mid, hidden] leaves + a [L] scale.

    ``from_qkv`` initializes from the frozen block K weights sliced/padded to
    ``mid_dim`` and scaled by 0.01 (vd_adapter.py:616-646); ``random`` uses
    the torch nn.Linear default (kaiming-uniform over mid_dim fan-in).
    """
    out: dict = {}
    h3 = None

    def make(kern, key):
        # kern: [h, out] or [L, h, out]; K block = cols [h : 2h]
        nonlocal h3
        kern = np.asarray(kern, np.float32)
        hdim = kern.shape[-2]
        k_w = kern[..., hdim:2 * hdim]  # [(L,) h, h]
        stacked = k_w.ndim == 3
        if init == "from_qkv":
            if mid_dim <= hdim:
                wk = k_w[..., :mid_dim, :] * 0.01
            else:
                pad_shape = k_w.shape[:-2] + (mid_dim - hdim, hdim)
                pad = np.asarray(
                    jax.random.normal(jax.random.fold_in(rng, hash(key) & 0xFFFF),
                                      pad_shape), np.float32) * 0.01
                wk = np.concatenate([k_w * 0.01, pad], axis=-2)
            wv = wk.copy()
        else:
            lim = 1.0 / np.sqrt(mid_dim)
            shape = k_w.shape[:-2] + (mid_dim, hdim)
            r1, r2 = jax.random.split(jax.random.fold_in(rng, hash(key) & 0xFFFF))
            wk = np.asarray(jax.random.uniform(r1, shape, jnp.float32, -lim, lim))
            wv = np.asarray(jax.random.uniform(r2, shape, jnp.float32, -lim, lim))
        sc = (np.full(k_w.shape[0], scale, np.float32) if stacked
              else np.float32(scale))
        return {"to_k": jnp.asarray(wk), "to_v": jnp.asarray(wv),
                "scale": jnp.asarray(sc)}

    if "double_blocks" in dit_params:  # scanned
        out["double_blocks"] = {"block": make(
            dit_params["double_blocks"]["block"]["img_qkv"]["kernel"], "double")}
        if not only_double and "single_blocks" in dit_params:
            out["single_blocks"] = {"block": make(
                dit_params["single_blocks"]["block"]["linear1"]["kernel"], "single")}
    else:
        for name, node in dit_params.items():
            if name.startswith("double_") and "img_qkv" in node:
                out[name] = make(node["img_qkv"]["kernel"], name)
            elif (not only_double and name.startswith("single_")
                  and "linear1" in node):
                out[name] = make(node["linear1"]["kernel"], name)
    return out


def flux_ip_flat(ip: dict, fmt: str = "vd") -> dict:
    """Flatten the flux 'ip' collection to the reference key layout:
    ``adapter_modules.{i}.to_k_adapter.weight`` (vision_direct,
    vd_adapter.py adapter_modules ModuleList: doubles then singles) or
    ``ip_adapter.{i}.to_k_ip.weight`` (ip_adapter.py). Torch orientation
    ([hidden, mid]); scanned stacks expand to per-layer entries."""
    kname, vname, prefix = (
        ("to_k_adapter", "to_v_adapter", "adapter_modules") if fmt == "vd"
        else ("to_k_ip", "to_v_ip", "ip_adapter"))
    flat: dict[str, np.ndarray] = {}
    idx = 0

    def emit(leaf):
        nonlocal idx
        k = np.asarray(leaf["to_k"], np.float32)
        v = np.asarray(leaf["to_v"], np.float32)
        if k.ndim == 3:
            for l in range(k.shape[0]):
                flat[f"{prefix}.{idx}.{kname}.weight"] = np.ascontiguousarray(k[l].T)
                flat[f"{prefix}.{idx}.{vname}.weight"] = np.ascontiguousarray(v[l].T)
                idx += 1
        else:
            flat[f"{prefix}.{idx}.{kname}.weight"] = np.ascontiguousarray(k.T)
            flat[f"{prefix}.{idx}.{vname}.weight"] = np.ascontiguousarray(v.T)
            idx += 1

    if "double_blocks" in ip:
        emit(ip["double_blocks"]["block"])
        if "single_blocks" in ip:
            emit(ip["single_blocks"]["block"])
    else:
        for name in sorted((n for n in ip if n.startswith("double_")),
                           key=lambda n: int(n.split("_")[1])):
            emit(ip[name])
        for name in sorted((n for n in ip if n.startswith("single_")),
                           key=lambda n: int(n.split("_")[1])):
            emit(ip[name])
    return flat


def load_flux_ip_flat(flat: dict, template: dict, fmt: str = "vd") -> dict:
    """Inverse of :func:`flux_ip_flat` against a shape template (resume)."""
    kname, vname, prefix = (
        ("to_k_adapter", "to_v_adapter", "adapter_modules") if fmt == "vd"
        else ("to_k_ip", "to_v_ip", "ip_adapter"))
    idx = 0

    def take(leaf):
        nonlocal idx
        tk = np.asarray(leaf["to_k"])
        if tk.ndim == 3:
            ks, vs = [], []
            for _ in range(tk.shape[0]):
                ks.append(np.asarray(flat[f"{prefix}.{idx}.{kname}.weight"]).T)
                vs.append(np.asarray(flat[f"{prefix}.{idx}.{vname}.weight"]).T)
                idx += 1
            return {"to_k": jnp.asarray(np.stack(ks), np.float32),
                    "to_v": jnp.asarray(np.stack(vs), np.float32),
                    "scale": leaf["scale"]}
        k = np.asarray(flat[f"{prefix}.{idx}.{kname}.weight"]).T
        v = np.asarray(flat[f"{prefix}.{idx}.{vname}.weight"]).T
        idx += 1
        return {"to_k": jnp.asarray(k, np.float32),
                "to_v": jnp.asarray(v, np.float32), "scale": leaf["scale"]}

    out: dict = {}
    if "double_blocks" in template:
        out["double_blocks"] = {"block": take(template["double_blocks"]["block"])}
        if "single_blocks" in template:
            out["single_blocks"] = {"block": take(template["single_blocks"]["block"])}
    else:
        for name in sorted((n for n in template if n.startswith("double_")),
                           key=lambda n: int(n.split("_")[1])):
            out[name] = take(template[name])
        for name in sorted((n for n in template if n.startswith("single_")),
                           key=lambda n: int(n.split("_")[1])):
            out[name] = take(template[name])
    return out
