"""CustomAdapter umbrella: redux / te_augmenter / vision_direct / clip_fusion /
single_value / photo_maker(lite) conditioning adapters.

Parity target: the reference's ``toolkit/custom_adapter.py:104-286`` type
dispatch and its building blocks (``toolkit/models/redux.py``,
``te_aug_adapter.py``, ``vd_adapter.py``, ``single_value_adapter.py``,
``zipper_resampler.py``, ``photomaker.py``). The torch implementation
monkey-patches attention processors and TE forwards; here every adapter is a
pure Flax module producing/transforming *conditioning tensors*, composed
around the model's ``predict_train`` so gradients reach the adapter params
inside the jitted step:

- ``redux``          vision tokens -> (up 3x, silu, down) -> tokens appended
                     to the text sequence (reference redux.py:5-26).
- ``clip_fusion``    learned-query resampler pools vision tokens to n_tokens
                     appended to the text sequence (zipper_resampler).
- ``te_augmenter``   text states cross-attend to vision tokens, residual add
                     (reference patches CLIP attention per-layer
                     te_aug_adapter.py:19-61; here applied once post-TE —
                     functional equivalent, documented difference).
- ``vision_direct``  vision hidden states projected to the cross-attn dim and
                     injected through the decoupled 'ip' collection
                     (vd_adapter.py attn processors; UNet archs).
- ``single_value``   N scalar knobs -> learned value embeddings -> tokens
                     appended to the text sequence (single_value_adapter.py).
- ``photo_maker``    (lite) pooled id embed fused with the text trigger
                     states via MLP -> id tokens appended.

All adapters export ``apply_cond(variables, cond)`` pure functions usable
under jit, and save/load to safetensors via ``save_custom_adapter``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import LayerNorm, Linear

ADAPTER_TYPES = (
    "decorator",
    "redux", "te_augmenter", "vision_direct", "clip_fusion", "single_value", "photo_maker",
    "photo_maker_full", "mean_flow", "t2i", "ilora", "llm_adapter",
)


class LLMContextEmbedder(nn.Module):
    """Trainable projection from LLM hidden states into the DiT context dim
    (reference toolkit/models/llm_adapter.py: ``context_embedder`` replacing
    the flux/lumina2 text path; here the projection lands in the frozen
    model's own context space — same rank, functional equivalent since
    ctx_dim >= inner_dim for the supported archs)."""

    ctx_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, llm_states):  # [B, S, H]
        return Linear(self.ctx_dim, dtype=self.dtype, param_dtype=self.dtype,
                      name="context_embedder")(llm_states.astype(self.dtype))


class DecoratorBank(nn.Module):
    """Learned token bank appended to the text sequence (reference
    toolkit/models/decorator.py: N trainable tokens, zeroed for the
    unconditional branch)."""

    ctx_dim: int
    n_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int):
        bank = self.param("bank", nn.initializers.normal(1.0),
                          (self.n_tokens, self.ctx_dim), self.dtype)
        return jnp.tile(bank[None], (batch_size, 1, 1))


class ReduxEncoder(nn.Module):
    """vision tokens [B, N, E] -> [B, N, txt_dim] (redux.py: up 3x, silu, down)."""

    txt_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(self.txt_dim * 3, dtype=self.dtype, param_dtype=self.dtype, name="redux_up")(x)
        return Linear(self.txt_dim, dtype=self.dtype, param_dtype=self.dtype, name="redux_down")(
            nn.silu(x)
        )


class ZipperResampler(nn.Module):
    """Learned-query attention pooling: vision tokens -> n_tokens ctx tokens."""

    ctx_dim: int
    n_tokens: int = 8
    n_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, N, E]
        b = x.shape[0]
        dt = self.dtype
        q = self.param("queries", nn.initializers.normal(0.02),
                       (self.n_tokens, self.ctx_dim), jnp.float32)
        q = jnp.broadcast_to(q[None].astype(dt), (b, self.n_tokens, self.ctx_dim))
        kv = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="kv_in")(x.astype(dt))
        hd = self.ctx_dim // self.n_heads
        qh = q.reshape(b, self.n_tokens, self.n_heads, hd)
        kh = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="k")(kv).reshape(b, -1, self.n_heads, hd)
        vh = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="v")(kv).reshape(b, -1, self.n_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(dt)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, self.n_tokens, self.ctx_dim)
        out = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="out")(out)
        return LayerNorm(dtype=dt, name="norm")(out)


class TEAugmenter(nn.Module):
    """Text states attend to vision tokens; residual with zero-init gate."""

    ctx_dim: int
    n_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt, vis):  # txt: [B, S, D]; vis: [B, N, E]
        dt = self.dtype
        b, s, d = txt.shape
        hd = self.ctx_dim // self.n_heads
        q = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="q")(txt.astype(dt))
        k = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="k")(vis.astype(dt))
        v = Linear(self.ctx_dim, dtype=dt, param_dtype=dt, name="v")(vis.astype(dt))
        qh = q.reshape(b, s, self.n_heads, hd)
        kh = k.reshape(b, -1, self.n_heads, hd)
        vh = v.reshape(b, -1, self.n_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(dt)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, s, self.ctx_dim)
        out = Linear(d, dtype=dt, param_dtype=dt, name="out")(out)
        # zero-init scalar gate: adapter starts as identity (reference zero-init
        # of the injected attention output)
        gate = self.param("gate", nn.initializers.zeros, (), jnp.float32)
        return txt + (gate.astype(txt.dtype) * out.astype(txt.dtype))


class SingleValueEncoder(nn.Module):
    """N scalar values [B, nv] -> [B, nv, ctx_dim] tokens (one MLP per slot
    expressed as a batched einsum)."""

    ctx_dim: int
    n_values: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, values):  # [B, nv]
        w1 = self.param("w1", nn.initializers.normal(0.02),
                        (self.n_values, self.ctx_dim), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (self.n_values, self.ctx_dim), jnp.float32)
        w2 = self.param("w2", nn.initializers.normal(0.02),
                        (self.n_values, self.ctx_dim, self.ctx_dim), jnp.float32)
        x = values[:, :, None] * w1[None] + b1[None]  # [B, nv, D]
        x = jnp.einsum("bnd,nde->bne", nn.silu(x), w2)
        return LayerNorm(dtype=self.dtype, name="norm")(x.astype(self.dtype))


class PhotoMakerLite(nn.Module):
    """Fuse a pooled id-image embed with pooled text states into id tokens."""

    ctx_dim: int
    n_tokens: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt_pooled, img_pooled):  # [B, D], [B, E]
        dt = self.dtype
        x = jnp.concatenate([txt_pooled.astype(dt), img_pooled.astype(dt)], axis=-1)
        x = Linear(self.ctx_dim * 2, dtype=dt, param_dtype=dt, name="fuse_in")(x)
        x = Linear(self.ctx_dim * self.n_tokens, dtype=dt, param_dtype=dt, name="fuse_out")(
            nn.silu(x)
        )
        x = x.reshape(x.shape[0], self.n_tokens, self.ctx_dim)
        return LayerNorm(dtype=dt, name="norm")(x)


class _FuseMLP(nn.Module):
    """LN -> fc1 -> GELU -> fc2 (+residual) — reference photomaker.MLP."""

    out_dim: int
    hidden: int
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = LayerNorm(dtype=dt, name="layernorm")(x.astype(dt))
        h = Linear(self.hidden, dtype=dt, param_dtype=dt, name="fc1")(h)
        h = Linear(self.out_dim, dtype=dt, param_dtype=dt, name="fc2")(
            jax.nn.gelu(h, approximate=False)
        )
        return h + x if self.residual else h


class PhotoMakerID(nn.Module):
    """Full PhotoMaker id-embedding (reference toolkit/photomaker.py:19-113):
    dual visual projection -> FuseModule replacing the trigger ("class")
    token embeddings inside the prompt states.

    TPU-first: instead of masked_scatter (dynamic gather), fusion runs
    densely at every position and a where(mask) keeps non-class tokens —
    one extra MLP over the sequence, no dynamic shapes.
    """

    ctx_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt, img_pooled, class_mask):
        """txt [B,S,E]; img_pooled [B,Ev]; class_mask [B,S'] (1 = trigger pos).
        S' may be the primary tokenizer length when the model concatenates
        several encoders' states — the mask is zero-padded/trimmed to S
        (trigger positions live in the leading segment)."""
        dt = self.dtype
        e = self.ctx_dim
        txt = txt.astype(dt)
        s = txt.shape[1]
        if class_mask.shape[1] < s:
            class_mask = jnp.pad(class_mask, ((0, 0), (0, s - class_mask.shape[1])))
        elif class_mask.shape[1] > s:
            class_mask = class_mask[:, :s]
        # dual projection (visual_projection + visual_projection_2) -> E
        p1 = Linear(e // 2, use_bias=False, dtype=dt, param_dtype=dt, name="proj1")(
            img_pooled.astype(dt)
        )
        p2 = Linear(e - e // 2, use_bias=False, dtype=dt, param_dtype=dt, name="proj2")(
            img_pooled.astype(dt)
        )
        id_embed = jnp.concatenate([p1, p2], axis=-1)[:, None, :]  # [B,1,E]
        id_b = jnp.broadcast_to(id_embed, txt.shape)
        # FuseModule.fuse_fn: mlp1(cat) + prompt -> mlp2 -> LN
        stacked = jnp.concatenate([txt, id_b], axis=-1)
        fused = _FuseMLP(e, e, residual=False, dtype=dt, name="mlp1")(stacked) + txt
        fused = _FuseMLP(e, e, residual=True, dtype=dt, name="mlp2")(fused)
        fused = LayerNorm(dtype=dt, name="layer_norm")(fused)
        m = class_mask.astype(bool)[..., None]
        return jnp.where(m, fused, txt)


class MeanFlowTimeEncoder(nn.Module):
    """Second-timestep r -> n context tokens (mean_flow_adapter equivalent:
    the reference injects an r embedding into the modulation path; here the
    r tokens ride the text sequence so any arch gains dual-time inputs)."""

    ctx_dim: int
    n_tokens: int = 1
    freq_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, r):  # [B]
        half = self.freq_dim // 2
        freqs = jnp.exp(-jnp.log(10_000.0) * jnp.arange(half) / half)
        ang = r.astype(jnp.float32)[:, None] * freqs[None] * 1000.0
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        x = Linear(self.ctx_dim, dtype=self.dtype, param_dtype=self.dtype, name="in")(emb)
        x = Linear(self.ctx_dim * self.n_tokens, dtype=self.dtype, param_dtype=self.dtype,
                   name="out")(nn.silu(x))
        x = x.reshape(r.shape[0], self.n_tokens, self.ctx_dim)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class PixtralResampler(nn.Module):
    """Reference pixtral_vision.py VisionLanguageAdapter (:358-372): vision
    tokens -> DiT mid dim via w_in -> GELU -> w_out (both biased). Used by
    vision_direct with image_encoder_arch=pixtral + flux_only_double
    (vd_adapter.py:756-760)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(self.out_dim, dtype=self.dtype, param_dtype=self.dtype,
                   name="w_in")(x.astype(self.dtype))
        return Linear(self.out_dim, dtype=self.dtype, param_dtype=self.dtype,
                      name="w_out")(jax.nn.gelu(x, approximate=False))


class IdentityTokens(nn.Module):
    """Raw vision tokens pass straight to the per-block decoupled-KV
    projections (the reference's non-pixtral flux vision_direct has no
    resampler: mid_size == vision hidden, vd_adapter.py:539-547)."""

    @nn.compact
    def __call__(self, x):
        return x


class VisionDirectProj(nn.Module):
    """vision hidden states [B, N, E] -> [B, N, cross_dim] ip tokens."""

    cross_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Linear(self.cross_dim, dtype=self.dtype, param_dtype=self.dtype, name="proj")(
            x.astype(self.dtype)
        )
        return LayerNorm(dtype=self.dtype, name="norm")(x)


@dataclass
class CustomAdapterRuntime:
    """Holds the adapter module + the context key it edits; jit-composable."""

    adapter_type: str
    module: nn.Module
    ctx_key: str  # 'txt' (DiT) or 'context' (UNet)
    collection: str = "adapter"
    # ilora: (params, variables, cond) -> (variables, cond) — installs the
    # generated per-sample 'lora' collection (adapters/ilora.py)
    vars_apply: Any = None

    def apply(self, variables: dict, cond: dict) -> tuple[dict, dict]:
        """Full hook: may edit both the variable collections and the cond."""
        if self.vars_apply is not None:
            params = variables.get(self.collection)
            if params is None:
                return variables, cond
            return self.vars_apply(params, variables, cond)
        return variables, self.apply_cond(variables, cond)

    def apply_cond(self, variables: dict, cond: dict) -> dict:
        """Pure: transform the conditioning dict using trainable params in
        ``variables[self.collection]``. Inputs the batch must provide:
        vision_tokens [B,N,E] (redux/te_augmenter/clip_fusion/vision_direct),
        vision_pooled [B,E] (photo_maker), extra_values [B,nv] (single_value).
        """
        params = variables.get(self.collection)
        if params is None:
            return cond
        t = self.adapter_type
        if t == "decorator":
            b = cond[self.ctx_key].shape[0]
            extra = self.module.apply({"params": params}, b)
            return _append_ctx(cond, self.ctx_key, extra)
        if t == "redux" and cond.get("vision_tokens") is not None:
            extra = self.module.apply({"params": params}, cond["vision_tokens"])
            return _append_ctx(cond, self.ctx_key, extra)
        if t == "clip_fusion" and cond.get("vision_tokens") is not None:
            extra = self.module.apply({"params": params}, cond["vision_tokens"])
            return _append_ctx(cond, self.ctx_key, extra)
        if t == "te_augmenter" and cond.get("vision_tokens") is not None:
            txt = self.module.apply({"params": params}, cond[self.ctx_key], cond["vision_tokens"])
            return {**cond, self.ctx_key: txt}
        if t == "single_value" and cond.get("extra_values") is not None:
            extra = self.module.apply({"params": params}, cond["extra_values"])
            return _append_ctx(cond, self.ctx_key, extra)
        if (
            t == "photo_maker_full"
            and cond.get("vision_pooled") is not None
            and cond.get("class_tokens_mask") is not None
        ):
            txt = self.module.apply(
                {"params": params}, cond[self.ctx_key], cond["vision_pooled"],
                cond["class_tokens_mask"],
            )
            out = {**cond, self.ctx_key: txt}
            out.pop("class_tokens_mask", None)
            return out
        if t == "photo_maker" and cond.get("vision_pooled") is not None:
            txt = cond[self.ctx_key]
            pooled_txt = txt.mean(axis=1)
            extra = self.module.apply({"params": params}, pooled_txt, cond["vision_pooled"])
            return _append_ctx(cond, self.ctx_key, extra)
        if t == "llm_adapter" and cond.get("llm_states") is not None:
            txt = self.module.apply({"params": params}, cond["llm_states"])
            out = {**cond, self.ctx_key: txt.astype(cond[self.ctx_key].dtype)
                   if cond.get(self.ctx_key) is not None else txt}
            if cond.get("llm_mask") is not None:
                out["txt_mask"] = cond["llm_mask"]
            out.pop("llm_states", None)
            out.pop("llm_mask", None)
            return out
        if t == "vision_direct" and cond.get("vision_tokens") is not None:
            tokens = self.module.apply({"params": params}, cond["vision_tokens"])
            return {**cond, "ip_tokens": tokens}
        if t == "t2i" and cond.get("control_pixels") is not None:
            res = self.module.apply({"params": params}, cond["control_pixels"])
            return {**cond, "adapter_residuals": res}
        if t == "mean_flow" and cond.get("mean_flow_r") is not None:
            extra = self.module.apply({"params": params}, cond["mean_flow_r"])
            out = _append_ctx(cond, self.ctx_key, extra)
            out.pop("mean_flow_r", None)
            return out
        return cond


def _append_ctx(cond: dict, key: str, extra: jax.Array) -> dict:
    ctx = cond[key]
    new = jnp.concatenate([ctx, extra.astype(ctx.dtype)], axis=1)
    out = {**cond, key: new}
    # keep the key-padding mask consistent: appended tokens are always visible
    if cond.get("txt_mask") is not None and key == "txt":
        m = cond["txt_mask"]
        pad = jnp.ones((m.shape[0], extra.shape[1]), m.dtype)
        out["txt_mask"] = jnp.concatenate([m, pad], axis=1)
    return out


def init_custom_adapter(
    adapter_cfg: dict,
    ctx_dim: int,
    ctx_key: str,
    vision_dim: int,
    rng: jax.Array,
) -> tuple[dict, CustomAdapterRuntime]:
    """Build (trainable params, runtime) for an adapter type."""
    t = adapter_cfg.get("type")
    n_tokens = int(adapter_cfg.get("num_tokens", 8))
    if t == "decorator":
        mod = DecoratorBank(ctx_dim, n_tokens=int(adapter_cfg.get("num_tokens", 4)))
        params = mod.init(rng, 1)["params"]
    elif t == "redux":
        mod = ReduxEncoder(ctx_dim)
        params = mod.init(rng, jnp.zeros((1, 4, vision_dim)))["params"]
    elif t == "clip_fusion":
        mod = ZipperResampler(ctx_dim, n_tokens=n_tokens)
        params = mod.init(rng, jnp.zeros((1, 4, vision_dim)))["params"]
    elif t == "te_augmenter":
        mod = TEAugmenter(ctx_dim)
        params = mod.init(rng, jnp.zeros((1, 4, ctx_dim)), jnp.zeros((1, 4, vision_dim)))["params"]
    elif t == "single_value":
        nv = int(adapter_cfg.get("num_tokens", 1))
        mod = SingleValueEncoder(ctx_dim, n_values=nv)
        params = mod.init(rng, jnp.zeros((1, nv)))["params"]
    elif t == "photo_maker":
        mod = PhotoMakerLite(ctx_dim, n_tokens=int(adapter_cfg.get("num_tokens", 2)))
        params = mod.init(rng, jnp.zeros((1, ctx_dim)), jnp.zeros((1, vision_dim)))["params"]
    elif t == "photo_maker_full":
        mod = PhotoMakerID(ctx_dim)
        params = mod.init(
            rng, jnp.zeros((1, 4, ctx_dim)), jnp.zeros((1, vision_dim)),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
    elif t == "vision_direct":
        if adapter_cfg.get("_flux_family"):
            # flux family: per-block decoupled-KV reads the tokens directly
            # (vd_adapter.py:539-547); pixtral + flux_only_double inserts the
            # VisionLanguageAdapter resampler to the DiT hidden size
            if (adapter_cfg.get("image_encoder_arch") == "pixtral"
                    and adapter_cfg.get("flux_only_double")):
                mod = PixtralResampler(int(adapter_cfg["_dit_hidden"]))
                params = mod.init(rng, jnp.zeros((1, 4, vision_dim)))["params"]
            else:
                mod = IdentityTokens()
                params = {}
        else:
            mod = VisionDirectProj(ctx_dim)
            params = mod.init(rng, jnp.zeros((1, 4, vision_dim)))["params"]
    elif t == "mean_flow":
        mod = MeanFlowTimeEncoder(ctx_dim, n_tokens=int(adapter_cfg.get("num_tokens", 1)))
        params = mod.init(rng, jnp.zeros((1,)))["params"]
    elif t == "llm_adapter":
        hidden = int(adapter_cfg["_llm_hidden"])
        mod = LLMContextEmbedder(ctx_dim)
        params = mod.init(rng, jnp.zeros((1, 4, hidden)))["params"]
    elif t == "t2i":
        from ai_toolkit_tpu.adapters.t2i_adapter import T2IAdapterNet

        ch = tuple(adapter_cfg["_unet_channels"])
        mod = T2IAdapterNet(channels=ch, downscale=int(adapter_cfg.get("downscale", 8)))
        sz = int(adapter_cfg.get("_image_size", 64))
        params = mod.init(rng, jnp.zeros((1, sz, sz, 3)))["params"]
    else:
        raise ValueError(f"unknown custom adapter type '{t}'; known: {ADAPTER_TYPES}")
    return params, CustomAdapterRuntime(t, mod, ctx_key)


def save_custom_adapter(params: dict, adapter_type: str, path: str, metadata=None):
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}.")
            else:
                arr = np.asarray(v)
                if arr.ndim == 2 and k == "kernel":  # torch linear convention
                    flat[f"{prefix}weight"] = np.ascontiguousarray(arr.T)
                elif k == "kernel":
                    flat[f"{prefix}weight"] = np.ascontiguousarray(arr)
                elif k == "bias":
                    flat[f"{prefix}bias"] = np.ascontiguousarray(arr)
                else:
                    flat[f"{prefix}{k}"] = np.ascontiguousarray(arr)

    walk(params, f"{adapter_type}.")
    meta = {"adapter_type": adapter_type, **(metadata or {})}
    save_file(flat, path, metadata={str(k): str(v) for k, v in meta.items()})


def load_custom_adapter(path: str) -> tuple[dict, str]:
    """Inverse of save: returns (params, adapter_type)."""
    from safetensors import safe_open

    params: dict = {}
    with safe_open(path, "np") as f:
        meta = f.metadata() or {}
        atype = meta.get("adapter_type", "")
        for key in f.keys():
            arr = f.get_tensor(key)
            parts = key.split(".")
            if parts[0] == atype:
                parts = parts[1:]
            node = params
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            leaf = parts[-1]
            if leaf == "weight" and arr.ndim == 2:
                node["kernel"] = np.ascontiguousarray(arr.T)
            elif leaf == "weight":
                node["kernel"] = arr
            else:
                node[leaf] = arr
    return params, atype
