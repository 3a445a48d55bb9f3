"""Conditional UNet (SD1.x / SD2.x / SDXL) in Flax, NHWC.

One configurable implementation of the diffusers-style UNet2DConditionModel
the reference trains for the sd/sdxl archs
(``/root/reference/toolkit/stable_diffusion_model.py``): resnet blocks with
timestep injection, transformer blocks with self+cross attention and GEGLU
FF, optional SDXL additional embeddings (time_ids + pooled text).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ai_toolkit_tpu.ops.attention import dot_product_attention
from ai_toolkit_tpu.ops.embeddings import timestep_embedding
from ai_toolkit_tpu.ops.layers import Conv, GroupNorm, LayerNorm, Linear
from ai_toolkit_tpu.parallel.sharding import PartitionRule


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # per down-level transformer depth; 0 = plain resnet level
    transformer_layers: tuple[int, ...] = (1, 1, 1, 0)
    num_heads: int = 8
    # When set, heads are computed PER attention level as dim // head_dim
    # (diffusers semantics: sd2.1/SDXL fix head_dim=64 so 640-dim levels run
    # 10x64 and 1280-dim 20x64; a single global num_heads mis-splits the
    # 640 levels 20x32 — real-checkpoint numerics diverge. SD1.5 keeps the
    # legacy global 8 heads.)
    head_dim: int | None = None
    cross_attention_dim: int = 768
    # SDXL extras
    addition_time_embed_dim: int | None = None  # 256 for sdxl
    projection_class_embeddings_dim: int | None = None  # 2816 for sdxl
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    # FreeU (b1, b2, s1, s2): scale the backbone's first channel half and
    # Fourier-damp the skip's low frequencies on the first two decoder
    # resolutions (diffusers apply_freeu; reference enables it on the TRAIN
    # forward, BaseSDTrainProcess.py:2539)
    free_u: tuple | None = None

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def sd21(cls) -> "UNetConfig":
        return cls(cross_attention_dim=1024, head_dim=64)

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(320, 640, 1280),
            transformer_layers=(0, 2, 10),
            cross_attention_dim=2048,
            head_dim=64,  # 10 heads @640, 20 @1280 (diffusers SDXL config)
            addition_time_embed_dim=256,
            projection_class_embeddings_dim=2816,
        )

    @classmethod
    def tiny(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            transformer_layers=(1, 1),
            num_heads=2,
            cross_attention_dim=64,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            remat=False,
        )

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class ResnetBlock(nn.Module):
    out_ch: int
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb):
        dt, pdt = self.cfg.dtype, self.cfg.param_dtype
        h = GroupNorm(32, eps=1e-5, dtype=dt, name="norm1")(x)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv1")(h)
        t = Linear(self.out_ch, dtype=dt, param_dtype=pdt, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(32, eps=1e-5, dtype=dt, name="norm2")(h)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), dtype=dt, param_dtype=pdt, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, (1, 1), dtype=dt, param_dtype=pdt, name="conv_shortcut")(x)
        return x + h


class TransformerBlock(nn.Module):
    cfg: UNetConfig
    dim: int

    @nn.compact
    def __call__(self, x, context, ip_context=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        nh = self.dim // cfg.head_dim if cfg.head_dim else cfg.num_heads
        hd = self.dim // nh
        b, s, _ = x.shape

        def attn(h, ctx, prefix):
            q = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name=f"{prefix}_q")(h)
            k = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name=f"{prefix}_k")(ctx)
            v = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name=f"{prefix}_v")(ctx)
            q = q.reshape(b, s, nh, hd)
            k = k.reshape(b, ctx.shape[1], nh, hd)
            v = v.reshape(b, ctx.shape[1], nh, hd)
            o = dot_product_attention(q, k, v).reshape(b, s, self.dim)
            return Linear(self.dim, dtype=dt, param_dtype=pdt, name=f"{prefix}_out")(o)

        h = LayerNorm(eps=1e-5, dtype=dt, name="norm1")(x)
        x = x + attn(h, h, "attn1")
        h = LayerNorm(eps=1e-5, dtype=dt, name="norm2")(x)
        # cross attention, decomposed so IP-Adapter can join pre-projection
        q2 = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name="attn2_q")(h)
        k2 = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name="attn2_k")(context)
        v2 = Linear(self.dim, use_bias=False, dtype=dt, param_dtype=pdt, name="attn2_v")(context)
        q2r = q2.reshape(b, s, nh, hd)
        o2 = dot_product_attention(
            q2r, k2.reshape(b, context.shape[1], nh, hd), v2.reshape(b, context.shape[1], nh, hd)
        ).reshape(b, s, self.dim)
        if ip_context is not None and self.has_variable("ip", "ip_k"):
            # IP-Adapter decoupled cross-attention (reference toolkit/ip_adapter.py):
            # same query, separate K/V over image tokens, scaled add BEFORE to_out
            ip_k = self.get_variable("ip", "ip_k").astype(dt)
            ip_v = self.get_variable("ip", "ip_v").astype(dt)
            ip_scale = jnp.asarray(self.get_variable("ip", "scale"), dt)
            n_ip = ip_context.shape[1]
            k_ip = (ip_context.astype(dt) @ ip_k).reshape(b, n_ip, nh, hd)
            v_ip = (ip_context.astype(dt) @ ip_v).reshape(b, n_ip, nh, hd)
            o_ip = dot_product_attention(q2r, k_ip, v_ip).reshape(b, s, self.dim)
            o2 = o2 + ip_scale * o_ip
        x = x + Linear(self.dim, dtype=dt, param_dtype=pdt, name="attn2_out")(o2)
        h = LayerNorm(eps=1e-5, dtype=dt, name="norm3")(x)
        gate = Linear(self.dim * 8, dtype=dt, param_dtype=pdt, name="ff_in")(h)
        a, g = jnp.split(gate, 2, axis=-1)
        h = a * jax.nn.gelu(g, approximate=False)
        return x + Linear(self.dim, dtype=dt, param_dtype=pdt, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    cfg: UNetConfig
    depth: int

    @nn.compact
    def __call__(self, x, context, ip_context=None):
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        b, hh, ww, c = x.shape
        h = GroupNorm(32, dtype=dt, name="norm")(x)
        h = h.reshape(b, hh * ww, c)
        h = Linear(c, dtype=dt, param_dtype=pdt, name="proj_in")(h)
        for i in range(self.depth):
            h = TransformerBlock(cfg, c, name=f"block_{i}")(h, context, ip_context)
        h = Linear(c, dtype=dt, param_dtype=pdt, name="proj_out")(h)
        return x + h.reshape(b, hh, ww, c)


def _fourier_filter(x: jax.Array, threshold: int, scale: float) -> jax.Array:
    """Scale the centered low-frequency box of a feature map (diffusers
    fourier_filter), channels-last."""
    xf = jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)), axes=(1, 2))
    _, hh, ww, _ = x.shape
    crow, ccol = hh // 2, ww // 2
    mask = jnp.ones((1, hh, ww, 1), jnp.float32)
    mask = mask.at[:, max(crow - threshold, 0):crow + threshold,
                   max(ccol - threshold, 0):ccol + threshold, :].set(scale)
    xf = xf * mask
    out = jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(xf, axes=(1, 2)), axes=(1, 2)))
    return out.astype(x.dtype)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, H, W, C] noisy latents
        t: jax.Array,  # [B] integer timesteps (or [0,1] flow times * 1000)
        context: jax.Array,  # [B, S, cross_dim] text states
        added_cond: dict | None = None,  # sdxl: {"time_ids": [B,6], "text_embeds": [B,1280]}
        ip_context: jax.Array | None = None,  # [B, N_ip, cross_dim] image tokens
        adapter_residuals: tuple | None = None,  # T2I-Adapter per-level features
    ) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.dtype, cfg.param_dtype
        ted = cfg.time_embed_dim

        temb = timestep_embedding(t, cfg.block_out_channels[0], time_factor=1.0)
        temb = Linear(ted, dtype=dt, param_dtype=pdt, name="time_fc1")(temb.astype(dt))
        temb = Linear(ted, dtype=dt, param_dtype=pdt, name="time_fc2")(nn.silu(temb))

        if cfg.addition_time_embed_dim and added_cond is not None:
            tid = timestep_embedding(
                added_cond["time_ids"].reshape(-1), cfg.addition_time_embed_dim, time_factor=1.0
            ).reshape(x.shape[0], -1)
            add = jnp.concatenate([added_cond["text_embeds"], tid.astype(dt)], axis=-1)
            add = Linear(ted, dtype=dt, param_dtype=pdt, name="add_fc1")(add.astype(dt))
            add = Linear(ted, dtype=dt, param_dtype=pdt, name="add_fc2")(nn.silu(add))
            temb = temb + add

        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        Attn = nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer

        h = Conv(cfg.block_out_channels[0], (3, 3), dtype=dt, param_dtype=pdt, name="conv_in")(x)
        skips = [h]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = Res(ch, cfg, name=f"down_{i}_res_{j}")(h, temb)
                if cfg.transformer_layers[i] > 0:
                    h = Attn(cfg, cfg.transformer_layers[i], name=f"down_{i}_attn_{j}")(h, context, ip_context)
                skips.append(h)
            if adapter_residuals is not None and i < len(adapter_residuals):
                # T2I-Adapter assist: per-level control features added to the
                # hidden states (reference adapter_assist, SDTrainer.py:1403)
                h = h + adapter_residuals[i].astype(h.dtype)
                skips[-1] = h
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D: symmetric (1,1) padding (XLA
                # 'SAME' at stride 2 would pad (0,1) — different alignment)
                h = Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                         dtype=dt, param_dtype=pdt, name=f"down_{i}_downsample")(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = Res(mid_ch, cfg, name="mid_res_0")(h, temb)
        h = Attn(cfg, max(cfg.transformer_layers[-1], 1), name="mid_attn")(h, context, ip_context)
        h = Res(mid_ch, cfg, name="mid_res_1")(h, temb)

        n_levels = len(cfg.block_out_channels)
        for i, ch in reversed(list(enumerate(cfg.block_out_channels))):
            res_idx = (n_levels - 1) - i
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                if cfg.free_u is not None and res_idx in (0, 1):
                    b1, b2, s1, s2 = cfg.free_u
                    bs, ss = (b1, s1) if res_idx == 0 else (b2, s2)
                    half = h.shape[-1] // 2
                    h = jnp.concatenate([h[..., :half] * bs, h[..., half:]], axis=-1)
                    skip = _fourier_filter(skip, 1, ss)
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(ch, cfg, name=f"up_{i}_res_{j}")(h, temb)
                if cfg.transformer_layers[i] > 0:
                    h = Attn(cfg, cfg.transformer_layers[i], name=f"up_{i}_attn_{j}")(h, context, ip_context)
            if i > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = Conv(cc, (3, 3), dtype=dt, param_dtype=pdt, name=f"up_{i}_upsample")(h)

        h = GroupNorm(32, eps=1e-5, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        return Conv(cfg.out_channels, (3, 3), dtype=dt, param_dtype=pdt, name="conv_out")(h)


def unet_partition_rules() -> list[PartitionRule]:
    return [
        PartitionRule(r"(attn1|attn2)_(q|k|v)/kernel", P("fsdp", "tp")),
        PartitionRule(r"(attn1|attn2)_out/kernel", P("tp", "fsdp")),
        PartitionRule(r"ff_in/kernel", P("fsdp", "tp")),
        PartitionRule(r"ff_out/kernel", P("tp", "fsdp")),
    ]


def unet_lora_key_map(lora_or_params: dict, num_levels: int = 4) -> dict[str, str]:
    """internal '/'-joined paths -> diffusers/kohya UNet module names
    (``down_blocks.i.attentions.j.transformer_blocks.k.attn1.to_q`` etc.)."""
    import re as _re

    from ai_toolkit_tpu.adapters.lora import lora_paths as _lp
    from ai_toolkit_tpu.models.flux_dit import _all_module_paths

    leaf_map = {
        "attn1_q": "attn1.to_q", "attn1_k": "attn1.to_k", "attn1_v": "attn1.to_v",
        "attn1_out": "attn1.to_out.0", "attn2_q": "attn2.to_q", "attn2_k": "attn2.to_k",
        "attn2_v": "attn2.to_v", "attn2_out": "attn2.to_out.0",
        "ff_in": "ff.net.0.proj", "ff_out": "ff.net.2",
    }

    def convert(p: str) -> str | None:
        m = _re.match(r"^down_(\d+)_res_(\d+)/(\w+)$", p)
        if m:
            return f"down_blocks.{m.group(1)}.resnets.{m.group(2)}.{m.group(3)}"
        m = _re.match(r"^up_(\d+)_res_(\d+)/(\w+)$", p)
        if m:
            return f"up_blocks.{num_levels - 1 - int(m.group(1))}.resnets.{m.group(2)}.{m.group(3)}"
        m = _re.match(r"^(down|up)_(\d+)_attn_(\d+)/(?:block_(\d+)/)?(\w+)$", p)
        if m:
            kind, i, j, k, leaf = m.groups()
            idx = int(i) if kind == "down" else num_levels - 1 - int(i)
            base = f"{kind}_blocks.{idx}.attentions.{j}"
            if k is None:
                return f"{base}.{leaf}"  # proj_in / proj_out
            return f"{base}.transformer_blocks.{k}.{leaf_map.get(leaf, leaf)}"
        m = _re.match(r"^mid_res_(\d+)/(\w+)$", p)
        if m:
            return f"mid_block.resnets.{m.group(1)}.{m.group(2)}"
        m = _re.match(r"^mid_attn/(?:block_(\d+)/)?(\w+)$", p)
        if m:
            k, leaf = m.groups()
            base = "mid_block.attentions.0"
            if k is None:
                return f"{base}.{leaf}"
            return f"{base}.transformer_blocks.{k}.{leaf_map.get(leaf, leaf)}"
        m = _re.match(r"^down_(\d+)_downsample$", p)
        if m:
            return f"down_blocks.{m.group(1)}.downsamplers.0.conv"
        m = _re.match(r"^up_(\d+)_upsample$", p)
        if m:
            return f"up_blocks.{num_levels - 1 - int(m.group(1))}.upsamplers.0.conv"
        simple = {
            "conv_in": "conv_in", "conv_out": "conv_out",
            "time_fc1": "time_embedding.linear_1", "time_fc2": "time_embedding.linear_2",
            "add_fc1": "add_embedding.linear_1", "add_fc2": "add_embedding.linear_2",
        }
        return simple.get(p)

    paths = ["/".join(p) for p in _lp(lora_or_params)] or _all_module_paths(lora_or_params)
    out = {}
    for p in paths:
        ext = convert(p)
        if ext:
            out[p] = ext
    return out


def unet_lora_targets() -> list[str]:
    """Default: attention + ff linears (kohya-style UNet LoRA targeting)."""
    return [r"attn\d_(q|k|v|out)$", r"ff_(in|out)$", r"proj_(in|out)$"]
