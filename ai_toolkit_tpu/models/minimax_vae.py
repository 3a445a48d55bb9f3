"""MiniMax-H3 video VAE — causal 3D-CNN encoder + 36-layer ViT decoder.

Parity target: ``extensions_built_in/diffusion_models/minimax_h3/src/vae.py``
(MiniMaxH3VideoVAE: 16x spatial / 4x temporal, 24 latent channels; encoder =
CausalConv3d stack (reflect spatial pad, front-only temporal zeros) with
per-frame GroupNorm; decoder = one token per latent voxel + 4 learned
register tokens + 1 zero token, 3-axis rope over [-1,1)-normalized coords
x 2π on the leading 75% of head channels, per-head-interleaved fused QKV,
affine-less fp32 RMS q/k norms, gated-SiLU FF, zero-init residual scales;
ImageNet pixel normalization inside encode/decode which speak [-1, 1];
17-frame encoder chunks with 3 trailing latents dropped (17n+5 frames <->
5n+2 latents), decode in 5-token chunks with 2-token overlap cross-faded
over 5 pixel frames; per-channel latents_mean/std normalization; fp32
islands: token embedder, output norm + projection, rope angles).

TPU-first deviations (documented, numerics-neutral or better):
- NTHWC layout (channels-last) throughout; importers transpose.
- No spatial tiling: the reference tiles at 256 px to fit GPU memory and
  linearly blends seams; whole-frame encode/decode is the same math without
  seam blending. (Tiling only changes pixels near seams.)
- Temporal chunk loops are static Python over the (static) frame count.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class MiniMaxVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 24
    block_out_channels: tuple[int, ...] = (128, 256, 256, 512, 512, 1024)
    layers_per_block: int = 2
    space_down: tuple[int, ...] = (2, 2, 2, 2, 1, 1)
    time_down: tuple[int, ...] = (1, 2, 2, 1, 1, 1)
    norm_num_groups: int = 32
    decoder_num_layers: int = 36
    decoder_heads: int = 32
    decoder_head_dim: int = 64
    decoder_num_register_tokens: int = 4
    decoder_ffn_mult: int = 4
    rope_theta: float = 100.0
    rope_dim_ratio: float = 0.75
    clip_length: int = 17
    token_drop: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def spatial_downscale(self) -> int:
        return int(np.prod(self.space_down))

    @property
    def temporal_downscale(self) -> int:
        return int(np.prod(self.time_down))

    @property
    def z_dim(self) -> int:
        return self.latent_channels

    @classmethod
    def tiny(cls) -> "MiniMaxVAEConfig":
        return cls(latent_channels=4,
                   block_out_channels=(8, 16), layers_per_block=1,
                   space_down=(2, 2), time_down=(2, 2), norm_num_groups=4,
                   decoder_num_layers=2, decoder_heads=2, decoder_head_dim=8,
                   clip_length=17, token_drop=3)


def _causal_conv3d(x, kernel, bias, stride=(1, 1, 1), spatial_pad=0,
                   pre_spatial_pad_br=False):
    """CausalConv3d (vae.py:92-109): reflect spatial pad, front-only temporal
    zeros of kt-1, VALID conv. x: [B, T, H, W, C]; kernel [kt,kh,kw,in,out].
    ``pre_spatial_pad_br``: Downsample3d's bottom/right reflect pad of 1."""
    if pre_spatial_pad_br:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)), mode="reflect")
    if spatial_pad > 0:
        p = spatial_pad
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    t_pad = kernel.shape[0] - 1
    if t_pad > 0:
        x = jnp.pad(x, ((0, 0), (t_pad, 0), (0, 0), (0, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride, padding="VALID",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    return out + bias.astype(x.dtype)


class CausalConv3d(nn.Module):
    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    stride: tuple[int, int, int] = (1, 1, 1)
    spatial_pad: int = 0
    pre_spatial_pad_br: bool = False

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kt, kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return _causal_conv3d(x, kernel, bias, self.stride, self.spatial_pad,
                              self.pre_spatial_pad_br)


class FrameGroupNorm(nn.Module):
    """GroupNorm with per-frame statistics (vae.py FrameGroupNorm)."""

    groups: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c)
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=jnp.float32, name="gn")(y)
        return y.reshape(b, t, h, w, c).astype(x.dtype)


class ResnetBlock3d(nn.Module):
    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, x):
        h = FrameGroupNorm(self.groups, name="norm1")(x)
        h = CausalConv3d(self.out_channels, spatial_pad=1, name="conv1")(nn.silu(h))
        h = FrameGroupNorm(self.groups, name="norm2")(h)
        h = CausalConv3d(self.out_channels, spatial_pad=1, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = CausalConv3d(self.out_channels, kernel_size=(1, 1, 1),
                             name="nin_shortcut")(x)
        return x + h


class Encoder3d(nn.Module):
    cfg: MiniMaxVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = CausalConv3d(cfg.block_out_channels[0], spatial_pad=1,
                         name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock3d(ch, cfg.norm_num_groups,
                                  name=f"down_{i}_block_{j}")(h)
            ts, ss = cfg.time_down[i], cfg.space_down[i]
            if ts * ss > 1:
                h = CausalConv3d(ch, stride=(ts, ss, ss),
                                 pre_spatial_pad_br=ss == 2,
                                 name=f"down_{i}_downsample")(h)
        h = FrameGroupNorm(cfg.norm_num_groups, name="norm_out")(h)
        return CausalConv3d(2 * cfg.latent_channels, spatial_pad=1,
                            name="conv_out")(nn.silu(h))


def _rms_noaffine(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


class ViTBlock(nn.Module):
    cfg: MiniMaxVAEConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg = self.cfg
        nh, hd = cfg.decoder_heads, cfg.decoder_head_dim
        dim = nh * hd
        b, s, _ = x.shape

        def rms_affine(y, name):
            scale = self.param(name, nn.initializers.ones_init(), (dim,), jnp.float32)
            return (_rms_noaffine(y.astype(jnp.float32))
                    * scale).astype(y.dtype)

        h = rms_affine(x, "norm1")
        qkv = nn.Dense(3 * dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                       name="to_qkv")(h)
        # per-head-interleaved layout: each head's slab is [q | k | v]
        qkv = qkv.reshape(b, s, nh, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_noaffine(q)
        k = _rms_noaffine(k)

        def rope(y):
            rot = cos.shape[-1]
            y_rot, y_pass = y[..., :rot], y[..., rot:]
            half = rot // 2
            y1, y2 = y_rot[..., :half], y_rot[..., half:]
            rotated = jnp.concatenate([-y2, y1], axis=-1)
            c = cos.astype(y.dtype)
            sn = sin.astype(y.dtype)
            return jnp.concatenate([y_rot * c + rotated * sn, y_pass], axis=-1)

        q, k = rope(q), rope(k)
        from ai_toolkit_tpu.ops.attention import dot_product_attention

        attn = dot_product_attention(q, k, v).reshape(b, s, dim)
        attn = nn.Dense(dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                        name="to_out")(attn)
        scale1 = self.param("scale1", nn.initializers.zeros_init(), (dim,),
                            jnp.float32)
        x = x + attn * scale1.astype(attn.dtype)

        h = rms_affine(x, "norm2")
        fused = nn.Dense(2 * dim * cfg.decoder_ffn_mult, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="w1")(h)
        gate, val = jnp.split(fused, 2, axis=-1)
        ff = nn.Dense(dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                      name="w2")(nn.silu(gate) * val)
        scale2 = self.param("scale2", nn.initializers.zeros_init(), (dim,),
                            jnp.float32)
        return x + ff * scale2.astype(ff.dtype)


class ViTDecoder3d(nn.Module):
    cfg: MiniMaxVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        nh, hd = cfg.decoder_heads, cfg.decoder_head_dim
        dim = nh * hd
        b, t, h, w, c = z.shape
        tokens = z.reshape(b, t * h * w, c)

        # fp32 islands: token embedder + final norm/proj
        x = nn.Dense(dim, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="x_embedder")(tokens.astype(jnp.float32))
        x = x.astype(cfg.dtype)
        n_patches = x.shape[1]
        regs = self.param("register_tokens", nn.initializers.zeros_init(),
                          (1, cfg.decoder_num_register_tokens, dim), jnp.float32)
        # kept for checkpoint parity; unused at inference (vae.py mask_token)
        self.param("mask_token", nn.initializers.zeros_init(), (1, 1, dim),
                   jnp.float32)
        x = jnp.concatenate([
            x, jnp.broadcast_to(regs.astype(x.dtype), (b, regs.shape[1], dim)),
            jnp.zeros((b, 1, dim), x.dtype),
        ], axis=1)

        rot_dim = int(hd * cfg.rope_dim_ratio)
        inv_freq = 1.0 / cfg.rope_theta ** np.arange(0, 1, 2 * 3 / rot_dim,
                                                     dtype=np.float32)
        grids = [2.0 * ((np.arange(size, dtype=np.float32) + 0.5) / size) - 1.0
                 for size in (t, h, w)]
        tt, hh2, ww2 = np.meshgrid(*grids, indexing="ij")
        pos = np.stack([tt.reshape(-1), hh2.reshape(-1), ww2.reshape(-1)], -1)
        pos = np.concatenate(
            [pos, np.zeros((cfg.decoder_num_register_tokens + 1, 3), np.float32)])
        ang = 2.0 * math.pi * pos[:, :, None] * inv_freq[None, None, :]
        ang = ang.reshape(pos.shape[0], -1)
        ang = np.tile(ang, 2)  # [a | a]
        cos = jnp.asarray(np.cos(ang))[None, :, None, :]
        sin = jnp.asarray(np.sin(ang))[None, :, None, :]

        for i in range(cfg.decoder_num_layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x, cos, sin)

        xf = x.astype(jnp.float32)
        xf = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="norm_out")(xf)
        pt, ps = cfg.temporal_downscale, cfg.spatial_downscale
        out = nn.Dense(cfg.out_channels * pt * ps * ps, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="proj_out")(xf)
        out = out[:, :n_patches]

        out = out.reshape(b, t, h, w, cfg.out_channels, pt, ps, ps)
        out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        return out.reshape(b, t * pt, h * ps, w * ps, cfg.out_channels)


def _blend_frames(a, b_, extent):
    """Cross-fade the trailing `extent` frames of a into the leading frames
    of b_ (vae.py _blend along the temporal axis, NTHWC axis 1)."""
    extent = min(a.shape[1], b_.shape[1], extent)
    wgt = (jnp.arange(extent, dtype=b_.dtype) / extent)[None, :, None, None, None]
    blended = a[:, -extent:] * (1 - wgt) + b_[:, :extent] * wgt
    if extent == b_.shape[1]:
        return blended
    return jnp.concatenate([blended, b_[:, extent:]], axis=1)


class MiniMaxVideoVAE(nn.Module):
    """Public interface mirrors vae.py: encode/decode speak [-1, 1] NTHWC,
    latents are per-channel normalized; 17n+5 frames <-> 5n+2 latents, or a
    single keyframe frame."""

    cfg: MiniMaxVAEConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder3d(cfg)
        self.decoder = ViTDecoder3d(cfg)
        self.quant_conv = CausalConv3d(2 * cfg.latent_channels,
                                       kernel_size=(1, 1, 1))
        self.post_quant_conv = CausalConv3d(cfg.latent_channels,
                                            kernel_size=(1, 1, 1))
        # checkpoint-shipped statistics; imported, not trained
        self.latents_mean = self.param(
            "latents_mean", nn.initializers.zeros_init(),
            (cfg.latent_channels,), jnp.float32)
        self.latents_std = self.param(
            "latents_std", nn.initializers.ones_init(),
            (cfg.latent_channels,), jnp.float32)

    def __call__(self, x, rng=None):
        lat = self.encode(x, rng)
        return self.decode(lat)

    # -- temporal chunking (static loops) ---------------------------------

    def _encode_video(self, x):
        cfg = self.cfg
        cl = cfg.clip_length
        if x.shape[1] % cl != 0:
            pad = jnp.repeat(x[:, -1:], (-x.shape[1]) % cl, axis=1)
            x = jnp.concatenate([x, pad], axis=1)
        moments = jnp.concatenate([
            self.quant_conv(self.encoder(x[:, i * cl:(i + 1) * cl]))
            for i in range(x.shape[1] // cl)
        ], axis=1)
        if cfg.token_drop > 0:
            moments = moments[:, :-cfg.token_drop]
        return moments

    def _decode_video(self, z):
        cfg = self.cfg
        ratio_t = cfg.temporal_downscale
        tcs = math.ceil(cfg.clip_length / ratio_t)
        token_overlap = (-cfg.token_drop) % tcs
        frame_pre_padding = (-cfg.clip_length) % ratio_t
        frame_overlap = max(token_overlap * ratio_t - frame_pre_padding, 0)
        chunk_frames = tcs * ratio_t
        split_count = 2 if cfg.token_drop > 0 else 1

        num_tokens = z.shape[1] + cfg.token_drop
        pad_tokens = (-num_tokens) % tcs
        num_chunks = (num_tokens + pad_tokens) // tcs - (split_count - 1)
        if num_chunks < 1:
            pad_tokens += tcs
            num_chunks += 1
        z_before_pad = z.shape[1] + pad_tokens  # matches ref's padded z length
        if pad_tokens > 0:
            z = jnp.concatenate(
                [z, jnp.repeat(z[:, -1:], pad_tokens, axis=1)], axis=1)

        decoded = []
        overlap = None
        for i in range(num_chunks):
            start = i * tcs
            clip = self.decoder(
                self.post_quant_conv(z[:, start: start + tcs + token_overlap]))
            for j in range(split_count):
                part = clip[:, j * chunk_frames:(j + 1) * chunk_frames]
                part = part[:, frame_pre_padding:]
                if j == 0:
                    if overlap is not None:
                        part = _blend_frames(overlap, part, frame_overlap)
                    decoded.append(part)
                else:
                    overlap = part
        if overlap is not None:
            decoded.append(overlap)
        dec = jnp.concatenate(decoded, axis=1)

        if pad_tokens > 0:
            intra_tail = cfg.clip_length % ratio_t
            before_pad = z_before_pad - pad_tokens
            pad_frames = sum(
                intra_tail if intra_tail and (before_pad + k) % tcs == 0
                else ratio_t
                for k in range(pad_tokens))
            dec = dec[:, :-pad_frames]
        return dec

    # -- public interface ---------------------------------------------------

    def encode(self, pixels, rng=None, sample: bool = True,
               fp16_round: bool = False):
        """pixels [B, T, H, W, 3] in [-1, 1], T == 17n+5 or 1. Returns
        normalized latents [B, t, h, w, latent_channels]."""
        cfg = self.cfg
        x = (pixels.astype(jnp.float32) + 1.0) * 0.5
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = x.astype(cfg.dtype)

        if x.shape[1] == 1:
            moments = self.quant_conv(self.encoder(x))[:, -1:]
        else:
            moments = self._encode_video(x)

        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        if sample and rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = mean + std * jax.random.normal(rng, mean.shape, jnp.float32)
        else:
            z = mean
        if fp16_round:
            z = z.astype(jnp.float16).astype(jnp.float32)
        return (z - self.latents_mean) / self.latents_std

    def decode(self, latents):
        """Normalized latents [B, t, h, w, C] -> pixels [B, T, H, W, 3]."""
        z = (latents.astype(jnp.float32) * self.latents_std
             + self.latents_mean).astype(self.cfg.dtype)
        if z.shape[1] == 1:
            # lone temporal token is OOD for the chunk-trained decoder
            # (vae.py:795-805): decode as the first latent of a 2-latent clip
            dec = self._decode_video(jnp.concatenate([z, z], axis=1))[:, :1]
        else:
            dec = self._decode_video(z)
        dec = (dec.astype(jnp.float32) * jnp.asarray(IMAGENET_STD)
               + jnp.asarray(IMAGENET_MEAN))
        return jnp.clip(dec, 0.0, 1.0) * 2.0 - 1.0
