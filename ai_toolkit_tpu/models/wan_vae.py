"""Exact Wan 2.1 video VAE (diffusers ``AutoencoderKLWan``), NDHWC.

Checkpoint-exact reimplementation of the VAE the reference loads for every
wan-family arch (``/root/reference/toolkit/models/wan21/wan21.py:14`` imports
diffusers ``AutoencoderKLWan``; ``autoencoder_kl_wan.py`` there only adds
gradient checkpointing). Structure, parameter shapes, and numerics follow the
diffusers module tree (``encoder.down_blocks.N...``, ``decoder.up_blocks.I.
resnets.J...``) so real ``vae/diffusion_pytorch_model.safetensors`` files
import key-for-key (see ``io/video_vae_import.wan_vae_rules``).

TPU-first redesign of the *streaming* semantics: diffusers processes video in
frame chunks with per-conv feature caches (1 frame, then 4-frame chunks on
encode; single latent frames on decode). That chunked flow is exactly
equivalent to one full-sequence pass with the right causal handling, which is
what XLA wants (one big static-shape conv program, no Python chunk loop):

- every ``WanCausalConv3d`` = zero front-pad of ``2*pad_t`` frames (the
  2-frame cache reproduces exactly this);
- encoder ``downsample3d``   = frame 0 passes through, frames 1.. come from a
  stride-2 VALID temporal conv over the full stream (first chunk seeds the
  cache and is never temporally convolved);
- decoder ``upsample3d``     = frame 0 passes through (the "Rep" sentinel
  skips its time_conv), frames >=1 run the causal time_conv over the stream
  with frame 0 REPLACED by zeros (the "Rep" cache is a zero history), each
  output frame splitting its 2C channels into two interleaved frames.

Frame counts: encode T=4k+1 -> k+1 latent frames; decode inverts it.

Wan 2.2 (TI2V-5B) variant — diffusers ``AutoencoderKLWan`` with
``patch_size=2`` / ``is_residual=True`` / ``decoder_base_dim`` (the reference's
``wan22_5b`` arch loads it through the same class,
``extensions_built_in/diffusion_models/wan22/wan22_5b_model.py``):

- input video is spatially patchified 2x2 before ``conv_in`` (channel order
  ``(c r q)`` with q = H sub-index fastest) and unpatchified after the decoder;
- every down block gains a parameter-free ``AvgDown3D`` shortcut (grouped
  channel-mean over the space-time factor block, zero front-pad in time) and
  every upsampling up block a ``DupUp3D`` shortcut (repeat-interleave channels
  -> redistribute into space-time, first output frame dropped ``ft-1`` times);
- up-block resample convs keep full width (no ``dim//2`` halving) and the
  decoder trunk runs at ``decoder_base_dim``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

# Wan 2.1 per-channel latent statistics (diffusers AutoencoderKLWan config;
# overridden by the checkpoint's config.json at import time).
_WAN21_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
_WAN21_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple[float, ...] = ()
    temperal_downsample: tuple[bool, ...] = (False, True, True)
    latents_mean: tuple[float, ...] = _WAN21_LATENTS_MEAN
    latents_std: tuple[float, ...] = _WAN21_LATENTS_STD
    in_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    # wan 2.2 (TI2V-5B) options
    patch_size: int = 1
    is_residual: bool = False
    decoder_base_dim: int | None = None
    clip_output: bool = False

    @classmethod
    def wan21(cls) -> "WanVAEConfig":
        # diffusers clip_output default is True (2.2 configs set it False)
        return cls(clip_output=True)

    @classmethod
    def wan22_5b(cls) -> "WanVAEConfig":
        """Wan2.2-TI2V-5B VAE dims (checkpoint config.json supplies the 48-ch
        latent statistics at import time)."""
        return cls(
            base_dim=160, z_dim=48, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
            temperal_downsample=(False, True, True),
            latents_mean=(0.0,) * 48, latents_std=(1.0,) * 48,
            patch_size=2, is_residual=True, decoder_base_dim=256,
        )

    @classmethod
    def tiny(cls) -> "WanVAEConfig":
        return cls(
            base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            temperal_downsample=(True,),
            latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4, dtype=jnp.float32,
        )

    @classmethod
    def tiny22(cls) -> "WanVAEConfig":
        # last block keeps in==out (AvgDown3D needs in*factor % out == 0,
        # mirroring the real config's trailing repeated mult)
        return cls(
            base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
            temperal_downsample=(True, True),
            latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4, dtype=jnp.float32,
            patch_size=2, is_residual=True, decoder_base_dim=12,
        )

    # interface shared with the other VAE configs
    @property
    def latent_channels(self) -> int:
        return self.z_dim

    @property
    def spatial_downscale(self) -> int:
        return 2 ** (len(self.dim_mult) - 1) * self.patch_size

    @property
    def temporal_downscale(self) -> int:
        return 2 ** sum(self.temperal_downsample)

    @property
    def temperal_upsample(self) -> tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))


class WanCausalConv3d(nn.Module):
    """torch ``WanCausalConv3d``: Conv3d whose temporal padding is all on the
    left (``2*pad_t`` zero frames); spatial padding symmetric. Input NDHWC."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    stride: tuple[int, int, int] = (1, 1, 1)
    pad: tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        pt, ph, pw = self.pad
        x = jnp.pad(x, ((0, 0), (2 * pt, 0), (ph, ph), (pw, pw), (0, 0)))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.stride, padding="VALID", dimension_numbers=dn,
        )
        return y + bias.astype(self.dtype)


class WanRMSNorm(nn.Module):
    """torch ``WanRMS_norm``: F.normalize over channels * sqrt(dim) * gamma."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones_init(), (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
        y = x32 / jnp.maximum(norm, 1e-12) * (self.dim ** 0.5) * gamma
        return y.astype(x.dtype)


def vae_patchify(x: jax.Array, p: int) -> jax.Array:
    """[B,T,H,W,C] -> [B,T,H/p,W/p,C*p*p]; packed channel = (c*p + r)*p + q
    with q the H sub-index (torch rearrange ``(c r q)``)."""
    if p == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)          # [.., h,q, w,r, C]
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)                  # [.., h, w, C, r, q]
    return x.reshape(b, t, h // p, w // p, c * p * p)


def vae_unpatchify(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)                    # [.., C, r, q]
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)                  # [.., h, q, w, r, C]
    return x.reshape(b, t, h * p, w * p, c)


def _avg_down3d(x: jax.Array, out_c: int, ft: int, fs: int) -> jax.Array:
    """Parameter-free AvgDown3D: zero front-pad T to a multiple of ft, pack the
    (ft, fs, fs) factor block into channels (channel = ((c*ft+it)*fs+ih)*fs+iw),
    then grouped mean down to out_c channels."""
    b, t, h, w, c = x.shape
    pad_t = (-t) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t += pad_t
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)               # [.., C, it, ih, iw]
    x = x.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = (c * ft * fs * fs) // out_c
    x = x.reshape(*x.shape[:4], out_c, group)
    return jnp.mean(x.astype(jnp.float32), axis=-1).astype(x.dtype)


def _dup_up3d(x: jax.Array, out_c: int, ft: int, fs: int) -> jax.Array:
    """Parameter-free DupUp3D: repeat-interleave channels, redistribute the
    (ft, fs, fs) factor block into space-time, drop the leading ft-1 frames
    (full-sequence equivalent of the chunked flow's first_chunk trim)."""
    b, t, h, w, c = x.shape
    repeats = out_c * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)                   # [.., out_c*ft*fs*fs]
    x = x.reshape(b, t, h, w, out_c, ft, fs, fs)          # [.., C, it, ih, iw]
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)               # [b,t,it,h,ih,w,iw,C]
    x = x.reshape(b, t * ft, h * fs, w * fs, out_c)
    return x[:, ft - 1:] if ft > 1 else x


class WanResidualBlock(nn.Module):
    in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.in_dim != self.out_dim:
            h = WanCausalConv3d(self.out_dim, (1, 1, 1), pad=(0, 0, 0),
                                dtype=self.dtype, name="conv_shortcut")(x)
        else:
            h = x
        y = WanRMSNorm(self.in_dim, name="norm1")(x)
        y = WanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(nn.silu(y))
        y = WanRMSNorm(self.out_dim, name="norm2")(y)
        y = WanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(nn.silu(y))
        return y + h


class WanAttentionBlock(nn.Module):
    """Single-head per-frame spatial self-attention (qkv/proj are 1x1 convs
    in torch -> dense over channels here)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = WanRMSNorm(self.dim, name="norm")(x)
        y = y.reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 2, 1))
            / (c ** 0.5), axis=-1,
        )
        out = (attn @ v.astype(jnp.float32)).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return x + out.reshape(b, t, h, w, c)


class WanMidBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = WanResidualBlock(self.dim, self.dim, self.dtype, name="resnets_0")(x)
        x = WanAttentionBlock(self.dim, self.dtype, name="attentions_0")(x)
        x = WanResidualBlock(self.dim, self.dim, self.dtype, name="resnets_1")(x)
        return x


def _conv2d_per_frame(x, features, stride, padding, dtype, name):
    """Per-frame Conv2d by folding T into the batch (torch does the same
    permute/reshape in WanResample.forward)."""
    b, t, h, w, c = x.shape
    y = x.reshape(b * t, h, w, c)
    y = nn.Conv(features, (3, 3), strides=(stride, stride), padding=padding,
                dtype=dtype, name=name)(y)
    return y.reshape(b, t, *y.shape[1:])


class WanResample(nn.Module):
    dim: int
    mode: str  # upsample2d | upsample3d | downsample2d | downsample3d
    dtype: Dtype = jnp.float32
    # wan2.2 residual blocks keep full width on the upsample conv
    # (diffusers ``upsample_out_dim``); default None = dim // 2 (wan2.1)
    up_out: int | None = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.mode == "upsample3d":
            # frame 0 is never temporally convolved (the "Rep" first chunk);
            # the causal stream for frames >=1 has frame 0 zeroed out.
            stream = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, 1:]], axis=1)
            y = WanCausalConv3d(2 * c, (3, 1, 1), pad=(1, 0, 0),
                                dtype=self.dtype, name="time_conv")(stream)
            y = y[:, 1:]  # outputs for t >= 1
            y = y.reshape(b, t - 1, h, w, 2, c)
            y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), h, w, c)
            x = jnp.concatenate([x[:, :1].astype(y.dtype), y], axis=1)
            t = x.shape[1]
        if self.mode in ("upsample2d", "upsample3d"):
            # nearest-exact == nearest for integer 2x
            x = jax.image.resize(x, (b, t, 2 * h, 2 * w, c), "nearest")
            feats = self.dim // 2 if self.up_out is None else self.up_out
            x = _conv2d_per_frame(x, feats, 1, [(1, 1), (1, 1)],
                                  self.dtype, "resample_conv")
        elif self.mode in ("downsample2d", "downsample3d"):
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))  # ZeroPad2d (0,1,0,1)
            x = _conv2d_per_frame(x, self.dim, 2, "VALID", self.dtype, "resample_conv")
            if self.mode == "downsample3d":
                # frame 0 passes through; stride-2 temporal conv over the full
                # stream supplies frames 1.. (chunk 0 only seeds the cache)
                y = WanCausalConv3d(self.dim, (3, 1, 1), stride=(2, 1, 1), pad=(0, 0, 0),
                                    dtype=self.dtype, name="time_conv")(x)
                x = jnp.concatenate([x[:, :1].astype(y.dtype), y], axis=1)
        return x


class WanResidualDownBlock(nn.Module):
    """wan2.2 down block: resnets (+ optional resample) with a parameter-free
    AvgDown3D shortcut over the whole block (diffusers WanResidualDownBlock)."""

    in_dim: int
    out_dim: int
    num_res_blocks: int
    temporal_down: bool
    down_flag: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ft = 2 if self.temporal_down else 1
        fs = 2 if self.down_flag else 1
        shortcut = _avg_down3d(x, self.out_dim, ft, fs)
        d = self.in_dim
        for j in range(self.num_res_blocks):
            x = WanResidualBlock(d, self.out_dim, self.dtype, name=f"resnets_{j}")(x)
            d = self.out_dim
        if self.down_flag:
            mode = "downsample3d" if self.temporal_down else "downsample2d"
            x = WanResample(self.out_dim, mode, self.dtype, name="downsampler")(x)
        return x + shortcut


class WanResidualUpBlock(nn.Module):
    """wan2.2 up block: resnets (+ optional resample at full width) with a
    parameter-free DupUp3D shortcut (diffusers WanResidualUpBlock)."""

    in_dim: int
    out_dim: int
    num_res_blocks: int
    temporal_up: bool
    up_flag: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = None
        if self.up_flag:
            ft = 2 if self.temporal_up else 1
            shortcut = _dup_up3d(x, self.out_dim, ft, 2)
        d = self.in_dim
        for j in range(self.num_res_blocks + 1):
            x = WanResidualBlock(d, self.out_dim, self.dtype, name=f"resnets_{j}")(x)
            d = self.out_dim
        if self.up_flag:
            mode = "upsample3d" if self.temporal_up else "upsample2d"
            x = WanResample(self.out_dim, mode, self.dtype,
                            up_out=self.out_dim, name="upsampler")(x)
            x = x + shortcut
        return x


class WanEncoder3d(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
        scale = 1.0
        x = WanCausalConv3d(dims[0], dtype=cfg.dtype, name="conv_in")(x)
        bi = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            if cfg.is_residual:
                x = WanResidualDownBlock(
                    in_dim, out_dim, cfg.num_res_blocks,
                    temporal_down=(not last) and cfg.temperal_downsample[i],
                    down_flag=not last, dtype=cfg.dtype, name=f"down_blocks_{bi}",
                )(x)
                bi += 1
                continue
            for _ in range(cfg.num_res_blocks):
                x = WanResidualBlock(in_dim, out_dim, cfg.dtype, name=f"down_blocks_{bi}")(x)
                bi += 1
                if scale in cfg.attn_scales:
                    x = WanAttentionBlock(out_dim, cfg.dtype, name=f"down_blocks_{bi}")(x)
                    bi += 1
                in_dim = out_dim
            if not last:
                mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
                x = WanResample(out_dim, mode, cfg.dtype, name=f"down_blocks_{bi}")(x)
                bi += 1
                scale /= 2.0
        x = WanMidBlock(dims[-1], cfg.dtype, name="mid_block")(x)
        x = WanRMSNorm(dims[-1], name="norm_out")(x)
        return WanCausalConv3d(2 * cfg.z_dim, dtype=cfg.dtype, name="conv_out")(nn.silu(x))


class WanUpBlock(nn.Module):
    in_dim: int
    out_dim: int
    num_res_blocks: int
    upsample_mode: str | None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.in_dim
        for j in range(self.num_res_blocks + 1):
            x = WanResidualBlock(d, self.out_dim, self.dtype, name=f"resnets_{j}")(x)
            d = self.out_dim
        if self.upsample_mode is not None:
            x = WanResample(self.out_dim, self.upsample_mode, self.dtype,
                            name="upsamplers_0")(x)
        return x


class WanDecoder3d(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        base = cfg.decoder_base_dim or cfg.base_dim
        dims = [base * u
                for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
        ups = cfg.temperal_upsample
        x = WanCausalConv3d(dims[0], dtype=cfg.dtype, name="conv_in")(z)
        x = WanMidBlock(dims[0], cfg.dtype, name="mid_block")(x)
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            if cfg.is_residual:
                x = WanResidualUpBlock(
                    in_dim, out_dim, cfg.num_res_blocks,
                    temporal_up=(not last) and ups[i], up_flag=not last,
                    dtype=cfg.dtype, name=f"up_blocks_{i}",
                )(x)
                continue
            if i > 0:
                in_dim = in_dim // 2  # previous upsampler halved the channels
            mode = None
            if not last:
                mode = "upsample3d" if ups[i] else "upsample2d"
            x = WanUpBlock(in_dim, out_dim, cfg.num_res_blocks, mode, cfg.dtype,
                           name=f"up_blocks_{i}")(x)
        x = WanRMSNorm(x.shape[-1], name="norm_out")(x)
        out_c = cfg.in_channels * cfg.patch_size ** 2
        return WanCausalConv3d(out_c, dtype=cfg.dtype, name="conv_out")(nn.silu(x))


class WanVAE(nn.Module):
    """Full autoencoder; ``encode`` returns latents normalized by the config's
    per-channel mean/std (what the wan DiT trains on, wan21.py:286-294)."""

    cfg: WanVAEConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = WanEncoder3d(cfg, name="encoder")
        self.quant_conv = WanCausalConv3d(2 * cfg.z_dim, (1, 1, 1), pad=(0, 0, 0),
                                          dtype=cfg.dtype, name="quant_conv")
        self.post_quant_conv = WanCausalConv3d(cfg.z_dim, (1, 1, 1), pad=(0, 0, 0),
                                               dtype=cfg.dtype, name="post_quant_conv")
        self.decoder = WanDecoder3d(cfg, name="decoder")

    def _stats(self):
        mean = jnp.asarray(self.cfg.latents_mean, jnp.float32)
        std = jnp.asarray(self.cfg.latents_std, jnp.float32)
        return mean, std

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """x: [B, T, H, W, 3] in [-1, 1], T = 4k+1 -> [B, k+1, H/sd, W/sd, z]."""
        x = vae_patchify(x, self.cfg.patch_size)
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0))
            mean = mean + (std * jax.random.normal(rng, mean.shape)).astype(mean.dtype)
        lm, ls = self._stats()
        return ((mean.astype(jnp.float32) - lm) / ls).astype(mean.dtype)

    def raw_moments(self, x: jax.Array) -> jax.Array:
        """Unnormalized encoder moments [B, t, h, w, 2z] (golden tests)."""
        return self.quant_conv(self.encoder(vae_patchify(x, self.cfg.patch_size)))

    def decode(self, z: jax.Array) -> jax.Array:
        lm, ls = self._stats()
        z = (z.astype(jnp.float32) * ls + lm).astype(z.dtype)
        y = self.decoder(self.post_quant_conv(z))
        y = vae_unpatchify(y, self.cfg.patch_size)
        if self.cfg.clip_output:
            y = jnp.clip(y, -1.0, 1.0)
        return y

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
