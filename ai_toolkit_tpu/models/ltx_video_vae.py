"""LTX-2 video VAE (diffusers ``AutoencoderKLLTX2Video``), NDHWC.

Checkpoint-layout reimplementation of the VAE every ltx2-family arch ships
with. Derivation anchors (no diffusers in this env):

- the reference's converter config + original->diffusers rename map
  (``extensions_built_in/diffusion_models/ltx2/convert_ltx2_to_diffusers.py:
  522-660``): block_out_channels (256,512,1024,2048), layers_per_block
  (4,6,6,2,2) = 4 down blocks + mid, downsample_type (spatial, temporal,
  spatiotemporal, spatiotemporal), decoder (256,512,1024)/(5,5,5,5) with
  residual upsamplers, patch_size 4 / patch_size_t 1, latent 128,
  32x spatial / 8x temporal, encoder causal / decoder non-causal,
  decoder spatial padding reflect; key tree ``encoder.down_blocks.N.
  resnets.M...``, ``...downsamplers.0``, ``decoder.up_blocks.N.
  upsamplers.0`` (upsample-then-refine), top-level latents_mean/std;
- the LTX-Video family VAE semantics (space-to-depth downsample with
  grouped-mean residual, depth-to-space upsample with repeated residual and
  causal front-frame trim, replicate temporal padding, paramless RMS norms,
  pixel patchify in the encoder/decoder).

Frame counts: encode T=8k+1 -> k+1 latent frames (each temporal downsample
front-pads one replicated frame); decode trims stride-1 frames per upsample.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


@dataclass(frozen=True)
class LTXVideoVAEConfig:
    in_channels: int = 3
    latent_channels: int = 128
    block_out_channels: tuple[int, ...] = (256, 512, 1024, 2048)
    layers_per_block: tuple[int, ...] = (4, 6, 6, 2, 2)  # 4 down blocks + mid
    downsample_type: tuple[str, ...] = ("spatial", "temporal", "spatiotemporal", "spatiotemporal")
    # decoder lists in DECODE order: up block i upsamples then refines
    decoder_channels: tuple[int, ...] = (1024, 512, 256)  # upsampler INPUT channels
    decoder_layers: tuple[int, ...] = (5, 5, 5, 5)  # mid + up blocks
    upsample_type: tuple[str, ...] = ("spatiotemporal", "spatiotemporal", "spatiotemporal")
    upsample_residual: tuple[bool, ...] = (True, True, True)
    upsample_factor: tuple[int, ...] = (2, 2, 2)  # channel divisor per upsampler
    patch_size: int = 4
    patch_size_t: int = 1
    eps: float = 1e-6
    encoder_causal: bool = True
    decoder_causal: bool = False
    decoder_reflect_pad: bool = True
    latents_mean: tuple[float, ...] | None = None  # buffers from the checkpoint
    latents_std: tuple[float, ...] | None = None
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def ltx2(cls) -> "LTXVideoVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LTXVideoVAEConfig":
        return cls(
            latent_channels=4, block_out_channels=(8, 16), layers_per_block=(1, 1, 1),
            downsample_type=("spatiotemporal",),
            decoder_channels=(16,), decoder_layers=(1, 1),
            upsample_type=("spatiotemporal",), upsample_residual=(True,),
            upsample_factor=(2,), patch_size=2, dtype=jnp.float32,
        )

    @property
    def spatial_downscale(self) -> int:
        f = self.patch_size
        for t in self.downsample_type:
            if t in ("spatial", "spatiotemporal"):
                f *= 2
        return f

    @property
    def temporal_downscale(self) -> int:
        f = self.patch_size_t
        for t in self.downsample_type:
            if t in ("temporal", "spatiotemporal"):
                f *= 2
        return f


def _stride(kind: str) -> tuple[int, int, int]:
    return {"spatial": (1, 2, 2), "temporal": (2, 1, 1),
            "spatiotemporal": (2, 2, 2)}[kind]


class LTXCausalConv3d(nn.Module):
    """Conv3d with replicate temporal padding — all-left when causal, split
    when not — and zeros/reflect spatial padding (torch LTXVideoCausalConv3d)."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    stride: tuple[int, int, int] = (1, 1, 1)
    causal: bool = True
    reflect_pad: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        if kt > 1:
            if self.causal:
                pads = ((kt - 1, 0),)
            else:
                pads = (((kt - 1) // 2, (kt - 1) // 2),)
            x = jnp.pad(x, ((0, 0), pads[0], (0, 0), (0, 0), (0, 0)), mode="edge")
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if ph or pw:
            mode = "reflect" if self.reflect_pad else "constant"
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
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


def _rms_norm(x, eps):
    """Paramless RMSNorm over channels (elementwise_affine=False)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LTXResnetBlock3d(nn.Module):
    in_dim: int
    out_dim: int
    eps: float
    causal: bool
    reflect_pad: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _rms_norm(x, self.eps)
        h = LTXCausalConv3d(self.out_dim, causal=self.causal, reflect_pad=self.reflect_pad,
                            dtype=self.dtype, name="conv1")(nn.silu(h))
        h = _rms_norm(h, self.eps)
        h = LTXCausalConv3d(self.out_dim, causal=self.causal, reflect_pad=self.reflect_pad,
                            dtype=self.dtype, name="conv2")(nn.silu(h))
        if self.in_dim != self.out_dim:
            x = LTXCausalConv3d(self.out_dim, (1, 1, 1), causal=self.causal,
                                dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


def _space_to_depth(x, s):
    """NDHWC, channel-major block layout (c, pt, ph, pw) matching torch's
    ``b c (d p1) (h p2) (w p3) -> b (c p1 p2 p3) d h w`` rearrange."""
    b, t, h, w, c = x.shape
    st, sh, sw = s
    x = x.reshape(b, t // st, st, h // sh, sh, w // sw, sw, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b, t', h', w', c, st, sh, sw
    return x.reshape(b, t // st, h // sh, w // sw, c * st * sh * sw)


def _depth_to_space(x, s):
    b, t, h, w, c = x.shape
    st, sh, sw = s
    c_out = c // (st * sh * sw)
    x = x.reshape(b, t, h, w, c_out, st, sh, sw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, t, st, h, sh, w, sw, c'
    return x.reshape(b, t * st, h * sh, w * sw, c_out)


class LTXDownsampler3d(nn.Module):
    """Space-to-depth downsample with grouped-mean residual
    (LTX SpaceToDepthDownsample): conv at full res to out//prod channels,
    space-to-depth, plus the input space-to-depth'd and channel-group-meaned."""

    in_dim: int
    out_dim: int
    kind: str
    causal: bool
    reflect_pad: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = _stride(self.kind)
        prod = s[0] * s[1] * s[2]
        if s[0] > 1:
            # replicate the first frame so T=8k+1 streams stay aligned
            x = jnp.concatenate([x[:, :1]] * (s[0] - 1) + [x], axis=1)
        y = LTXCausalConv3d(self.out_dim // prod, causal=self.causal,
                            reflect_pad=self.reflect_pad, dtype=self.dtype,
                            name="conv")(x)
        y = _space_to_depth(y, s)
        res = _space_to_depth(x, s)  # [..., in*prod]
        group = (self.in_dim * prod) // self.out_dim
        res = res.reshape(*res.shape[:-1], self.out_dim, group).mean(axis=-1)
        return y + res.astype(y.dtype)


class LTXUpsampler3d(nn.Module):
    """Depth-to-space upsample (LTX DepthToSpaceUpsample): conv to
    in*prod/factor channels, depth-to-space (-> in/factor), trim the
    stride-1 leading frames; optional residual = depth-to-space(input)
    channel-repeated prod/factor times."""

    in_dim: int
    kind: str
    factor: int
    residual: bool
    causal: bool
    reflect_pad: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = _stride(self.kind)
        prod = s[0] * s[1] * s[2]
        y = LTXCausalConv3d(self.in_dim * prod // self.factor, causal=self.causal,
                            reflect_pad=self.reflect_pad, dtype=self.dtype,
                            name="conv")(x)
        y = _depth_to_space(y, s)
        y = y[:, s[0] - 1:]
        if self.residual:
            res = _depth_to_space(x, s)  # [..., in/prod]
            res = jnp.concatenate([res] * (prod // self.factor), axis=-1)
            y = y + res[:, s[0] - 1:].astype(y.dtype)
        return y


class LTXVideoEncoder3d(nn.Module):
    cfg: LTXVideoVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        p, pt = cfg.patch_size, cfg.patch_size_t
        x = _space_to_depth_patch(x, pt, p)
        ch = cfg.block_out_channels
        x = LTXCausalConv3d(ch[0], causal=cfg.encoder_causal, dtype=cfg.dtype,
                            name="conv_in")(x)
        for i, kind in enumerate(cfg.downsample_type):
            d = ch[i]
            for j in range(cfg.layers_per_block[i]):
                x = LTXResnetBlock3d(d, d, cfg.eps, cfg.encoder_causal, False,
                                     cfg.dtype, name=f"down_blocks_{i}_resnets_{j}")(x)
            out = ch[i + 1] if i + 1 < len(ch) else ch[-1]
            x = LTXDownsampler3d(d, out, kind, cfg.encoder_causal, False, cfg.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
        d = ch[-1]
        for j in range(cfg.layers_per_block[-1]):
            x = LTXResnetBlock3d(d, d, cfg.eps, cfg.encoder_causal, False,
                                 cfg.dtype, name=f"mid_block_resnets_{j}")(x)
        x = _rms_norm(x, cfg.eps)
        return LTXCausalConv3d(2 * cfg.latent_channels, causal=cfg.encoder_causal,
                               dtype=cfg.dtype, name="conv_out")(nn.silu(x))


class LTXVideoDecoder3d(nn.Module):
    cfg: LTXVideoVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        causal, refl = cfg.decoder_causal, cfg.decoder_reflect_pad
        d = cfg.decoder_channels[0]
        x = LTXCausalConv3d(d, causal=causal, reflect_pad=refl, dtype=cfg.dtype,
                            name="conv_in")(z)
        for j in range(cfg.decoder_layers[0]):
            x = LTXResnetBlock3d(d, d, cfg.eps, causal, refl, cfg.dtype,
                                 name=f"mid_block_resnets_{j}")(x)
        for i, kind in enumerate(cfg.upsample_type):
            din = cfg.decoder_channels[i]
            x = LTXUpsampler3d(din, kind, cfg.upsample_factor[i],
                               cfg.upsample_residual[i], causal, refl, cfg.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(x)
            d = din // cfg.upsample_factor[i]
            for j in range(cfg.decoder_layers[i + 1]):
                x = LTXResnetBlock3d(d, d, cfg.eps, causal, refl, cfg.dtype,
                                     name=f"up_blocks_{i}_resnets_{j}")(x)
        x = _rms_norm(x, cfg.eps)
        x = LTXCausalConv3d(cfg.in_channels * cfg.patch_size_t * cfg.patch_size ** 2,
                            causal=causal, reflect_pad=refl, dtype=cfg.dtype,
                            name="conv_out")(nn.silu(x))
        return _depth_to_space_patch(x, cfg.patch_size_t, cfg.patch_size)


def _space_to_depth_patch(x, pt, p):
    """Pixel patchify with torch's (c, pt, ph, pw) channel-major order
    (LTXVideoEncoder3d permute(0,1,3,5,7,2,4,6))."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pt, pt, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // pt, h // p, w // p, c * pt * p * p)


def _depth_to_space_patch(x, pt, p):
    b, t, h, w, c = x.shape
    c_out = c // (pt * p * p)
    x = x.reshape(b, t, h, w, c_out, pt, p, p)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * pt, h * p, w * p, c_out)


class LTXVideoVAE(nn.Module):
    """encode: [B, T, H, W, 3] (T = 8k+1) -> normalized latents
    [B, k+1, H/32, W/32, 128]; decode inverts. Latent normalization uses the
    checkpoint's top-level latents_mean/std buffers ((z-mean)/std, reference
    ltx2.py:594-601)."""

    cfg: LTXVideoVAEConfig

    def setup(self):
        self.encoder = LTXVideoEncoder3d(self.cfg, name="encoder")
        self.decoder = LTXVideoDecoder3d(self.cfg, name="decoder")

    def _stats(self):
        c = self.cfg.latent_channels
        mean = jnp.asarray(self.cfg.latents_mean or (0.0,) * c, jnp.float32)
        std = jnp.asarray(self.cfg.latents_std or (1.0,) * c, jnp.float32)
        return mean, std

    def encode(self, x: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0))
            mean = mean + (std * jax.random.normal(rng, mean.shape)).astype(mean.dtype)
        lm, ls = self._stats()
        return ((mean.astype(jnp.float32) - lm) / ls).astype(mean.dtype)

    def raw_moments(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        lm, ls = self._stats()
        z = (z.astype(jnp.float32) * ls + lm).astype(z.dtype)
        return self.decoder(z)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
