"""LTX-2 audio VAE (diffusers ``AutoencoderKLLTX2Audio``), NHWC.

The reference converts the Lightricks audio VAE 1:1 into diffusers (rename
map is empty except the latent statistics —
``convert_ltx2_to_diffusers.py:84-86, 693-752``), so the checkpoint keys are
the original taming/VQGAN-style tree: ``encoder.conv_in``,
``encoder.down.N.block.M.{norm?,conv1,conv2,nin_shortcut}``,
``encoder.down.N.downsample.conv``, ``encoder.mid.block_{1,2}``,
``encoder.conv_out``, mirrored ``decoder.up.N`` + ``upsample.conv``, and
``quant_conv``/``post_quant_conv``. Config (from the converter):
base 128, ch_mult (1,2,4), 2 res blocks, in/out 2 (stereo mel), latent 8,
``norm_type="pixel"`` (paramless pixel norm -> no norm weights in the
checkpoint), ``causality_axis="height"`` (the mel TIME axis is height;
convolutions pad causally along it), no mid attention, double_z.

Geometry: mel spectrograms [B, T, mel=64, 2] -> two 2x downsamples ->
latents [B, T/4, 16, 8]; the AV DiT packs them to [B, T/4, 128] tokens
(reference ``_pack_audio_latents``; 16*8 == audio_in_channels 128).

This is the DEFAULT ltx2_av audio path for checkpoint training (r3):
decoded mels go through ``models/ltx_vocoder.LTX2Vocoder`` (HiFiGAN-family,
landed r2) back to waveforms; weights import from the checkpoint's
``audio_vae/`` + ``vocoder/`` dirs. The 1D waveform VAE is opt-in via
``model_kwargs: {audio_vae: waveform}`` for from-scratch experiments.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


@dataclass(frozen=True)
class LTXAudioVAEConfig:
    in_channels: int = 2
    base_channels: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    latent_channels: int = 8
    mel_bins: int = 64
    sample_rate: int = 16000
    hop_length: int = 160
    causal: bool = True  # causal along the time (height) axis
    latents_mean: tuple[float, ...] | None = None
    latents_std: tuple[float, ...] | None = None
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def ltx2(cls) -> "LTXAudioVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LTXAudioVAEConfig":
        return cls(base_channels=8, ch_mult=(1, 2), num_res_blocks=1,
                   latent_channels=4, mel_bins=16)

    @property
    def time_downscale(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @property
    def downscale(self) -> int:
        """Waveform samples per audio latent token (mel hop x VAE temporal
        stride) — the mel-chain analog of AudioVAEConfig.downscale, so
        generation token-count math is backend-agnostic."""
        return self.hop_length * self.time_downscale


def _pixel_norm(x, eps=1e-6):
    """Paramless pixel norm over channels (norm_type='pixel')."""
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
            ).astype(x.dtype)


class CausalConv2d(nn.Module):
    """3x3 (or kxk) conv padding causally along H (time) when ``causal``."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    stride: tuple[int, int] = (1, 1)
    causal: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = kh - 1, (kw - 1) // 2
        if self.causal:
            pad_h = (ph, 0)
        else:
            pad_h = (ph // 2, ph - ph // 2)
        x = jnp.pad(x, ((0, 0), pad_h, (pw, pw), (0, 0)))
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class ResnetBlock(nn.Module):
    out_ch: int
    causal: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _pixel_norm(x)
        h = CausalConv2d(self.out_ch, causal=self.causal, dtype=self.dtype,
                         name="conv1")(nn.silu(h))
        h = _pixel_norm(h)
        h = CausalConv2d(self.out_ch, causal=self.causal, dtype=self.dtype,
                         name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AudioEncoder(nn.Module):
    cfg: LTXAudioVAEConfig

    @nn.compact
    def __call__(self, x):  # [B, T, mel, C]
        cfg = self.cfg
        ch = [cfg.base_channels * m for m in cfg.ch_mult]
        x = CausalConv2d(ch[0], causal=cfg.causal, dtype=cfg.dtype, name="conv_in")(x)
        for i in range(len(ch)):
            d = ch[i]
            for j in range(cfg.num_res_blocks):
                x = ResnetBlock(d, cfg.causal, cfg.dtype, name=f"down_{i}_block_{j}")(x)
            if i < len(ch) - 1:
                # taming Downsample: stride-2 conv, pad (right/bottom); the
                # causal axis pads in FRONT instead
                pad_h = (1, 0) if cfg.causal else (0, 1)
                x = jnp.pad(x, ((0, 0), pad_h, (0, 1), (0, 0)))
                x = nn.Conv(ch[i + 1], (3, 3), strides=(2, 2), padding="VALID",
                            dtype=cfg.dtype, name=f"down_{i}_downsample")(x)
        x = ResnetBlock(ch[-1], cfg.causal, cfg.dtype, name="mid_block_1")(x)
        x = ResnetBlock(ch[-1], cfg.causal, cfg.dtype, name="mid_block_2")(x)
        x = nn.silu(_pixel_norm(x))
        return CausalConv2d(2 * cfg.latent_channels, causal=cfg.causal,
                            dtype=cfg.dtype, name="conv_out")(x)


class AudioDecoder(nn.Module):
    cfg: LTXAudioVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = [cfg.base_channels * m for m in cfg.ch_mult]
        x = CausalConv2d(ch[-1], causal=cfg.causal, dtype=cfg.dtype, name="conv_in")(z)
        x = ResnetBlock(ch[-1], cfg.causal, cfg.dtype, name="mid_block_1")(x)
        x = ResnetBlock(ch[-1], cfg.causal, cfg.dtype, name="mid_block_2")(x)
        for i in reversed(range(len(ch))):
            for j in range(cfg.num_res_blocks + 1):
                x = ResnetBlock(ch[i], cfg.causal, cfg.dtype, name=f"up_{i}_block_{j}")(x)
            if i > 0:
                b, t, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * t, 2 * w, c), "nearest")
                if cfg.causal:
                    # causal: drop the look-ahead row introduced by upsampling
                    x = x[:, 1:]
                x = CausalConv2d(ch[i - 1], causal=cfg.causal, dtype=cfg.dtype,
                                 name=f"up_{i}_upsample")(x)
        x = nn.silu(_pixel_norm(x))
        return CausalConv2d(cfg.in_channels, causal=cfg.causal, dtype=cfg.dtype,
                            name="conv_out")(x)


class LTXAudioVAE(nn.Module):
    """encode: mel [B, T, mel, 2] -> normalized latents [B, T/4, mel/4, 8];
    decode inverts to mel space."""

    cfg: LTXAudioVAEConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = AudioEncoder(cfg, name="encoder")
        self.quant_conv = nn.Conv(2 * cfg.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1), name="post_quant_conv")
        self.decoder = AudioDecoder(cfg, name="decoder")

    def _stats(self):
        c = self.cfg.latent_channels
        mean = jnp.asarray(self.cfg.latents_mean or (0.0,) * c, jnp.float32)
        std = jnp.asarray(self.cfg.latents_std or (1.0,) * c, jnp.float32)
        return mean, std

    def encode(self, mel: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        moments = self.quant_conv(self.encoder(mel))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0))
            mean = mean + (std * jax.random.normal(rng, mean.shape)).astype(mean.dtype)
        lm, ls = self._stats()
        return ((mean.astype(jnp.float32) - lm) / ls).astype(mean.dtype)

    def raw_moments(self, mel: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(mel))

    def decode(self, z: jax.Array) -> jax.Array:
        lm, ls = self._stats()
        z = (z.astype(jnp.float32) * ls + lm).astype(z.dtype)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, mel: jax.Array) -> jax.Array:
        return self.decode(self.encode(mel))


def pack_audio_latents(z: jax.Array) -> jax.Array:
    """[B, T, mel_lat, C] -> [B, T, mel_lat*C] DiT tokens (reference
    ``_pack_audio_latents``)."""
    b, t, w, c = z.shape
    return z.reshape(b, t, w * c)


def unpack_audio_latents(tokens: jax.Array, mel_lat: int) -> jax.Array:
    b, t, d = tokens.shape
    return tokens.reshape(b, t, mel_lat, d // mel_lat)


def log_mel_jax(
    wav: jax.Array, sample_rate: int = 16000, n_fft: int = 1024,
    hop: int = 160, n_mels: int = 64,
) -> jax.Array:
    """Jit-able log-mel: [B, S, C] waveform -> [B, T, n_mels, C]."""
    s = wav.shape[1]
    n_frames = max(1, 1 + (s - n_fft) // hop)
    idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    fb = jnp.asarray(_mel_filterbank(sample_rate, n_fft, n_mels))
    frames = wav.astype(jnp.float32)[:, idx, :] * win[None, None, :, None]
    power = jnp.abs(jnp.fft.rfft(frames, axis=2)) ** 2  # [B, T, F, C]
    mel = jnp.einsum("btfc,mf->btmc", power, fb)
    return jnp.log(jnp.clip(mel, 1e-5, None))


def log_mel_spectrogram(
    wav: np.ndarray, sample_rate: int = 16000, n_fft: int = 1024,
    hop: int = 160, n_mels: int = 64,
) -> np.ndarray:
    """Host-side log-mel frontend: [S, C] waveform -> [T, n_mels, C].

    Slaney-style mel filterbank (librosa/torchaudio convention); exact
    parity with the reference's extractor is unverifiable offline and is
    noted in docs/PARITY.md."""
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        wav = wav[:, None]
    win = np.hanning(n_fft).astype(np.float32)
    n_frames = max(1, 1 + (len(wav) - n_fft) // hop)
    fb = _mel_filterbank(sample_rate, n_fft, n_mels)
    out = np.empty((n_frames, n_mels, wav.shape[1]), np.float32)
    idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
    for c in range(wav.shape[1]):
        frames = wav[:, c][idx] * win
        power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        out[..., c] = np.log(np.clip(power @ fb.T, 1e-5, None))
    return out


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb
