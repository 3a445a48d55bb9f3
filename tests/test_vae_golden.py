"""VAE golden numerics: Flax AutoencoderKL vs a hand-written torch mirror.

diffusers is not installed in this offline env, so the torch side is a
hand-written mirror of diffusers' ``AutoencoderKL`` (same module tree and
state-dict key names — ``encoder.down_blocks.N.resnets.M...`` — so the real
``vae_rules`` import path is exercised end-to-end). This pins the NCHW→NHWC
conv transposes, GroupNorm grouping/eps, asymmetric downsample padding,
nearest upsample, and the single-head mid attention against an independent
torch implementation (reference uses diffusers AutoencoderKL for every SD
family model: toolkit/models/base_model.py encode_images/decode_latents).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.sd_import import vae_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402


def _gn(c):
    return nn.GroupNorm(min(32, c), c, eps=1e-6)


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttention(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = _gn(c)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)  # [B, HW, C]
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) / (c ** 0.5), dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.transpose(1, 2).reshape(b, c, h, w)


class TMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = nn.ModuleList([TAttention(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TDown(nn.Module):
    def __init__(self, cin, cout, layers, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(layers)]
        )
        self.downsamplers = (
            nn.ModuleList([nn.Module()]) if downsample else None
        )
        if downsample:
            self.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, stride=2)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class TUp(nn.Module):
    def __init__(self, cin, cout, layers, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(layers)]
        )
        self.upsamplers = nn.ModuleList([nn.Module()]) if upsample else None
        if upsample:
            self.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = [cfg.base_channels * m for m in cfg.channel_multipliers]
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        for i, ch in enumerate(chans):
            cin = chans[i - 1] if i else chans[0]
            self.down_blocks.append(
                TDown(cin, ch, cfg.layers_per_block, i < len(chans) - 1)
            )
        self.mid_block = TMid(chans[-1])
        self.conv_norm_out = _gn(chans[-1])
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(torch.nn.functional.silu(self.conv_norm_out(x)))


class TDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = [cfg.base_channels * m for m in reversed(cfg.channel_multipliers)]
        self.conv_in = nn.Conv2d(cfg.latent_channels, chans[0], 3, padding=1)
        self.mid_block = TMid(chans[0])
        self.up_blocks = nn.ModuleList()
        for i, ch in enumerate(chans):
            cin = chans[i - 1] if i else chans[0]
            self.up_blocks.append(
                TUp(cin, ch, cfg.layers_per_block + 1, i < len(chans) - 1)
            )
        self.conv_norm_out = _gn(chans[-1])
        self.conv_out = nn.Conv2d(chans[-1], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for blk in self.up_blocks:
            z = blk(z)
        return self.conv_out(torch.nn.functional.silu(self.conv_norm_out(z)))


class TAutoencoderKL(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        if cfg.use_quant_conv:
            self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
            self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)


@pytest.fixture(scope="module")
def vae_pair():
    cfg = VAEConfig(base_channels=16, channel_multipliers=(1, 2), layers_per_block=1,
                    latent_channels=4, use_quant_conv=True, dtype=jnp.float32)
    torch.manual_seed(0)
    tm = TAutoencoderKL(cfg).eval()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(
        flat, vae_rules(len(cfg.channel_multipliers), cfg.layers_per_block)
    )
    assert not unmatched, f"unmapped torch keys: {unmatched[:8]}"
    ours = AutoencoderKL(cfg)
    return cfg, tm, ours, tree


def test_vae_encoder_matches_torch_mirror(vae_pair):
    cfg, tm, ours, tree = vae_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm.quant_conv(tm.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    out = ours.apply({"params": tree}, jnp.asarray(x), method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=2e-5
    )


def test_vae_decoder_matches_torch_mirror(vae_pair):
    cfg, tm, ours, tree = vae_pair
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 8, 8, cfg.latent_channels)).astype(np.float32)
    zs = (z - cfg.shift_factor) * cfg.scaling_factor  # ours expects scaled latents
    with torch.no_grad():
        ref = tm.decoder(tm.post_quant_conv(torch.from_numpy(z.transpose(0, 3, 1, 2))))
    out = ours.apply({"params": tree}, jnp.asarray(zs), method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=5e-5, rtol=5e-5
    )
