"""LTX-2 video VAE golden numerics: flax LTXVideoVAE vs a torch mirror.

The torch side follows the diffusers ``AutoencoderKLLTX2Video`` module tree
(key names per the reference converter's rename target,
``convert_ltx2_to_diffusers.py:48-76``) and the LTX-family op semantics:
replicate temporal padding (causal encoder / symmetric decoder), reflect
spatial padding in the decoder, paramless RMS norms, space-to-depth
downsamplers with grouped-mean residuals, depth-to-space upsamplers with
channel-repeated residuals and leading-frame trims, and pixel patchify.
Pins the NCDHW->NDHWC transposes, channel-major block orders, and the
8k+1 frame arithmetic against an independent torch implementation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.io.video_vae_import import ltx_video_vae_rules  # noqa: E402
from ai_toolkit_tpu.models.ltx_video_vae import (  # noqa: E402
    LTXVideoVAE,
    LTXVideoVAEConfig,
)


def _stride(kind):
    return {"spatial": (1, 2, 2), "temporal": (2, 1, 1),
            "spatiotemporal": (2, 2, 2)}[kind]


class TConv(nn.Module):
    """LTXVideoCausalConv3d: replicate temporal pad + spatially padded conv."""

    def __init__(self, cin, cout, k=3, causal=True, reflect=False):
        super().__init__()
        k = (k, k, k) if isinstance(k, int) else k
        self.k, self.causal, self.reflect = k, causal, reflect
        self.conv = nn.Conv3d(cin, cout, k)

    def forward(self, x):
        kt, kh, kw = self.k
        if kt > 1:
            if self.causal:
                x = torch.cat([x[:, :, :1].repeat(1, 1, kt - 1, 1, 1), x], dim=2)
            else:
                p = (kt - 1) // 2
                x = torch.cat([x[:, :, :1].repeat(1, 1, p, 1, 1), x,
                               x[:, :, -1:].repeat(1, 1, p, 1, 1)], dim=2)
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if ph or pw:
            x = F.pad(x, (pw, pw, ph, ph, 0, 0),
                      mode="reflect" if self.reflect else "constant")
        return self.conv(x)


def _rms(x, eps=1e-6):
    # channels-first RMS over dim 1, no affine
    var = x.pow(2).mean(dim=1, keepdim=True)
    return x * torch.rsqrt(var + eps)


class TRes(nn.Module):
    def __init__(self, cin, cout, causal, reflect):
        super().__init__()
        self.conv1 = TConv(cin, cout, 3, causal, reflect)
        self.conv2 = TConv(cout, cout, 3, causal, reflect)
        self.conv_shortcut = TConv(cin, cout, (1, 1, 1), causal) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(_rms(x)))
        h = self.conv2(F.silu(_rms(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def s2d(x, s):
    b, c, t, h, w = x.shape
    st, sh, sw = s
    x = x.reshape(b, c, t // st, st, h // sh, sh, w // sw, sw)
    return x.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, c * st * sh * sw, t // st, h // sh, w // sw)


def d2s(x, s):
    b, c, t, h, w = x.shape
    st, sh, sw = s
    c2 = c // (st * sh * sw)
    x = x.reshape(b, c2, st, sh, sw, t, h, w)
    return x.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(b, c2, t * st, h * sh, w * sw)


class TDown(nn.Module):
    def __init__(self, cin, cout, kind, causal):
        super().__init__()
        self.s = _stride(kind)
        prod = self.s[0] * self.s[1] * self.s[2]
        self.group = cin * prod // cout
        self.cout = cout
        self.conv = TConv(cin, cout // prod, 3, causal)

    def forward(self, x):
        if self.s[0] > 1:
            x = torch.cat([x[:, :, :1].repeat(1, 1, self.s[0] - 1, 1, 1), x], dim=2)
        y = s2d(self.conv(x), self.s)
        res = s2d(x, self.s).unflatten(1, (self.cout, self.group)).mean(2)
        return y + res


class TUp(nn.Module):
    def __init__(self, cin, kind, factor, residual, causal, reflect):
        super().__init__()
        self.s = _stride(kind)
        prod = self.s[0] * self.s[1] * self.s[2]
        self.factor, self.residual, self.prod = factor, residual, prod
        self.conv = TConv(cin, cin * prod // factor, 3, causal, reflect)

    def forward(self, x):
        y = d2s(self.conv(x), self.s)[:, :, self.s[0] - 1:]
        if self.residual:
            res = d2s(x, self.s).repeat(1, self.prod // self.factor, 1, 1, 1)
            y = y + res[:, :, self.s[0] - 1:]
        return y


class TEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        self.p, self.pt = cfg.patch_size, cfg.patch_size_t
        self.conv_in = TConv(3 * self.pt * self.p * self.p, ch[0], 3, True)
        self.down_blocks = nn.ModuleList()
        for i, kind in enumerate(cfg.downsample_type):
            d = ch[i]
            out = ch[i + 1] if i + 1 < len(ch) else ch[-1]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TRes(d, d, True, False) for _ in range(cfg.layers_per_block[i])])
            blk.downsamplers = nn.ModuleList([TDown(d, out, kind, True)])
            self.down_blocks.append(blk)
        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [TRes(ch[-1], ch[-1], True, False) for _ in range(cfg.layers_per_block[-1])])
        self.mid_block = mid
        self.conv_out = TConv(ch[-1], 2 * cfg.latent_channels, 3, True)

    def forward(self, x):
        b, c, t, h, w = x.shape
        p, pt = self.p, self.pt
        x = x.reshape(b, c, t // pt, pt, h // p, p, w // p, p)
        x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).flatten(1, 4)
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                x = r(x)
            x = blk.downsamplers[0](x)
        for r in self.mid_block.resnets:
            x = r(x)
        return self.conv_out(F.silu(_rms(x)))


class TDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        causal, refl = cfg.decoder_causal, cfg.decoder_reflect_pad
        self.p, self.pt = cfg.patch_size, cfg.patch_size_t
        d0 = cfg.decoder_channels[0]
        self.conv_in = TConv(cfg.latent_channels, d0, 3, causal, refl)
        mid = nn.Module()
        mid.resnets = nn.ModuleList(
            [TRes(d0, d0, causal, refl) for _ in range(cfg.decoder_layers[0])])
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        for i, kind in enumerate(cfg.upsample_type):
            din = cfg.decoder_channels[i]
            d = din // cfg.upsample_factor[i]
            blk = nn.Module()
            blk.upsamplers = nn.ModuleList([
                TUp(din, kind, cfg.upsample_factor[i], cfg.upsample_residual[i],
                    causal, refl)])
            blk.resnets = nn.ModuleList(
                [TRes(d, d, causal, refl) for _ in range(cfg.decoder_layers[i + 1])])
            self.up_blocks.append(blk)
        self.conv_out = TConv(d, 3 * self.pt * self.p * self.p, 3, causal, refl)

    def forward(self, x):
        x = self.conv_in(x)
        for r in self.mid_block.resnets:
            x = r(x)
        for blk in self.up_blocks:
            x = blk.upsamplers[0](x)
            for r in blk.resnets:
                x = r(x)
        x = self.conv_out(F.silu(_rms(x)))
        b, c, t, h, w = x.shape
        p, pt = self.p, self.pt
        c2 = c // (pt * p * p)
        x = x.unflatten(1, (c2, pt, p, p))
        return x.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(b, c2, t * pt, h * p, w * p)


class TLTXVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)


def _build_pair(cfg, seed=0):
    torch.manual_seed(seed)
    tm = TLTXVAE(cfg).eval()
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.15
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, ltx_video_vae_rules())
    assert not unmatched, f"unmatched: {unmatched[:8]}"
    vae = LTXVideoVAE(cfg)
    td, sd = cfg.temporal_downscale, cfg.spatial_downscale
    ref = vae.init(jax.random.key(0), jnp.zeros((1, td + 1, 2 * sd, 2 * sd, 3)))["params"]
    ref_paths = {"/".join(p) for p, _ in _walk(ref)}
    got_paths = {"/".join(p) for p, _ in _walk(tree)}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:6]} extra: {sorted(got_paths - ref_paths)[:6]}"
    )
    return tm, vae, {"params": tree}


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@pytest.mark.parametrize("cfg,T,HW", [
    (LTXVideoVAEConfig.tiny(), 5, 8),
    # deeper: all three downsample kinds, mixed residual/factor, shortcuts
    (LTXVideoVAEConfig(
        latent_channels=4, block_out_channels=(8, 16, 16),
        layers_per_block=(1, 2, 1, 1),
        downsample_type=("spatial", "temporal", "spatiotemporal"),
        decoder_channels=(16, 8), decoder_layers=(2, 1, 1),
        upsample_type=("spatiotemporal", "spatial"),
        upsample_residual=(True, False), upsample_factor=(2, 1),
        patch_size=2, dtype=jnp.float32), 9, 16),
])
def test_ltx_video_vae_golden(cfg, T, HW):
    tm, vae, variables = _build_pair(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, T, HW, HW)).astype(np.float32)

    with torch.no_grad():
        t_m = tm.encoder(torch.from_numpy(x)).numpy()
    j_m = np.asarray(vae.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), method=LTXVideoVAE.raw_moments
    )).transpose(0, 4, 1, 2, 3)
    assert t_m.shape == j_m.shape
    np.testing.assert_allclose(j_m, t_m, rtol=2e-3, atol=2e-3)

    z = t_m[:, : cfg.latent_channels]
    with torch.no_grad():
        t_d = tm.decoder(torch.from_numpy(z)).numpy()
    j_d = np.asarray(vae.apply(
        variables, jnp.asarray(z.transpose(0, 2, 3, 4, 1)), method=LTXVideoVAE.decode
    )).transpose(0, 4, 1, 2, 3)
    assert t_d.shape == j_d.shape, (t_d.shape, j_d.shape)
    np.testing.assert_allclose(j_d, t_d, rtol=2e-3, atol=2e-3)
