"""Wan video VAE golden numerics: flax WanVAE vs a torch mirror of diffusers
``AutoencoderKLWan``.

The torch side reimplements the *reference semantics* faithfully — including
the chunked streaming with per-conv feature caches (first frame alone, then
td-frame chunks on encode; single latent frames on decode, with the "Rep"
zero-history sentinel on upsample time_convs) that diffusers always uses
(``AutoencoderKLWan._encode/_decode``; reference wraps it at
``toolkit/models/wan21/autoencoder_kl_wan.py``). The flax side runs ONE
full-sequence pass. Matching outputs therefore prove two things at once:

1. the key-for-key import mapping (``io/video_vae_import.wan_vae_rules``) is
   correct, and
2. the TPU-native full-sequence formulation is exactly equivalent to the
   chunked-cache streaming formulation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.io.video_vae_import import wan_vae_rules  # noqa: E402
from ai_toolkit_tpu.models.wan_vae import WanVAE, WanVAEConfig  # noqa: E402

CACHE_T = 2


class TCausalConv(nn.Conv3d):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__(cin, cout, k, stride=stride, padding=padding)
        self._p = (self.padding[2], self.padding[2], self.padding[1],
                   self.padding[1], 2 * self.padding[0], 0)
        self.padding = (0, 0, 0)

    def forward(self, x, cache_x=None):
        pad = list(self._p)
        if cache_x is not None and self._p[4] > 0:
            x = torch.cat([cache_x, x], dim=2)
            pad[4] -= cache_x.shape[2]
        x = F.pad(x, pad)
        return self._conv_forward(x, self.weight, self.bias)


def cached_conv(conv, x, feat_cache, feat_idx):
    if feat_cache is None:
        return conv(x)
    idx = feat_idx[0]
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
        cache_x = torch.cat([feat_cache[idx][:, :, -1:], cache_x], dim=2)
    out = conv(x, feat_cache[idx])
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return out


class TRMS(nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        shape = (dim, 1, 1) if images else (dim, 1, 1, 1)
        self.gamma = nn.Parameter(torch.ones(shape))
        self.scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class TRes(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = TRMS(cin, images=False)
        self.conv1 = TCausalConv(cin, cout, 3, padding=1)
        self.norm2 = TRMS(cout, images=False)
        self.conv2 = TCausalConv(cout, cout, 3, padding=1)
        self.conv_shortcut = TCausalConv(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x, feat_cache=None, feat_idx=None):
        h = self.conv_shortcut(x)
        x = F.silu(self.norm1(x))
        x = cached_conv(self.conv1, x, feat_cache, feat_idx)
        x = F.silu(self.norm2(x))
        x = cached_conv(self.conv2, x, feat_cache, feat_idx)
        return x + h


class TAttn(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = TRMS(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.size()
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.norm(x)
        qkv = self.to_qkv(x).reshape(b * t, 1, c * 3, h * w).permute(0, 1, 3, 2)
        q, k, v = qkv.chunk(3, dim=-1)
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        return x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4) + identity


class TResample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.dim, self.mode = dim, mode
        if mode == "upsample2d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
        elif mode == "upsample3d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
            self.time_conv = TCausalConv(dim, dim * 2, (3, 1, 1), padding=(1, 0, 0))
        elif mode == "downsample2d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2)))
        elif mode == "downsample3d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2)))
            self.time_conv = TCausalConv(dim, dim, (3, 1, 1), stride=(2, 1, 1),
                                         padding=(0, 0, 0))

    def forward(self, x, feat_cache=None, feat_idx=None):
        b, c, t, h, w = x.size()
        if self.mode == "upsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = "Rep"
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and not isinstance(feat_cache[idx], str):
                    cache_x = torch.cat([feat_cache[idx][:, :, -1:], cache_x], dim=2)
                if cache_x.shape[2] < 2 and isinstance(feat_cache[idx], str):
                    cache_x = torch.cat([torch.zeros_like(cache_x), cache_x], dim=2)
                if isinstance(feat_cache[idx], str):
                    x = self.time_conv(x)
                else:
                    x = self.time_conv(x, feat_cache[idx])
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3)
                x = x.reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.view(b, t, x.size(1), x.size(2), x.size(3)).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            if feat_cache[idx] is None:
                feat_cache[idx] = x.clone()
                feat_idx[0] += 1
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.time_conv(torch.cat([feat_cache[idx][:, :, -1:], x], 2))
                feat_cache[idx] = cache_x
                feat_idx[0] += 1
        return x


class TMid(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resnets = nn.ModuleList([TRes(dim, dim), TRes(dim, dim)])
        self.attentions = nn.ModuleList([TAttn(dim)])

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = self.resnets[0](x, feat_cache, feat_idx)
        x = self.attentions[0](x)
        return self.resnets[1](x, feat_cache, feat_idx)


class TEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
        self.conv_in = TCausalConv(3, dims[0], 3, padding=1)
        blocks, scale = [], 1.0
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks):
                blocks.append(TRes(cin, cout))
                if scale in cfg.attn_scales:
                    blocks.append(TAttn(cout))
                cin = cout
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
                blocks.append(TResample(cout, mode))
                scale /= 2.0
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(dims[-1])
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv(dims[-1], cfg.z_dim * 2, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = cached_conv(self.conv_in, x, feat_cache, feat_idx)
        for layer in self.down_blocks:
            if isinstance(layer, TAttn) or feat_cache is None:
                x = layer(x)
            else:
                x = layer(x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        return cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TUp(nn.Module):
    def __init__(self, cin, cout, n, mode):
        super().__init__()
        resnets, d = [], cin
        for _ in range(n + 1):
            resnets.append(TRes(d, cout))
            d = cout
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = nn.ModuleList([TResample(cout, mode)]) if mode else None

    def forward(self, x, feat_cache=None, feat_idx=None):
        for r in self.resnets:
            x = r(x, feat_cache, feat_idx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, feat_cache, feat_idx)
        return x


class TDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * u
                for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
        ups = tuple(reversed(cfg.temperal_downsample))
        self.conv_in = TCausalConv(cfg.z_dim, dims[0], 3, padding=1)
        self.mid_block = TMid(dims[0])
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                cin = cin // 2
            mode = None
            if i != len(cfg.dim_mult) - 1:
                mode = "upsample3d" if ups[i] else "upsample2d"
            blocks.append(TUp(cin, cout, cfg.num_res_blocks, mode))
        self.up_blocks = nn.ModuleList(blocks)
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv(dims[-1], 3, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = cached_conv(self.conv_in, x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        for up in self.up_blocks:
            x = up(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        return cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TWanVAE(nn.Module):
    """Mirror of AutoencoderKLWan incl. the chunked streaming encode/decode."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = TEncoder(cfg)
        self.quant_conv = TCausalConv(cfg.z_dim * 2, cfg.z_dim * 2, 1)
        self.post_quant_conv = TCausalConv(cfg.z_dim, cfg.z_dim, 1)
        self.decoder = TDecoder(cfg)

    @torch.no_grad()
    def encode_moments(self, x):
        td = 2 ** sum(self.cfg.temperal_downsample)
        T = x.shape[2]
        feat = [None] * 99
        outs = []
        chunks = [x[:, :, :1]] + [
            x[:, :, 1 + td * i: 1 + td * (i + 1)] for i in range((T - 1) // td)
        ]
        for ch in chunks:
            outs.append(self.encoder(ch, feat_cache=feat, feat_idx=[0]))
        return self.quant_conv(torch.cat(outs, dim=2))

    @torch.no_grad()
    def decode_raw(self, z):
        feat = [None] * 99
        x = self.post_quant_conv(z)
        outs = [self.decoder(x[:, :, i:i + 1], feat_cache=feat, feat_idx=[0])
                for i in range(x.shape[2])]
        return torch.cat(outs, dim=2)


def _build_pair(cfg, seed=0):
    torch.manual_seed(seed)
    tm = TWanVAE(cfg).eval()
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.2
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, wan_vae_rules())
    assert not unmatched, f"unmatched torch keys: {unmatched[:8]}"
    vae = WanVAE(cfg)
    td, sd = cfg.temporal_downscale, cfg.spatial_downscale
    ref = vae.init(jax.random.key(0), jnp.zeros((1, td + 1, 2 * sd, 2 * sd, 3)))["params"]
    ref_paths = {"/".join(p) for p, _ in _walk(ref)}
    got_paths = {"/".join(p) for p, _ in _walk(tree)}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:6]} extra: {sorted(got_paths - ref_paths)[:6]}"
    )
    for p, leaf in _walk(tree):
        r = ref
        for k in p:
            r = r[k]
        assert r.shape == leaf.shape, (p, r.shape, leaf.shape)
    return tm, vae, {"params": tree}


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


@pytest.mark.parametrize("cfg,T,HW", [
    (WanVAEConfig.tiny(), 5, 8),
    (WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
                  attn_scales=(1.0,), temperal_downsample=(False, True, True),
                  latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4,
                  dtype=jnp.float32), 9, 16),
])
def test_wan_vae_encode_decode_golden(cfg, T, HW):
    tm, vae, variables = _build_pair(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, T, HW, HW)).astype(np.float32)  # NCDHW

    t_moments = tm.encode_moments(torch.from_numpy(x)).numpy()
    j_moments = np.asarray(
        vae.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                  method=WanVAE.raw_moments)
    ).transpose(0, 4, 1, 2, 3)
    assert t_moments.shape == j_moments.shape
    np.testing.assert_allclose(j_moments, t_moments, rtol=2e-3, atol=2e-3)

    z = t_moments[:, : cfg.z_dim]
    t_dec = tm.decode_raw(torch.from_numpy(z)).numpy()
    # flax decode applies the latent de-normalization; stats are identity here
    j_dec = np.asarray(
        vae.apply(variables, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                  method=WanVAE.decode)
    ).transpose(0, 4, 1, 2, 3)
    assert t_dec.shape == j_dec.shape, (t_dec.shape, j_dec.shape)
    np.testing.assert_allclose(j_dec, t_dec, rtol=2e-3, atol=2e-3)


def test_wan_vae_roundtrip_shapes():
    """4k+1 frame contract: encode T=2k+1 (tiny td=2) -> k+1 latent frames,
    decode inverts exactly."""
    cfg = WanVAEConfig.tiny()
    vae = WanVAE(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 7, 8, 8, 3)) * 2 - 1
    v = vae.init(jax.random.key(1), x)
    z = vae.apply(v, x, method=WanVAE.encode)
    assert z.shape == (1, 4, 4, 4, 4)
    y = vae.apply(v, z, method=WanVAE.decode)
    assert y.shape == x.shape


# ---------------------------------------------------------------- wan 2.2


def t_patchify(x, p):
    """torch mirror of the wan2.2 rearrange ``b c f (h q) (w r) -> b (c r q) f h w``."""
    if p == 1:
        return x
    B, C, T, H, W = x.shape
    x = x.view(B, C, T, H // p, p, W // p, p)      # .., h, q, w, r
    x = x.permute(0, 1, 6, 4, 2, 3, 5).contiguous()  # B, C, r, q, T, h, w
    return x.reshape(B, C * p * p, T, H // p, W // p)


def t_unpatchify(x, p):
    if p == 1:
        return x
    B, CPP, T, H, W = x.shape
    C = CPP // (p * p)
    x = x.view(B, C, p, p, T, H, W)                # .., r, q, ..
    x = x.permute(0, 1, 4, 5, 3, 6, 2).contiguous()  # B, C, T, H, q, W, r
    return x.reshape(B, C, T, H * p, W * p)


class TAvgDown(nn.Module):
    def __init__(self, cin, cout, ft, fs):
        super().__init__()
        self.cout, self.ft, self.fs = cout, ft, fs

    def forward(self, x):
        ft, fs = self.ft, self.fs
        pad_t = (-x.shape[2]) % ft
        x = F.pad(x, (0, 0, 0, 0, pad_t, 0))
        B, C, T, H, W = x.shape
        x = x.view(B, C, T // ft, ft, H // fs, fs, W // fs, fs)
        x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).contiguous()
        x = x.view(B, C * ft * fs * fs, T // ft, H // fs, W // fs)
        return x.view(B, self.cout, -1, T // ft, H // fs, W // fs).mean(2)


class TDupUp(nn.Module):
    def __init__(self, cin, cout, ft, fs):
        super().__init__()
        self.cout, self.ft, self.fs = cout, ft, fs
        self.repeats = cout * ft * fs * fs // cin

    def forward(self, x, first_chunk=False):
        ft, fs = self.ft, self.fs
        x = x.repeat_interleave(self.repeats, dim=1)
        B = x.size(0)
        x = x.view(B, self.cout, ft, fs, fs, x.size(2), x.size(3), x.size(4))
        x = x.permute(0, 1, 5, 2, 6, 3, 7, 4).contiguous()
        x = x.view(B, self.cout, x.size(2) * ft, x.size(4) * fs, x.size(6) * fs)
        if first_chunk and ft > 1:
            x = x[:, :, ft - 1:]
        return x


class TResampleV2(TResample):
    """wan2.2 resample: upsample convs keep full width (upsample_out_dim)."""

    def __init__(self, dim, mode, out_dim):
        super().__init__(dim, mode)
        if mode in ("upsample2d", "upsample3d"):
            self.resample[1] = nn.Conv2d(dim, out_dim, 3, padding=1)


class TResDown(nn.Module):
    def __init__(self, cin, cout, n, t_down, down_flag):
        super().__init__()
        self.avg_shortcut = TAvgDown(cin, cout, 2 if t_down else 1, 2 if down_flag else 1)
        resnets, d = [], cin
        for _ in range(n):
            resnets.append(TRes(d, cout))
            d = cout
        self.resnets = nn.ModuleList(resnets)
        self.downsampler = None
        if down_flag:
            mode = "downsample3d" if t_down else "downsample2d"
            self.downsampler = TResample(cout, mode)

    def forward(self, x, feat_cache=None, feat_idx=None):
        sc = self.avg_shortcut(x)
        for r in self.resnets:
            x = r(x, feat_cache, feat_idx)
        if self.downsampler is not None:
            x = self.downsampler(x, feat_cache, feat_idx)
        return x + sc


class TResUp(nn.Module):
    def __init__(self, cin, cout, n, t_up, up_flag):
        super().__init__()
        self.avg_shortcut = TDupUp(cin, cout, 2 if t_up else 1, 2) if up_flag else None
        resnets, d = [], cin
        for _ in range(n + 1):
            resnets.append(TRes(d, cout))
            d = cout
        self.resnets = nn.ModuleList(resnets)
        self.upsampler = None
        if up_flag:
            mode = "upsample3d" if t_up else "upsample2d"
            self.upsampler = TResampleV2(cout, mode, cout)

    def forward(self, x, feat_cache=None, feat_idx=None, first_chunk=False):
        xin = x
        for r in self.resnets:
            x = r(x, feat_cache, feat_idx)
        if self.upsampler is not None:
            x = self.upsampler(x, feat_cache, feat_idx)
            x = x + self.avg_shortcut(xin, first_chunk)
        return x


class TEncoder22(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
        p = cfg.patch_size
        self.conv_in = TCausalConv(3 * p * p, dims[0], 3, padding=1)
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            blocks.append(TResDown(
                cin, cout, cfg.num_res_blocks,
                (not last) and cfg.temperal_downsample[i], not last))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(dims[-1])
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv(dims[-1], cfg.z_dim * 2, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = cached_conv(self.conv_in, x, feat_cache, feat_idx)
        for layer in self.down_blocks:
            x = layer(x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        return cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TDecoder22(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        base = cfg.decoder_base_dim or cfg.base_dim
        dims = [base * u
                for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
        ups = tuple(reversed(cfg.temperal_downsample))
        self.conv_in = TCausalConv(cfg.z_dim, dims[0], 3, padding=1)
        self.mid_block = TMid(dims[0])
        blocks = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            blocks.append(TResUp(cin, cout, cfg.num_res_blocks,
                                 (not last) and ups[i], not last))
        self.up_blocks = nn.ModuleList(blocks)
        p = cfg.patch_size
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv(dims[-1], 3 * p * p, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=None, first_chunk=False):
        x = cached_conv(self.conv_in, x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        for up in self.up_blocks:
            x = up(x, feat_cache, feat_idx, first_chunk=first_chunk)
        x = F.silu(self.norm_out(x))
        return cached_conv(self.conv_out, x, feat_cache, feat_idx)


class TWanVAE22(nn.Module):
    """Mirror of the wan2.2 AutoencoderKLWan incl. patchify + chunked flow."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = TEncoder22(cfg)
        self.quant_conv = TCausalConv(cfg.z_dim * 2, cfg.z_dim * 2, 1)
        self.post_quant_conv = TCausalConv(cfg.z_dim, cfg.z_dim, 1)
        self.decoder = TDecoder22(cfg)

    @torch.no_grad()
    def encode_moments(self, x):
        x = t_patchify(x, self.cfg.patch_size)
        td = 2 ** sum(self.cfg.temperal_downsample)
        T = x.shape[2]
        feat = [None] * 99
        outs = []
        chunks = [x[:, :, :1]] + [
            x[:, :, 1 + td * i: 1 + td * (i + 1)] for i in range((T - 1) // td)
        ]
        for ch in chunks:
            outs.append(self.encoder(ch, feat_cache=feat, feat_idx=[0]))
        return self.quant_conv(torch.cat(outs, dim=2))

    @torch.no_grad()
    def decode_raw(self, z):
        feat = [None] * 99
        x = self.post_quant_conv(z)
        outs = [self.decoder(x[:, :, i:i + 1], feat_cache=feat, feat_idx=[0],
                             first_chunk=(i == 0))
                for i in range(x.shape[2])]
        return t_unpatchify(torch.cat(outs, dim=2), self.cfg.patch_size)


def test_wan22_vae_encode_decode_golden():
    """wan2.2 TI2V-5B VAE semantics (patchify, AvgDown/DupUp residual blocks,
    decoder_base_dim, full-width upsample convs) vs the chunked torch flow."""
    from ai_toolkit_tpu.models.wan_vae import WanVAEConfig as Cfg

    cfg = Cfg.tiny22()
    torch.manual_seed(3)
    tm = TWanVAE22(cfg).eval()
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.2
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, wan_vae_rules())
    assert not unmatched, f"unmatched torch keys: {unmatched[:8]}"
    vae = WanVAE(cfg)
    td, sd = cfg.temporal_downscale, cfg.spatial_downscale
    ref = vae.init(jax.random.key(0), jnp.zeros((1, td + 1, 2 * sd, 2 * sd, 3)))["params"]
    ref_paths = {"/".join(p) for p, _ in _walk(ref)}
    got_paths = {"/".join(p) for p, _ in _walk(tree)}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:6]} extra: {sorted(got_paths - ref_paths)[:6]}"
    )
    variables = {"params": tree}

    rng = np.random.default_rng(7)
    T, HW = 5, 16
    x = rng.uniform(-1, 1, (1, 3, T, HW, HW)).astype(np.float32)

    t_moments = tm.encode_moments(torch.from_numpy(x)).numpy()
    j_moments = np.asarray(
        vae.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                  method=WanVAE.raw_moments)
    ).transpose(0, 4, 1, 2, 3)
    assert t_moments.shape == j_moments.shape
    np.testing.assert_allclose(j_moments, t_moments, rtol=2e-3, atol=2e-3)

    z = t_moments[:, : cfg.z_dim]
    t_dec = tm.decode_raw(torch.from_numpy(z)).numpy()
    j_dec = np.asarray(
        vae.apply(variables, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                  method=WanVAE.decode)
    ).transpose(0, 4, 1, 2, 3)
    assert t_dec.shape == j_dec.shape, (t_dec.shape, j_dec.shape)
    np.testing.assert_allclose(j_dec, t_dec, rtol=2e-3, atol=2e-3)
