"""MageVAE golden: flax MageVAE (NHWC) vs a hand-written torch mirror of the
reference Mage-Flow autoencoder semantics
(extensions_built_in/diffusion_models/mageflow/src/vae.py: DConvEncoder
one-step encode at t=0, CoD decoder + DConv NeRF denoiser decode on a zero
image), with the checkpoint's 'student.dconv_encoder.*' / 'pipeline.*' key
layout loaded through the real import rules (io/dit_importers.mage_vae_rules).
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import mage_vae_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.mage_vae import MageVAE, MageVAEConfig  # noqa: E402


def modulate(x, shift, scale):
    if x.dim() == 4:
        b, c = x.shape[:2]
        return x * (1 + scale.view(b, c, 1, 1)) + shift.view(b, c, 1, 1)
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class LN2d(nn.LayerNorm):
    def __init__(self, c, affine=True):
        super().__init__(c, eps=1e-6, elementwise_affine=affine)

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class TEmb(nn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(256, hidden), nn.SiLU(), nn.Linear(hidden, hidden))

    def forward(self, t):
        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        return self.mlp(torch.cat([torch.cos(args), torch.sin(args)], dim=-1))


def _dico_convs(m, ch, ratio):
    m.conv1 = nn.Conv2d(ch, ch, 1)
    m.conv2 = nn.Conv2d(ch, ch, 3, padding=1, groups=ch)
    m.conv3 = nn.Conv2d(ch, ch, 1)
    m.ca = nn.Sequential(nn.AdaptiveAvgPool2d(1), nn.Conv2d(ch, ch, 1), nn.Sigmoid())
    m.conv4 = nn.Conv2d(ch, int(ratio * ch), 1)
    m.conv5 = nn.Conv2d(int(ratio * ch), ch, 1)


class DiCo(nn.Module):
    def __init__(self, ch, ratio=4.0):
        super().__init__()
        _dico_convs(self, ch, ratio)
        self.norm1 = LN2d(ch, affine=False)
        self.norm2 = LN2d(ch, affine=False)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(ch, 6 * ch))

    def forward(self, inp, c):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = self.adaLN_modulation(c).chunk(6, dim=1)
        x = modulate(self.norm1(inp), sh_a, sc_a)
        x = F.gelu(self.conv2(self.conv1(x)))
        x = x * self.ca(x)
        x = self.conv3(x)
        x = inp + g_a[..., None, None] * x
        return x + g_m[..., None, None] * self.conv5(
            F.gelu(self.conv4(modulate(self.norm2(x), sh_m, sc_m)))
        )


class EncDiCo(nn.Module):
    def __init__(self, ch, ratio=4.0):
        super().__init__()
        _dico_convs(self, ch, ratio)
        self.norm1 = LN2d(ch)
        self.norm2 = LN2d(ch)

    def forward(self, inp):
        x = self.norm1(inp)
        x = F.gelu(self.conv2(self.conv1(x)))
        x = x * self.ca(x)
        x = inp + self.conv3(x)
        return x + self.conv5(F.gelu(self.conv4(self.norm2(x))))


class Encoder(nn.Module):
    def __init__(self, cfg: MageVAEConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_cond_embed = nn.Conv2d(3, cfg.head_size, cfg.patch, cfg.patch)
        self.head_blocks = nn.ModuleList(
            [EncDiCo(cfg.head_size, cfg.mlp_ratio) for _ in range(cfg.head_blocks)])
        self.proj_down = nn.Conv2d(cfg.head_size, cfg.hidden, 1)
        self.z_proj = nn.Conv2d(cfg.z_ch, cfg.hidden, 1)
        self.fuse_proj = nn.Conv2d(cfg.hidden * 2, cfg.hidden, 1)
        self.t_embedder = TEmb(cfg.hidden)
        self.blocks = nn.ModuleList(
            [DiCo(cfg.hidden, cfg.mlp_ratio) for _ in range(cfg.enc_blocks)])
        self.norm_out = LN2d(cfg.hidden)
        self.proj_out = nn.Conv2d(cfg.hidden, 2 * cfg.z_ch, 1)

    def forward(self, y):
        cond = self.patch_cond_embed(y)
        for b in self.head_blocks:
            cond = b(cond)
        cond = self.proj_down(cond)
        z_t = torch.zeros(y.shape[0], self.cfg.z_ch, *cond.shape[-2:])
        s = self.fuse_proj(torch.cat([cond, self.z_proj(z_t)], dim=1))
        c = self.t_embedder(torch.zeros(y.shape[0]))
        for b in self.blocks:
            s = b(s, c)
        return self.proj_out(self.norm_out(s))


class Res(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, ch, eps=1e-6)
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, ch, eps=1e-6)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        return x + self.conv2(F.silu(self.norm2(h)))


class PAttn(nn.Module):
    def __init__(self, ch, d, groups):
        super().__init__()
        self.d = d
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        h_ = self.norm(x)
        Q, K, V = self.q(h_), self.k(h_), self.v(h_)
        d = self.d
        b, c, H, W = Q.shape
        ph, pw = (d - H % d) % d, (d - W % d) % d
        if ph or pw:
            Q = F.pad(Q, (0, pw, 0, ph), mode="replicate")
            K = F.pad(K, (0, pw, 0, ph), mode="replicate")
            V = F.pad(V, (0, pw, 0, ph), mode="replicate")
        Hp, Wp = H + ph, W + pw
        nph, npw = Hp // d, Wp // d

        def pat(t):
            return t.reshape(b, c, nph, d, npw, d).permute(0, 2, 4, 1, 3, 5).reshape(
                b * nph * npw, c, d * d)

        Q, K, V = pat(Q), pat(K), pat(V)
        w_ = torch.bmm(Q.permute(0, 2, 1), K) * (c ** -0.5)
        w_ = F.softmax(w_, dim=2).permute(0, 2, 1)
        h_ = torch.bmm(V, w_).reshape(b, nph, npw, c, d, d).permute(
            0, 3, 1, 4, 2, 5).reshape(b, c, Hp, Wp)
        if ph or pw:
            h_ = h_[:, :, :H, :W]
        return x + self.proj_out(h_)


class MLPRes(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.in_ln = nn.LayerNorm(ch, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(ch, ch), nn.SiLU(), nn.Linear(ch, ch))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(ch, 3 * ch))

    def forward(self, x, y):
        shift, scale, gate = self.adaLN_modulation(y).chunk(3, dim=-1)
        return x + gate * self.mlp(self.in_ln(x) * (1 + scale) + shift)


class RMS(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))

    def forward(self, x):
        xf = x.float()
        return self.weight * (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-6)).to(x.dtype)


class Denoiser(nn.Module):
    def __init__(self, cfg: MageVAEConfig, groups):
        super().__init__()
        self.cfg = cfg
        ch, hx, p = cfg.hidden, cfg.hidden_x, cfg.patch
        self.t_embedder = TEmb(ch)
        self.y_embedder_x = nn.Conv2d(ch, hx * p * p, 1)
        self.s_embedder = nn.Module()
        self.s_embedder.proj1 = nn.Conv2d(3, cfg.z_ch, p, p, bias=False)
        self.s_embedder.proj2 = nn.Conv2d(cfg.z_ch + ch, ch, 1)
        self.blocks = nn.ModuleList(
            [DiCo(ch, cfg.mlp_ratio) for _ in range(cfg.dec_cond_blocks)])
        self.x_embedder = nn.Module()
        self.x_embedder.embedder = nn.Sequential(
            nn.Linear(3 + hx + cfg.max_freqs ** 2, hx))
        self.dec_net = nn.Module()
        self.dec_net.input_proj = nn.Linear(hx, hx)
        self.dec_net.cond_embed = nn.Linear(ch, p * p * hx)
        self.dec_net.res_blocks = nn.ModuleList(
            [MLPRes(hx) for _ in range(cfg.dec_blocks - cfg.dec_cond_blocks)])
        self.final_layer = nn.Module()
        self.final_layer.norm = RMS(hx)
        self.final_layer.linear = nn.Linear(hx, 3)
        self.y_embedder = nn.Module()
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.z_ch, ch, 3, padding=1)
        dec.block = nn.Sequential(
            Res(ch, groups), PAttn(ch, cfg.attn_patch, groups), Res(ch, groups),
            PAttn(ch, cfg.attn_patch, groups), Res(ch, groups))
        dec.norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, ch, 3, padding=1)
        self.y_embedder.decoder = dec

    def cod(self, z):
        d = self.y_embedder.decoder
        h = d.block(d.conv_in(z))
        return d.conv_out(F.silu(d.norm_out(h)))

    def forward(self, x, cond):
        cfg = self.cfg
        p, hx, ch = cfg.patch, cfg.hidden_x, cfg.hidden
        b, _, h, w = x.shape
        c = self.t_embedder(torch.zeros(b))
        s = self.s_embedder.proj2(torch.cat([self.s_embedder.proj1(x), cond], dim=1))
        for blk in self.blocks:
            s = blk(s, c)
        length = s.shape[-2] * s.shape[-1]
        s = s.permute(0, 2, 3, 1).reshape(-1, ch)
        x = F.unfold(x, kernel_size=p, stride=p)
        x = torch.cat([x, self.y_embedder_x(cond).flatten(2)], dim=1)
        x = x.reshape(b, -1, p * p, length).permute(0, 3, 2, 1).flatten(0, 1)
        # NerfEmbedder DCT
        pos = torch.linspace(0, 1, p)
        py, px = torch.meshgrid(pos, pos, indexing="ij")
        px, py = px.reshape(-1, 1, 1), py.reshape(-1, 1, 1)
        freqs = torch.linspace(0, cfg.max_freqs, cfg.max_freqs)
        fx, fy = freqs[None, :, None], freqs[None, None, :]
        dct = (torch.cos(px * fx * torch.pi) * torch.cos(py * fy * torch.pi)
               * (1 + fx * fy) ** -1).reshape(1, p * p, -1).expand(x.shape[0], -1, -1)
        x = self.x_embedder.embedder(torch.cat([x, dct], dim=-1))
        x = self.dec_net.input_proj(x)
        y = self.dec_net.cond_embed(s).reshape(s.shape[0], p * p, -1)
        for blk in self.dec_net.res_blocks:
            x = blk(x, y)
        x = self.final_layer.linear(self.final_layer.norm(x))
        x = x.transpose(1, 2).reshape(b, length, -1)
        return F.fold(x.transpose(1, 2).contiguous(), (h, w), kernel_size=p, stride=p)


class TorchMageVAE(nn.Module):
    # the real model uses GroupNorm(32, 384); our flax GroupNorm clamps groups
    # to min(32, C), so the tiny mirror must use min(32, hidden) groups too
    def __init__(self, cfg, groups=16):
        super().__init__()
        self.cfg = cfg
        self.student = nn.Module()
        self.student.dconv_encoder = Encoder(cfg)
        self.pipeline = Denoiser(cfg, groups)

    def encode_mean(self, x):
        out = self.student.dconv_encoder(x)
        return out[:, : self.cfg.z_ch]

    def decode(self, z):
        cond = self.pipeline.cod(z)
        b = z.shape[0]
        H = z.shape[2] * self.cfg.patch
        W = z.shape[3] * self.cfg.patch
        return self.pipeline(torch.zeros(b, 3, H, W), cond)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = MageVAEConfig.tiny()
    ref = TorchMageVAE(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, mage_vae_rules())
    # proj1 feeds the always-zero decode image: intentionally unmapped
    assert all("s_embedder.proj1" in k for k in unmatched), unmatched[:8]
    return cfg, ref, tree


def test_mage_encoder_golden(pair):
    cfg, ref, tree = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 2 * cfg.patch, 3 * cfg.patch, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_mean(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = MageVAE(cfg)
    got = np.asarray(ours.apply({"params": tree}, jnp.asarray(x), None,
                                method=MageVAE.encode))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4, rtol=2e-4)


def test_mage_decoder_golden(pair):
    cfg, ref, tree = pair
    rng = np.random.default_rng(1)
    # 5x9 latent grid: exercises the replicate pad in the patched attention
    z = rng.normal(size=(1, 5, 9, cfg.z_ch)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    ours = MageVAE(cfg)
    got = np.asarray(ours.apply({"params": tree}, jnp.asarray(z),
                                method=MageVAE.decode))
    assert got.shape == (1, 5 * cfg.patch, 9 * cfg.patch, 3)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-4, rtol=3e-4)


def test_mageflow_wrapper_uses_exact_mage_vae():
    """mageflow with vae_size=tiny builds the exact MageVAE (patch-1 tokens,
    16x-analog downsample) and round-trips encode/decode shapes; predict runs
    one token per latent pixel (mageflow.py:122-125)."""
    import json

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        tdir = os.path.join(td, "transformer")
        os.makedirs(tdir)
        json.dump({"in_channels": 6, "context_in_dim": 64, "hidden_size": 64,
                   "num_heads": 4, "depth": 1, "axes_dim": [4, 6, 6]},
                  open(os.path.join(tdir, "config.json"), "w"))
        model = get_model_class("mageflow")(
            ModelConfig(arch="mageflow", name_or_path=td,
                        model_kwargs={"te_size": "tiny", "vae_size": "tiny"}))
        assert model._vae_mage and model.vae_config.latent_channels == 6
        variables = model.init_variables(jax.random.key(0))
        p = model.vae_config.patch
        h, w, c = model.latent_shape(8 * p, 4 * p)
        assert (h, w, c) == (8, 4, 6)
        px = jax.random.normal(jax.random.key(1), (1, 8 * p, 4 * p, 3))
        lat = model.encode_images(variables, px)
        assert lat.shape == (1, 8, 4, 6)
        dec = model.decode_latents(variables, lat)
        assert dec.shape == px.shape
        cond = model.encode_prompt(variables, ["x"])
        cond["pe"] = model.rope_table(h, w, cond["txt"].shape[1])
        out = model.predict(variables, lat, jnp.asarray([0.5]), cond)
        assert out.shape == lat.shape
        assert model.image_seq_len(8 * p, 4 * p) == 32
