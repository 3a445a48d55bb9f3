"""CogView4 golden vs a hand-written torch mirror of diffusers'
``CogView4Transformer2DModel``. The block module inventory is pinned by the
reference wrapper's quantization exclude list
(``toolkit/models/cogview4.py:160-166``): norm1 (12-chunk joint adaLN),
affine attn1.norm_q/norm_k, param-less norm2/norm2_context; the mirror
encodes the public diffusers layout for the rest (channel-major patchify
both directions, text-first single attention with rope on the image span,
ONE shared FF for both streams, size-condition sinusoids, final
AdaLayerNormContinuous). Fed through the REAL import rules
(``io/dit_importers.cogview4_rules``)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

NH, HD = 2, 16
DIM = NH * HD
TXT, P, C = 24, 2, 4
TEMB, CDIM = 32, 16
AXES = (8, 8)  # sums to head_dim; angle count = head_dim/2
N_LAYERS = 2
T = 5


def rope_angles(hp, wp):
    dh, dw = AXES
    fh = 1.0 / (10000.0 ** (np.arange(0, dh, 2) / dh))
    fw = 1.0 / (10000.0 ** (np.arange(0, dw, 2) / dw))
    rows = np.repeat(np.arange(hp), wp).astype(np.float64)
    cols = np.tile(np.arange(wp), hp).astype(np.float64)
    return np.concatenate([rows[:, None] * fh[None], cols[:, None] * fw[None]], axis=1)


def apply_rope_t(x, ang):
    # x [B, S, H, D]; half-split rotate (use_real_unbind_dim=-2)
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = torch.cos(ang)[None, :, None, :].float()
    s = torch.sin(ang)[None, :, None, :].float()
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)


class Attn(nn.Module):
    def __init__(self):
        super().__init__()
        self.to_q = nn.Linear(DIM, DIM)
        self.to_k = nn.Linear(DIM, DIM)
        self.to_v = nn.Linear(DIM, DIM)
        self.norm_q = nn.LayerNorm(HD, eps=1e-5)
        self.norm_k = nn.LayerNorm(HD, eps=1e-5)
        self.to_out = nn.ModuleList([nn.Linear(DIM, DIM)])

    def forward(self, x, t_txt, ang):
        b, s, _ = x.shape
        q = self.norm_q(self.to_q(x).view(b, s, NH, HD).float())
        k = self.norm_k(self.to_k(x).view(b, s, NH, HD).float())
        v = self.to_v(x).view(b, s, NH, HD).float()
        q = torch.cat([q[:, :t_txt], apply_rope_t(q[:, t_txt:], ang)], dim=1)
        k = torch.cat([k[:, :t_txt], apply_rope_t(k[:, t_txt:], ang)], dim=1)
        q, k, v = (u.transpose(1, 2) for u in (q, k, v))
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, DIM))


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        n1 = nn.Module()
        n1.linear = nn.Linear(TEMB, 12 * DIM)
        self.norm1 = n1
        self.attn1 = Attn()
        ff = nn.Module()
        proj = nn.Module()
        proj.proj = nn.Linear(DIM, 4 * DIM)
        ff.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(4 * DIM, DIM)])
        self.ff = ff

    def forward(self, x, ctx, temb, ang):
        t_txt = ctx.shape[1]
        mods = self.norm1.linear(F.silu(temb)).chunk(12, dim=1)
        (sh_a, csh_a, sc_a, csc_a, g_a, cg_a,
         sh_m, csh_m, sc_m, csc_m, g_m, cg_m) = [m.unsqueeze(1) for m in mods]
        xm = F.layer_norm(x, (DIM,), eps=1e-5) * (1 + sc_a) + sh_a
        cm = F.layer_norm(ctx, (DIM,), eps=1e-5) * (1 + csc_a) + csh_a
        a = self.attn1(torch.cat([cm, xm], dim=1), t_txt, ang)
        x = x + g_a * a[:, t_txt:]
        ctx = ctx + cg_a * a[:, :t_txt]
        hm = F.layer_norm(x, (DIM,), eps=1e-5) * (1 + sc_m) + sh_m
        cmm = F.layer_norm(ctx, (DIM,), eps=1e-5) * (1 + csc_m) + csh_m
        mlp = lambda z: self.ff.net[2](F.gelu(self.ff.net[0].proj(z), approximate="tanh"))
        return x + g_m * mlp(hm), ctx + cg_m * mlp(cmm)


class CogView4Mirror(nn.Module):
    def __init__(self):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Linear(P * P * C, DIM)
        pe.text_proj = nn.Linear(TXT, DIM)
        self.patch_embed = pe
        tce = nn.Module()
        te = nn.Module()
        te.linear_1 = nn.Linear(256, TEMB)
        te.linear_2 = nn.Linear(TEMB, TEMB)
        tce.timestep_embedder = te
        ce = nn.Module()
        ce.linear_1 = nn.Linear(6 * CDIM, TEMB)
        ce.linear_2 = nn.Linear(TEMB, TEMB)
        tce.condition_embedder = ce
        self.time_condition_embed = tce
        self.transformer_blocks = nn.ModuleList([Block() for _ in range(N_LAYERS)])
        no = nn.Module()
        no.linear = nn.Linear(TEMB, 2 * DIM)
        self.norm_out = no
        self.proj_out = nn.Linear(DIM, P * P * C)

    def sinusoid(self, t, dim):
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, lat, t, txt, original_size, target_size, crop):
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        # channel-major patchify (permute(0,2,4,1,3,5).flatten(3).flatten(1,2))
        x = lat.view(b, c, hp, P, wp, P).permute(0, 2, 4, 1, 3, 5).flatten(3).flatten(1, 2)
        x = self.patch_embed.proj(x)
        ctx = self.patch_embed.text_proj(txt)

        te = self.time_condition_embed.timestep_embedder
        temb = te.linear_2(F.silu(te.linear_1(self.sinusoid(t, 256))))
        conds = torch.cat([original_size, crop, target_size], dim=1)
        c_sin = self.sinusoid(conds.flatten(), CDIM).view(b, 6 * CDIM)
        ce = self.time_condition_embed.condition_embedder
        temb = temb + ce.linear_2(F.silu(ce.linear_1(c_sin)))

        ang = torch.from_numpy(rope_angles(hp, wp))
        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, temb, ang)

        mod = self.norm_out.linear(F.silu(temb)).unsqueeze(1)
        scale, shift = torch.chunk(mod, 2, dim=-1)
        x = F.layer_norm(x, (DIM,), eps=1e-5) * (1 + scale) + shift
        x = self.proj_out(x)
        # channel-major unpatchify
        x = x.reshape(b, hp, wp, C, P, P).permute(0, 3, 1, 4, 2, 5)
        return x.flatten(4, 5).flatten(2, 3)


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
def test_cogview4_matches_torch_mirror(scan):
    from ai_toolkit_tpu.io.dit_importers import cogview4_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.cogview4_dit import (
        CogView4Config,
        CogView4DiT,
        cogview4_rope,
    )
    from ai_toolkit_tpu.models.flux_dit import pack_latents_cmajor, unpack_latents_cmajor

    torch.manual_seed(0)
    mirror = CogView4Mirror().eval().float()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

    cfg = CogView4Config.tiny(text_embed_dim=TXT, time_embed_dim=TEMB,
                              condition_dim=CDIM, rope_axes_dim=AXES,
                              scan_blocks=scan)
    tree, unmatched = torch_to_tree(sd, cogview4_rules(scan))
    assert not unmatched, unmatched[:8]
    dit = CogView4DiT(cfg)

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    txt = rng.normal(size=(2, T, TXT)).astype(np.float32)
    t = np.array([150.0, 820.0], np.float32)
    osz = np.array([[64.0, 64.0], [64.0, 64.0]], np.float32)
    crop = np.zeros((2, 2), np.float32)

    ang = jnp.asarray(cogview4_rope(cfg, 4, 4))
    out = dit.apply({"params": tree}, pack_latents_cmajor(jnp.asarray(lat)),
                    jnp.asarray(txt), jnp.asarray(t), ang,
                    jnp.asarray(osz), jnp.asarray(osz), jnp.asarray(crop))
    ours = np.asarray(unpack_latents_cmajor(out, 8, 8)).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t), torch.from_numpy(txt),
                     torch.from_numpy(osz), torch.from_numpy(osz),
                     torch.from_numpy(crop)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_cogview4_rules_are_invertible():
    from ai_toolkit_tpu.io.dit_importers import cogview4_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch

    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in CogView4Mirror().state_dict().items()}
    tree, unmatched = torch_to_tree(sd, cogview4_rules(False))
    assert not unmatched
    flat = tree_to_torch(tree, cogview4_rules(False))
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_allclose(flat[k], sd[k], atol=1e-6, err_msg=k)
