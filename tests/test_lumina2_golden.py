"""Lumina-Image-2.0 golden vs a hand-written torch mirror of diffusers'
Lumina2Transformer2DModel, with the module semantics pinned by the
reference's vendored copies (omnigen2/boogu ``block_lumina2.py``: 4-chunk
LuminaRMSNormZero, tanh-gated sandwich norms, swiglu linear_1/3->2,
LuminaLayerNormContinuous linear_1/linear_2; rope id scheme ``repo.py``:
caption ids (i,i,i), image axis0 = caption length). Fed through the REAL
import rules (``io/dit_importers.lumina2_rules``), with uneven caption
lengths to pin the dynamic-length rope + masking."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

DIM, NH, NKV, HD = 32, 2, 1, 16
CAP, FFN, P, C = 24, 64, 2, 4
AXES = (4, 6, 6)
N_LAYERS, N_REF = 2, 1
T_MAX = 6


def rms(x, w, eps=1e-5):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return x.float() * torch.rsqrt(v + eps) * w.float()


class RMS(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(d) * 0.1 + 1.0)

    def forward(self, x):
        return rms(x, self.weight)


class FF(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear_1 = nn.Linear(DIM, FFN, bias=False)
        self.linear_2 = nn.Linear(FFN, DIM, bias=False)
        self.linear_3 = nn.Linear(DIM, FFN, bias=False)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)) * self.linear_3(x))


def build_angles(ids):
    """ids [B, S, 3] -> angles [B, S, HD/2] (per-axis 1d rope, concatenated)."""
    outs = []
    for i, d in enumerate(AXES):
        freqs = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        outs.append(ids[..., i:i + 1].float() * freqs[None, None])
    return torch.cat(outs, dim=-1)


def apply_rope_t(x, ang):
    # x [B, S, H, D]; interleaved pairs
    xe, xo = x.float()[..., 0::2], x.float()[..., 1::2]
    c, s = torch.cos(ang)[:, :, None], torch.sin(ang)[:, :, None]
    oe, oo = xe * c - xo * s, xe * s + xo * c
    return torch.stack([oe, oo], dim=-1).reshape(x.shape)


class Attn(nn.Module):
    def __init__(self):
        super().__init__()
        self.to_q = nn.Linear(DIM, NH * HD, bias=False)
        self.to_k = nn.Linear(DIM, NKV * HD, bias=False)
        self.to_v = nn.Linear(DIM, NKV * HD, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(NH * HD, DIM, bias=False)])
        self.norm_q, self.norm_k = RMS(HD), RMS(HD)

    def forward(self, x, ang, key_ok=None):
        b, s, _ = x.shape
        q = self.norm_q(self.to_q(x).reshape(b, s, NH, HD))
        k = self.norm_k(self.to_k(x).reshape(b, s, NKV, HD))
        v = self.to_v(x).reshape(b, s, NKV, HD).float()
        q, k = apply_rope_t(q, ang), apply_rope_t(k, ang)
        k = k.repeat_interleave(NH // NKV, dim=2)
        v = v.repeat_interleave(NH // NKV, dim=2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        mask = None
        if key_ok is not None:
            mask = key_ok[:, None, None, :].expand(b, 1, s, s)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        return self.to_out[0](a.transpose(1, 2).reshape(b, s, NH * HD))


class Block(nn.Module):
    def __init__(self, modulation=True):
        super().__init__()
        self.attn = Attn()
        self.feed_forward = FF()
        if modulation:
            self.norm1 = nn.Module()
            self.norm1.linear = nn.Linear(min(DIM, 1024), 4 * DIM)
            self.norm1.norm = RMS(DIM)
        else:
            self.norm1 = RMS(DIM)
        self.norm2, self.ffn_norm1, self.ffn_norm2 = RMS(DIM), RMS(DIM), RMS(DIM)
        self.modulation = modulation

    def forward(self, x, ang, key_ok, temb=None):
        if self.modulation:
            mods = self.norm1.linear(torch.nn.functional.silu(temb)).chunk(4, dim=1)
            scale_msa, gate_msa, scale_mlp, gate_mlp = mods
            xn = self.norm1.norm(x) * (1 + scale_msa[:, None])
            a = self.attn(xn, ang, key_ok)
            x = x + gate_msa.unsqueeze(1).tanh() * self.norm2(a)
            mlp = self.feed_forward(self.ffn_norm1(x) * (1 + scale_mlp.unsqueeze(1)))
            x = x + gate_mlp.unsqueeze(1).tanh() * self.ffn_norm2(mlp)
        else:
            a = self.attn(self.norm1(x), ang, key_ok)
            x = x + self.norm2(a)
            x = x + self.ffn_norm2(self.feed_forward(self.ffn_norm1(x)))
        return x


class Lumina2Mirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.x_embedder = nn.Linear(P * P * C, DIM)
        tce = nn.Module()
        te = nn.Module()
        te.linear_1 = nn.Linear(256, min(DIM, 1024))
        te.linear_2 = nn.Linear(min(DIM, 1024), min(DIM, 1024))
        tce.timestep_embedder = te
        tce.caption_embedder = nn.Sequential(RMS(CAP), nn.Linear(CAP, DIM))
        self.time_caption_embed = tce
        self.noise_refiner = nn.ModuleList([Block(True) for _ in range(N_REF)])
        self.context_refiner = nn.ModuleList([Block(False) for _ in range(N_REF)])
        self.layers = nn.ModuleList([Block(True) for _ in range(N_LAYERS)])
        no = nn.Module()
        no.linear_1 = nn.Linear(min(DIM, 1024), DIM)
        no.linear_2 = nn.Linear(DIM, P * P * C)
        self.norm_out = no

    def forward(self, lat, t, cap, cap_mask):
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        n_img = hp * wp
        # patchify p-major '(p1 p2 c)' like the lumina family vae_flatten
        x = lat.view(b, c, hp, P, wp, P).permute(0, 2, 4, 3, 5, 1).reshape(b, n_img, P * P * C)
        x = self.x_embedder(x)

        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        targs = t.float()[:, None] * freqs[None]
        temb = self.time_caption_embed.timestep_embedder.linear_2(
            torch.nn.functional.silu(self.time_caption_embed.timestep_embedder.linear_1(
                torch.cat([torch.cos(targs), torch.sin(targs)], dim=-1))))
        cap = self.time_caption_embed.caption_embedder(cap)

        lens = cap_mask.sum(1)
        cap_ids = torch.arange(T_MAX)[None, :, None].expand(b, T_MAX, 3).clone()
        rows = torch.arange(hp)[:, None].expand(hp, wp).flatten()
        cols = torch.arange(wp)[None, :].expand(hp, wp).flatten()
        img_ids = torch.zeros(b, n_img, 3)
        img_ids[..., 0] = lens[:, None].float()
        img_ids[..., 1] = rows[None]
        img_ids[..., 2] = cols[None]
        cap_ang, img_ang = build_angles(cap_ids.float()), build_angles(img_ids)

        for blk in self.context_refiner:
            cap = blk(cap, cap_ang, cap_mask.bool())
        for blk in self.noise_refiner:
            x = blk(x, img_ang, None, temb)

        joint = torch.cat([cap, x], dim=1)
        ang = torch.cat([cap_ang, img_ang], dim=1)
        key_ok = torch.cat([cap_mask.bool(), torch.ones(b, n_img, dtype=torch.bool)], dim=1)
        for blk in self.layers:
            joint = blk(joint, ang, key_ok, temb)

        x = joint[:, T_MAX:]
        scale = self.norm_out.linear_1(torch.nn.functional.silu(temb))
        x = torch.nn.functional.layer_norm(x, (DIM,), eps=1e-6) * (1 + scale[:, None])
        x = self.norm_out.linear_2(x)
        x = x.view(b, hp, wp, P, P, C).permute(0, 5, 1, 3, 2, 4).reshape(b, C, h, w)
        return x


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
def test_lumina2_matches_torch_mirror(scan):
    from ai_toolkit_tpu.io.dit_importers import lumina2_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.flux_dit import pack_latents, unpack_latents
    from ai_toolkit_tpu.models.lumina2_dit import Lumina2Config, Lumina2DiT, lumina2_pos_angles

    torch.manual_seed(0)
    mirror = Lumina2Mirror().eval().float()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

    cfg = Lumina2Config.tiny(scan_blocks=scan)
    tree, unmatched = torch_to_tree(sd, lumina2_rules(scan))
    assert not unmatched, unmatched[:8]
    dit = Lumina2DiT(cfg)

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    cap = rng.normal(size=(2, T_MAX, CAP)).astype(np.float32)
    t = np.array([0.15, 0.7], np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)

    ta, ia = lumina2_pos_angles(cfg, 4, 4, jnp.asarray(mask.sum(1)), T_MAX)
    out = dit.apply({"params": tree}, pack_latents(jnp.asarray(lat)), jnp.asarray(cap),
                    jnp.asarray(t), jnp.asarray(mask, bool), ia, ta)
    ours = np.asarray(unpack_latents(out, 8, 8)).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                     torch.from_numpy(cap), torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_lumina2_rules_are_invertible():
    """tree_to_torch(lumina2_rules) round-trips (full-model export path)."""
    from ai_toolkit_tpu.io.dit_importers import lumina2_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch

    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in Lumina2Mirror().state_dict().items()}
    tree, unmatched = torch_to_tree(sd, lumina2_rules(False))
    assert not unmatched
    flat = tree_to_torch(tree, lumina2_rules(False))
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_allclose(flat[k], sd[k], atol=1e-6, err_msg=k)
