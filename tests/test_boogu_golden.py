"""Boogu-Image DiT golden: flax BooguDiT (padded-static layout) vs a torch
mirror implementing the reference's packed-sequence semantics
(extensions_built_in/diffusion_models/boogu_image/src/transformer.py) with
the diffusers checkpoint key names, loaded through the real import rules.

The mirror packs each sample's [caption_eff | image] tokens end-to-end and
loops per sample exactly like the vendored source; ours keeps padded
sequences + key masks. Matching image outputs proves the layouts equivalent.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import boogu_dit_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.boogu_dit import (  # noqa: E402
    BooguConfig,
    BooguDiT,
    boogu_patchify,
)


class RMS(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


class MNormZero(nn.Module):
    def __init__(self, dim, time_dim, eps):
        super().__init__()
        self.linear = nn.Linear(time_dim, 4 * dim)
        self.norm = RMS(dim, eps)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        s_msa, g_msa, s_mlp, g_mlp = emb.chunk(4, dim=1)
        return self.norm(x) * (1 + s_msa[:, None]), g_msa, s_mlp, g_mlp


class MFF(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.linear_1 = nn.Linear(dim, inner, bias=False)
        self.linear_2 = nn.Linear(inner, dim, bias=False)
        self.linear_3 = nn.Linear(dim, inner, bias=False)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x).float()).to(x.dtype) * self.linear_3(x))


def rope_tables(cfg):
    """Per-axis complex cis tables (float64, reference get_freqs_cis)."""
    out = []
    for d in cfg.axes_dim:
        freqs = 1.0 / cfg.theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        pos = np.arange(64, dtype=np.float64)
        out.append(torch.from_numpy(np.exp(1j * pos[:, None] * freqs[None])))
    return out


def gather_rope(tables, ids):
    """ids [B, S, 3] -> complex [B, S, D/2]."""
    parts = []
    for i, tab in enumerate(tables):
        parts.append(tab[ids[..., i].long()])
    return torch.cat(parts, dim=-1)


def apply_rope_t(x, fc):
    """x [B, S, H, D], fc complex [B, S, D/2] (reference apply_rotary_emb
    use_real=False)."""
    xr = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    return torch.view_as_real(xr * fc.unsqueeze(2)).flatten(3).type_as(x)


def sdpa_gqa(q, k, v, mask2d, cfg, fc):
    """q [B,S,Hq*D]; qk-norm applied by caller; rope fc for the sequence."""
    b, s = q.shape[0], q.shape[1]
    hd = cfg.head_dim
    q = q.view(b, s, -1, hd)
    k = k.view(b, s, -1, hd)
    v = v.view(b, s, -1, hd)
    return q, k, v


class MAttn(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, kvd = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim
        self.to_q = nn.Linear(d, d, bias=False)
        self.to_k = nn.Linear(d, kvd, bias=False)
        self.to_v = nn.Linear(d, kvd, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(d, d, bias=False), nn.Identity()])
        self.norm_q = RMS(cfg.head_dim, 1e-5)
        self.norm_k = RMS(cfg.head_dim, 1e-5)
        self.cfg = cfg

    def forward(self, x, mask2d, fc):
        cfg = self.cfg
        b, s = x.shape[0], x.shape[1]
        hd = cfg.head_dim
        q = self.norm_q(self.to_q(x).view(b, s, -1, hd))
        k = self.norm_k(self.to_k(x).view(b, s, -1, hd))
        v = self.to_v(x).view(b, s, -1, hd)
        q, k = apply_rope_t(q, fc), apply_rope_t(k, fc)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        rep = q.size(-3) // k.size(-3)
        k = k.repeat_interleave(rep, -3)
        v = v.repeat_interleave(rep, -3)
        am = None
        if mask2d is not None:
            am = mask2d.bool().view(b, 1, 1, -1)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=am, scale=hd ** -0.5)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[1](self.to_out[0](o))


class MBasic(nn.Module):
    def __init__(self, cfg, modulation=True):
        super().__init__()
        d, eps = cfg.hidden_size, cfg.norm_eps
        self.modulation = modulation
        self.attn = MAttn(cfg)
        self.feed_forward = MFF(d, cfg.ffn_dim)
        self.norm1 = MNormZero(d, cfg.time_dim, eps) if modulation else RMS(d, eps)
        self.norm2 = RMS(d, eps)
        self.ffn_norm1 = RMS(d, eps)
        self.ffn_norm2 = RMS(d, eps)

    def forward(self, x, mask2d, fc, temb=None):
        if self.modulation:
            xn, g_msa, s_mlp, g_mlp = self.norm1(x, temb)
            x = x + g_msa.unsqueeze(1).tanh() * self.norm2(self.attn(xn, mask2d, fc))
            mlp = self.feed_forward(self.ffn_norm1(x) * (1 + s_mlp.unsqueeze(1)))
            return x + g_mlp.unsqueeze(1).tanh() * self.ffn_norm2(mlp)
        xn = self.norm1(x)
        x = x + self.norm2(self.attn(xn, mask2d, fc))
        return x + self.ffn_norm2(self.feed_forward(self.ffn_norm1(x)))


class MProc(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, kvd = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim
        self.img_to_q = nn.Linear(d, d, bias=False)
        self.img_to_k = nn.Linear(d, kvd, bias=False)
        self.img_to_v = nn.Linear(d, kvd, bias=False)
        self.instruct_to_q = nn.Linear(d, d, bias=False)
        self.instruct_to_k = nn.Linear(d, kvd, bias=False)
        self.instruct_to_v = nn.Linear(d, kvd, bias=False)
        self.instruct_out = nn.Linear(d, d, bias=False)
        self.img_out = nn.Linear(d, d, bias=False)


class MJointAttn(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.processor = MProc(cfg)
        self.to_out = nn.ModuleList([nn.Linear(d, d, bias=False), nn.Identity()])
        self.norm_q = RMS(cfg.head_dim, 1e-5)
        self.norm_k = RMS(cfg.head_dim, 1e-5)


class MDouble(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, eps, td = cfg.hidden_size, cfg.norm_eps, cfg.time_dim
        self.cfg = cfg
        self.img_instruct_attn = MJointAttn(cfg)
        self.img_self_attn = MAttn(cfg)
        self.img_feed_forward = MFF(d, cfg.ffn_dim)
        self.instruct_feed_forward = MFF(d, cfg.ffn_dim)
        for n in ("img_norm1", "img_norm2", "img_norm3", "instruct_norm1",
                  "instruct_norm2"):
            setattr(self, n, MNormZero(d, td, eps))
        for n in ("img_ffn_norm1", "img_attn_norm", "img_self_attn_norm",
                  "img_ffn_norm2", "instruct_ffn_norm1", "instruct_attn_norm",
                  "instruct_ffn_norm2"):
            setattr(self, n, RMS(d, eps))

    def joint_attention(self, img_n, instr_n, cap_lens, joint_fc, seq_lens):
        """Reference BooguImageDoubleStreamSelfAttnProcessor with packed
        [instruct_eff | img] per-sample layout."""
        cfg, p = self.cfg, self.img_instruct_attn.processor
        b, limg, d = img_n.shape
        hd = cfg.head_dim
        max_seq = max(seq_lens)

        def pack(instr_t, img_t):
            out = img_t.new_zeros(b, max_seq, instr_t.shape[-1])
            for i in range(b):
                cl = cap_lens[i]
                out[i, :cl] = instr_t[i, :cl]
                out[i, cl:cl + limg] = img_t[i]
            return out

        q = pack(p.instruct_to_q(instr_n), p.img_to_q(img_n))
        k = pack(p.instruct_to_k(instr_n), p.img_to_k(img_n))
        v = pack(p.instruct_to_v(instr_n), p.img_to_v(img_n))
        q = self.img_instruct_attn.norm_q(q.view(b, max_seq, -1, hd))
        k = self.img_instruct_attn.norm_k(k.view(b, max_seq, -1, hd))
        v = v.view(b, max_seq, -1, hd)
        q, k = apply_rope_t(q, joint_fc), apply_rope_t(k, joint_fc)
        mask = torch.zeros(b, max_seq, dtype=torch.bool)
        for i, sl in enumerate(seq_lens):
            mask[i, :sl] = True
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        rep = q.size(-3) // k.size(-3)
        k = k.repeat_interleave(rep, -3)
        v = v.repeat_interleave(rep, -3)
        o = F.scaled_dot_product_attention(
            q, k, v, attn_mask=mask.view(b, 1, 1, -1), scale=hd ** -0.5)
        o = o.transpose(1, 2).reshape(b, max_seq, -1)
        # split, per-stream out, shared out (reference zeroes pads)
        instr_o = o.new_zeros(b, instr_n.shape[1], d)
        img_o = o.new_zeros(b, limg, d)
        for i in range(b):
            cl = cap_lens[i]
            instr_o[i, :cl] = o[i, :cl]
            img_o[i] = o[i, cl:cl + limg]
        instr_o = self.img_instruct_attn.to_out[0](p.instruct_out(instr_o))
        img_o = self.img_instruct_attn.to_out[0](p.img_out(img_o))
        return img_o, instr_o

    def forward(self, img, instr, cap_lens, img_fc, joint_fc, seq_lens, temb):
        i_n1, i_gmsa, i_smlp, i_gmlp = self.img_norm1(img, temb)
        i_n2, i_shift, _, _ = self.img_norm2(img, temb)
        i_n3, i_gself, _, _ = self.img_norm3(img, temb)
        t_n1, t_gmsa, t_smlp, t_gmlp = self.instruct_norm1(instr, temb)
        t_n2, t_shift, _, _ = self.instruct_norm2(instr, temb)

        img_att, instr_att = self.joint_attention(i_n1, t_n1, cap_lens, joint_fc, seq_lens)
        self_att = self.img_self_attn(i_n3, None, img_fc)

        img = img + i_gmsa.unsqueeze(1).tanh() * self.img_attn_norm(img_att)
        img = img + i_gself.unsqueeze(1).tanh() * self.img_self_attn_norm(self_att)
        i_mlp_in = (1 + i_smlp.unsqueeze(1)) * i_n2 + i_shift.unsqueeze(1)
        i_mlp = self.img_feed_forward(self.img_ffn_norm1(i_mlp_in))
        img = img + i_gmlp.unsqueeze(1).tanh() * self.img_ffn_norm2(i_mlp)

        instr = instr + t_gmsa.unsqueeze(1).tanh() * self.instruct_attn_norm(instr_att)
        t_mlp_in = (1 + t_smlp.unsqueeze(1)) * t_n2 + t_shift.unsqueeze(1)
        t_mlp = self.instruct_feed_forward(self.instruct_ffn_norm1(t_mlp_in))
        instr = instr + t_gmlp.unsqueeze(1).tanh() * self.instruct_ffn_norm2(t_mlp)
        return img, instr


class MTimeCaption(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.timestep_embedder = nn.Module()
        self.timestep_embedder.linear_1 = nn.Linear(256, cfg.time_dim)
        self.timestep_embedder.linear_2 = nn.Linear(cfg.time_dim, cfg.time_dim)
        self.caption_embedder = nn.Sequential(
            RMS(cfg.instruction_feat_dim, cfg.norm_eps),
            nn.Linear(cfg.instruction_feat_dim, cfg.hidden_size),
        )
        self.scale = cfg.timestep_scale

    def forward(self, t, instr):
        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        ang = t.float()[:, None] * freqs[None] * self.scale
        proj = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)
        te = self.timestep_embedder.linear_2(F.silu(self.timestep_embedder.linear_1(proj)))
        return te, self.caption_embedder(instr)


class MNormOut(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.hidden_size
        self.linear_1 = nn.Linear(cfg.time_dim, d)
        self.linear_2 = nn.Linear(d, cfg.patch_size ** 2 * cfg.in_channels)

    def forward(self, x, temb):
        scale = self.linear_1(F.silu(temb))
        x = F.layer_norm(x.float(), (x.shape[-1],), eps=1e-6).to(x.dtype)
        return self.linear_2(x * (1 + scale)[:, None])


class MBoogu(nn.Module):
    """Packed-layout mirror of BooguImageTransformer2DModel (t2i path,
    optional single reference image)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        pc = cfg.patch_size ** 2 * cfg.in_channels
        self.x_embedder = nn.Linear(pc, d)
        self.ref_image_patch_embedder = nn.Linear(pc, d)
        self.time_caption_embed = MTimeCaption(cfg)
        self.noise_refiner = nn.ModuleList(
            [MBasic(cfg) for _ in range(cfg.num_refiner_layers)])
        self.ref_image_refiner = nn.ModuleList(
            [MBasic(cfg) for _ in range(cfg.num_refiner_layers)])
        self.context_refiner = nn.ModuleList(
            [MBasic(cfg, modulation=False) for _ in range(cfg.num_refiner_layers)])
        self.double_stream_layers = nn.ModuleList(
            [MDouble(cfg) for _ in range(cfg.num_double_stream_layers)])
        self.single_stream_layers = nn.ModuleList(
            [MBasic(cfg) for _ in range(cfg.num_single_stream_layers)])
        self.norm_out = MNormOut(cfg)
        self.image_index_embedding = nn.Parameter(torch.randn(5, d))

    def forward(self, img_tokens, instr, t, instr_mask, hw, ref=None, ref_hw=None):
        cfg = self.cfg
        b, limg, _ = img_tokens.shape
        li = instr.shape[1]
        h_tok, w_tok = hw
        tables = rope_tables(cfg)
        cap_lens = instr_mask.sum(1).tolist()

        temb, instr_h = self.time_caption_embed(t, instr)

        # text rope: arange ids on every axis (per reference)
        txt_ids = torch.arange(li, dtype=torch.int64)[None, :, None].repeat(b, 1, 3)
        for i in range(b):
            txt_ids[i, cap_lens[i]:] = 0  # reference zero-pads position ids
        txt_fc = gather_rope(tables, txt_ids)

        rows = torch.arange(h_tok).repeat_interleave(w_tok)
        cols = torch.arange(w_tok).repeat(h_tok)
        img_ids = torch.zeros(b, limg, 3, dtype=torch.int64)
        lref = 0
        ref_fc = None
        if ref is not None:
            rh, rw = ref_hw
            lref = rh * rw
            r_rows = torch.arange(rh).repeat_interleave(rw)
            r_cols = torch.arange(rw).repeat(rh)
            ref_ids = torch.zeros(b, lref, 3, dtype=torch.int64)
            for i in range(b):
                ref_ids[i, :, 0] = cap_lens[i]
                ref_ids[i, :, 1] = r_rows
                ref_ids[i, :, 2] = r_cols
            ref_fc = gather_rope(tables, ref_ids)
        for i in range(b):
            shift = cap_lens[i] + (max(ref_hw) if ref is not None else 0)
            img_ids[i, :, 0] = shift
            img_ids[i, :, 1] = rows
            img_ids[i, :, 2] = cols
        img_fc = gather_rope(tables, img_ids)

        for layer in self.context_refiner:
            instr_h = layer(instr_h, instr_mask, txt_fc)

        x = self.x_embedder(img_tokens)
        for layer in self.noise_refiner:
            x = layer(x, None, img_fc, temb)

        if ref is not None:
            r = self.ref_image_patch_embedder(ref) + self.image_index_embedding[0]
            for layer in self.ref_image_refiner:
                r = layer(r, None, ref_fc, temb)
            x = torch.cat([r, x], dim=1)
            img_fc = torch.cat([ref_fc, img_fc], dim=1)

        lcomb = x.shape[1]
        seq_lens = [cl + lcomb for cl in cap_lens]
        max_seq = max(seq_lens)

        # joint rope in the PACKED layout: [cap_eff | combined img]
        joint_fc = torch.zeros(b, max_seq, txt_fc.shape[-1], dtype=txt_fc.dtype)
        for i in range(b):
            cl = cap_lens[i]
            joint_fc[i, :cl] = txt_fc[i, :cl]
            joint_fc[i, cl:cl + lcomb] = img_fc[i]

        for layer in self.double_stream_layers:
            x, instr_h = layer(x, instr_h, cap_lens, img_fc, joint_fc, seq_lens, temb)

        # fuse to packed joint sequence
        joint = x.new_zeros(b, max_seq, cfg.hidden_size)
        jmask = torch.zeros(b, max_seq, dtype=torch.bool)
        for i in range(b):
            cl = cap_lens[i]
            joint[i, :cl] = instr_h[i, :cl]
            joint[i, cl:cl + lcomb] = x[i]
            jmask[i, :cl + lcomb] = True

        for layer in self.single_stream_layers:
            joint = layer(joint, jmask, joint_fc, temb)

        out = self.norm_out(joint, temb)
        res = out.new_zeros(b, limg, out.shape[-1])
        for i in range(b):
            sl = seq_lens[i]
            res[i] = out[i, sl - limg:sl]
        return res


def _run_pair(cfg, scan, with_ref=False, seed=0):
    torch.manual_seed(seed)
    tm = MBoogu(cfg).eval().double()
    for p_ in tm.parameters():
        p_.data = torch.randn_like(p_) * 0.08
    tm = tm.float()
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    import dataclasses

    jcfg = dataclasses.replace(cfg, scan_blocks=scan)
    tree, unmatched = torch_to_tree(
        flat, boogu_dit_rules(scan, cfg.num_refiner_layers))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(seed)
    b, h_tok, w_tok = 2, 3, 2
    li = 6
    pc = cfg.patch_size ** 2 * cfg.in_channels
    img = rng.normal(size=(b, h_tok * w_tok, pc)).astype(np.float32)
    instr = rng.normal(size=(b, li, cfg.instruction_feat_dim)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    mask = np.asarray([[1, 1, 1, 1, 1, 0], [1, 1, 1, 0, 0, 0]], np.int32)
    ref = ref_hw = None
    tref = None
    if with_ref:
        ref_hw = (2, 2)
        ref = rng.normal(size=(b, 4, pc)).astype(np.float32)
        tref = torch.from_numpy(ref)

    dit = BooguDiT(jcfg)
    init = dit.init(jax.random.key(0), jnp.asarray(img), jnp.asarray(instr),
                    jnp.asarray(t), jnp.asarray(mask), (h_tok, w_tok),
                    jnp.asarray(ref) if ref is not None else None, ref_hw)["params"]
    # every imported leaf must land on an existing param
    def _paths(d, p=()):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from _paths(v, p + (k,))
            else:
                yield p + (k,), np.shape(v)
    ip = dict(_paths(tree))
    jp = dict(_paths(jax.tree.map(np.asarray, init)))
    assert set(ip) == set(jp), (set(ip) ^ set(jp))
    for k in ip:
        assert ip[k] == jp[k], (k, ip[k], jp[k])

    j_out = dit.apply({"params": tree}, jnp.asarray(img), jnp.asarray(instr),
                      jnp.asarray(t), jnp.asarray(mask), (h_tok, w_tok),
                      jnp.asarray(ref) if ref is not None else None, ref_hw)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(img), torch.from_numpy(instr),
                   torch.from_numpy(t), torch.from_numpy(mask), (h_tok, w_tok),
                   tref, ref_hw).numpy()
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("scan", [False, True])
def test_boogu_golden(scan):
    _run_pair(BooguConfig.tiny(), scan)


def test_boogu_golden_with_ref_image():
    """Edit path: one reference image stream through ref_image_refiner with
    image_index_embedding and rope pe_shift."""
    _run_pair(BooguConfig.tiny(), False, with_ref=True)


def test_boogu_model_wrapper_shapes():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("boogu_image")(
        ModelConfig(arch="boogu_image", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(32, 32)
    cond = model.encode_prompt(variables, ["a thing", "b"])
    noisy = jax.random.normal(jax.random.key(1), (2, h, w, c))
    out = model.predict(variables, noisy, jnp.asarray([0.5, 0.9]), cond)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()
