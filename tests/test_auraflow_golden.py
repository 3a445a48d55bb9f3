"""AuraFlow golden vs a hand-written torch mirror of diffusers'
``AuraFlowTransformer2DModel``, with the patchify/pos-embed semantics pinned
by the reference's vendored ``toolkit/models/auraflow.py:8-48`` (channel-major
``(c ph pw)`` patch tokens, learned absolute pos embed). The mirror follows
the diffusers module grammar the reference loads
(``stable_diffusion_model.py:606-611``): AdaLayerNormZero(bias=False,
fp32_layer_norm), the post-norm *sandwich* residual, bias-free attention with
per-head fp32-LN qk norm and context-first concatenation, SwiGLU
linear_1/linear_2/out_projection FFN, register tokens, pre-final scale/shift.
Fed through the REAL import rules (``io/dit_importers.auraflow_rules``)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

NH, HD = 2, 16
DIM = NH * HD
CTX, FFN, P, C = 24, 256, 2, 4
N_DOUBLE, N_SINGLE = 2, 2
POS_MAX, N_REG = 64, 2  # 8x8 learned grid
T = 5


def ln32(x):
    return F.layer_norm(x.float(), (x.shape[-1],), eps=1e-5)


class FF(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear_1 = nn.Linear(DIM, FFN, bias=False)
        self.linear_2 = nn.Linear(DIM, FFN, bias=False)
        self.out_projection = nn.Linear(FFN, DIM, bias=False)

    def forward(self, x):
        return self.out_projection(F.silu(self.linear_1(x)) * self.linear_2(x))


class AdaLNZero(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear = nn.Linear(DIM, 6 * DIM, bias=False)

    def forward(self, x, emb):
        mods = self.linear(F.silu(emb)).chunk(6, dim=1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
        x = ln32(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class Attn(nn.Module):
    def __init__(self, joint):
        super().__init__()
        self.to_q = nn.Linear(DIM, DIM, bias=False)
        self.to_k = nn.Linear(DIM, DIM, bias=False)
        self.to_v = nn.Linear(DIM, DIM, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(DIM, DIM, bias=False)])
        if joint:
            self.add_q_proj = nn.Linear(DIM, DIM, bias=False)
            self.add_k_proj = nn.Linear(DIM, DIM, bias=False)
            self.add_v_proj = nn.Linear(DIM, DIM, bias=False)
            self.to_add_out = nn.Linear(DIM, DIM, bias=False)
        self.joint = joint

    def forward(self, x, ctx=None):
        b, s, _ = x.shape
        q = ln32(self.to_q(x).view(b, s, NH, HD))
        k = ln32(self.to_k(x).view(b, s, NH, HD))
        v = self.to_v(x).view(b, s, NH, HD).float()
        if self.joint:
            t = ctx.shape[1]
            cq = ln32(self.add_q_proj(ctx).view(b, t, NH, HD))
            ck = ln32(self.add_k_proj(ctx).view(b, t, NH, HD))
            cv = self.add_v_proj(ctx).view(b, t, NH, HD).float()
            q = torch.cat([cq, q], dim=1)
            k = torch.cat([ck, k], dim=1)
            v = torch.cat([cv, v], dim=1)
        q, k, v = (u.transpose(1, 2) for u in (q, k, v))
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, -1, DIM)
        if self.joint:
            o_img, o_ctx = o[:, t:], o[:, :t]
            return self.to_out[0](o_img), self.to_add_out(o_ctx)
        return self.to_out[0](o)


class JointBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = AdaLNZero()
        self.norm1_context = AdaLNZero()
        self.attn = Attn(joint=True)
        self.ff = FF()
        self.ff_context = FF()

    def forward(self, x, ctx, temb):
        res_x, res_c = x, ctx
        xm, g_a, sh_m, sc_m, g_m = self.norm1(x, temb)
        cm, cg_a, csh_m, csc_m, cg_m = self.norm1_context(ctx, temb)
        a_x, a_c = self.attn(xm, cm)
        x = ln32(res_x + g_a.unsqueeze(1) * a_x)
        x = x * (1 + sc_m[:, None]) + sh_m[:, None]
        x = res_x + g_m.unsqueeze(1) * self.ff(x)
        ctx = ln32(res_c + cg_a.unsqueeze(1) * a_c)
        ctx = ctx * (1 + csc_m[:, None]) + csh_m[:, None]
        ctx = res_c + cg_m.unsqueeze(1) * self.ff_context(ctx)
        return x, ctx


class SingleBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = AdaLNZero()
        self.attn = Attn(joint=False)
        self.ff = FF()

    def forward(self, x, temb):
        res = x
        xm, g_a, sh_m, sc_m, g_m = self.norm1(x, temb)
        a = self.attn(xm)
        x = ln32(res + g_a.unsqueeze(1) * a)
        x = x * (1 + sc_m[:, None]) + sh_m[:, None]
        return res + g_m.unsqueeze(1) * self.ff(x)


class AuraFlowMirror(nn.Module):
    def __init__(self):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Linear(P * P * C, DIM)
        pe.pos_embed = nn.Parameter(torch.randn(1, POS_MAX, DIM) * 0.1)
        self.pos_embed = pe
        self.register_tokens = nn.Parameter(torch.randn(1, N_REG, DIM) * 0.02)
        self.context_embedder = nn.Linear(CTX, DIM, bias=False)
        tsp = nn.Module()
        tsp.linear_1 = nn.Linear(256, DIM)
        tsp.linear_2 = nn.Linear(DIM, DIM)
        self.time_step_proj = tsp
        self.joint_transformer_blocks = nn.ModuleList([JointBlock() for _ in range(N_DOUBLE)])
        self.single_transformer_blocks = nn.ModuleList([SingleBlock() for _ in range(N_SINGLE)])
        no = nn.Module()
        no.linear = nn.Linear(DIM, 2 * DIM, bias=False)
        self.norm_out = no
        self.proj_out = nn.Linear(DIM, P * P * C, bias=False)

    def pe_index(self, hp, wp):
        side = int(POS_MAX ** 0.5)
        idx = torch.arange(POS_MAX).view(side, side)
        sh, sw = side // 2 - hp // 2, side // 2 - wp // 2
        return idx[sh:sh + hp, sw:sw + wp].flatten()

    def forward(self, lat, t, txt):
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        # vendored AuraFlowPatchEmbed patchify: channel-major (c ph pw)
        x = lat.view(b, c, hp, P, wp, P).permute(0, 2, 4, 1, 3, 5).flatten(-3).flatten(1, 2)
        x = self.pos_embed.proj(x)
        x = x + self.pos_embed.pos_embed[:, self.pe_index(hp, wp)]

        # Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0, scale=1000)
        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * 1000.0 * freqs[None]
        t_sin = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_step_proj.linear_2(F.silu(self.time_step_proj.linear_1(t_sin)))

        ctx = self.context_embedder(txt)
        ctx = torch.cat([self.register_tokens.expand(b, -1, -1), ctx], dim=1)

        for blk in self.joint_transformer_blocks:
            x, ctx = blk(x, ctx, temb)
        t_ctx = ctx.shape[1]
        joint = torch.cat([ctx, x], dim=1)
        for blk in self.single_transformer_blocks:
            joint = blk(joint, temb)
        x = joint[:, t_ctx:]

        mod = self.norm_out.linear(F.silu(temb))
        scale, shift = torch.chunk(mod, 2, dim=1)
        x = x * (1 + scale)[:, None] + shift[:, None]
        x = self.proj_out(x)
        # diffusers unpatchify: nhwpqc -> nchpwq (patch-major, channels last)
        x = x.reshape(b, hp, wp, P, P, C)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, C, h, w)


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
def test_auraflow_matches_torch_mirror(scan):
    from ai_toolkit_tpu.io.dit_importers import auraflow_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.auraflow_dit import AuraFlowConfig, AuraFlowDiT
    from ai_toolkit_tpu.models.flux_dit import pack_latents_cmajor, unpack_latents

    torch.manual_seed(0)
    mirror = AuraFlowMirror().eval().float()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

    cfg = AuraFlowConfig.tiny(scan_blocks=scan)
    assert cfg.ffn_hidden == FFN and cfg.hidden_size == DIM
    tree, unmatched = torch_to_tree(sd, auraflow_rules(scan))
    assert not unmatched, unmatched[:8]
    dit = AuraFlowDiT(cfg)

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    txt = rng.normal(size=(2, T, CTX)).astype(np.float32)
    t = np.array([0.15, 0.7], np.float32)

    out = dit.apply({"params": tree}, pack_latents_cmajor(jnp.asarray(lat)),
                    jnp.asarray(txt), jnp.asarray(t), 4, 4)
    ours = np.asarray(unpack_latents(out, 8, 8)).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t), torch.from_numpy(txt)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_auraflow_rules_are_invertible():
    from ai_toolkit_tpu.io.dit_importers import auraflow_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch

    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in AuraFlowMirror().state_dict().items()}
    tree, unmatched = torch_to_tree(sd, auraflow_rules(False))
    assert not unmatched
    flat = tree_to_torch(tree, auraflow_rules(False))
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_allclose(flat[k], sd[k], atol=1e-6, err_msg=k)
