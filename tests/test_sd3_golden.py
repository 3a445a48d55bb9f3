"""SD3/SD3.5 MMDiT golden vs a hand-written torch mirror of diffusers'
SD3Transformer2DModel (reference loads it at
``toolkit/stable_diffusion_model.py:396``), fed through the REAL import path
(``io/sd3_import.sd3_dit_tree``). Exercises every exact-layout feature at
once: conv patch embed + center-cropped learned pos table, a dual-attention
(sd3.5-medium attn2) block, a standard joint block, the context_pre_only
final block, q/k RMSNorm, and the (scale, shift) norm_out swap."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

D, NH, HD, CTX, VEC, C, P = 64, 4, 16, 48, 40, 4, 2
MAXP = 8  # pos table grid


def t_emb(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t.float()[:, None] * 1000.0 * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class MLP2(nn.Module):
    def __init__(self, din, d):
        super().__init__()
        self.linear_1 = nn.Linear(din, d)
        self.linear_2 = nn.Linear(d, d)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)))


class TimeText(nn.Module):
    def __init__(self):
        super().__init__()
        self.timestep_embedder = MLP2(256, D)
        self.text_embedder = MLP2(VEC, D)

    def forward(self, t, pooled):
        return self.timestep_embedder(t_emb(t)) + self.text_embedder(pooled)


class PatchEmbedM(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Conv2d(C, D, P, P)
        self.pos_embed = nn.Parameter(torch.randn(1, MAXP * MAXP, D) * 0.05)

    def forward(self, lat):
        b, c, h, w = lat.shape
        x = self.proj(lat).flatten(2).transpose(1, 2)  # [B, N, D]
        h2, w2 = h // P, w // P
        top, left = (MAXP - h2) // 2, (MAXP - w2) // 2
        grid = self.pos_embed.reshape(1, MAXP, MAXP, D)[:, top:top + h2, left:left + w2]
        return x + grid.reshape(1, h2 * w2, D)


class AdaLNZero(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.linear = nn.Linear(D, n * D)

    def forward(self, emb):
        return self.linear(torch.nn.functional.silu(emb)).chunk(
            self.linear.out_features // D, dim=-1)


class RMS(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(d) * 0.1 + 1.0)

    def forward(self, x):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + 1e-6) * self.weight.float()).to(x.dtype)


class GELUProj(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = nn.Linear(din, dout)

    def forward(self, x):
        return torch.nn.functional.gelu(self.proj(x), approximate="tanh")


class FF(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = nn.ModuleList([GELUProj(D, 4 * D), nn.Identity(), nn.Linear(4 * D, D)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class JointAttn(nn.Module):
    def __init__(self, pre_only=False, qk_norm=True):
        super().__init__()
        self.to_q = nn.Linear(D, D)
        self.to_k = nn.Linear(D, D)
        self.to_v = nn.Linear(D, D)
        self.add_q_proj = nn.Linear(D, D)
        self.add_k_proj = nn.Linear(D, D)
        self.add_v_proj = nn.Linear(D, D)
        self.to_out = nn.ModuleList([nn.Linear(D, D)])
        if not pre_only:
            self.to_add_out = nn.Linear(D, D)
        if qk_norm:
            self.norm_q, self.norm_k = RMS(HD), RMS(HD)
            self.norm_added_q, self.norm_added_k = RMS(HD), RMS(HD)
        self.pre_only, self.qk_norm = pre_only, qk_norm

    def heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, NH, HD).transpose(1, 2)

    def forward(self, x, ctx):
        q, k, v = self.heads(self.to_q(x)), self.heads(self.to_k(x)), self.heads(self.to_v(x))
        cq, ck, cv = (self.heads(self.add_q_proj(ctx)), self.heads(self.add_k_proj(ctx)),
                      self.heads(self.add_v_proj(ctx)))
        if self.qk_norm:
            q, k = self.norm_q(q), self.norm_k(k)
            cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
        q = torch.cat([q, cq], dim=2)
        k = torch.cat([k, ck], dim=2)
        v = torch.cat([v, cv], dim=2)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(x.shape[0], -1, D)
        s_img = x.shape[1]
        img, c = a[:, :s_img], a[:, s_img:]
        img = self.to_out[0](img)
        if self.pre_only:
            return img, None
        return img, self.to_add_out(c)


class SelfAttn(nn.Module):
    def __init__(self, qk_norm=True):
        super().__init__()
        self.to_q = nn.Linear(D, D)
        self.to_k = nn.Linear(D, D)
        self.to_v = nn.Linear(D, D)
        self.to_out = nn.ModuleList([nn.Linear(D, D)])
        if qk_norm:
            self.norm_q, self.norm_k = RMS(HD), RMS(HD)
        self.qk_norm = qk_norm

    def forward(self, x):
        b, s, _ = x.shape
        def h(t):
            return t.reshape(b, s, NH, HD).transpose(1, 2)
        q, k, v = h(self.to_q(x)), h(self.to_k(x)), h(self.to_v(x))
        if self.qk_norm:
            q, k = self.norm_q(q), self.norm_k(k)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](a.transpose(1, 2).reshape(b, s, D))


class ContinuousNorm(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear = nn.Linear(D, 2 * D)

    def forward(self, x, emb):
        scale, shift = self.linear(torch.nn.functional.silu(emb)).chunk(2, dim=-1)
        x = torch.nn.functional.layer_norm(x, (D,), eps=1e-6)
        return x * (1 + scale[:, None]) + shift[:, None]


class Block(nn.Module):
    def __init__(self, dual=False, pre_only=False, qk_norm=True):
        super().__init__()
        self.norm1 = AdaLNZero(9 if dual else 6)
        self.norm1_context = ContinuousNorm() if pre_only else AdaLNZero(6)
        self.attn = JointAttn(pre_only, qk_norm)
        if dual:
            self.attn2 = SelfAttn(qk_norm)
        self.ff = FF()
        if not pre_only:
            self.ff_context = FF()
        self.dual, self.pre_only = dual, pre_only

    def forward(self, x, ctx, emb):
        ln = torch.nn.functional.layer_norm(x, (D,), eps=1e-6)
        mods = self.norm1(emb)
        sh1, sc1, g1, sh2, sc2, g2 = mods[:6]
        xn = ln * (1 + sc1[:, None]) + sh1[:, None]
        if self.pre_only:
            cn = self.norm1_context(ctx, emb)
        else:
            csh1, csc1, cg1, csh2, csc2, cg2 = self.norm1_context(emb)
            cln = torch.nn.functional.layer_norm(ctx, (D,), eps=1e-6)
            cn = cln * (1 + csc1[:, None]) + csh1[:, None]
        a_img, a_ctx = self.attn(xn, cn)
        x = x + g1[:, None] * a_img
        if self.dual:
            sh3, sc3, g3 = mods[6:]
            xn2 = ln * (1 + sc3[:, None]) + sh3[:, None]
            x = x + g3[:, None] * self.attn2(xn2)
        xm = torch.nn.functional.layer_norm(x, (D,), eps=1e-6)
        x = x + g2[:, None] * self.ff(xm * (1 + sc2[:, None]) + sh2[:, None])
        if self.pre_only:
            return x, None
        ctx = ctx + cg1[:, None] * a_ctx
        cm = torch.nn.functional.layer_norm(ctx, (D,), eps=1e-6)
        ctx = ctx + cg2[:, None] * self.ff_context(cm * (1 + csc2[:, None]) + csh2[:, None])
        return x, ctx


class SD3Mirror(nn.Module):
    def __init__(self, qk_norm=True, n_dual=1, depth=3):
        super().__init__()
        self.pos_embed = PatchEmbedM()
        self.context_embedder = nn.Linear(CTX, D)
        self.time_text_embed = TimeText()
        blocks = []
        for i in range(depth):
            blocks.append(Block(dual=i < n_dual, pre_only=i == depth - 1, qk_norm=qk_norm))
        self.transformer_blocks = nn.ModuleList(blocks)
        self.norm_out = ContinuousNorm()
        self.proj_out = nn.Linear(D, P * P * C)

    def forward(self, lat, t, txt, pooled):
        b, c, h, w = lat.shape
        x = self.pos_embed(lat)
        ctx = self.context_embedder(txt)
        emb = self.time_text_embed(t, pooled)
        for blk in self.transformer_blocks:
            x, ctx2 = blk(x, ctx, emb)
            ctx = ctx2 if ctx2 is not None else ctx
        x = self.norm_out(x, emb)
        x = self.proj_out(x)
        # diffusers unpatchify: nhwpqc -> nchpwq
        x = x.reshape(b, h // P, w // P, P, P, C)
        return torch.einsum("nhwpqc->nchpwq", x).reshape(b, C, h, w)


def _run_ours(sd, scan):
    from ai_toolkit_tpu.io.sd3_import import sd3_dit_tree
    from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT, pack_latents, unpack_latents

    cfg = FluxConfig(
        in_channels=C * P * P, hidden_size=D, num_heads=NH, head_dim=HD,
        depth_double=3, depth_single=0, context_dim=CTX, vec_dim=VEC,
        guidance_embed=False, axes_dim=(HD,), dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False, scan_blocks=scan,
        qk_norm=True, final_context_pre_only=True, dual_attention_layers=1,
        pos_embed_max_size=MAXP,
    )
    tree, unmatched = sd3_dit_tree({k: v.numpy() for k, v in sd.items()}, cfg)
    assert not unmatched, unmatched[:8]
    dit = FluxDiT(cfg)

    rng = np.random.default_rng(0)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    txt = rng.normal(size=(2, 6, CTX)).astype(np.float32)
    pooled = rng.normal(size=(2, VEC)).astype(np.float32)
    t = np.array([0.25, 0.8], np.float32)

    n_img, n_txt = 16, 6
    pe = jnp.zeros((1, n_txt + n_img, HD // 2, 2, 2))
    pe = pe.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    h2, w2 = 4, 4
    top, left = (MAXP - h2) // 2, (MAXP - w2) // 2
    rows = np.arange(top, top + h2)[:, None] * MAXP + np.arange(left, left + w2)[None]
    pos_ids = jnp.asarray(rows.reshape(-1), jnp.int32)

    out = dit.apply({"params": tree}, pack_latents(jnp.asarray(lat)), jnp.asarray(txt),
                    jnp.asarray(t), jnp.asarray(pooled), pe, None, pos_ids=pos_ids)
    ours = np.asarray(unpack_latents(out, 8, 8)).transpose(0, 3, 1, 2)
    return lat, txt, pooled, t, ours


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
def test_sd3_mmdit_matches_torch_mirror(scan):
    torch.manual_seed(0)
    mirror = SD3Mirror().eval()
    sd = mirror.state_dict()
    lat, txt, pooled, t, ours = _run_ours(sd, scan)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                     torch.from_numpy(txt), torch.from_numpy(pooled)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_sd3_export_import_roundtrip(tmp_path):
    """export (sd3_flat) is the exact inverse of sd3_dit_tree."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.io.full_export import export_full_model
    from ai_toolkit_tpu.io.sd3_import import load_sd3_checkpoint
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("sd3")(ModelConfig(arch="sd3", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    written = export_full_model(model, variables, str(tmp_path))
    assert any("transformer" in p for p in written)
    import safetensors.numpy as stnp
    flat = stnp.load_file(
        str(tmp_path / "transformer" / "diffusion_pytorch_model.safetensors"))
    assert "pos_embed.pos_embed" in flat
    assert "norm_out.linear.weight" in flat
    # tiny depth=2: block 0 standard, block 1 context_pre_only
    assert "transformer_blocks.1.norm1_context.linear.weight" in flat
    assert "transformer_blocks.1.attn.to_add_out.weight" not in flat
    re = load_sd3_checkpoint(str(tmp_path), model)
    a = jax.tree.map(np.asarray, variables["dit"])
    b = jax.tree.map(np.asarray, re["dit"])
    flat_a = {k: v for k, v in _walk(a)}
    flat_b = {k: v for k, v in _walk(b)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], atol=2e-3, rtol=2e-3, err_msg=k)


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), np.asarray(v, np.float32)
