"""FluxDiT golden numerics vs a hand-written torch mirror of the BFL flux
transformer (the reference's vendored model family, e.g.
``extensions_built_in/diffusion_models/chroma/src`` shares this exact math).

The mirror carries BFL state-dict keys (``double_blocks.N.img_attn.qkv`` …)
and is imported through the real ``flux_dit_rules`` path, pinning: sinusoidal
timestep embedding, MLPEmbedder vec path, modulation chunk order
(shift/scale/gate x2), per-head QK RMSNorm, multi-axis rope rotation,
joint [txt|img] attention, the fused single-block linear1 split, tanh-GELU
MLPs, and the final adaLN layer — everything checkpoint imports rely on.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import Tensor, nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

from ai_toolkit_tpu.io.flux_import import flux_dit_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.flux_dit import FluxConfig, FluxDiT  # noqa: E402
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope  # noqa: E402

H, NH, HD, DD, DS = 64, 4, 16, 2, 2
CTX, VEC, IN_CH = 64, 64, 16
AXES = (4, 6, 6)
THETA = 10_000.0


def t_timestep_embedding(t: Tensor, dim: int, time_factor: float = 1000.0) -> Tensor:
    t = t.float() * time_factor
    half = dim // 2
    freqs = torch.exp(-math.log(10_000.0) * torch.arange(half).float() / half)
    args = t[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_rope(pos: Tensor, dim: int) -> Tensor:
    scale = torch.arange(0, dim, 2).float() / dim
    omega = 1.0 / (THETA ** scale)
    out = torch.einsum("...n,d->...nd", pos.float(), omega)
    out = torch.stack([out.cos(), -out.sin(), out.sin(), out.cos()], dim=-1)
    return out.reshape(*out.shape[:-1], 2, 2)


def t_apply_rope(x: Tensor, freqs: Tensor) -> Tensor:
    # x: [B, H, S, D]; freqs: [B, 1, S, D/2, 2, 2]
    xf = x.float().reshape(*x.shape[:-1], -1, 1, 2)
    out = freqs[..., 0] * xf[..., 0] + freqs[..., 1] * xf[..., 1]
    return out.reshape(x.shape)


class TMLPEmbedder(nn.Module):
    def __init__(self, din, h):
        super().__init__()
        self.in_layer = nn.Linear(din, h)
        self.out_layer = nn.Linear(h, h)

    def forward(self, x):
        return self.out_layer(F.silu(self.in_layer(x)))


class TRMS(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(d))

    def forward(self, x):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-6)) * self.scale


class TQKNorm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.query_norm = TRMS(d)
        self.key_norm = TRMS(d)


class TModulation(nn.Module):
    def __init__(self, h, mult):
        super().__init__()
        self.lin = nn.Linear(h, mult * 3 * h)
        self.mult = mult

    def forward(self, vec):
        return self.lin(F.silu(vec))[:, None].chunk(self.mult * 3, dim=-1)


def t_attention(q, k, v, pe):
    q = t_apply_rope(q, pe)
    k = t_apply_rope(k, pe)
    attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(q.shape[-1]), dim=-1) @ v
    b, h, s, d = attn.shape
    return attn.transpose(1, 2).reshape(b, s, h * d)


class TDouble(nn.Module):
    def __init__(self):
        super().__init__()
        mlp = 4 * H
        self.img_mod = TModulation(H, 2)
        self.txt_mod = TModulation(H, 2)
        for p in ("img", "txt"):
            attn = nn.Module()
            attn.qkv = nn.Linear(H, 3 * H)
            attn.norm = TQKNorm(HD)
            attn.proj = nn.Linear(H, H)
            setattr(self, f"{p}_attn", attn)
            setattr(self, f"{p}_mlp", nn.Sequential(
                nn.Linear(H, mlp), nn.GELU(approximate="tanh"), nn.Linear(mlp, H)))

    def forward(self, img, txt, vec, pe):
        i_s1, i_c1, i_g1, i_s2, i_c2, i_g2 = self.img_mod(vec)
        t_s1, t_c1, t_g1, t_s2, t_c2, t_g2 = self.txt_mod(vec)

        def qkv_heads(x, attn):
            b, s, _ = x.shape
            q, k, v = attn.qkv(x).reshape(b, s, 3, NH, HD).permute(2, 0, 3, 1, 4)
            return attn.norm.query_norm(q).to(v.dtype), attn.norm.key_norm(k).to(v.dtype), v

        img_n = F.layer_norm(img, (H,)) * (1 + i_c1) + i_s1
        txt_n = F.layer_norm(txt, (H,)) * (1 + t_c1) + t_s1
        iq, ik, iv = qkv_heads(img_n, self.img_attn)
        tq, tk, tv = qkv_heads(txt_n, self.txt_attn)
        q = torch.cat([tq, iq], dim=2)
        k = torch.cat([tk, ik], dim=2)
        v = torch.cat([tv, iv], dim=2)
        attn = t_attention(q, k, v, pe)
        t_a, i_a = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]
        img = img + i_g1 * self.img_attn.proj(i_a)
        img = img + i_g2 * self.img_mlp(F.layer_norm(img, (H,)) * (1 + i_c2) + i_s2)
        txt = txt + t_g1 * self.txt_attn.proj(t_a)
        txt = txt + t_g2 * self.txt_mlp(F.layer_norm(txt, (H,)) * (1 + t_c2) + t_s2)
        return img, txt


class TSingle(nn.Module):
    def __init__(self):
        super().__init__()
        mlp = 4 * H
        self.linear1 = nn.Linear(H, 3 * H + mlp)
        self.linear2 = nn.Linear(H + mlp, H)
        self.norm = TQKNorm(HD)
        self.modulation = TModulation(H, 1)

    def forward(self, x, vec, pe):
        shift, scale, gate = self.modulation(vec)
        xn = F.layer_norm(x, (H,)) * (1 + scale) + shift
        qkv, mlp = torch.split(self.linear1(xn), [3 * H, 4 * H], dim=-1)
        b, s, _ = xn.shape
        q, k, v = qkv.reshape(b, s, 3, NH, HD).permute(2, 0, 3, 1, 4)
        q = self.norm.query_norm(q).to(v.dtype)
        k = self.norm.key_norm(k).to(v.dtype)
        attn = t_attention(q, k, v, pe)
        out = self.linear2(torch.cat([attn, F.gelu(mlp, approximate="tanh")], dim=-1))
        return x + gate * out


class TFlux(nn.Module):
    def __init__(self):
        super().__init__()
        self.img_in = nn.Linear(IN_CH, H)
        self.txt_in = nn.Linear(CTX, H)
        self.time_in = TMLPEmbedder(256, H)
        self.guidance_in = TMLPEmbedder(256, H)
        self.vector_in = TMLPEmbedder(VEC, H)
        self.double_blocks = nn.ModuleList([TDouble() for _ in range(DD)])
        self.single_blocks = nn.ModuleList([TSingle() for _ in range(DS)])
        self.final_layer = nn.Module()
        self.final_layer.linear = nn.Linear(H, IN_CH)
        self.final_layer.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(H, 2 * H))

    def forward(self, img, txt, t, y, g, ids):
        img = self.img_in(img)
        txt = self.txt_in(txt)
        vec = self.time_in(t_timestep_embedding(t, 256))
        vec = vec + self.guidance_in(t_timestep_embedding(g, 256))
        vec = vec + self.vector_in(y)
        pe = torch.cat(
            [t_rope(ids[..., i], AXES[i]) for i in range(3)], dim=-3
        )[:, None]  # [B, 1, S, D/2, 2, 2]
        for blk in self.double_blocks:
            img, txt = blk(img, txt, vec, pe)
        x = torch.cat([txt, img], dim=1)
        for blk in self.single_blocks:
            x = blk(x, vec, pe)
        x = x[:, txt.shape[1]:]
        shift, scale = self.final_layer.adaLN_modulation(vec)[:, None].chunk(2, dim=-1)
        x = F.layer_norm(x, (H,)) * (1 + scale) + shift
        return self.final_layer.linear(x)


def test_flux_dit_matches_torch_mirror():
    cfg = FluxConfig(
        in_channels=IN_CH, hidden_size=H, num_heads=NH, head_dim=HD,
        depth_double=DD, depth_single=DS, context_dim=CTX, vec_dim=VEC,
        axes_dim=AXES, guidance_embed=True, dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False, scan_blocks=False,
    )
    torch.manual_seed(0)
    tm = TFlux().eval()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, flux_dit_rules(scan_blocks=False))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    n_txt, hh, ww = 4, 4, 4
    img = rng.normal(size=(2, hh * ww, IN_CH)).astype(np.float32)
    txt = rng.normal(size=(2, n_txt, CTX)).astype(np.float32)
    t = np.asarray([0.25, 0.8], np.float32)
    y = rng.normal(size=(2, VEC)).astype(np.float32)
    g = np.asarray([1.0, 4.0], np.float32)
    ids = np.asarray(image_position_ids(hh, ww, text_len=n_txt))  # [S, 3]
    ids_b = np.broadcast_to(ids[None], (2,) + ids.shape).copy()

    with torch.no_grad():
        ref = tm(torch.from_numpy(img), torch.from_numpy(txt), torch.from_numpy(t),
                 torch.from_numpy(y), torch.from_numpy(g), torch.from_numpy(ids_b))

    ours = FluxDiT(cfg)
    pe = multi_axis_rope(jnp.asarray(ids)[None], list(AXES), THETA)
    out = ours.apply({"params": tree}, jnp.asarray(img), jnp.asarray(txt),
                     jnp.asarray(t), jnp.asarray(y), pe, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=2e-4)

    # also the scanned layout through the *stacked* import rules
    cfg_s = FluxConfig(**{**cfg.__dict__, "scan_blocks": True})
    tree_s, unmatched_s = torch_to_tree(flat, flux_dit_rules(scan_blocks=True))
    assert not unmatched_s, unmatched_s[:8]
    out_s = FluxDiT(cfg_s).apply({"params": tree_s}, jnp.asarray(img), jnp.asarray(txt),
                                 jnp.asarray(t), jnp.asarray(y), pe, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out_s), ref.numpy(), atol=2e-4, rtol=2e-4)
