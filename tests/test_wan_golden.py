"""WanDiT golden numerics vs a hand-written torch mirror of the diffusers
WanTransformer3DModel (the reference's wan21/wan22 training target).

The mirror carries diffusers state-dict keys (``blocks.N.attn1.to_q``,
``scale_shift_table``, ``condition_embedder.*``, Conv3d ``patch_embedding``)
and is imported through the real ``wan_dit_tree`` path, pinning: the conv3d
patchify → linear-token equivalence, per-block scale_shift_table + temb
modulation chunk order, across-heads QK RMSNorm, (t,y,x) rope rotation,
affine norm2 cross-attn pre-norm, tanh-GELU FFN, and the
``scale_shift_table + temb`` output head.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import Tensor, nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import wan_dit_tree  # noqa: E402
from ai_toolkit_tpu.models.wan_dit import (  # noqa: E402
    WanConfig,
    WanDiT,
    multi_axis_rope,
    wan_patchify,
    wan_position_ids,
)

D, NH, FFN, L = 64, 4, 128, 2
IN_CH, TXT_D, FREQ = 4, 64, 32
PATCH = (1, 2, 2)
AXES = (8, 4, 4)
HD = D // NH


def t_timestep_embedding(t: Tensor, dim: int) -> Tensor:
    t = t.float() * 1000.0
    half = dim // 2
    freqs = torch.exp(-math.log(10_000.0) * torch.arange(half).float() / half)
    args = t[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_rope_axis(pos: Tensor, dim: int) -> Tensor:
    scale = torch.arange(0, dim, 2).float() / dim
    omega = 1.0 / (10_000.0 ** scale)
    out = torch.einsum("...n,d->...nd", pos.float(), omega)
    out = torch.stack([out.cos(), -out.sin(), out.sin(), out.cos()], dim=-1)
    return out.reshape(*out.shape[:-1], 2, 2)


def t_apply_rope(x: Tensor, freqs: Tensor) -> Tensor:
    # x [B, H, S, D]; freqs [S, D/2, 2, 2]
    xf = x.float().reshape(*x.shape[:-1], -1, 1, 2)
    fr = freqs[None, None]
    out = fr[..., 0] * xf[..., 0] + fr[..., 1] * xf[..., 1]
    return out.reshape(x.shape)


class TRMSAcross(nn.Module):
    """RMSNorm over the full inner dim (wan rms_norm_across_heads)."""

    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))

    def forward(self, x):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-6)) * self.weight


class TAttn(nn.Module):
    def __init__(self, ctx_dim):
        super().__init__()
        self.to_q = nn.Linear(D, D)
        self.to_k = nn.Linear(ctx_dim, D)
        self.to_v = nn.Linear(ctx_dim, D)
        self.to_out = nn.ModuleList([nn.Linear(D, D)])
        self.norm_q = TRMSAcross(D)
        self.norm_k = TRMSAcross(D)

    def forward(self, x, ctx, pe=None):
        b, s, _ = x.shape
        q = self.norm_q(self.to_q(x)).reshape(b, s, NH, HD).transpose(1, 2)
        k = self.norm_k(self.to_k(ctx)).reshape(b, ctx.shape[1], NH, HD).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, ctx.shape[1], NH, HD).transpose(1, 2)
        if pe is not None:
            q = t_apply_rope(q, pe)
            k = t_apply_rope(k, pe)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(HD), dim=-1) @ v
        return self.to_out[0](attn.transpose(1, 2).reshape(b, s, D))


class TBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn1 = TAttn(D)
        self.attn2 = TAttn(D)
        self.norm2 = nn.LayerNorm(D)
        self.ffn = nn.Module()
        self.ffn.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(FFN, D)])
        self.ffn.net[0].proj = nn.Linear(D, FFN)
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, D) * 0.02)

    def forward(self, x, ctx, temb6, pe):
        e = (self.scale_shift_table + temb6).chunk(6, dim=1)
        sh_sa, sc_sa, g_sa, sh_ff, sc_ff, g_ff = [v for v in e]
        h = F.layer_norm(x, (D,)) * (1 + sc_sa) + sh_sa
        x = x + g_sa * self.attn1(h, h, pe)
        x = x + self.attn2(self.norm2(x), ctx)
        h = F.layer_norm(x, (D,)) * (1 + sc_ff) + sh_ff
        x = x + g_ff * self.ffn.net[2](F.gelu(self.ffn.net[0].proj(h), approximate="tanh"))
        return x


class TWan(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embedding = nn.Conv3d(IN_CH, D, PATCH, stride=PATCH)
        ce = nn.Module()
        ce.text_embedder = nn.Module()
        ce.text_embedder.linear_1 = nn.Linear(TXT_D, D)
        ce.text_embedder.linear_2 = nn.Linear(D, D)
        ce.time_embedder = nn.Module()
        ce.time_embedder.linear_1 = nn.Linear(FREQ, D)
        ce.time_embedder.linear_2 = nn.Linear(D, D)
        ce.time_proj = nn.Linear(D, 6 * D)
        self.condition_embedder = ce
        self.blocks = nn.ModuleList([TBlock() for _ in range(L)])
        self.proj_out = nn.Linear(D, IN_CH * PATCH[0] * PATCH[1] * PATCH[2])
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, D) * 0.02)

    def forward(self, latents, ctx, t, pe):
        # latents: [B, C, T, H, W] (torch layout)
        x = self.patch_embedding(latents)
        x = x.flatten(2).transpose(1, 2)  # [B, N, D] in (t, h, w) order
        ce = self.condition_embedder
        ctx = ce.text_embedder.linear_2(F.gelu(ce.text_embedder.linear_1(ctx)))
        temb = ce.time_embedder.linear_2(F.silu(ce.time_embedder.linear_1(
            t_timestep_embedding(t, FREQ))))
        temb6 = ce.time_proj(F.silu(temb)).reshape(-1, 6, D)
        for blk in self.blocks:
            x = blk(x, ctx, temb6, pe)
        shift, scale = (self.scale_shift_table + temb[:, None]).chunk(2, dim=1)
        x = F.layer_norm(x, (D,)) * (1 + scale) + shift
        return self.proj_out(x)


def test_wan_dit_matches_torch_mirror():
    for scan in (False, True):
        cfg = WanConfig(
            in_channels=IN_CH, dim=D, ffn_dim=FFN, num_heads=NH, num_layers=L,
            text_dim=TXT_D, freq_dim=FREQ, patch_size=PATCH, axes_dim=AXES,
            dtype=jnp.float32, param_dtype=jnp.float32, remat=False,
            scan_blocks=scan,
        )
        torch.manual_seed(0)
        tm = TWan().eval()
        flat = {k: v.numpy() for k, v in tm.state_dict().items()}
        tree, unmatched = wan_dit_tree(flat, cfg)
        assert not unmatched, unmatched[:8]

        rng = np.random.default_rng(0)
        tt, hh, ww = 2, 4, 4
        lat = rng.normal(size=(2, tt, hh, ww, IN_CH)).astype(np.float32)  # NTHWC
        ctx = rng.normal(size=(2, 6, TXT_D)).astype(np.float32)
        t = np.asarray([0.3, 0.9], np.float32)

        ids = wan_position_ids(tt // PATCH[0], hh // PATCH[1], ww // PATCH[2])
        pe = multi_axis_rope(ids, list(AXES))  # [1, N, HD/2, 2, 2]
        pe_t = torch.from_numpy(np.asarray(pe[0]))

        with torch.no_grad():
            ref = tm(torch.from_numpy(lat.transpose(0, 4, 1, 2, 3)),
                     torch.from_numpy(ctx), torch.from_numpy(t), pe_t)

        tokens = wan_patchify(jnp.asarray(lat), PATCH)
        out = WanDiT(cfg).apply(
            {"params": tree}, tokens, jnp.asarray(ctx), jnp.asarray(t), pe, None
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-4, rtol=2e-4,
            err_msg=f"scan_blocks={scan}",
        )
