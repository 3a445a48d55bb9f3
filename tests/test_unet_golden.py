"""UNet golden numerics: Flax UNet2DCondition vs a hand-written torch mirror.

Same approach as test_vae_golden: diffusers isn't installed offline, so the
torch side is a hand-written mirror of diffusers' ``UNet2DConditionModel``
(module tree + state-dict keys exactly as ``unet_rules`` expects), pinning
timestep-embedding layout (cos|sin), resnet time injection, GEGLU with exact
gelu, symmetric downsample padding, skip-concat order, and norm epsilons
against an independent torch implementation (reference trains this UNet for
sd/sdxl via toolkit/stable_diffusion_model.py).
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

from ai_toolkit_tpu.io.sd_import import unet_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.unet import UNet2DCondition, UNetConfig  # noqa: E402


def _temb_sincos(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10_000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TResnet(nn.Module):
    def __init__(self, cin, cout, ted):
        super().__init__()
        self.norm1 = nn.GroupNorm(32 if cin % 32 == 0 else cin, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(ted, cout)
        self.norm2 = nn.GroupNorm(32 if cout % 32 == 0 else cout, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttnInner(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.heads = heads

    def forward(self, x, ctx):
        b, s, d = x.shape
        h = self.heads
        q = self.to_q(x).reshape(b, s, h, d // h).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, ctx.shape[1], h, d // h).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, ctx.shape[1], h, d // h).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d // h), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](out)


class TBasicBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TAttnInner(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TAttnInner(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(4 * dim, dim)])
        self.ff.net[0].proj = nn.Linear(dim, 8 * dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        a, g = self.ff.net[0].proj(self.norm3(x)).chunk(2, dim=-1)
        return x + self.ff.net[2](a * F.gelu(g))


class TSpatial(nn.Module):
    def __init__(self, dim, ctx_dim, heads, depth):
        super().__init__()
        self.norm = nn.GroupNorm(32 if dim % 32 == 0 else dim, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [TBasicBlock(dim, ctx_dim, heads) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        h = self.norm(x).reshape(b, c, hh * ww).transpose(1, 2)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        return x + h.transpose(1, 2).reshape(b, c, hh, ww)


def _heads(cfg: UNetConfig, dim: int) -> int:
    # diffusers semantics: fixed head_dim -> per-level head count
    return dim // cfg.head_dim if cfg.head_dim else cfg.num_heads


class TUNet(nn.Module):
    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        chans = list(cfg.block_out_channels)
        ted = cfg.time_embed_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)

        self.down_blocks = nn.ModuleList()
        skip_ch = [chans[0]]
        cur = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TResnet(cur, ch, ted))
                cur = ch
                if cfg.transformer_layers[i]:
                    blk.attentions.append(
                        TSpatial(ch, cfg.cross_attention_dim, _heads(cfg, ch),
                                 cfg.transformer_layers[i])
                    )
                skip_ch.append(cur)
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                skip_ch.append(ch)
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([TResnet(cur, cur, ted), TResnet(cur, cur, ted)])
        self.mid_block.attentions = nn.ModuleList(
            [TSpatial(cur, cfg.cross_attention_dim, _heads(cfg, cur),
                      max(cfg.transformer_layers[-1], 1))]
        )

        self.up_blocks = nn.ModuleList()
        for i, ch in reversed(list(enumerate(chans))):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TResnet(cur + skip_ch.pop(), ch, ted))
                cur = ch
                if cfg.transformer_layers[i]:
                    blk.attentions.append(
                        TSpatial(ch, cfg.cross_attention_dim, _heads(cfg, ch),
                                 cfg.transformer_layers[i])
                    )
            if i > 0:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(ch, ch, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32 if cur % 32 == 0 else cur, cur, eps=1e-5)
        self.conv_out = nn.Conv2d(cur, cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        cfg = self.cfg
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(_temb_sincos(t, cfg.block_out_channels[0])))
        )
        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if cfg.transformer_layers[i]:
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for bi, blk in enumerate(self.up_blocks):
            i = len(self.down_blocks) - 1 - bi
            for j, res in enumerate(blk.resnets):
                h = res(torch.cat([h, skips.pop()], dim=1), temb)
                if cfg.transformer_layers[i]:
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def test_unet_matches_torch_mirror():
    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(1, 1),
        num_heads=2, cross_attention_dim=48, dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False,
    )
    torch.manual_seed(0)
    tm = TUNet(cfg).eval()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, unet_rules(len(cfg.block_out_channels)))
    assert not unmatched, f"unmapped torch keys: {unmatched[:8]}"

    ours = UNet2DCondition(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    t = np.asarray([7, 421], np.int64)
    ctx = rng.normal(size=(2, 6, 48)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                 torch.from_numpy(ctx))
    out = ours.apply({"params": tree}, jnp.asarray(x), jnp.asarray(t.astype(np.float32)),
                     jnp.asarray(ctx))
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


class TUNetXL(TUNet):
    """SDXL extras: add_embedding over (text_embeds | time_ids sincos)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        ted = cfg.time_embed_dim
        self.add_embedding = nn.Module()
        self.add_embedding.linear_1 = nn.Linear(cfg.projection_class_embeddings_dim, ted)
        self.add_embedding.linear_2 = nn.Linear(ted, ted)

    def forward(self, x, t, ctx, text_embeds, time_ids):
        cfg = self.cfg
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(_temb_sincos(t, cfg.block_out_channels[0])))
        )
        tid = _temb_sincos(time_ids.reshape(-1), cfg.addition_time_embed_dim).reshape(
            x.shape[0], -1
        )
        add = torch.cat([text_embeds, tid], dim=-1)
        temb = temb + self.add_embedding.linear_2(F.silu(self.add_embedding.linear_1(add)))
        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if cfg.transformer_layers[i]:
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for bi, blk in enumerate(self.up_blocks):
            i = len(self.down_blocks) - 1 - bi
            for j, res in enumerate(blk.resnets):
                h = res(torch.cat([h, skips.pop()], dim=1), temb)
                if cfg.transformer_layers[i]:
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def test_sdxl_added_cond_matches_torch_mirror():
    """SDXL micro-conditioning: add_embedding over pooled text + sincos
    time_ids must match the diffusers layout through unet_rules."""
    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(0, 1),
        num_heads=2, cross_attention_dim=48, addition_time_embed_dim=8,
        projection_class_embeddings_dim=32 + 6 * 8, dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False,
    )
    torch.manual_seed(1)
    tm = TUNetXL(cfg).eval()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, unet_rules(len(cfg.block_out_channels)))
    assert not unmatched, unmatched[:8]

    ours = UNet2DCondition(cfg)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    t = np.asarray([11, 700], np.int64)
    ctx = rng.normal(size=(2, 5, 48)).astype(np.float32)
    text_embeds = rng.normal(size=(2, 32)).astype(np.float32)
    time_ids = np.tile(np.asarray([[512, 512, 0, 0, 512, 512]], np.float32), (2, 1))

    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                 torch.from_numpy(ctx), torch.from_numpy(text_embeds),
                 torch.from_numpy(time_ids))
    out = ours.apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(t.astype(np.float32)),
        jnp.asarray(ctx),
        added_cond={"time_ids": jnp.asarray(time_ids), "text_embeds": jnp.asarray(text_embeds)},
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_free_u_modulates_decoder():
    """FreeU (diffusers apply_freeu semantics): enabled config changes the
    output; fourier filter is identity at scale=1."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from ai_toolkit_tpu.models.unet import UNet2DCondition, UNetConfig, _fourier_filter

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    np.testing.assert_allclose(
        np.asarray(_fourier_filter(x, 1, 1.0)), np.asarray(x), atol=1e-4
    )
    damped = _fourier_filter(x, 1, 0.0)
    # removing the DC/low box shifts the mean toward zero
    assert abs(float(damped.mean())) < abs(float(x.mean()))

    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, cfg.in_channels), cfg.dtype)
    ctx = jax.random.normal(jax.random.key(2), (1, 8, cfg.cross_attention_dim), cfg.dtype)
    v = unet.init(jax.random.key(3), lat, jnp.zeros((1,)), ctx)
    base = unet.apply(v, lat, jnp.zeros((1,)), ctx)
    fu = UNet2DCondition(replace(cfg, free_u=(1.3, 1.4, 0.9, 0.2)))
    out = fu.apply(v, lat, jnp.zeros((1,)), ctx)
    assert out.shape == base.shape
    assert float(jnp.max(jnp.abs(out - base))) > 1e-4


def test_unet_head_dim_per_level_matches_mirror():
    """r5 fix: sd2.1/SDXL fix head_dim=64 so head COUNT varies per level
    (640 -> 10x64, 1280 -> 20x64); a global num_heads mis-split the smaller
    levels (20x32) and diverged from real checkpoints. Tiny analog:
    head_dim=16 -> 2 heads at dim 32, 4 at dim 64."""
    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(1, 1),
        head_dim=16, cross_attention_dim=48, dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False,
    )
    torch.manual_seed(1)
    tm = TUNet(cfg).eval()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, unet_rules(len(cfg.block_out_channels)))
    assert not unmatched

    ours = UNet2DCondition(cfg)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    t = np.asarray([311], np.int64)
    ctx = rng.normal(size=(1, 6, 48)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                 torch.from_numpy(ctx))
    out = ours.apply({"params": tree}, jnp.asarray(x), jnp.asarray(t.astype(np.float32)),
                     jnp.asarray(ctx))
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4)

    # and the head split genuinely matters: a mis-split config diverges
    cfg_bad = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, transformer_layers=(1, 1),
        num_heads=2, cross_attention_dim=48, dtype=jnp.float32,
        param_dtype=jnp.float32, remat=False,
    )
    out_bad = UNet2DCondition(cfg_bad).apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(t.astype(np.float32)),
        jnp.asarray(ctx))
    assert float(jnp.abs(out - out_bad).max()) > 1e-5
