"""Sapiens2 matting golden: flax reimplementation vs a hand-written torch
mirror of the reference's vendored standalone Sapiens2
(/root/reference/toolkit/models/sapiens2.py), loaded through the real
checkpoint import rules (import_sapiens2_matting)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

pytestmark = pytest.mark.golden


# ---- torch mirror (tiny), written from the reference's documented behavior ----

class MirrorRope(nn.Module):
    def __init__(self, head_dim, base=100.0):
        super().__init__()
        d4 = head_dim // 4
        periods = base ** (2 * torch.arange(d4, dtype=torch.float32) / (head_dim // 2))
        self.register_buffer("periods", periods.to(torch.bfloat16))

    def forward(self, H, W):
        dd = dict(dtype=torch.bfloat16)
        ch = torch.arange(0.5, H, **dd) / H
        cw = torch.arange(0.5, W, **dd) / W
        coords = torch.stack(torch.meshgrid(ch, cw, indexing="ij"), dim=-1).flatten(0, 1)
        coords = 2.0 * coords - 1.0
        ang = 2 * math.pi * coords[:, :, None] / self.periods[None, None, :]
        ang = ang.flatten(1, 2).tile(2)
        return torch.sin(ang), torch.cos(ang)


def _rot_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([-x2, x1], dim=-1)


class MirrorGQA(nn.Module):
    def __init__(self, dim, heads, kv_heads, ls_init=1e-4):
        super().__init__()
        hd = dim // heads
        self.heads, self.kv_heads, self.hd = heads, kv_heads, hd
        self.wq = nn.Linear(dim, dim)
        self.wk = nn.Linear(dim, kv_heads * hd)
        self.wv = nn.Linear(dim, kv_heads * hd)
        self.q_norm = nn.RMSNorm(hd, eps=1e-6)
        self.k_norm = nn.RMSNorm(hd, eps=1e-6)
        self.proj = nn.Linear(dim, dim)
        self.gamma = nn.Parameter(torch.ones(dim) * ls_init)

    def forward(self, x, rope, n_prefix):
        B, N, _ = x.shape
        q = self.wq(x).view(B, N, self.heads, self.hd).permute(0, 2, 1, 3)
        k = self.wk(x).view(B, N, self.kv_heads, self.hd).permute(0, 2, 1, 3)
        v = self.wv(x).view(B, N, self.kv_heads, self.hd).permute(0, 2, 1, 3)
        q, k = self.q_norm(q), self.k_norm(k)
        if self.kv_heads != self.heads:
            f = self.heads // self.kv_heads
            k = k.repeat_interleave(f, dim=1)
            v = v.repeat_interleave(f, dim=1)
        sin, cos = rope

        def rot(t):
            dt = t.dtype
            body = t[:, :, n_prefix:].to(sin.dtype)
            body = body * cos + _rot_half(body) * sin
            return torch.cat([t[:, :, :n_prefix], body.to(dt)], dim=2)

        q, k = rot(q), rot(k)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.permute(0, 2, 1, 3).reshape(B, N, -1)
        return self.proj(out) * self.gamma


class MirrorBlock(nn.Module):
    def __init__(self, dim, heads, kv_heads, ffn):
        super().__init__()
        self.ln1 = nn.RMSNorm(dim, eps=1e-6)
        self.attn = MirrorGQA(dim, heads, kv_heads)
        self.ln2 = nn.RMSNorm(dim, eps=1e-6)
        self.w12 = nn.Linear(dim, 2 * ffn)
        self.w3 = nn.Linear(ffn, dim)

    def forward(self, x, rope, n_prefix):
        x = x + self.attn(self.ln1(x), rope, n_prefix)
        h = self.ln2(x)
        a, b = self.w12(h).chunk(2, dim=-1)
        return x + self.w3(F.silu(a) * b)


class MirrorMatting(nn.Module):
    def __init__(self, dim=64, layers=4, heads=4, ffn=128, storage=2,
                 up_ch=(32, 16, 8, 8), conv_ch=(8, 8, 8), patch=16):
        super().__init__()
        self.patch = patch
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.storage_tokens = nn.Parameter(torch.zeros(1, storage, dim))
        self.rope = MirrorRope(dim // heads)
        # tiny MHSA/GQA pattern: first/last 1 MHSA, middle kv=heads//2
        self.blocks = nn.ModuleList([
            MirrorBlock(dim, heads,
                        heads if (i < 1 or i >= layers - 1) else heads // 2, ffn)
            for i in range(layers)
        ])
        self.ln1 = nn.RMSNorm(dim, eps=1e-6)
        # head
        self.input_conv = nn.Conv2d(dim, dim, 3, padding=1)
        ups, cur = [], dim
        for ch in up_ch:
            ups.append(nn.Conv2d(cur, ch * 4, 3, padding=1))
            cur = ch
        self.ups = nn.ModuleList(ups)
        convs = []
        for ch in conv_ch:
            convs.append(nn.Conv2d(cur, ch, 3, padding=1))
            cur = ch
        self.convs = nn.ModuleList(convs)
        self.conv_matting = nn.Conv2d(cur, 4, 1)

    def forward(self, x):
        B = x.shape[0]
        x = self.proj(x)
        gh, gw = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1),
                       self.storage_tokens.expand(B, -1, -1), x], dim=1)
        n_prefix = 1 + self.storage_tokens.shape[1]
        rope = self.rope(gh, gw)
        for blk in self.blocks:
            x = blk(x, rope, n_prefix)
        x = self.ln1(x)
        feat = x[:, n_prefix:].reshape(B, gh, gw, -1).permute(0, 3, 1, 2)

        def inorm(t):
            return F.instance_norm(t, eps=1e-5)

        h = F.silu(inorm(self.input_conv(feat)))
        for up in self.ups:
            h = F.silu(inorm(F.pixel_shuffle(up(h), 2)))
        for cv in self.convs:
            h = F.silu(inorm(cv(h)))
        return self.conv_matting(h).sigmoid()


def _reference_layout_state_dict(m: MirrorMatting) -> dict:
    sd = {
        "backbone.patch_embed.projection.weight": m.proj.weight,
        "backbone.patch_embed.projection.bias": m.proj.bias,
        "backbone.cls_token": m.cls_token,
        "backbone.storage_tokens": m.storage_tokens,
        "backbone.rope_embed.periods": m.rope.periods,
        "backbone.ln1.weight": m.ln1.weight,
        "decode_head.input_conv.0.weight": m.input_conv.weight,
        "decode_head.input_conv.0.bias": m.input_conv.bias,
        "decode_head.conv_matting.weight": m.conv_matting.weight,
        "decode_head.conv_matting.bias": m.conv_matting.bias,
    }
    for i, blk in enumerate(m.blocks):
        p = f"backbone.blocks.{i}"
        sd[f"{p}.ln1.weight"] = blk.ln1.weight
        sd[f"{p}.ln2.weight"] = blk.ln2.weight
        for nm in ("wq", "wk", "wv", "proj"):
            lin = getattr(blk.attn, nm)
            sd[f"{p}.attn.{nm}.weight"] = lin.weight
            sd[f"{p}.attn.{nm}.bias"] = lin.bias
        sd[f"{p}.attn.q_norm.weight"] = blk.attn.q_norm.weight
        sd[f"{p}.attn.k_norm.weight"] = blk.attn.k_norm.weight
        sd[f"{p}.attn.gamma.weight"] = blk.attn.gamma
        sd[f"{p}.ffn.w12.weight"] = blk.w12.weight
        sd[f"{p}.ffn.w12.bias"] = blk.w12.bias
        sd[f"{p}.ffn.w3.weight"] = blk.w3.weight
        sd[f"{p}.ffn.w3.bias"] = blk.w3.bias
    for i, up in enumerate(m.ups):
        sd[f"decode_head.upsample_blocks.{i}.0.weight"] = up.weight
        sd[f"decode_head.upsample_blocks.{i}.0.bias"] = up.bias
    for i, cv in enumerate(m.convs):
        sd[f"decode_head.conv_layers.{i * 3}.weight"] = cv.weight
        sd[f"decode_head.conv_layers.{i * 3}.bias"] = cv.bias
    return {k: v.detach().clone() for k, v in sd.items()}


def test_sapiens2_matting_golden(tmp_path):
    from safetensors.torch import save_file

    torch.manual_seed(0)
    mirror = MirrorMatting().eval()
    # randomize: default zero cls/storage and ones-norms hide mapping bugs
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in mirror.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        # keep gammas near identity scale so activations stay sane
        for blk in mirror.blocks:
            blk.attn.gamma.copy_(torch.randn(blk.attn.gamma.shape, generator=g) * 0.01 + 0.1)

    path = str(tmp_path / "sapiens2_tiny_matting.safetensors")
    save_file(_reference_layout_state_dict(mirror), path)

    from ai_toolkit_tpu.models.sapiens2 import import_sapiens2_matting

    runner = import_sapiens2_matting(path)
    cfg = runner.config
    assert cfg.embed_dim == 64 and cfg.num_layers == 4
    assert cfg.kv_pattern == (4, 2, 2, 4)
    assert cfg.head_channels == (32, 16, 8, 8)

    rng = np.random.default_rng(2)
    img = rng.random((1, 48, 64, 3), np.float32)  # non-square grid 3x4
    with torch.no_grad():
        ref = mirror(torch.from_numpy(img).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    import jax.numpy as jnp

    ours = np.asarray(runner.model.apply({"params": runner.params}, jnp.asarray(img)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-3)


def test_sapiens2_mask_control_fallback(tmp_path):
    """Without local weights the control type falls back to the classical
    mask, loudly; with AIT_SAPIENS2_PATH it runs the real model."""
    from PIL import Image

    from ai_toolkit_tpu.data.control_generator import ControlGenerator

    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255
    p = tmp_path / "im.png"
    Image.fromarray(img).save(p)
    gen = ControlGenerator()
    out = gen.get_or_generate(str(p), "sapiens2_mask")
    assert out.endswith("_sapiens2_mask.png")
    m = np.asarray(Image.open(out).convert("L"))
    assert m[32, 32] > 128 and m[2, 2] < 128  # foreground vs border


def test_sapiens2_mask_control_with_weights(tmp_path, monkeypatch):
    from safetensors.torch import save_file
    from PIL import Image

    torch.manual_seed(0)
    mirror = MirrorMatting().eval()
    wpath = str(tmp_path / "w.safetensors")
    save_file(_reference_layout_state_dict(mirror), wpath)
    monkeypatch.setenv("AIT_SAPIENS2_PATH", wpath)

    from ai_toolkit_tpu.data.control_generator import ControlGenerator

    rng = np.random.default_rng(0)
    p = tmp_path / "im.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(p)
    gen = ControlGenerator()
    out = gen.get_or_generate(str(p), "sapiens2_mask")
    m = Image.open(out)
    assert m.size == (64, 64)
