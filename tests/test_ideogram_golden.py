"""Ideogram4 DiT golden: flax Ideogram4DiT vs a hand-written torch mirror of
the reference Ideogram4Transformer2DModel semantics
(extensions_built_in/diffusion_models/ideogram4/src/transformer.py), using
the vendored checkpoint key names loaded through the real import rules.

The mirror implements the reference's block-diagonal SEGMENT mask (pad text
tokens form their own segment); ours keeps a key-side mask only. Matching
image-token outputs (the only ones ever consumed) proves the two equivalent.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import ideogram_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.ideogram_dit import (  # noqa: E402
    IMAGE_POSITION_OFFSET,
    Ideogram4Config,
    Ideogram4DiT,
)


class RMS(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        return F.rms_norm(x, self.weight.shape, self.weight, self.eps)


def rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat((-x[..., half:], x[..., :half]), dim=-1)


class MRoPE(nn.Module):
    def __init__(self, head_dim, base, section):
        super().__init__()
        self.inv_freq = 1.0 / (
            base ** (torch.arange(0, head_dim, 2, dtype=torch.float32) / head_dim)
        )
        self.section = section

    def forward(self, position_ids):  # (B, L, 3)
        b, L, _ = position_ids.shape
        pos = position_ids.permute(2, 0, 1).to(torch.float32)  # (3, B, L)
        inv = self.inv_freq[None, None, :, None].expand(3, b, -1, 1)
        freqs = (inv @ pos.unsqueeze(2)).transpose(2, 3)  # (3, B, L, nf)
        freqs_t = freqs[0].clone()
        for axis, offset in ((1, 1), (2, 2)):
            idx = torch.arange(offset, self.section[axis] * 3, 3)
            freqs_t[..., idx] = freqs[axis][..., idx]
        emb = torch.cat((freqs_t, freqs_t), dim=-1)
        return emb.cos(), emb.sin()


class Attention(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads, self.hd = heads, d // heads
        self.qkv = nn.Linear(d, 3 * d, bias=False)
        self.norm_q = RMS(self.hd, 1e-5)
        self.norm_k = RMS(self.hd, 1e-5)
        self.o = nn.Linear(d, d, bias=False)

    def forward(self, x, attn_mask, cos, sin):
        b, L, _ = x.shape
        qkv = self.qkv(x).view(b, L, 3, self.heads, self.hd)
        q, k, v = qkv.unbind(dim=2)
        q, k = self.norm_q(q), self.norm_k(k)
        q, k, v = (y.transpose(1, 2) for y in (q, k, v))
        c, s = cos.unsqueeze(1), sin.unsqueeze(1)
        q = q * c + rotate_half(q) * s
        k = k * c + rotate_half(k) * s
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        return self.o(out.transpose(1, 2).reshape(b, L, -1))


class Block(nn.Module):
    def __init__(self, d, inner, heads, eps, adanln):
        super().__init__()
        self.attention = Attention(d, heads)
        self.feed_forward = nn.Module()
        self.feed_forward.w1 = nn.Linear(d, inner, bias=False)
        self.feed_forward.w2 = nn.Linear(inner, d, bias=False)
        self.feed_forward.w3 = nn.Linear(d, inner, bias=False)
        self.attention_norm1 = RMS(d, eps)
        self.ffn_norm1 = RMS(d, eps)
        self.attention_norm2 = RMS(d, eps)
        self.ffn_norm2 = RMS(d, eps)
        self.adaln_modulation = nn.Linear(adanln, 4 * d, bias=True)

    def forward(self, x, attn_mask, cos, sin, adaln_input):
        mod = self.adaln_modulation(adaln_input)
        sc_a, g_a, sc_m, g_m = mod.chunk(4, dim=-1)
        g_a, g_m = torch.tanh(g_a), torch.tanh(g_m)
        sc_a, sc_m = 1.0 + sc_a, 1.0 + sc_m
        attn = self.attention(self.attention_norm1(x) * sc_a, attn_mask, cos, sin)
        x = x + g_a * self.attention_norm2(attn)
        h = self.ffn_norm1(x) * sc_m
        mlp = self.feed_forward.w2(F.silu(self.feed_forward.w1(h)) * self.feed_forward.w3(h))
        return x + g_m * self.ffn_norm2(mlp)


def sinusoidal(t, dim, scale=1e4):
    half = dim // 2
    freq = math.log(scale) / (half - 1)
    freq = torch.exp(torch.arange(half, dtype=torch.float32) * -freq)
    emb = t.to(torch.float32).unsqueeze(-1) * freq
    return torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)


class TorchIdeogram(nn.Module):
    def __init__(self, cfg: Ideogram4Config):
        super().__init__()
        self.cfg = cfg
        d = cfg.emb_dim
        self.input_proj = nn.Linear(cfg.in_channels, d, bias=True)
        self.llm_cond_norm = RMS(cfg.llm_features_dim, 1e-6)
        self.llm_cond_proj = nn.Linear(cfg.llm_features_dim, d, bias=True)
        self.t_embedding = nn.Module()
        self.t_embedding.mlp_in = nn.Linear(d, d, bias=True)
        self.t_embedding.mlp_out = nn.Linear(d, d, bias=True)
        self.adaln_proj = nn.Linear(d, cfg.adanln_dim, bias=True)
        self.embed_image_indicator = nn.Embedding(2, d)
        self.rotary_emb = MRoPE(cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
        self.layers = nn.ModuleList([
            Block(d, cfg.intermediate_size, cfg.num_heads, cfg.norm_eps, cfg.adanln_dim)
            for _ in range(cfg.num_layers)
        ])
        self.final_layer = nn.Module()
        self.final_layer.linear = nn.Linear(d, cfg.in_channels, bias=True)
        self.final_layer.adaln_modulation = nn.Linear(cfg.adanln_dim, d, bias=True)

    def forward(self, llm_features, x, t, position_ids, segment_ids, indicator):
        llm_mask = (indicator == 3).float().unsqueeze(-1)
        img_mask = (indicator == 2).float().unsqueeze(-1)
        x = self.input_proj(x * img_mask) * img_mask
        t_cond = self.t_embedding.mlp_out(
            F.silu(self.t_embedding.mlp_in(sinusoidal(1e4 * t.clamp(0, 1), self.cfg.emb_dim)))
        ).unsqueeze(1)
        adaln_input = F.silu(self.adaln_proj(t_cond))
        feats = self.llm_cond_norm(llm_features * llm_mask)
        feats = self.llm_cond_proj(feats) * llm_mask
        h = x + feats
        h = h + self.embed_image_indicator((indicator == 2).long())
        cos, sin = self.rotary_emb(position_ids)
        attn_mask = (segment_ids.unsqueeze(2) == segment_ids.unsqueeze(1)).unsqueeze(1)
        for layer in self.layers:
            h = layer(h, attn_mask, cos, sin, adaln_input)
        scale = 1.0 + self.final_layer.adaln_modulation(F.silu(adaln_input))
        h = F.layer_norm(h, (self.cfg.emb_dim,), eps=1e-6) * scale
        return self.final_layer.linear(h).to(torch.float32)


@pytest.mark.parametrize("scan", [True, False])
def test_ideogram_golden(scan):
    torch.manual_seed(0)
    cfg = Ideogram4Config(
        emb_dim=32, num_layers=2, num_heads=2, intermediate_size=64, adanln_dim=16,
        in_channels=12, llm_features_dim=40, rope_theta=5e6, mrope_section=(4, 2, 2),
        scan_blocks=scan, remat=False, dtype=jnp.float32,
    )
    ref = TorchIdeogram(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = {k.replace("rotary_emb.inv_freq", ""): v for k, v in flat.items() if "inv_freq" not in k}
    tree, unmatched = torch_to_tree(flat, ideogram_rules(scan))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    gh = gw = 3
    li, lt = gh * gw, 5
    img = rng.normal(size=(2, li, 12)).astype(np.float32)
    feats = rng.normal(size=(2, lt, 40)).astype(np.float32)
    t = np.asarray([0.2, 0.7], np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)

    # torch side: full packed-sequence contract (pipeline predict_velocity)
    n = lt + li
    x = np.concatenate([np.zeros((2, lt, 12), np.float32), img], axis=1)
    llm_full = np.concatenate([feats, np.zeros((2, li, 40), np.float32)], axis=1)
    indicator = np.zeros((2, n), np.int64)
    indicator[:, :lt] = mask * 3
    indicator[:, lt:] = 2
    segment = np.ones((2, n), np.int64)
    segment[:, :lt] = np.where(mask > 0, 1, -1)
    tpos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
    rr, cc = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    ipos = np.stack([np.zeros(li, np.int64), rr.reshape(-1), cc.reshape(-1)], -1) + IMAGE_POSITION_OFFSET
    pos = np.concatenate(
        [np.repeat(tpos[..., None], 3, -1), np.broadcast_to(ipos[None], (2, li, 3))], axis=1
    )
    with torch.no_grad():
        want = ref(
            torch.from_numpy(llm_full), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(pos), torch.from_numpy(segment), torch.from_numpy(indicator),
        ).numpy()[:, lt:]

    got = np.asarray(Ideogram4DiT(cfg).apply(
        {"params": tree}, jnp.asarray(img), gh, gw, jnp.asarray(feats),
        jnp.asarray(t), jnp.asarray(mask),
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_ideogram_model_wrapper_train_and_geometry():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model = get_model_class("ideogram4")(
        ModelConfig(arch="ideogram4", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    # tiny vae downscale 2, patch 2 -> /4; 4*latent_channels(4)=16 token dim
    h, w, c = model.latent_shape(32, 32)
    assert (h, w, c) == (8, 8, 16)
    px = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    lat = model.encode_images(variables, px)
    assert lat.shape == (1, 8, 8, 16)
    dec = model.decode_latents(variables, lat)
    assert dec.shape == (1, 32, 32, 3)

    cond = model.encode_prompt(variables, ["a sign that says Ideogram"])
    assert cond["txt"].shape[-1] == model.dit_config.llm_features_dim

    spec = LoRASpec(rank=2, alpha=2.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(2))
    assert lora_paths(lora)
    batch = {"latents": lat, "cond": {**cond, "pe": model.rope_table(h, w)}}
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 5e-3))
    step = jax.jit(make_train_step(
        model.predict, FlowMatchSchedule(shift=1.0, use_dynamic_shifting=False),
        TrainStepConfig(timestep_type="sigmoid"),
    ))
    losses = []
    for _ in range(25):
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ideogram_inference_sigmas():
    from ai_toolkit_tpu.models.ideogram_dit import ideogram_inference_sigmas

    s = ideogram_inference_sigmas(8, 1024, 1024)
    assert s.shape == (9,)
    assert s[-1] == 0.0 and s[0] > s[1] > s[-2] > 0
    # resolution-aware: larger images shift sigma mass upward
    s_big = ideogram_inference_sigmas(8, 2048, 2048)
    assert float(s_big[1:-1].mean()) > float(s[1:-1].mean())
