"""Ernie-Image DiT golden: flax ErnieDiT vs a hand-written torch mirror of
the vendored reference transformer semantics
(extensions_built_in/diffusion_models/ernie_image/transformer.py: single
stream over [img, txt], ONE shared 6-way AdaLN from the timestep for all
layers, per-head RMSNorm q/k, Megatron non-interleaved rope with duplicated
adjacent angles over axes (32,48,48) where image axis-0 position = the
sample's valid text length, exact-GELU gated FFN, paramless-LN final AdaLN
with (scale, shift) chunk order), loaded through the real import rules
(io/dit_importers.ernie_rules)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import ernie_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.ernie_dit import ErnieConfig, ErnieDiT  # noqa: E402


class RMS(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


def rope_axis(pos, dim, theta):
    scale = torch.arange(0, dim, 2).float() / dim
    omega = 1.0 / (theta ** scale)
    return torch.einsum("...n,d->...nd", pos.float(), omega)


def embed_nd3(ids, axes_dim, theta):
    emb = torch.cat([rope_axis(ids[..., i], axes_dim[i], theta) for i in range(3)], dim=-1)
    emb = emb.unsqueeze(2)  # [B, S, 1, hd/2]
    return torch.stack([emb, emb], dim=-1).reshape(*emb.shape[:-1], -1)  # [B,S,1,hd]


def apply_rotary(x, freqs):
    rot = freqs.shape[-1]
    xr, xp = x[..., :rot], x[..., rot:]
    cos_, sin_ = torch.cos(freqs).to(x.dtype), torch.sin(freqs).to(x.dtype)
    x1, x2 = xr.chunk(2, dim=-1)
    rotated = torch.cat((-x2, x1), dim=-1)
    return torch.cat((xr * cos_ + rotated * sin_, xp), dim=-1)


class Attn(nn.Module):
    def __init__(self, d, heads, eps):
        super().__init__()
        self.heads, self.hd = heads, d // heads
        self.to_q = nn.Linear(d, d, bias=False)
        self.to_k = nn.Linear(d, d, bias=False)
        self.to_v = nn.Linear(d, d, bias=False)
        self.norm_q = RMS(self.hd, eps)
        self.norm_k = RMS(self.hd, eps)
        self.to_out = nn.ModuleList([nn.Linear(d, d, bias=False)])

    def forward(self, x, mask, freqs):
        b, s, _ = x.shape
        q = self.to_q(x).unflatten(-1, (self.heads, -1))
        k = self.to_k(x).unflatten(-1, (self.heads, -1))
        v = self.to_v(x).unflatten(-1, (self.heads, -1))
        q, k = self.norm_q(q), self.norm_k(k)
        q, k = apply_rotary(q, freqs), apply_rotary(k, freqs)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=mask,
        ).transpose(1, 2).flatten(2, 3)
        return self.to_out[0](o)


class MLP(nn.Module):
    def __init__(self, d, ff):
        super().__init__()
        self.gate_proj = nn.Linear(d, ff, bias=False)
        self.up_proj = nn.Linear(d, ff, bias=False)
        self.linear_fc2 = nn.Linear(ff, d, bias=False)

    def forward(self, x):
        return self.linear_fc2(self.up_proj(x) * F.gelu(self.gate_proj(x)))


class Block(nn.Module):
    def __init__(self, d, heads, ff, eps):
        super().__init__()
        self.adaLN_sa_ln = RMS(d, eps)
        self.self_attention = Attn(d, heads, eps)
        self.adaLN_mlp_ln = RMS(d, eps)
        self.mlp = MLP(d, ff)

    def forward(self, x, freqs, temb, mask):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = temb
        res = x
        x = self.adaLN_sa_ln(x)
        x = (x.float() * (1 + sc_a.float()) + sh_a.float()).to(x.dtype)
        attn = self.self_attention(x, mask, freqs)
        x = res + (g_a.float() * attn.float()).to(x.dtype)
        res = x
        x = self.adaLN_mlp_ln(x)
        x = (x.float() * (1 + sc_m.float()) + sh_m.float()).to(x.dtype)
        return res + (g_m.float() * self.mlp(x).float()).to(x.dtype)


class TorchErnie(nn.Module):
    def __init__(self, cfg: ErnieConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        self.x_embedder = nn.Module()
        self.x_embedder.proj = nn.Conv2d(
            cfg.in_channels, d, kernel_size=cfg.patch_size, stride=cfg.patch_size)
        self.text_proj = (nn.Linear(cfg.text_in_dim, d, bias=False)
                          if cfg.text_in_dim != d else None)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(d, d)
        self.time_embedding.linear_2 = nn.Linear(d, d)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(d, 6 * d))
        self.layers = nn.ModuleList([
            Block(d, cfg.num_attention_heads, cfg.ffn_hidden_size, cfg.eps)
            for _ in range(cfg.num_layers)
        ])
        self.final_norm = nn.Module()
        self.final_norm.norm = nn.LayerNorm(d, elementwise_affine=False, eps=cfg.eps)
        self.final_norm.linear = nn.Linear(d, 2 * d)
        self.final_linear = nn.Linear(d, cfg.patch_size ** 2 * cfg.out_channels)

    def forward(self, x, t, text_bth, text_lens):
        cfg = self.cfg
        d, p = cfg.hidden_size, cfg.patch_size
        b, c, hh, ww = x.shape
        hp, wp = hh // p, ww // p
        n_img = hp * wp

        img = self.x_embedder.proj(x)
        img = img.reshape(b, d, n_img).transpose(1, 2).contiguous()
        if self.text_proj is not None:
            text_bth = self.text_proj(text_bth)
        tmax = text_bth.shape[1]
        seq = torch.cat([img, text_bth], dim=1)

        text_ids = torch.cat([
            torch.arange(tmax).float().view(1, tmax, 1).expand(b, -1, -1),
            torch.zeros((b, tmax, 2)),
        ], dim=-1)
        grid = torch.stack(torch.meshgrid(
            torch.arange(hp).float(), torch.arange(wp).float(), indexing="ij"),
            dim=-1).reshape(-1, 2)
        image_ids = torch.cat([
            text_lens.float().view(b, 1, 1).expand(-1, n_img, -1),
            grid.view(1, n_img, 2).expand(b, -1, -1),
        ], dim=-1)
        freqs = embed_nd3(torch.cat([image_ids, text_ids], dim=1),
                          cfg.rope_axes_dim, cfg.rope_theta)

        valid = torch.arange(tmax).view(1, tmax) < text_lens.view(b, 1)
        mask = torch.cat([torch.ones((b, n_img), dtype=torch.bool), valid],
                         dim=1)[:, None, None, :]

        half = d // 2
        f = torch.exp(-math.log(10_000.0) * torch.arange(half).float() / half)
        arg = t.float()[:, None] * f[None]
        sample = torch.cat([torch.sin(arg), torch.cos(arg)], dim=-1)
        c_t = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(sample)))
        temb = [m.unsqueeze(1) for m in self.adaLN_modulation(c_t).chunk(6, dim=-1)]
        for layer in self.layers:
            seq = layer(seq, freqs, temb, mask)
        scale, shift = self.final_norm.linear(c_t).chunk(2, dim=-1)
        seq = self.final_norm.norm(seq) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
        patches = self.final_linear(seq)[:, :n_img]
        out = patches.view(b, hp, wp, p, p, cfg.out_channels)
        return out.permute(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels, hh, ww)


def _cfg(scan):
    return ErnieConfig(
        hidden_size=32, num_attention_heads=2, num_layers=2, ffn_hidden_size=80,
        in_channels=8, out_channels=8, patch_size=1, text_in_dim=24,
        rope_axes_dim=(4, 6, 6), scan_blocks=scan, remat=False, dtype=jnp.float32,
    )


@pytest.mark.parametrize("scan", [True, False])
def test_ernie_golden(scan):
    torch.manual_seed(0)
    cfg = _cfg(scan)
    ref = TorchErnie(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, ernie_rules(scan))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)  # NHWC
    txt = rng.normal(size=(2, 5, 24)).astype(np.float32)
    t = np.asarray([137.0, 804.0], np.float32)
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
            torch.from_numpy(txt), torch.from_numpy(mask.sum(-1)),
        ).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(ErnieDiT(cfg).apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t),
        jnp.asarray(mask, bool),
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_ernie_golden_no_mask():
    """txt_mask=None path: full-length text, same numerics."""
    torch.manual_seed(1)
    cfg = _cfg(True)
    ref = TorchErnie(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, ernie_rules(True))
    assert not unmatched

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    txt = rng.normal(size=(1, 3, 24)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
            torch.from_numpy(txt), torch.tensor([3]),
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ErnieDiT(cfg).apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t), None,
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_ernie_model_wrapper():
    """Wrapper contract: 2x2-patchified bn-standardized latents, loud refuse
    on a missing checkpoint path, lora targeting matches."""
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    cls = get_model_class("ernie_image")
    m = cls(ModelConfig(arch="ernie_image", name_or_path="", model_kwargs={"size": "tiny"}))
    v = m.init_variables(jax.random.key(0))
    # zero-init contract (reference nn.init.zeros_)
    assert float(jnp.abs(v["dit"]["adaLN_modulation"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(v["dit"]["final_linear"]["kernel"]).max()) == 0.0

    lat = m.encode_images(v, jnp.zeros((1, 32, 32, 3)))
    assert lat.shape == (1, *m.latent_shape(32, 32))
    dec = m.decode_latents(v, lat)
    assert dec.shape == (1, 32, 32, 3)
    cond = m.encode_prompt(v, ["a cat"])
    pred = m.predict(v, lat, jnp.asarray([0.4]), cond)
    assert pred.shape == lat.shape

    spec = LoRASpec(rank=2, alpha=2.0, target_patterns=m.lora_targets())
    lora = build_lora(v["dit"], spec, jax.random.key(1))
    assert lora_paths(lora), "ernie lora targeting matched nothing"

    bad = cls(ModelConfig(arch="ernie_image", name_or_path="/nonexistent/ernie",
                          model_kwargs={"size": "tiny"}))
    with pytest.raises(FileNotFoundError):
        bad.load_variables(jax.random.key(0))


def test_ernie_te_interleaved_rope_golden():
    """LLMEncoder(all_bias + rope_interleaved) vs transformers-semantics torch
    mirror of Ernie4_5 (modeling_ernie4_5.py: interleaved rotate_half with
    repeat_interleave(2) angles, biased linears when use_bias)."""
    from ai_toolkit_tpu.io.sd_import import llm_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree as t2t
    from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder

    torch.manual_seed(2)
    d, nh, nkv, hd, ff, nl, vocab = 32, 4, 2, 8, 64, 2, 64

    class TRms(nn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))
            self.eps = eps

        def forward(self, x):
            xf = x.float()
            y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
            return (y * self.weight.float()).to(x.dtype)

    class TLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_layernorm = TRms(d)
            self.post_attention_layernorm = TRms(d)
            sa = nn.Module()
            sa.q_proj = nn.Linear(d, nh * hd, bias=True)
            sa.k_proj = nn.Linear(d, nkv * hd, bias=True)
            sa.v_proj = nn.Linear(d, nkv * hd, bias=True)
            sa.o_proj = nn.Linear(nh * hd, d, bias=True)
            self.self_attn = sa
            mlp = nn.Module()
            mlp.gate_proj = nn.Linear(d, ff, bias=True)
            mlp.up_proj = nn.Linear(d, ff, bias=True)
            mlp.down_proj = nn.Linear(ff, d, bias=True)
            self.mlp = mlp

        def rope(self, x, theta=500_000.0):
            b, h, s, dd = x.shape
            inv = 1.0 / (theta ** (torch.arange(0, dd, 2).float() / dd))
            ang = torch.arange(s).float()[:, None] * inv[None]
            cos = ang.cos().repeat_interleave(2, dim=-1)[None, None]
            sin = ang.sin().repeat_interleave(2, dim=-1)[None, None]
            x1, x2 = x[..., 0::2], x[..., 1::2]
            rot = torch.stack((-x2, x1), dim=-1).flatten(-2)
            return (x.float() * cos + rot.float() * sin).to(x.dtype)

        def forward(self, x, mask):
            b, s, _ = x.shape
            h = self.input_layernorm(x)
            q = self.self_attn.q_proj(h).view(b, s, nh, hd).transpose(1, 2)
            k = self.self_attn.k_proj(h).view(b, s, nkv, hd).transpose(1, 2)
            v = self.self_attn.v_proj(h).view(b, s, nkv, hd).transpose(1, 2)
            q, k = self.rope(q), self.rope(k)
            k = k.repeat_interleave(nh // nkv, dim=1)
            v = v.repeat_interleave(nh // nkv, dim=1)
            o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
            o = o.transpose(1, 2).reshape(b, s, nh * hd)
            x = x + self.self_attn.o_proj(o)
            h = self.post_attention_layernorm(x)
            return x + self.mlp.down_proj(
                F.silu(self.mlp.gate_proj(h)) * self.mlp.up_proj(h))

    class TErnie(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed_tokens = nn.Embedding(vocab, d)
            self.layers = nn.ModuleList([TLayer() for _ in range(nl)])
            self.norm = TRms(d)

        def forward(self, ids):
            x = self.embed_tokens(ids)
            s = ids.shape[1]
            mask = torch.tril(torch.ones(s, s, dtype=torch.bool))[None, None]
            hiddens = [x]
            for l in self.layers:
                x = l(x, mask)
                hiddens.append(x)
            return self.norm(x), hiddens

    ref = TErnie().eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, _ = t2t(flat, llm_rules())

    cfg = LLMConfig(vocab_size=vocab, d_model=d, n_layers=nl, n_heads=nh,
                    n_kv_heads=nkv, head_dim=hd, d_ff=ff, rope_theta=500_000.0,
                    rms_eps=1e-5, all_bias=True, rope_interleaved=True,
                    collect_layers=(nl - 2,), dtype=jnp.float32)
    ids = np.asarray([[3, 9, 14, 2, 7, 30]], np.int32)
    with torch.no_grad():
        want_last, hiddens = ref(torch.from_numpy(ids).long())
        want_pen = hiddens[-2]  # hidden_states[-2]: input to the last layer
    out = LLMEncoder(cfg).apply({"params": tree}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), want_last.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["collected"][0]), want_pen.numpy(), atol=2e-4, rtol=2e-4)
