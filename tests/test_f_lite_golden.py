"""F-Lite golden numerics: flax FLiteDiT vs a torch mirror of the vendored
reference model (``extensions_built_in/diffusion_models/f_light/src/model.py``):
conv patch embed, 16 register tokens, split-half 2D rotary with identity
rotation on registers, post-rope paramless QK-norm, residual-v mixing,
9-way adaLN blocks, modulated RMS head."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.config.modules import ModelConfig  # noqa: E402
from ai_toolkit_tpu.io.dit_importers import flite_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.f_lite import (  # noqa: E402
    FLiteConfig,
    FLiteDiT,
    flite_rope_table,
)
from ai_toolkit_tpu.models.registry import get_model_class  # noqa: E402


def _rms(x, w=None, eps=1e-6):
    y = x.float() * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True) + eps)
    if w is not None:
        y = y * w
    return y.to(x.dtype)


def _rot(x, cos, sin):
    d = x.shape[-1] // 2
    x1, x2 = x.float()[..., :d], x.float()[..., d:]
    return torch.cat([x1 * cos + x2 * sin, -x1 * sin + x2 * cos], -1).to(x.dtype)


class TBlock(nn.Module):
    def __init__(self, d, heads, ctx, residual_v):
        super().__init__()
        self.h, self.hd, self.residual_v = heads, d // heads, residual_v

        self.norm1 = nn.Module()
        self.norm1.weight = nn.Parameter(torch.ones(d))
        self.self_attn = nn.Module()
        self.self_attn.qkv = nn.Linear(d, 3 * d, bias=True)
        self.self_attn.proj = nn.Linear(d, d, bias=False)
        if residual_v:
            self.self_attn.lambda_param = nn.Parameter(torch.tensor(0.5).reshape(1))
        self.norm2 = nn.Module()
        self.norm2.weight = nn.Parameter(torch.ones(d))
        self.cross_attn = nn.Module()
        self.cross_attn.q = nn.Linear(d, d, bias=True)
        self.cross_attn.context_kv = nn.Linear(ctx, 2 * d, bias=True)
        self.cross_attn.proj = nn.Linear(d, d, bias=False)
        self.norm3 = nn.Module()
        self.norm3.weight = nn.Parameter(torch.ones(d))
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(d, 9 * d, bias=True))

    def forward(self, x, context, c, v_0, rope):
        cos, sin = rope
        mods = self.adaLN_modulation(c).chunk(9, dim=1)
        (sh_sa, sc_sa, g_sa, sh_ca, sc_ca, g_ca, sh_mlp, sc_mlp, g_mlp) = [
            m[:, None, :] for m in mods
        ]
        b, n, d = x.shape
        h = _rms(x, self.norm1.weight) * (1 + sc_sa) + sh_sa
        qkv = self.self_attn.qkv(h).reshape(b, n, 3, self.h, self.hd)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        if self.residual_v and v_0 is not None:
            v = self.self_attn.lambda_param * v + (1 - self.self_attn.lambda_param) * v_0
        v_out = v
        q, k = _rot(q, cos, sin), _rot(k, cos, sin)
        q, k = _rms(q), _rms(k)
        o = F.scaled_dot_product_attention(q, k, v)
        o = self.self_attn.proj(o.transpose(1, 2).reshape(b, n, d))
        x = x + o * g_sa

        h = _rms(x, self.norm2.weight) * (1 + sc_ca) + sh_ca
        q = self.cross_attn.q(h).reshape(b, n, self.h, self.hd).transpose(1, 2)
        kv = self.cross_attn.context_kv(context)
        kv = kv.reshape(b, -1, 2, self.h, self.hd)
        k, v = kv[:, :, 0].transpose(1, 2), kv[:, :, 1].transpose(1, 2)
        q, k = _rms(q), _rms(k)
        o = F.scaled_dot_product_attention(q, k, v)
        o = self.cross_attn.proj(o.transpose(1, 2).reshape(b, n, d))
        x = x + o * g_ca

        h = _rms(x, self.norm3.weight) * (1 + sc_mlp) + sh_mlp
        return x + self.mlp(h) * g_mlp, v_out


def _t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TDiT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, p = cfg.hidden_size, cfg.patch_size
        self.cfg = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.patch_proj = nn.Conv2d(cfg.in_channels, d, p, stride=p)
        self.register_tokens = nn.Parameter(torch.randn(1, 16, d))
        self.time_embed = nn.Sequential(
            nn.Linear(d, 4 * d), nn.SiLU(), nn.Linear(4 * d, d))
        self.blocks = nn.ModuleList([
            TBlock(d, cfg.num_heads, cfg.cross_attn_input_size, cfg.residual_v)
            for _ in range(cfg.depth)])
        self.final_modulation = nn.Sequential(nn.SiLU(), nn.Linear(d, 2 * d, bias=True))
        self.final_norm = nn.Module()
        self.final_norm.weight = nn.Parameter(torch.ones(d))
        self.final_proj = nn.Linear(d, p * p * cfg.in_channels)

    def forward(self, x, context, t, cos, sin):
        cfg = self.cfg
        b, c, hh, ww = x.shape
        p = cfg.patch_size
        x = self.patch_embed.patch_proj(x)
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.register_tokens.repeat(b, 1, 1), x], 1)
        temb = self.time_embed(_t_timestep_embedding(t * 1000.0, cfg.hidden_size))
        v0 = None
        for blk in self.blocks:
            x, v = blk(x, context, temb, v0, (cos, sin))
            if v0 is None:
                v0 = v
        x = x[:, 16:]
        f_shift, f_scale = self.final_modulation(temb).chunk(2, dim=1)
        x = _rms(x, self.final_norm.weight) * (1 + f_scale[:, None]) + f_shift[:, None]
        x = self.final_proj(x)
        x = x.reshape(b, hh // p, ww // p, p, p, c)
        return x.permute(0, 5, 1, 3, 2, 4).reshape(b, c, hh, ww)


def test_flite_golden_forward():
    cfg = FLiteConfig.tiny()  # residual_v=True exercises the v-mixing path
    torch.manual_seed(0)
    tm = TDiT(cfg).eval()
    for p_ in tm.parameters():
        p_.data = torch.randn_like(p_) * 0.2
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, flite_rules(scan_blocks=True))
    assert not unmatched, unmatched[:6]

    model = FLiteDiT(cfg)
    pe = jnp.asarray(flite_rope_table(4, 4, cfg.head_dim))
    x = np.random.default_rng(0).normal(size=(1, 8, 8, cfg.in_channels)).astype(np.float32)
    ctx = np.random.default_rng(1).normal(size=(1, 7, cfg.cross_attn_input_size)).astype(np.float32)
    ref = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ctx),
                     jnp.full((1,), 0.4), pe)["params"]
    ref_paths = {p for p, _ in _walk(ref)}
    got_paths = {p for p, _ in _walk(tree)}
    assert ref_paths == got_paths, (sorted(ref_paths - got_paths)[:5],
                                    sorted(got_paths - ref_paths)[:5])

    j = model.apply({"params": tree}, jnp.asarray(x), jnp.asarray(ctx),
                    jnp.full((1,), 0.4), pe)
    cos = torch.from_numpy(np.asarray(pe[0], np.float32))
    sin = torch.from_numpy(np.asarray(pe[1], np.float32))
    with torch.no_grad():
        tref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(ctx), torch.tensor([0.4]), cos, sin)
    np.testing.assert_allclose(
        np.asarray(j).transpose(0, 3, 1, 2), tref.numpy(), rtol=2e-3, atol=2e-3
    )


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


def test_flite_model_train_step():
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model = get_model_class("f-lite")(
        ModelConfig(arch="f-lite", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    h, w, c = model.latent_shape(16, 16)
    cond = model.encode_prompt(variables, ["a cat"])
    cond["pe"] = model.rope_table(h, w)
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape

    lora = build_lora(variables["dit"],
                      LoRASpec(rank=2, target_patterns=model.lora_targets()),
                      jax.random.key(2))
    assert lora
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, FlowMatchSchedule(), TrainStepConfig()))
    state, m = step(state, {"latents": noisy, "cond": cond}, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
