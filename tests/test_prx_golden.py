"""PRX DiT golden: flax PRXDiT vs a hand-written torch mirror of the
reference PRXTransformer2DModel semantics
(extensions_built_in/diffusion_models/prx_pixel_t2i/src/transformer_prx.py:
image-only queries over [txt | img] keys/values, per-head RMSNorms on
q/k/txt-k, BFL 2x2 rope on image q/k, 6-way modulation, GELU-tanh gated MLP,
bottleneck patch projection and resolution-conditioned timestep vector),
using the diffusers checkpoint key names loaded through the real import
rules (io/dit_importers.prx_rules)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import prx_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.prx_dit import PRXConfig, PRXDiT, prx_image_ids  # noqa: E402


def sin_embed(t, dim, max_period, scale):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half).float() / half)
    args = scale * t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class RMS(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


class MLPEmb(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.in_layer = nn.Linear(din, dout)
        self.out_layer = nn.Linear(dout, dout)

    def forward(self, x):
        return self.out_layer(F.silu(self.in_layer(x)))


class Modulation(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.lin = nn.Linear(d, 6 * d)

    def forward(self, vec):
        out = self.lin(F.silu(vec))[:, None, :].chunk(6, dim=-1)
        return tuple(out[:3]), tuple(out[3:])


class Attention(nn.Module):
    def __init__(self, d, heads, hd):
        super().__init__()
        self.heads, self.hd = heads, hd
        self.img_qkv_proj = nn.Linear(d, 3 * d, bias=False)
        self.txt_kv_proj = nn.Linear(d, 2 * d, bias=False)
        self.norm_q = RMS(hd)
        self.norm_k = RMS(hd)
        self.norm_added_k = RMS(hd)
        self.to_out = nn.ModuleList([nn.Linear(d, d, bias=False)])

    def forward(self, x, txt, pe, mask):
        b, li, _ = x.shape
        lt = txt.shape[1]
        qkv = self.img_qkv_proj(x).reshape(b, li, 3, self.heads, self.hd)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))  # [B,H,L,D]
        q, k = self.norm_q(q), self.norm_k(k)
        kv = self.txt_kv_proj(txt).reshape(b, lt, 2, self.heads, self.hd)
        tk, tv = (kv[:, :, i].transpose(1, 2) for i in range(2))
        tk = self.norm_added_k(tk)

        def rope(xq):
            xq_ = xq.float().reshape(*xq.shape[:-1], -1, 1, 2)
            out = pe[..., 0] * xq_[..., 0] + pe[..., 1] * xq_[..., 1]
            return out.reshape(*xq.shape).type_as(xq)

        q, k = rope(q), rope(k)
        k = torch.cat([tk, k], dim=2)
        v = torch.cat([tv, v], dim=2)
        am = None
        if mask is not None:
            joint = torch.cat([mask.bool(), torch.ones(b, li, dtype=torch.bool)], dim=-1)
            am = joint[:, None, None, :].expand(-1, self.heads, li, -1)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=am)
        o = o.transpose(1, 2).reshape(b, li, self.heads * self.hd)
        return self.to_out[0](o)


class Block(nn.Module):
    def __init__(self, d, heads, mlp_ratio):
        super().__init__()
        inner = int(d * mlp_ratio)
        self.modulation = Modulation(d)
        self.attention = Attention(d, heads, d // heads)
        self.img_pre_norm = nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.post_attention_layernorm = nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.gate_proj = nn.Linear(d, inner, bias=False)
        self.up_proj = nn.Linear(d, inner, bias=False)
        self.down_proj = nn.Linear(inner, d, bias=False)

    def forward(self, x, txt, vec, pe, mask):
        (sh_a, sc_a, g_a), (sh_m, sc_m, g_m) = self.modulation(vec)
        h = (1 + sc_a) * self.img_pre_norm(x) + sh_a
        x = x + g_a * self.attention(h, txt, pe, mask)
        h = (1 + sc_m) * self.post_attention_layernorm(x) + sh_m
        x = x + g_m * self.down_proj(
            F.gelu(self.gate_proj(h), approximate="tanh") * self.up_proj(h)
        )
        return x


class FinalLayer(nn.Module):
    def __init__(self, d, out):
        super().__init__()
        self.norm_final = nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.linear = nn.Linear(d, out)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(d, 2 * d))

    def forward(self, x, vec):
        shift, scale = self.adaLN_modulation(vec).chunk(2, dim=1)
        return self.linear((1 + scale[:, None]) * self.norm_final(x) + shift[:, None])


class TorchPRX(nn.Module):
    def __init__(self, cfg: PRXConfig):
        super().__init__()
        self.cfg = cfg
        d, p = cfg.hidden_size, cfg.patch_size
        patch_dim = cfg.in_channels * p * p
        if cfg.bottleneck_size is not None:
            self.img_in = nn.Sequential(
                nn.Linear(patch_dim, cfg.bottleneck_size), nn.Linear(cfg.bottleneck_size, d)
            )
        else:
            self.img_in = nn.Linear(patch_dim, d)
        self.txt_in = nn.Linear(cfg.context_in_dim, d)
        self.time_in = MLPEmb(256, d)
        self.resolution_embedder = nn.Module()
        self.resolution_embedder.mlp = MLPEmb(256, d)
        self.blocks = nn.ModuleList(
            [Block(d, cfg.num_heads, cfg.mlp_ratio) for _ in range(cfg.depth)]
        )
        self.final_layer = FinalLayer(d, patch_dim)

    def rope_table(self, h_p, w_p):
        ids = torch.from_numpy(prx_image_ids(h_p, w_p)).double()
        tabs = []
        for ax, dim in enumerate(self.cfg.axes_dim):
            scale = torch.arange(0, dim, 2).double() / dim
            omega = 1.0 / (self.cfg.theta**scale)
            out = ids[:, ax : ax + 1] * omega[None]
            tab = torch.stack(
                [torch.cos(out), -torch.sin(out), torch.sin(out), torch.cos(out)], dim=-1
            ).reshape(*out.shape, 2, 2)
            tabs.append(tab)
        return torch.cat(tabs, dim=-3).float()[None, None]  # [1,1,L,D/2,2,2]

    def forward(self, x, txt, t, mask):
        cfg = self.cfg
        p = cfg.patch_size
        b, c, hh, ww = x.shape
        img = x.reshape(b, c, hh // p, p, ww // p, p)
        img = torch.einsum("nchpwq->nhwcpq", img).reshape(b, -1, c * p * p)
        img = self.img_in(img)
        txt = self.txt_in(txt)
        pe = self.rope_table(hh // p, ww // p)
        vec = self.time_in(sin_embed(t, 256, cfg.time_max_period, cfg.time_factor))
        if cfg.resolution_embeds:
            hw = torch.cat([
                sin_embed(torch.full((b,), float(hh)), 128, cfg.time_max_period, 1.0),
                sin_embed(torch.full((b,), float(ww)), 128, cfg.time_max_period, 1.0),
            ], dim=-1)
            vec = vec + self.resolution_embedder.mlp(hw)
        for blk in self.blocks:
            img = blk(img, txt, vec, pe, mask)
        img = self.final_layer(img, vec)
        img = img.reshape(b, hh // p, ww // p, c, p, p)
        return torch.einsum("nhwcpq->nchpwq", img).reshape(b, c, hh, ww)


def _cfg(scan):
    return PRXConfig(
        in_channels=3, patch_size=4, hidden_size=32, num_heads=2, depth=2,
        context_in_dim=24, axes_dim=(8, 8), mlp_ratio=3.5, bottleneck_size=20,
        resolution_embeds=True, scan_blocks=scan, remat=False,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("scan", [True, False])
def test_prx_golden(scan):
    torch.manual_seed(0)
    cfg = _cfg(scan)
    ref = TorchPRX(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, prx_rules(scan))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    txt = rng.normal(size=(2, 6, 24)).astype(np.float32)
    t = np.asarray([0.3, 0.9], np.float32)
    mask = np.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(txt),
            torch.from_numpy(t), torch.from_numpy(mask),
        ).numpy().transpose(0, 2, 3, 1)

    from ai_toolkit_tpu.ops.rope import multi_axis_rope

    pe = multi_axis_rope(jnp.asarray(prx_image_ids(4, 4))[None], list(cfg.axes_dim), cfg.theta)
    ours = PRXDiT(cfg)
    got = np.asarray(ours.apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t), pe,
        jnp.asarray(mask, bool),
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_prx_single_linear_img_in_rules():
    """The non-bottleneck img_in variant also round-trips the rules."""
    torch.manual_seed(1)
    cfg = PRXConfig(
        in_channels=4, patch_size=2, hidden_size=32, num_heads=2, depth=1,
        context_in_dim=16, axes_dim=(8, 8), bottleneck_size=None,
        resolution_embeds=False, scan_blocks=True, remat=False, dtype=jnp.float32,
    )
    ref = TorchPRX(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, prx_rules(True))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    txt = rng.normal(size=(1, 5, 16)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(txt),
            torch.from_numpy(t), None,
        ).numpy().transpose(0, 2, 3, 1)
    from ai_toolkit_tpu.ops.rope import multi_axis_rope

    pe = multi_axis_rope(jnp.asarray(prx_image_ids(2, 2))[None], list(cfg.axes_dim), cfg.theta)
    got = np.asarray(PRXDiT(cfg).apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t), pe, None,
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_prx_model_wrapper_shapes():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("prx_pixel")(
        ModelConfig(arch="prx_pixel", model_kwargs={"size": "tiny"}))
    assert model.x0_prediction and model.noise_scale == 2.0
    variables = model.init_variables(jax.random.key(0))
    h = w = 16  # pixel space, patch 4 in tiny
    assert model.latent_shape(h, w) == (16, 16, 3)
    cond = model.encode_prompt(variables, ["a photo"])
    assert cond["txt"].shape[1] == model.max_txt_len
    cond["pe"] = model.rope_table(h, w)
    x = jnp.zeros((1, h, w, 3))
    out = model.predict(variables, x, jnp.asarray([0.5]), cond)
    assert out.shape == (1, 16, 16, 3)
    # pixel space: encode/decode are identity/clamp
    imgs = jnp.ones((1, h, w, 3)) * 2.0
    assert model.encode_images(variables, imgs).shape == imgs.shape
    assert float(jnp.max(model.decode_latents(variables, imgs))) == 1.0


def test_prx_x0_lora_train_step_and_sampling():
    """x-prediction end-to-end: make_train_step with x0_target targets the
    clean latents with noise std 2.0 (prx_pixel_t2i.py:294-304), loss falls,
    and generate_flux runs the x0->velocity euler path with CFG on x0."""
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_flux
    from ai_toolkit_tpu.models.registry import get_model_class
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model = get_model_class("prx_pixel")(
        ModelConfig(arch="prx_pixel", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    spec = LoRASpec(rank=2, alpha=2.0, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(1))
    assert lora_paths(lora), "prx lora targeting matched nothing"

    h, w, c = model.latent_shape(16, 16)
    cond = model.encode_prompt(variables, ["x"])
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, h, w, c)) * 0.1,
        "cond": {**cond, "pe": model.rope_table(h, w)},
    }
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 5e-3))
    schedule = FlowMatchSchedule(shift=3.0, use_dynamic_shifting=False)
    step = jax.jit(make_train_step(
        model.predict, schedule,
        TrainStepConfig(timestep_type="sigmoid", x0_target=True, model_noise_scale=2.0),
    ))
    losses = []
    for _ in range(30):
        state, m = step(state, batch, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    img = generate_flux(
        model, variables,
        GenerateImageConfig(prompt="x", width=16, height=16, sample_steps=2,
                            guidance_scale=3.0),
        schedule=schedule,
    )
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
