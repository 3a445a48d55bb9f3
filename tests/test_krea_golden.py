"""Krea2 MMDiT golden: flax KreaDiT vs a hand-written torch mirror of the
vendored reference semantics
(extensions_built_in/diffusion_models/krea2/src/mmdit.py: single-stream
[txt | img | refs] blocks with per-block additive zero-init modulation,
plus-one RMSNorms, sigmoid-gated GQA attention with per-head qk norms and
BFL rope, SwiGLU rounded to a multiple, TextFusionTransformer across the
stacked TE-layer axis, additive SimpleModulation LastLayer; pipeline.py:
(c,ph,pw) patchify, text pos zeros / image [0,y,x] / refs [i+1,y,x] with
t=0 modulation), loaded through the real import rules
(io/dit_importers.krea_rules)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import krea_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.krea_dit import (  # noqa: E402
    KreaConfig,
    KreaDiT,
    krea_pack,
    krea_unpack,
)
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope  # noqa: E402


class RMS(nn.Module):
    """mmdit.py RMSNorm: zero-init scale applied as (1 + scale), f32."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.scale = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        y = F.rms_norm(xf, (xf.shape[-1],), eps=self.eps,
                       weight=(self.scale.float() + 1.0))
        return y.to(x.dtype)


def rope_tab(pos, dim, theta):
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / (theta ** scale)
    out = torch.einsum("...n,d->...nd", pos.double(), omega)
    out = torch.stack([torch.cos(out), -torch.sin(out),
                       torch.sin(out), torch.cos(out)], dim=-1)
    return out.reshape(*out.shape[:-1], 2, 2).float()


def ropeapply(xq, freqs):
    xq_ = xq.float().reshape(*xq.shape[:-1], -1, 1, 2)
    fr = freqs[:, None]
    out = fr[..., 0] * xq_[..., 0] + fr[..., 1] * xq_[..., 1]
    return out.reshape(*xq.shape).to(xq.dtype)


class Attn(nn.Module):
    def __init__(self, dim, heads, kvheads, bias=False):
        super().__init__()
        self.heads, self.kvheads = heads, kvheads
        self.headdim = dim // heads
        self.wq = nn.Linear(dim, self.headdim * heads, bias=bias)
        self.wk = nn.Linear(dim, self.headdim * kvheads, bias=bias)
        self.wv = nn.Linear(dim, self.headdim * kvheads, bias=bias)
        self.gate = nn.Linear(dim, dim, bias=bias)
        qk = nn.Module()
        qk.qnorm = RMS(self.headdim)
        qk.knorm = RMS(self.headdim)
        self.qknorm = qk
        self.wo = nn.Linear(dim, dim, bias=bias)

    def forward(self, x, freqs=None, mask=None):
        b, s, _ = x.shape
        q = self.wq(x).view(b, s, self.heads, self.headdim).transpose(1, 2)
        k = self.wk(x).view(b, s, self.kvheads, self.headdim).transpose(1, 2)
        v = self.wv(x).view(b, s, self.kvheads, self.headdim).transpose(1, 2)
        gate = self.gate(x)
        q, k = self.qknorm.qnorm(q), self.qknorm.knorm(k)
        if freqs is not None:
            q, k = ropeapply(q, freqs), ropeapply(k, freqs)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask,
                                           enable_gqa=self.heads != self.kvheads)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.wo(o * torch.sigmoid(gate))


class SwiGLU(nn.Module):
    def __init__(self, features, multiplier, bias=False, multiple=8):
        super().__init__()
        mlpdim = int(2 * features / 3) * multiplier
        mlpdim = multiple * ((mlpdim + multiple - 1) // multiple)
        self.gate = nn.Linear(features, mlpdim, bias=bias)
        self.up = nn.Linear(features, mlpdim, bias=bias)
        self.down = nn.Linear(mlpdim, features, bias=bias)

    def forward(self, x):
        return self.down(F.silu(self.gate(x)) * self.up(x))


class FusionBlock(nn.Module):
    def __init__(self, features, heads, multiplier, bias, kvheads, multiple):
        super().__init__()
        self.prenorm = RMS(features)
        self.postnorm = RMS(features)
        self.attn = Attn(features, heads, kvheads, bias)
        self.mlp = SwiGLU(features, multiplier, bias, multiple)

    def forward(self, x, mask=None):
        x = x + self.attn(self.prenorm(x), mask=mask)
        return x + self.mlp(self.postnorm(x))


class TxtFusion(nn.Module):
    def __init__(self, n, txtdim, heads, multiplier, bias, kvheads, multiple):
        super().__init__()
        self.layerwise_blocks = nn.ModuleList(
            [FusionBlock(txtdim, heads, multiplier, bias, kvheads, multiple)
             for _ in range(2)])
        self.projector = nn.Linear(n, 1, bias=False)
        self.refiner_blocks = nn.ModuleList(
            [FusionBlock(txtdim, heads, multiplier, bias, kvheads, multiple)
             for _ in range(2)])

    def forward(self, x, mask=None):
        b, l, n, d = x.shape
        x = x.reshape(b * l, n, d)
        for blk in self.layerwise_blocks:
            x = blk(x, mask=None)
        x = x.reshape(b, l, n, d).permute(0, 1, 3, 2)
        x = self.projector(x.reshape(b * l, d, n)).reshape(b, l, d)
        for blk in self.refiner_blocks:
            x = blk(x, mask=mask)
        return x


class Block(nn.Module):
    def __init__(self, features, heads, multiplier, bias, kvheads, multiple):
        super().__init__()
        mod = nn.Module()
        mod.lin = nn.Parameter(torch.zeros(6 * features))
        self.mod = mod
        self.prenorm = RMS(features)
        self.postnorm = RMS(features)
        self.attn = Attn(features, heads, kvheads, bias)
        self.mlp = SwiGLU(features, multiplier, bias, multiple)

    def forward(self, x, vec, freqs, mask=None):
        if isinstance(vec, tuple):
            vec, refvec, split = vec
            m = (vec + self.mod.lin).chunk(6, dim=-1)
            r = (refvec + self.mod.lin).chunk(6, dim=-1)

            def modf(h, s, sh):
                return torch.cat(((1 + m[s]) * h[:, :split] + m[sh],
                                  (1 + r[s]) * h[:, split:] + r[sh]), dim=1)

            def gatef(h, g):
                return torch.cat((m[g] * h[:, :split], r[g] * h[:, split:]), dim=1)

            x = x + gatef(self.attn(modf(self.prenorm(x), 0, 1), freqs, mask), 2)
            x = x + gatef(self.mlp(modf(self.postnorm(x), 3, 4)), 5)
            return x
        pres, presh, preg, posts, postsh, postg = (vec + self.mod.lin).chunk(6, dim=-1)
        x = x + preg * self.attn((1 + pres) * self.prenorm(x) + presh, freqs, mask)
        x = x + postg * self.mlp((1 + posts) * self.postnorm(x) + postsh)
        return x


def temb(t, dim, period=1e4, tfactor=1e3):
    half = dim // 2
    freqs = torch.exp(-math.log(period) * torch.arange(half).float() / half)
    args = (t.float() * tfactor)[:, None, None] * freqs
    return torch.cat((torch.cos(args), torch.sin(args)), dim=-1)


class TorchKrea(nn.Module):
    def __init__(self, cfg: KreaConfig):
        super().__init__()
        self.cfg = cfg
        f = cfg.features
        hd = cfg.head_dim
        self.axes = list(cfg.axes_dim)
        self.first = nn.Linear(cfg.channels * cfg.patch ** 2, f, bias=True)
        self.blocks = nn.ModuleList([
            Block(f, cfg.heads, cfg.multiplier, cfg.bias, cfg.kvheads,
                  cfg.mlp_multiple) for _ in range(cfg.layers)])
        self.tmlp = nn.Sequential(nn.Linear(cfg.tdim, f),
                                  nn.GELU(approximate="tanh"), nn.Linear(f, f))
        self.txtfusion = TxtFusion(cfg.txtlayers, cfg.txtdim, cfg.txtheads,
                                   cfg.multiplier, cfg.bias, cfg.txtkvheads,
                                   cfg.mlp_multiple)
        self.txtmlp = nn.Sequential(RMS(cfg.txtdim), nn.Linear(cfg.txtdim, f),
                                    nn.GELU(approximate="tanh"), nn.Linear(f, f))
        last = nn.Module()
        last.norm = RMS(f)
        last.linear = nn.Linear(f, cfg.patch ** 2 * cfg.channels, bias=True)
        lastmod = nn.Module()
        lastmod.lin = nn.Parameter(torch.zeros(2, f))
        last.modulation = lastmod
        self.last = last
        self.tproj = nn.Sequential(nn.GELU(approximate="tanh"),
                                   nn.Linear(f, f * 6))

    def forward(self, img, context, t, pos, mask, reflen=0):
        cfg = self.cfg
        img = self.first(img)
        tv = self.tmlp(temb(t, cfg.tdim))
        tvec = self.tproj(tv)
        txtlen = context.shape[1]
        txtmask = mask[:, :txtlen]
        pair = txtmask.unsqueeze(1).unsqueeze(2) * txtmask.unsqueeze(1).unsqueeze(3)
        context = self.txtfusion(context, mask=pair.bool())
        context = self.txtmlp(context)
        imglen = img.shape[1]
        combined = torch.cat((context, img), dim=1)
        blockvec = tvec
        if reflen > 0:
            t0 = self.tmlp(temb(torch.zeros_like(t), cfg.tdim))
            blockvec = (tvec, self.tproj(t0), txtlen + imglen - reflen)
        m = mask.bool()
        attnmask = (m.unsqueeze(1).unsqueeze(2) * m.unsqueeze(1).unsqueeze(3)).bool()
        freqs = torch.cat([rope_tab(pos[..., i], d, cfg.theta)
                           for i, d in enumerate(self.axes)], dim=-3)
        for blk in self.blocks:
            combined = blk(combined, blockvec, freqs, attnmask)
        scale, shift = (tv + self.last.modulation.lin[None]).chunk(2, dim=1)
        x = (1 + scale) * self.last.norm(combined) + shift
        x = self.last.linear(x)
        return x[:, txtlen: txtlen + imglen - reflen]


def _cfg(scan):
    return KreaConfig(features=32, tdim=16, txtdim=24, heads=2, kvheads=1,
                      multiplier=2, layers=2, patch=2, channels=4, txtlayers=3,
                      txtheads=2, txtkvheads=2, mlp_multiple=8, theta=1e3,
                      scan_blocks=scan, remat=False, dtype=jnp.float32)


def _pe(cfg, hp, wp, txt_len, edit=False):
    ids = image_position_ids(hp, wp, text_len=txt_len)
    tab = multi_axis_rope(jnp.asarray(ids)[None], list(cfg.axes_dim), cfg.theta)
    if edit:
        cids = np.asarray(image_position_ids(hp, wp, text_len=0)).copy()
        cids[:, 0] = 1
        tab = jnp.concatenate([
            tab, multi_axis_rope(jnp.asarray(cids)[None], list(cfg.axes_dim),
                                 cfg.theta)], axis=1)
    return tab


@pytest.mark.parametrize("scan", [True, False])
def test_krea_golden(scan):
    torch.manual_seed(0)
    cfg = _cfg(scan)
    ref = TorchKrea(cfg).eval()
    # modulation / rms scales are zero-init in the reference; randomize so the
    # golden actually exercises them
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().max() == 0:
                p.copy_(torch.randn_like(p) * 0.2)
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, krea_rules(scan))
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    hp, wp, lt = 2, 3, 5
    img = rng.normal(size=(2, hp * wp, 4 * cfg.patch ** 2)).astype(np.float32)
    ctx = rng.normal(size=(2, lt, cfg.txtlayers, cfg.txtdim)).astype(np.float32)
    t = np.asarray([0.25, 0.9], np.float32)
    txt_mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], np.int32)

    ids = np.asarray(image_position_ids(hp, wp, text_len=lt), np.float32)
    # torch mirror expects [txt | img] pos rows
    pos = np.broadcast_to(ids[None], (2, *ids.shape)).copy()
    full_mask = np.concatenate([txt_mask, np.ones((2, hp * wp), np.int32)], axis=1)

    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(ctx),
                   torch.from_numpy(t), torch.from_numpy(pos),
                   torch.from_numpy(full_mask)).numpy()

    pe = _pe(cfg, hp, wp, lt)
    got = np.asarray(KreaDiT(cfg).apply(
        {"params": tree}, jnp.asarray(img), jnp.asarray(ctx), jnp.asarray(t),
        pe, jnp.asarray(txt_mask, bool)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_krea_golden_ref_tokens():
    """Edit path: clean reference tokens appended after the image span get the
    t=0 modulation (mmdit.py index_timestep_zero) and are sliced off."""
    torch.manual_seed(3)
    cfg = _cfg(True)
    ref = TorchKrea(cfg).eval()
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().max() == 0:
                p.copy_(torch.randn_like(p) * 0.2)
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, krea_rules(True))
    assert not unmatched

    rng = np.random.default_rng(3)
    hp, wp, lt = 2, 2, 4
    n_img = hp * wp
    img = rng.normal(size=(1, n_img, 4 * cfg.patch ** 2)).astype(np.float32)
    refs = rng.normal(size=(1, n_img, 4 * cfg.patch ** 2)).astype(np.float32)
    ctx = rng.normal(size=(1, lt, cfg.txtlayers, cfg.txtdim)).astype(np.float32)
    t = np.asarray([0.6], np.float32)
    txt_mask = np.ones((1, lt), np.int32)

    ids = np.asarray(image_position_ids(hp, wp, text_len=lt), np.float32)
    rids = np.asarray(image_position_ids(hp, wp, text_len=0), np.float32).copy()
    rids[:, 0] = 1
    pos = np.concatenate([ids, rids], axis=0)[None]
    full_mask = np.ones((1, lt + 2 * n_img), np.int32)

    with torch.no_grad():
        want = ref(torch.from_numpy(np.concatenate([img, refs], axis=1)),
                   torch.from_numpy(ctx), torch.from_numpy(t),
                   torch.from_numpy(pos), torch.from_numpy(full_mask),
                   reflen=n_img).numpy()

    pe = _pe(cfg, hp, wp, lt, edit=True)
    got = np.asarray(KreaDiT(cfg).apply(
        {"params": tree}, jnp.asarray(np.concatenate([img, refs], axis=1)),
        jnp.asarray(ctx), jnp.asarray(t), pe, jnp.asarray(txt_mask, bool),
        n_img))
    assert got.shape == (1, n_img, 4 * cfg.patch ** 2)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_krea_pack_roundtrip_and_order():
    """(c, ph, pw) feature order matches the reference rearrange."""
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(1, 4, 6, 3)).astype(np.float32)
    toks = np.asarray(krea_pack(jnp.asarray(lat), 2))
    # torch: rearrange(b c (h ph) (w pw) -> b (h w) (c ph pw))
    tl = torch.from_numpy(lat.transpose(0, 3, 1, 2))
    b, c, h, w = tl.shape
    want = tl.reshape(b, c, h // 2, 2, w // 2, 2).permute(0, 2, 4, 1, 3, 5)
    want = want.reshape(b, (h // 2) * (w // 2), c * 4).numpy()
    np.testing.assert_allclose(toks, want, atol=0, rtol=0)
    back = np.asarray(krea_unpack(jnp.asarray(toks), 4, 6, 2))
    np.testing.assert_allclose(back, lat, atol=0, rtol=0)


def test_krea_model_wrapper():
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    cls = get_model_class("krea2")
    m = cls(ModelConfig(arch="krea2", name_or_path="", model_kwargs={"size": "tiny"}))
    v = m.init_variables(jax.random.key(0))
    lat = m.encode_images(v, jnp.zeros((1, 32, 32, 3)))
    assert lat.shape == (1, *m.latent_shape(32, 32))
    cond = m.encode_prompt(v, ["a cat"])
    assert cond["txt"].ndim == 4 and cond["txt"].shape[2] == m.dit_config.txtlayers
    h, w, _ = m.latent_shape(32, 32)
    cond["pe"] = m.rope_table(h, w, cond["txt"].shape[1])
    pred = m.predict(v, lat, jnp.asarray([0.4]), cond)
    assert pred.shape == lat.shape
    dec = m.decode_latents(v, lat)
    assert dec.shape == (1, 32, 32, 3)

    spec = LoRASpec(rank=2, alpha=2.0, target_patterns=m.lora_targets())
    lora = build_lora(v["dit"], spec, jax.random.key(1))
    paths = lora_paths(lora)
    assert paths, "krea lora targeting matched nothing"
    assert not any("first" in p or "last" in p or "tproj" in p or "projector" in p
                   for p in paths)

    bad = cls(ModelConfig(arch="krea2", name_or_path="/nonexistent/krea2",
                          model_kwargs={"size": "tiny"}))
    with pytest.raises(FileNotFoundError):
        bad.load_variables(jax.random.key(0))
