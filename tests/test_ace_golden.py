"""ACE-Step 1.5 golden: our AceDiT/ConditionEncoder vs a hand-written torch
mirror of the reference's vendored AIO model (src/model.py), run through the
real import rules (io/ace_import.py) — the method that caught the wan
import bug. Also covers weight-norm folding for the Oobleck VAE convs."""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from ai_toolkit_tpu.io.ace_import import (
    fold_weight_norm,
    infer_ace_config,
    load_ace_dit,
    split_ace_checkpoint,
)
from ai_toolkit_tpu.models.ace_dit import AceConfig, AceStep15


# ---- torch mirror (AIO key layout) ----

class TRms(tnn.Module):
    def __init__(self, d, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps) * self.weight


def t_rope(seq, hd, device, base=1e6):
    inv = 1.0 / (base ** (torch.arange(0, hd, 2, dtype=torch.float32) / hd))
    f = torch.outer(torch.arange(seq, dtype=torch.float32), inv)
    emb = torch.cat([f, f], dim=-1)
    return emb.cos(), emb.sin()


def t_rot_half(x):
    h = x.shape[-1] // 2
    return torch.cat([-x[..., h:], x[..., :h]], dim=-1)


class TAttn(tnn.Module):
    def __init__(self, hidden, heads, kv, hd, eps=1e-6, is_cross=False, window=None):
        super().__init__()
        self.heads, self.kv, self.hd = heads, kv, hd
        self.is_cross, self.window = is_cross, window
        self.q_proj = tnn.Linear(hidden, heads * hd, bias=False)
        self.k_proj = tnn.Linear(hidden, kv * hd, bias=False)
        self.v_proj = tnn.Linear(hidden, kv * hd, bias=False)
        self.o_proj = tnn.Linear(heads * hd, hidden, bias=False)
        self.q_norm = TRms(hd, eps)
        self.k_norm = TRms(hd, eps)

    def forward(self, x, enc=None, rope=None):
        B, L, _ = x.shape
        q = self.q_norm(self.q_proj(x).view(B, L, self.heads, self.hd)).transpose(1, 2)
        src = enc if (self.is_cross and enc is not None) else x
        sL = src.shape[1]
        k = self.k_norm(self.k_proj(src).view(B, sL, self.kv, self.hd)).transpose(1, 2)
        v = self.v_proj(src).view(B, sL, self.kv, self.hd).transpose(1, 2)
        if rope is not None and not (self.is_cross and enc is not None):
            cos, sin = rope
            cos, sin = cos[None, None], sin[None, None]
            q = q * cos + t_rot_half(q) * sin
            k = k * cos + t_rot_half(k) * sin
        rep = self.heads // self.kv
        if rep > 1:
            k = k.repeat_interleave(rep, dim=1)
            v = v.repeat_interleave(rep, dim=1)
        bias = None
        if self.window is not None and not self.is_cross:
            idx = torch.arange(L)
            ok = (idx[:, None] - idx[None, :]).abs() <= self.window
            bias = torch.zeros(L, sL)
            bias.masked_fill_(~ok, torch.finfo(torch.float32).min)
            bias = bias[None, None]
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
        return self.o_proj(out.transpose(1, 2).reshape(B, L, -1))


class TMLP(tnn.Module):
    def __init__(self, hidden, inter):
        super().__init__()
        self.gate_proj = tnn.Linear(hidden, inter, bias=False)
        self.up_proj = tnn.Linear(hidden, inter, bias=False)
        self.down_proj = tnn.Linear(inter, hidden, bias=False)

    def forward(self, x):
        return self.down_proj(F.silu(self.gate_proj(x)) * self.up_proj(x))


class TEncLayer(tnn.Module):
    def __init__(self, hidden, heads, kv, hd, inter, eps=1e-6):
        super().__init__()
        self.self_attn = TAttn(hidden, heads, kv, hd, eps)
        self.input_layernorm = TRms(hidden, eps)
        self.post_attention_layernorm = TRms(hidden, eps)
        self.mlp = TMLP(hidden, inter)

    def forward(self, x, rope):
        x = x + self.self_attn(self.input_layernorm(x), rope=rope)
        return x + self.mlp(self.post_attention_layernorm(x))


class TDiTLayer(tnn.Module):
    def __init__(self, hidden, heads, kv, hd, inter, eps=1e-6, window=None):
        super().__init__()
        self.self_attn_norm = TRms(hidden, eps)
        self.self_attn = TAttn(hidden, heads, kv, hd, eps, window=window)
        self.cross_attn_norm = TRms(hidden, eps)
        self.cross_attn = TAttn(hidden, heads, kv, hd, eps, is_cross=True)
        self.mlp_norm = TRms(hidden, eps)
        self.mlp = TMLP(hidden, inter)
        self.scale_shift_table = tnn.Parameter(torch.randn(1, 6, hidden) * 0.02)

    def forward(self, x, tproj, enc, rope):
        mods = (self.scale_shift_table + tproj).chunk(6, dim=1)
        s1, c1, g1, s2, c2, g2 = mods
        x = x + self.self_attn(self.self_attn_norm(x) * (1 + c1) + s1, rope=rope) * g1
        x = x + self.cross_attn(self.cross_attn_norm(x), enc=enc)
        x = x + self.mlp(self.mlp_norm(x) * (1 + c2) + s2) * g2
        return x


def t_time_emb(t, dim, scale=1000.0):
    t = t * scale
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TTimeEmbed(tnn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.linear_1 = tnn.Linear(256, hidden)
        self.linear_2 = tnn.Linear(hidden, hidden)
        self.time_proj = tnn.Linear(hidden, hidden * 6)

    def forward(self, t):
        temb = self.linear_2(F.silu(self.linear_1(t_time_emb(t, 256))))
        proj = self.time_proj(F.silu(temb)).view(-1, 6, temb.shape[-1])
        return temb, proj


class TDecoder(tnn.Module):
    def __init__(self, c: AceConfig):
        super().__init__()
        self.c = c
        self.proj_in = tnn.Sequential(
            tnn.Identity(), tnn.Conv1d(c.in_ch, c.hidden, c.patch, stride=c.patch)
        )
        self.time_embed = TTimeEmbed(c.hidden)
        self.time_embed_r = TTimeEmbed(c.hidden)
        self.condition_embedder = tnn.Linear(c.eh, c.hidden)
        self.layers = tnn.ModuleList([
            TDiTLayer(c.hidden, c.heads, c.kv, c.head_dim, c.inter, c.eps,
                      window=c.sliding_window if i % 2 == 0 else None)
            for i in range(c.n_dit)
        ])
        self.norm_out = TRms(c.hidden, c.eps)
        self.proj_out = tnn.Sequential(
            tnn.Identity(),
            tnn.ConvTranspose1d(c.hidden, c.out_ch, c.patch, stride=c.patch),
        )
        self.scale_shift_table = tnn.Parameter(torch.randn(1, 2, c.hidden) * 0.02)

    def forward(self, x, t, t_r, enc_h, context):
        temb_t, proj_t = self.time_embed(t)
        temb_r, proj_r = self.time_embed_r(t - t_r)
        temb, tproj = temb_t + temb_r, proj_t + proj_r
        h = torch.cat([context, x], dim=-1)
        orig = h.shape[1]
        if h.shape[1] % self.c.patch:
            h = F.pad(h, (0, 0, 0, self.c.patch - h.shape[1] % self.c.patch))
        h = self.proj_in(h.transpose(1, 2)).transpose(1, 2)
        enc = self.condition_embedder(enc_h)
        rope = t_rope(h.shape[1], self.c.head_dim, h.device)
        for layer in self.layers:
            h = layer(h, tproj, enc, rope)
        shift, scale = (self.scale_shift_table + temb.unsqueeze(1)).chunk(2, dim=1)
        h = self.norm_out(h) * (1 + scale) + shift
        h = self.proj_out(h.transpose(1, 2)).transpose(1, 2)
        return h[:, :orig]


class TLyric(tnn.Module):
    def __init__(self, c: AceConfig):
        super().__init__()
        self.embed_tokens = tnn.Linear(c.text_dim, c.eh)
        self.norm = TRms(c.eh, c.eps)
        self.layers = tnn.ModuleList([
            TEncLayer(c.eh, c.enc_heads or c.heads, c.enc_kv or c.kv,
                      c.head_dim, c.enc_inter or c.inter, c.eps)
            for _ in range(c.n_lyric)
        ])
        self.c = c

    def forward(self, e):
        x = self.embed_tokens(e)
        rope = t_rope(x.shape[1], self.c.head_dim, x.device)
        for layer in self.layers:
            x = layer(x, rope)
        return self.norm(x)


class TTimbre(tnn.Module):
    def __init__(self, c: AceConfig):
        super().__init__()
        self.embed_tokens = tnn.Linear(c.timbre_dim, c.eh)
        self.norm = TRms(c.eh, c.eps)
        self.layers = tnn.ModuleList([
            TEncLayer(c.eh, c.enc_heads or c.heads, c.enc_kv or c.kv,
                      c.head_dim, c.enc_inter or c.inter, c.eps)
            for _ in range(c.n_timbre)
        ])
        self.special_token = tnn.Parameter(torch.randn(1, 1, c.eh) * 0.02)
        self.c = c

    def forward(self, packed):
        x = self.embed_tokens(packed)
        rope = t_rope(x.shape[1], self.c.head_dim, x.device)
        for layer in self.layers:
            x = layer(x, rope)
        return self.norm(x)[:, 0, :]


class TEncoder(tnn.Module):
    def __init__(self, c: AceConfig):
        super().__init__()
        self.text_projector = tnn.Linear(c.text_dim, c.eh, bias=False)
        self.lyric_encoder = TLyric(c)
        self.timbre_encoder = TTimbre(c)


class TAce(tnn.Module):
    def __init__(self, c: AceConfig):
        super().__init__()
        self.decoder = TDecoder(c)
        self.encoder = TEncoder(c)
        self.null_condition_emb = tnn.Parameter(torch.randn(1, 1, c.eh) * 0.02)


def _cfg():
    return AceConfig.tiny()


def _mirror_and_params(cfg):
    torch.manual_seed(0)
    mirror = TAce(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params, cfg_kw = load_ace_dit(sd)
    return mirror, params, cfg_kw


def test_infer_config_matches():
    cfg = _cfg()
    mirror, params, kw = _mirror_and_params(cfg)
    assert kw["hidden"] == cfg.hidden and kw["inter"] == cfg.inter
    assert kw["heads"] == cfg.heads and kw["kv"] == cfg.kv
    assert kw["n_dit"] == cfg.n_dit and kw["n_lyric"] == cfg.n_lyric
    assert kw["in_ch"] == cfg.in_ch and kw["out_ch"] == cfg.out_ch
    assert kw["patch"] == cfg.patch and kw["text_dim"] == cfg.text_dim


def test_ace_dit_golden():
    cfg = _cfg()
    mirror, params, _ = _mirror_and_params(cfg)
    rng = np.random.default_rng(0)
    b, t_len = 2, 9  # odd length exercises the patch padding path
    x = rng.standard_normal((b, t_len, cfg.out_ch)).astype(np.float32)
    ctx = rng.standard_normal((b, t_len, cfg.in_ch - cfg.out_ch)).astype(np.float32)
    enc_h = rng.standard_normal((b, 5, cfg.eh)).astype(np.float32)
    ts = np.asarray([0.3, 0.8], np.float32)
    ts_r = np.asarray([0.1, 0.8], np.float32)

    with torch.no_grad():
        ref = mirror.decoder(
            torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(ts_r),
            torch.from_numpy(enc_h), torch.from_numpy(ctx),
        ).numpy()

    model = AceStep15(cfg)
    out = model.apply({"params": params}, jax.numpy.asarray(x),
                      jax.numpy.asarray(ts), jax.numpy.asarray(ts_r),
                      jax.numpy.asarray(enc_h), jax.numpy.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


def test_ace_condition_encoder_golden():
    cfg = _cfg()
    mirror, params, _ = _mirror_and_params(cfg)
    rng = np.random.default_rng(1)
    b = 2
    text_h = rng.standard_normal((b, 4, cfg.text_dim)).astype(np.float32)
    lyric_h = rng.standard_normal((b, 6, cfg.text_dim)).astype(np.float32)
    packed = rng.standard_normal((b, 3, cfg.timbre_dim)).astype(np.float32)
    text_m = np.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], np.int32)
    lyric_m = np.asarray([[1] * 6, [1, 1, 1, 1, 0, 0]], np.int32)
    timbre_m = np.asarray([[1], [1]], np.int32)

    with torch.no_grad():
        tp = mirror.encoder.text_projector(torch.from_numpy(text_h))
        le = mirror.encoder.lyric_encoder(torch.from_numpy(lyric_h))
        cls = mirror.encoder.timbre_encoder(torch.from_numpy(packed))  # [B, eh]

        def pack(h1, h2, m1, m2):
            h = torch.cat([h1, h2], dim=1)
            m = torch.cat([m1, m2], dim=1)
            B, L, D = h.shape
            idx = m.argsort(dim=1, descending=True, stable=True)
            h = torch.gather(h, 1, idx.unsqueeze(-1).expand(B, L, D))
            lengths = m.sum(dim=1)
            return h, (torch.arange(L)[None] < lengths[:, None]).long()

        m1, m2 = pack(le, cls[:, None], torch.from_numpy(lyric_m), torch.from_numpy(timbre_m))
        ref, ref_m = pack(m1, tp, m2, torch.from_numpy(text_m))

    # run our full condition path: timbre CLS from our tower, then encoder
    import jax.numpy as jnp

    from ai_toolkit_tpu.models.ace_dit import AceTimbreEncoder

    model = AceStep15(cfg)

    cls_ours = AceTimbreEncoder(cfg).apply(
        {"params": params["encoder"]["timbre_encoder"]}, jnp.asarray(packed)
    )
    np.testing.assert_allclose(np.asarray(cls_ours), cls.numpy(), atol=2e-4, rtol=2e-3)

    out, out_m = model.apply(
        {"params": params}, jnp.asarray(text_h), jnp.asarray(text_m),
        jnp.asarray(lyric_h), jnp.asarray(lyric_m),
        cls_ours[:, None, :], jnp.asarray(timbre_m),
        method=AceStep15.encode_condition,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(out_m).astype(np.int64), ref_m.numpy())


def test_weight_norm_folding():
    conv = tnn.utils.parametrizations.weight_norm(tnn.Conv1d(4, 8, 7, padding=3))
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    w = fold_weight_norm(sd, "c")
    with torch.no_grad():
        np.testing.assert_allclose(w, conv.weight.detach().numpy(), atol=1e-6)


def test_split_checkpoint_prefixes():
    flat = {
        "model.diffusion_model.decoder.norm_out.weight": np.ones(4),
        "vae.encoder.layers.0.bias": np.ones(2),
        "text_encoders.qwen3_06b.transformer.model.embed_tokens.weight": np.ones((3, 2)),
        "unrelated.key": np.ones(1),
    }
    dit, vae, te = split_ace_checkpoint(flat)
    assert list(dit) == ["decoder.norm_out.weight"]
    assert list(vae) == ["encoder.layers.0.bias"]
    assert list(te) == ["embed_tokens.weight"]


class TSnake(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = tnn.Parameter(torch.randn(ch) * 0.1)
        self.beta = tnn.Parameter(torch.randn(ch) * 0.1)

    def forward(self, x):  # [B, C, L]
        a = self.alpha[None, :, None].exp()
        b = self.beta[None, :, None].exp()
        return x + (1.0 / (b + 1e-9)) * torch.sin(x * a).pow(2)


def _wn(m):
    return tnn.utils.parametrizations.weight_norm(m)


class TResUnit(tnn.Module):
    def __init__(self, ch, d):
        super().__init__()
        self.layers = tnn.Sequential(
            TSnake(ch), _wn(tnn.Conv1d(ch, ch, 7, dilation=d, padding=(d * 6) // 2)),
            TSnake(ch), _wn(tnn.Conv1d(ch, ch, 1)),
        )

    def forward(self, x):
        return x + self.layers(x)


class TSeqWrap(tnn.Module):
    def __init__(self, *mods):
        super().__init__()
        self.layers = tnn.Sequential(*mods)

    def forward(self, x):
        return self.layers(x)


class TOobleck(tnn.Module):
    def __init__(self, in_ch=2, channels=8, latent=4, c_mults=(1, 2), strides=(2, 4)):
        super().__init__()
        cm = [1] + list(c_mults)

        def enc_block(i, o, s):
            return tnn.Sequential(
                TResUnit(i, 1), TResUnit(i, 3), TResUnit(i, 9), TSnake(i),
                _wn(tnn.Conv1d(i, o, 2 * s, stride=s, padding=math.ceil(s / 2))),
            )

        def dec_block(i, o, s):
            return tnn.Sequential(
                TSnake(i),
                _wn(tnn.ConvTranspose1d(i, o, 2 * s, stride=s, padding=math.ceil(s / 2))),
                TResUnit(o, 1), TResUnit(o, 3), TResUnit(o, 9),
            )

        enc = [_wn(tnn.Conv1d(in_ch, cm[0] * channels, 7, padding=3))]
        enc += [TSeqWrap(*enc_block(cm[i] * channels, cm[i + 1] * channels, strides[i]).children())
                for i in range(len(cm) - 1)]
        enc += [TSnake(cm[-1] * channels), _wn(tnn.Conv1d(cm[-1] * channels, latent * 2, 3, padding=1))]
        self.encoder = TSeqWrap(*enc)
        dec = [_wn(tnn.Conv1d(latent, cm[-1] * channels, 7, padding=3))]
        dec += [TSeqWrap(*dec_block(cm[i] * channels, cm[i - 1] * channels, strides[i - 1]).children())
                for i in range(len(cm) - 1, 0, -1)]
        dec += [TSnake(cm[0] * channels), _wn(tnn.Conv1d(cm[0] * channels, in_ch, 7, padding=3, bias=False))]
        self.decoder = TSeqWrap(*dec)

    def encode(self, x):
        return self.encoder(x).chunk(2, dim=1)[0]

    def decode(self, z):
        return self.decoder(z)


def test_ace_oobleck_vae_golden():
    from ai_toolkit_tpu.io.ace_import import load_ace_vae
    from ai_toolkit_tpu.models.ace_vae import AceOobleckVAE, OobleckConfig

    torch.manual_seed(3)
    cfg = OobleckConfig.tiny()
    mirror = TOobleck(channels=cfg.channels, latent=cfg.latent_dim,
                      c_mults=cfg.c_mults, strides=cfg.strides).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = load_ace_vae(sd, n_blocks=len(cfg.c_mults))

    rng = np.random.default_rng(0)
    up = cfg.upscale_factor
    wav = rng.standard_normal((2, up * 6, cfg.in_ch)).astype(np.float32) * 0.3

    with torch.no_grad():
        z_ref = mirror.encode(torch.from_numpy(wav).transpose(1, 2))
        y_ref = mirror.decode(z_ref).transpose(1, 2).numpy()
        z_ref = z_ref.transpose(1, 2).numpy()

    vae = AceOobleckVAE(cfg)
    import jax.numpy as jnp

    z = vae.apply({"params": params}, jnp.asarray(wav), method=AceOobleckVAE.encode)
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=3e-4, rtol=2e-3)
    y = vae.apply({"params": params}, z, method=AceOobleckVAE.decode)
    assert np.asarray(y).shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=3e-4, rtol=2e-3)


def test_ace_exact_model_end_to_end(tmp_path):
    """A synthetic tiny AIO single-file checkpoint loads through AudioModel's
    exact path: prompt encode -> predict -> VAE encode/decode all run with
    imported weights."""
    from safetensors.torch import save_file as torch_save

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.ace_vae import OobleckConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    torch.manual_seed(7)
    cfg = _cfg()
    mirror = TAce(cfg).eval()
    vcfg = OobleckConfig.tiny()
    vae = TOobleck(channels=vcfg.channels, latent=cfg.out_ch,
                   c_mults=vcfg.c_mults, strides=vcfg.strides).eval()

    # minimal qwen3-style TE whose hidden == cfg.text_dim
    te_sd = {}
    hd, heads, kv, dff = 8, 2, 1, 32
    te_sd["embed_tokens.weight"] = torch.randn(64, cfg.text_dim) * 0.05
    te_sd["norm.weight"] = torch.ones(cfg.text_dim)
    for i in range(2):
        p = f"layers.{i}."
        te_sd[p + "self_attn.q_proj.weight"] = torch.randn(heads * hd, cfg.text_dim) * 0.05
        te_sd[p + "self_attn.k_proj.weight"] = torch.randn(kv * hd, cfg.text_dim) * 0.05
        te_sd[p + "self_attn.v_proj.weight"] = torch.randn(kv * hd, cfg.text_dim) * 0.05
        te_sd[p + "self_attn.o_proj.weight"] = torch.randn(cfg.text_dim, heads * hd) * 0.05
        te_sd[p + "self_attn.q_norm.weight"] = torch.ones(hd)
        te_sd[p + "self_attn.k_norm.weight"] = torch.ones(hd)
        te_sd[p + "input_layernorm.weight"] = torch.ones(cfg.text_dim)
        te_sd[p + "post_attention_layernorm.weight"] = torch.ones(cfg.text_dim)
        te_sd[p + "mlp.gate_proj.weight"] = torch.randn(dff, cfg.text_dim) * 0.05
        te_sd[p + "mlp.up_proj.weight"] = torch.randn(dff, cfg.text_dim) * 0.05
        te_sd[p + "mlp.down_proj.weight"] = torch.randn(cfg.text_dim, dff) * 0.05

    flat = {}
    for k, v in mirror.state_dict().items():
        flat[f"model.diffusion_model.{k}"] = v.contiguous()
    for k, v in vae.state_dict().items():
        flat[f"vae.{k}"] = v.contiguous()
    for k, v in te_sd.items():
        flat[f"text_encoders.qwen3_06b.transformer.model.{k}"] = v.contiguous()
    ckpt = tmp_path / "ace_tiny_aio.safetensors"
    torch_save(flat, str(ckpt))

    model = get_model_class("ace_step_15")(
        ModelConfig(arch="ace_step_15", name_or_path=str(ckpt))
    )
    assert model.exact
    v = model.load_variables(jax.random.key(0))
    cond = model.encode_prompt(
        v, ["<CAPTION>lofi beat</CAPTION><BPM>90</BPM><LYRICS>la la</LYRICS>"]
    )
    assert cond["enc_h"].ndim == 3

    up = vcfg.upscale_factor
    wav = np.random.default_rng(0).standard_normal((1, up * 4, 2)).astype(np.float32) * 0.2
    import jax.numpy as jnp

    lat = model.encode_audio(v, jnp.asarray(wav))
    assert lat.shape == (1, 4, cfg.out_ch)
    pred = model.predict(v, lat, jnp.asarray([0.5]), cond)
    assert pred.shape == lat.shape and bool(jnp.isfinite(pred).all())
    out = model.decode_latents(v, lat)
    assert out.shape == wav.shape
