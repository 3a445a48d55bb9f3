"""Z-Image family goldens: flax ZImageDiT vs hand-written torch mirrors of
the vendored reference semantics (zeta_chroma_transformer.py: ZImageDCT with
tanh-gated 4-way AdaLN RMSNorm-sandwich blocks, complex interleaved rope over
(32,48,48)-style axes, NerfEmbedder/ResBlock DCT decoder + x0 residual;
z_image_l2p_model.py: FinalLayer/MicroDiffusionModel heads and the [img, txt]
unified order), loaded through the real import rules
(io/dit_importers.zimage_rules + zimage_canonical)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import (  # noqa: E402
    zimage_canonical,
    zimage_rules,
)
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.zimage_dit import (  # noqa: E402
    ZImageConfig,
    ZImageDiT,
    zimage_pos_angles,
)


class RMS(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        y = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)
        return y * self.weight


def apply_rotary(x, freqs_cis):
    # zeta_chroma_transformer.py:143-148
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    out = torch.view_as_real(xc * freqs_cis.unsqueeze(2)).flatten(3)
    return out.type_as(x)


class Attn(nn.Module):
    def __init__(self, dim, heads, eps):
        super().__init__()
        self.heads, self.hd = heads, dim // heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim, bias=False)])
        self.norm_q = RMS(self.hd, eps)
        self.norm_k = RMS(self.hd, eps)

    def forward(self, x, mask, freqs_cis):
        b, s, _ = x.shape
        q = self.to_q(x).unflatten(-1, (self.heads, -1))
        k = self.to_k(x).unflatten(-1, (self.heads, -1))
        v = self.to_v(x).unflatten(-1, (self.heads, -1))
        q, k = self.norm_q(q), self.norm_k(k)
        q, k = apply_rotary(q, freqs_cis), apply_rotary(k, freqs_cis)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=mask,
        ).transpose(1, 2).flatten(2, 3)
        return self.to_out[0](o)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        hidden = int(dim / 3 * 8)
        self.w1 = nn.Linear(dim, hidden, bias=False)
        self.w2 = nn.Linear(hidden, dim, bias=False)
        self.w3 = nn.Linear(dim, hidden, bias=False)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


class Block(nn.Module):
    def __init__(self, dim, heads, eps, adaln_dim, modulation=True):
        super().__init__()
        self.modulation = modulation
        self.attention = Attn(dim, heads, eps)
        self.feed_forward = FeedForward(dim)
        self.attention_norm1 = RMS(dim, eps)
        self.ffn_norm1 = RMS(dim, eps)
        self.attention_norm2 = RMS(dim, eps)
        self.ffn_norm2 = RMS(dim, eps)
        if modulation:
            self.adaLN_modulation = nn.ModuleList(
                [nn.Linear(adaln_dim, 4 * dim, bias=True)])

    def forward(self, x, mask, freqs_cis, adaln=None):
        if self.modulation:
            sc_a, g_a, sc_m, g_m = (
                self.adaLN_modulation[0](adaln).unsqueeze(1).chunk(4, dim=2))
            g_a, g_m = g_a.tanh(), g_m.tanh()
            sc_a, sc_m = 1.0 + sc_a, 1.0 + sc_m
            a = self.attention(self.attention_norm1(x) * sc_a, mask, freqs_cis)
            x = x + g_a * self.attention_norm2(a)
            x = x + g_m * self.ffn_norm2(
                self.feed_forward(self.ffn_norm1(x) * sc_m))
        else:
            a = self.attention(self.attention_norm1(x), mask, freqs_cis)
            x = x + self.attention_norm2(a)
            x = x + self.ffn_norm2(self.feed_forward(self.ffn_norm1(x)))
        return x


class TimestepEmbedder(nn.Module):
    def __init__(self, out_size, mid_size=1024, freq=256):
        super().__init__()
        self.freq = freq
        self.mlp = nn.Sequential(
            nn.Linear(freq, mid_size), nn.SiLU(), nn.Linear(mid_size, out_size))

    def forward(self, t):
        half = self.freq // 2
        f = torch.exp(-math.log(10_000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * f[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class NerfEmbedder(nn.Module):
    def __init__(self, in_channels, hidden, max_freqs):
        super().__init__()
        self.max_freqs = max_freqs
        self.embedder = nn.Sequential(nn.Linear(in_channels + max_freqs ** 2, hidden))

    def forward(self, inputs):
        B, P2, C = inputs.shape
        p = int(P2 ** 0.5)
        pos = torch.linspace(0, 1, p) if p > 1 else torch.zeros(1)
        py, px = torch.meshgrid(pos, pos, indexing="ij")
        px = px.reshape(-1, 1, 1)
        py = py.reshape(-1, 1, 1)
        f = torch.linspace(0, self.max_freqs - 1, self.max_freqs)
        fx, fy = f[None, :, None], f[None, None, :]
        coeffs = (1 + fx * fy) ** -1
        dct = (torch.cos(px * fx * torch.pi) * torch.cos(py * fy * torch.pi)
               * coeffs).view(1, -1, self.max_freqs ** 2).repeat(B, 1, 1)
        return self.embedder(torch.cat([inputs.float(), dct], dim=-1))


class ResBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.in_ln = nn.LayerNorm(ch, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(ch, ch), nn.SiLU(), nn.Linear(ch, ch))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(ch, 3 * ch))

    def forward(self, x, y):
        sh, sc, g = self.adaLN_modulation(y).chunk(3, dim=-1)
        return x + g * self.mlp(self.in_ln(x) * (1 + sc) + sh)


class SimpleMLPAdaLN(nn.Module):
    def __init__(self, in_ch, model_ch, z_ch, n_res, patch, max_freqs):
        super().__init__()
        self.patch = patch
        self.cond_embed = nn.Linear(z_ch, patch ** 2 * model_ch)
        self.input_embedder = NerfEmbedder(in_ch, model_ch, max_freqs)
        self.res_blocks = nn.ModuleList([ResBlock(model_ch) for _ in range(n_res)])
        fl = nn.Module()
        fl.norm_final = nn.LayerNorm(model_ch, elementwise_affine=False, eps=1e-6)
        fl.linear = nn.Linear(model_ch, in_ch)
        self.final_layer = fl

    def forward(self, x, c):
        x = self.input_embedder(x)
        y = self.cond_embed(c).reshape(c.shape[0], self.patch ** 2, -1)
        for blk in self.res_blocks:
            x = blk(x, y)
        return self.final_layer.linear(self.final_layer.norm_final(x))


class TorchZImage(nn.Module):
    """Mirror of ZImageDCT (zeta_chroma_transformer.py:452-651) with the
    head selectable: 'dct' (zeta, [txt, img] order, x0 residual), 'final'
    (zimage, [img, txt]), 'l2p' (pixel U-Net)."""

    def __init__(self, cfg: ZImageConfig):
        super().__init__()
        self.cfg = cfg
        d, eps, ad = cfg.dim, cfg.norm_eps, cfg.adaln_dim
        self.x_embedder = nn.Linear(cfg.in_feats, d, bias=True)
        self.t_embedder = TimestepEmbedder(ad)
        self.cap_embedder = nn.Sequential(
            RMS(cfg.cap_feat_dim, eps), nn.Linear(cfg.cap_feat_dim, d, bias=True))
        self.x_pad_token = nn.Parameter(torch.randn(1, d) * 0.02)
        self.cap_pad_token = nn.Parameter(torch.randn(1, d) * 0.02)
        self.noise_refiner = nn.ModuleList(
            [Block(d, cfg.n_heads, eps, ad) for _ in range(cfg.n_refiner_layers)])
        self.context_refiner = nn.ModuleList(
            [Block(d, cfg.n_heads, eps, ad, modulation=False)
             for _ in range(cfg.n_refiner_layers)])
        self.layers = nn.ModuleList(
            [Block(d, cfg.n_heads, eps, ad) for _ in range(cfg.n_layers)])
        if cfg.head == "dct":
            self.dec_net = SimpleMLPAdaLN(
                cfg.dct_in_channels, cfg.decoder_hidden_size, d,
                cfg.decoder_num_res_blocks, cfg.dct_patch, cfg.decoder_max_freqs)
        elif cfg.head == "l2p":
            self.local_decoder = TorchMicroUNet(cfg.l2p_in_channels, d)
        else:
            fl = nn.Module()
            fl.linear = nn.Linear(d, cfg.out_feats)
            fl.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(ad, d))
            self.final_layer = fl
            self.final_norm = nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)

    def freqs_cis(self, ids):
        # RopeEmbedder (:274-318)
        cfg = self.cfg
        out = []
        for i, dim in enumerate(cfg.axes_dims):
            f = 1.0 / (cfg.rope_theta ** (
                torch.arange(0, dim, 2, dtype=torch.float64) / dim))
            ang = torch.outer(ids[..., i].reshape(-1).double(), f).float()
            out.append(torch.polar(torch.ones_like(ang), ang).reshape(
                *ids.shape[:-1], -1))
        return torch.cat(out, dim=-1)

    def forward(self, img, txt, t_sigma, text_lens, pixels=None):
        cfg = self.cfg
        b, n_img = img.shape[:2]
        t_max = txt.shape[1]

        adaln = self.t_embedder((1.0 - t_sigma) * cfg.t_scale)

        # position ids (zeta_chroma_transformer.py:681-717)
        img_ids = torch.zeros(b, n_img, 3)
        hp = wp = int(n_img ** 0.5)
        yy, xx = torch.meshgrid(torch.arange(hp).float(),
                                torch.arange(wp).float(), indexing="ij")
        img_ids[..., 0] = text_lens.float().view(b, 1)
        img_ids[..., 1] = yy.reshape(-1)[None]
        img_ids[..., 2] = xx.reshape(-1)[None]
        txt_ids = torch.zeros(b, t_max, 3)
        seq = torch.arange(1, t_max + 1).float()[None].expand(b, -1)
        txt_ids[..., 0] = torch.minimum(seq, text_lens.float().view(b, 1))

        img_pe = self.freqs_cis(img_ids)
        txt_pe = self.freqs_cis(txt_ids)

        valid_txt = torch.arange(t_max).view(1, -1) < text_lens.view(b, 1)
        img_mask_b = torch.ones(b, n_img, dtype=torch.bool)
        am = lambda m: torch.where(m[:, None, None, :],
                                   torch.zeros(1), torch.full((1,), float("-inf")))

        img_h = self.x_embedder(img)
        txt_h = self.cap_embedder(txt)
        txt_h = torch.where(valid_txt[:, :, None], txt_h,
                            self.cap_pad_token[None].to(txt_h.dtype))

        for layer in self.noise_refiner:
            img_h = layer(img_h, am(img_mask_b), img_pe, adaln)
        for layer in self.context_refiner:
            txt_h = layer(txt_h, am(valid_txt), txt_pe)

        if cfg.text_first:
            mixed = torch.cat([txt_h, img_h], dim=1)
            pe = torch.cat([txt_pe, img_pe], dim=1)
            mask = torch.cat([valid_txt, img_mask_b], dim=1)
        else:
            mixed = torch.cat([img_h, txt_h], dim=1)
            pe = torch.cat([img_pe, txt_pe], dim=1)
            mask = torch.cat([img_mask_b, valid_txt], dim=1)
        for layer in self.layers:
            mixed = layer(mixed, am(mask), pe, adaln)

        img_out = mixed[:, t_max:] if cfg.text_first else mixed[:, :n_img]

        if cfg.head == "dct":
            pix = img.reshape(b * n_img, cfg.dct_patch ** 2, cfg.dct_in_channels)
            cond = img_out.reshape(b * n_img, cfg.dim)
            out = -self.dec_net(pix, cond).reshape(b, n_img, -1)
            if cfg.use_x0:
                out = (img - out) / t_sigma.view(-1, 1, 1)
            return out
        if cfg.head == "l2p":
            feat = img_out.reshape(b, hp, wp, cfg.dim).permute(0, 3, 1, 2)
            return self.local_decoder(pixels, feat)
        scale = self.final_layer.adaLN_modulation(adaln)
        h = self.final_norm(img_out) * (1 + scale.unsqueeze(1))
        return self.final_layer.linear(h)


class TorchMicroUNet(nn.Module):
    """MicroDiffusionModel mirror (z_image_l2p_model.py:60-138), NCHW."""

    def __init__(self, in_ch, cond_ch):
        super().__init__()
        seq = lambda i, o: nn.Sequential(nn.Conv2d(i, o, 3, padding=1), nn.SiLU())
        self.enc1, self.enc2 = seq(in_ch, 64), seq(64, 128)
        self.enc3, self.enc4 = seq(128, 256), seq(256, 512)
        self.pool = nn.MaxPool2d(2, stride=2)
        self.bottleneck = nn.Sequential(
            nn.Conv2d(512 + cond_ch, 512, 1), nn.SiLU())
        up = lambda c: nn.Sequential(
            nn.Upsample(scale_factor=2, mode="nearest"),
            nn.Conv2d(c, c, 3, padding=1))
        self.up4, self.up3, self.up2, self.up1 = up(512), up(256), up(128), up(64)
        self.dec4, self.dec3 = seq(1024, 256), seq(512, 128)
        self.dec2, self.dec1 = seq(256, 64), seq(128, 64)
        self.out_conv = nn.Conv2d(64, in_ch, 1)

    def forward(self, x, c):
        e1 = self.enc1(x)
        e2 = self.enc2(self.pool(e1))
        e3 = self.enc3(self.pool(e2))
        e4 = self.enc4(self.pool(e3))
        p4 = self.pool(e4)
        if c.shape[-2:] != p4.shape[-2:]:
            c = F.interpolate(c, size=p4.shape[-2:], mode="nearest")
        b = self.bottleneck(torch.cat([p4, c], dim=1))
        d4 = self.dec4(torch.cat([self.up4(b), e4], dim=1))
        d3 = self.dec3(torch.cat([self.up3(d4), e3], dim=1))
        d2 = self.dec2(torch.cat([self.up2(d3), e2], dim=1))
        d1 = self.dec1(torch.cat([self.up1(d2), e1], dim=1))
        return self.out_conv(d1)


def _run_flax(cfg, tree, img, txt, t, lens, pixels=None, hp=None, wp=None):
    b = img.shape[0]
    t_max = txt.shape[1]
    ia, ta = zimage_pos_angles(cfg, hp or int(img.shape[1] ** 0.5),
                               wp or int(img.shape[1] ** 0.5),
                               jnp.asarray(lens), t_max)
    tm = np.arange(t_max)[None] < np.asarray(lens)[:, None]
    return np.asarray(ZImageDiT(cfg).apply(
        {"params": tree}, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(t),
        ia, ta, None, jnp.asarray(tm),
        None if pixels is None else jnp.asarray(pixels), hp, wp,
    ))


def _import(ref, cfg, head):
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # exercise the canonicalizer exactly as real checkpoints do
    flat = zimage_canonical(flat)
    tree, unmatched = torch_to_tree(
        flat, zimage_rules(cfg.scan_blocks, cfg.n_refiner_layers, head,
                           cfg.decoder_num_res_blocks))
    # final_norm is the torch mirror's paramless LN wrapper: nothing to map
    assert not unmatched, unmatched[:8]
    return tree


@pytest.mark.parametrize("scan", [True, False])
def test_zeta_chroma_dct_golden(scan):
    torch.manual_seed(0)
    cfg = ZImageConfig.tiny(head="dct", text_first=True, use_x0=True,
                            scan_blocks=scan)
    ref = TorchZImage(cfg).eval()
    tree = _import(ref, cfg, "dct")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 4, cfg.in_feats)).astype(np.float32)
    txt = rng.normal(size=(2, 5, cfg.cap_feat_dim)).astype(np.float32)
    t = np.asarray([0.7, 0.25], np.float32)
    lens = [3, 5]
    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(txt),
                   torch.from_numpy(t), torch.tensor(lens)).numpy()
    got = _run_flax(cfg, tree, img, txt, t, lens)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_zimage_final_golden_fused_qkv():
    """zimage single-file layout: fused qkv + q_norm/out + all_x_embedder
    prefixes through zimage_canonical (toolkit/models/v2/z_image.py:37-58)."""
    torch.manual_seed(1)
    cfg = ZImageConfig.tiny(head="final", scan_blocks=True)
    ref = TorchZImage(cfg).eval()

    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # rewrite into the single-file layout to exercise every canonical rule
    single = {}
    for k, v in flat.items():
        if k.endswith(".attention.to_q.weight"):
            p = k[: -len(".to_q.weight")]
            single[p + ".qkv.weight"] = np.concatenate(
                [flat[p + ".to_q.weight"], flat[p + ".to_k.weight"],
                 flat[p + ".to_v.weight"]], axis=0)
            continue
        if k.endswith(".attention.to_k.weight") or k.endswith(".attention.to_v.weight"):
            continue
        k2 = k.replace(".attention.to_out.0.weight", ".attention.out.weight")
        k2 = k2.replace(".attention.norm_q.weight", ".attention.q_norm.weight")
        k2 = k2.replace(".attention.norm_k.weight", ".attention.k_norm.weight")
        if k2.startswith("x_embedder."):
            k2 = "all_x_embedder.2-1." + k2[len("x_embedder."):]
        elif k2.startswith("final_layer."):
            k2 = "all_final_layer.2-1." + k2[len("final_layer."):]
        single[k2] = v
    single["__x0__"] = np.zeros((0,), np.float32)

    tree, unmatched = torch_to_tree(
        zimage_canonical(single), zimage_rules(True, cfg.n_refiner_layers, "final"))
    unmatched = [u for u in unmatched if not u.startswith("final_norm")]
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 9, cfg.in_feats)).astype(np.float32)
    txt = rng.normal(size=(2, 4, cfg.cap_feat_dim)).astype(np.float32)
    t = np.asarray([0.9, 0.1], np.float32)
    lens = [2, 4]
    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(txt),
                   torch.from_numpy(t), torch.tensor(lens)).numpy()
    got = _run_flax(cfg, tree, img, txt, t, lens, hp=3, wp=3)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_zimage_l2p_golden():
    torch.manual_seed(2)
    p = 4
    cfg = ZImageConfig.tiny(head="l2p", in_feats=3 * p * p, l2p_patch=p,
                            scan_blocks=True)
    ref = TorchZImage(cfg).eval()
    tree = _import(ref, cfg, "l2p")

    rng = np.random.default_rng(2)
    h = w = 4 * p  # 4 pool levels
    pixels = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    # tokens are the patchified pixels, like the wrapper builds them
    from ai_toolkit_tpu.models.zimage_dit import patchify

    img = np.asarray(patchify(jnp.asarray(pixels), p))
    txt = rng.normal(size=(1, 3, cfg.cap_feat_dim)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    lens = [3]
    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(txt),
                   torch.from_numpy(t), torch.tensor(lens),
                   pixels=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                   ).numpy().transpose(0, 2, 3, 1)
    got = _run_flax(cfg, tree, img, txt, t, lens, pixels=pixels,
                    hp=h // p, wp=w // p)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_zimage_wrappers_smoke():
    """Tiny end-to-end wrapper contract for the three archs: encode/predict
    shapes, lora targeting, loud refusal on a missing checkpoint."""
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, lora_paths
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    for arch, px in (("zimage", 32), ("zimage_l2p", 64), ("zeta_chroma", 32)):
        cls = get_model_class(arch)
        m = cls(ModelConfig(arch=arch, name_or_path="", model_kwargs={"size": "tiny"}))
        v = m.init_variables(jax.random.key(0))
        lat = m.encode_images(v, jnp.zeros((1, px, px, 3)))
        assert lat.shape == (1, *m.latent_shape(px, px)), arch
        cond = m.encode_prompt(v, ["a dog"])
        pred = m.predict(v, lat, jnp.asarray([0.4]), cond)
        assert pred.shape == lat.shape, arch
        dec = m.decode_latents(v, lat)
        assert dec.shape[-1] == 3, arch

        spec = LoRASpec(rank=2, alpha=2.0, target_patterns=m.lora_targets())
        lora = build_lora(v["dit"], spec, jax.random.key(1))
        assert lora_paths(lora), f"{arch} lora targeting matched nothing"

        bad = cls(ModelConfig(arch=arch, name_or_path="/nonexistent/zi",
                              model_kwargs={"size": "tiny"}))
        with pytest.raises(FileNotFoundError):
            bad.load_variables(jax.random.key(0))


def test_zeta_import_x0_autodetect(tmp_path):
    """load_zeta_checkpoint flips use_x0 off when __x0__ is absent and
    round-trips the real file path."""
    import safetensors.numpy as st

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    import dataclasses

    torch.manual_seed(3)
    cls = get_model_class("zeta_chroma")
    m = cls(ModelConfig(arch="zeta_chroma", name_or_path="",
                        model_kwargs={"size": "tiny"}))
    cfg = dataclasses.replace(m.dit_config, use_x0=False)
    ref = TorchZImage(cfg).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    f = tmp_path / "zeta.safetensors"
    st.save_file(flat, str(f))

    m = cls(ModelConfig(arch="zeta_chroma", name_or_path=str(f),
                        model_kwargs={"size": "tiny"}))
    assert m.dit_config.use_x0 is True  # default until the file says otherwise
    v = m.load_variables(jax.random.key(0))
    assert m.dit_config.use_x0 is False
    # imported weights actually landed (x_embedder kernel matches transpose)
    np.testing.assert_allclose(
        np.asarray(v["dit"]["x_embedder"]["kernel"]),
        flat["x_embedder.weight"].T, atol=1e-6)
