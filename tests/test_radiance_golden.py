"""chroma_radiance golden numerics vs a hand-written torch mirror of the
vendored reference model (``extensions_built_in/diffusion_models/chroma/src/
radiance.py`` + ``src/layers.py``): pixel-space chroma trunk (Approximator
modulation over sinusoidal mod-index embeddings, masked joint attention with
one attendable padding token) + the NeRF decoder head (unfold patchify, DCT
positional embedder, per-token hyper-GLU MLPs with column-normalized generated
weights, RMSNorm + 3x3 conv reassembly).

The mirror carries the reference state-dict keys (``img_in_patch``,
``distilled_guidance_layer``, ``nerf_blocks.N`` …) and is imported through
the real ``radiance_rules`` path.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import Tensor, nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

from ai_toolkit_tpu.config.modules import ModelConfig  # noqa: E402
from ai_toolkit_tpu.io.flux_import import (  # noqa: E402
    chroma_approximator_rules,
    flux_dit_rules,
    radiance_rules,
)
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.flux_dit import pack_pixels_cmajor  # noqa: E402
from ai_toolkit_tpu.models.registry import get_model_class  # noqa: E402
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope  # noqa: E402

# tiny dims — must match ChromaRadianceModel's size="tiny" config
H, NH, HD, DD, DS = 64, 4, 16, 2, 2
CTX = 64
AXES = (4, 6, 6)
THETA = 10_000.0
PP, NERF_H, NERF_D, NERF_F = 4, 8, 2, 4
APPR_IN, APPR_H, APPR_D = 64, 64, 2
MODLEN = 3 * DS + 2 * 6 * DD + 2


def t_timestep_embedding(t: Tensor, dim: int) -> Tensor:
    t = t.float() * 1000.0
    half = dim // 2
    freqs = torch.exp(-math.log(10_000.0) * torch.arange(half).float() / half)
    args = t[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_rope(pos: Tensor, dim: int) -> Tensor:
    scale = torch.arange(0, dim, 2).float() / dim
    omega = 1.0 / (THETA ** scale)
    out = torch.einsum("...n,d->...nd", pos.float(), omega)
    out = torch.stack([out.cos(), -out.sin(), out.sin(), out.cos()], dim=-1)
    return out.reshape(*out.shape[:-1], 2, 2)


def t_apply_rope(x: Tensor, freqs: Tensor) -> Tensor:
    xf = x.float().reshape(*x.shape[:-1], -1, 1, 2)
    out = freqs[..., 0] * xf[..., 0] + freqs[..., 1] * xf[..., 1]
    return out.reshape(x.shape)


class TRMS(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(d))

    def forward(self, x):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-6)) * self.scale


class TQKNorm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.query_norm = TRMS(d)
        self.key_norm = TRMS(d)


class TMLPEmbedder(nn.Module):
    def __init__(self, din, h):
        super().__init__()
        self.in_layer = nn.Linear(din, h)
        self.out_layer = nn.Linear(h, h)

    def forward(self, x):
        return self.out_layer(F.silu(self.in_layer(x)))


class TApproximator(nn.Module):
    """layers.py:390-417."""

    def __init__(self, in_dim, out_dim, hidden, n_layers):
        super().__init__()
        self.in_proj = nn.Linear(in_dim, hidden)
        self.layers = nn.ModuleList([TMLPEmbedder(hidden, hidden) for _ in range(n_layers)])
        self.norms = nn.ModuleList([TRMS(hidden) for _ in range(n_layers)])
        self.out_proj = nn.Linear(hidden, out_dim)

    def forward(self, x):
        x = self.in_proj(x)
        for layer, norm in zip(self.layers, self.norms):
            x = x + layer(norm(x))
        return self.out_proj(x)


def t_attention(q, k, v, pe, mask):
    # masked sdpa with the CUDA fused-kernel convention the reference actually
    # runs (fully-masked query rows -> 0, not the math backend's NaN): padded
    # txt queries beyond the +1 attendable token have all-False mask rows
    q = t_apply_rope(q, pe)
    k = t_apply_rope(k, pe)
    w = (q @ k.transpose(-1, -2)) / math.sqrt(q.shape[-1])
    w = w.masked_fill(~mask, float("-inf"))
    p = torch.nan_to_num(torch.softmax(w, dim=-1), 0.0)
    x = p @ v
    b, h, s, d = x.shape
    return x.transpose(1, 2).reshape(b, s, h * d)


class TDoubleC(nn.Module):
    """Chroma DoubleStreamBlock (layers.py:471-608): modulation from
    distilled vectors, masked joint attention."""

    def __init__(self):
        super().__init__()
        mlp = 4 * H
        for p in ("img", "txt"):
            attn = nn.Module()
            attn.qkv = nn.Linear(H, 3 * H)
            attn.norm = TQKNorm(HD)
            attn.proj = nn.Linear(H, H)
            setattr(self, f"{p}_attn", attn)
            setattr(self, f"{p}_mlp", nn.Sequential(
                nn.Linear(H, mlp), nn.GELU(approximate="tanh"), nn.Linear(mlp, H)))

    def forward(self, img, txt, pe, mods, mask):
        (i1s, i1c, i1g), (i2s, i2c, i2g), (t1s, t1c, t1g), (t2s, t2c, t2g) = mods

        def qkv_heads(x, attn):
            b, s, _ = x.shape
            q, k, v = attn.qkv(x).reshape(b, s, 3, NH, HD).permute(2, 0, 3, 1, 4)
            return attn.norm.query_norm(q).to(v.dtype), attn.norm.key_norm(k).to(v.dtype), v

        img_n = F.layer_norm(img, (H,)) * (1 + i1c) + i1s
        txt_n = F.layer_norm(txt, (H,)) * (1 + t1c) + t1s
        iq, ik, iv = qkv_heads(img_n, self.img_attn)
        tq, tk, tv = qkv_heads(txt_n, self.txt_attn)
        q = torch.cat([tq, iq], dim=2)
        k = torch.cat([tk, ik], dim=2)
        v = torch.cat([tv, iv], dim=2)
        attn = t_attention(q, k, v, pe, mask)
        t_a, i_a = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]
        img = img + i1g * self.img_attn.proj(i_a)
        img = img + i2g * self.img_mlp(F.layer_norm(img, (H,)) * (1 + i2c) + i2s)
        txt = txt + t1g * self.txt_attn.proj(t_a)
        txt = txt + t2g * self.txt_mlp(F.layer_norm(txt, (H,)) * (1 + t2c) + t2s)
        return img, txt


class TSingleC(nn.Module):
    def __init__(self):
        super().__init__()
        mlp = 4 * H
        self.linear1 = nn.Linear(H, 3 * H + mlp)
        self.linear2 = nn.Linear(H + mlp, H)
        self.norm = TQKNorm(HD)

    def forward(self, x, pe, mod, mask):
        shift, scale, gate = mod
        xn = F.layer_norm(x, (H,)) * (1 + scale) + shift
        qkv, mlp = torch.split(self.linear1(xn), [3 * H, 4 * H], dim=-1)
        b, s, _ = xn.shape
        q, k, v = qkv.reshape(b, s, 3, NH, HD).permute(2, 0, 3, 1, 4)
        q = self.norm.query_norm(q).to(v.dtype)
        k = self.norm.key_norm(k).to(v.dtype)
        attn = t_attention(q, k, v, pe, mask)
        out = self.linear2(torch.cat([attn, F.gelu(mlp, approximate="tanh")], dim=-1))
        return x + gate * out


class TNerfEmbedder(nn.Module):
    """layers.py:178-296 — f32 DCT positional features + projection."""

    def __init__(self, in_ch, hidden, max_freqs):
        super().__init__()
        self.max_freqs = max_freqs
        self.embedder = nn.Sequential(nn.Linear(in_ch + max_freqs ** 2, hidden))

    def fetch_pos(self, patch):
        pos = torch.linspace(0, 1, patch)
        py, px = torch.meshgrid(pos, pos, indexing="ij")
        px = px.reshape(-1, 1, 1)
        py = py.reshape(-1, 1, 1)
        f = torch.linspace(0, self.max_freqs - 1, self.max_freqs)
        fx, fy = f[None, :, None], f[None, None, :]
        coeffs = (1 + fx * fy) ** -1
        dct = torch.cos(px * fx * torch.pi) * torch.cos(py * fy * torch.pi) * coeffs
        return dct.reshape(1, -1, self.max_freqs ** 2)

    def forward(self, x):
        b, p2, c = x.shape
        dct = self.fetch_pos(int(p2 ** 0.5)).repeat(b, 1, 1)
        return self.embedder(torch.cat([x.float(), dct], dim=-1))


class TNerfGLU(nn.Module):
    """layers.py:300-341."""

    def __init__(self, hs, hx, mlp_ratio):
        super().__init__()
        self.param_generator = nn.Linear(hs, 3 * hx * hx * mlp_ratio)
        self.norm = TRMS(hx)
        self.mlp_ratio = mlp_ratio

    def forward(self, x, s):
        b, _, hx = x.shape
        g, v, o = self.param_generator(s).chunk(3, dim=-1)
        fc1_gate = F.normalize(g.view(b, hx, hx * self.mlp_ratio), dim=-2)
        fc1_value = F.normalize(v.view(b, hx, hx * self.mlp_ratio), dim=-2)
        fc2 = F.normalize(o.view(b, hx * self.mlp_ratio, hx), dim=-2)
        xn = self.norm(x).to(x.dtype)
        h = torch.bmm(F.silu(torch.bmm(xn, fc1_gate)) * torch.bmm(xn, fc1_value), fc2)
        return x + h


class TRadiance(nn.Module):
    """radiance.py:103-380 at tiny dims."""

    def __init__(self):
        super().__init__()
        self.img_in_patch = nn.Conv2d(3, H, kernel_size=PP, stride=PP)
        self.txt_in = nn.Linear(CTX, H)
        self.distilled_guidance_layer = TApproximator(APPR_IN, H, APPR_H, APPR_D)
        self.double_blocks = nn.ModuleList([TDoubleC() for _ in range(DD)])
        self.single_blocks = nn.ModuleList([TSingleC() for _ in range(DS)])
        self.nerf_image_embedder = TNerfEmbedder(3, NERF_H, NERF_F)
        self.nerf_blocks = nn.ModuleList([TNerfGLU(H, NERF_H, 4) for _ in range(NERF_D)])
        self.nerf_final_layer_conv = nn.Module()
        self.nerf_final_layer_conv.norm = TRMS(NERF_H)
        self.nerf_final_layer_conv.conv = nn.Conv2d(NERF_H, 3, 3, padding=1)

    def forward(self, img, txt, txt_mask, t, g, ids):
        B, C, Hp, Wp = img.shape
        nerf_pixels = F.unfold(img, kernel_size=PP, stride=PP).transpose(1, 2)
        img_t = self.img_in_patch(img)
        num_patches = img_t.shape[2] * img_t.shape[3]
        img_t = img_t.flatten(2).transpose(1, 2)
        txt = self.txt_in(txt)

        dt = t_timestep_embedding(t, APPR_IN // 4)
        dg = t_timestep_embedding(g, APPR_IN // 4)
        mod_idx = t_timestep_embedding(torch.arange(MODLEN).float(), APPR_IN // 2)
        mod_idx = mod_idx[None].repeat(B, 1, 1)
        tg = torch.cat([dt, dg], dim=1)[:, None].repeat(1, MODLEN, 1)
        mods = self.distilled_guidance_layer(torch.cat([tg, mod_idx], dim=-1))

        # distribute_modulations order (layers.py:90-166):
        # singles (3 each) | img doubles (6) | txt doubles (6) | final (2)
        def vecs(start, n):
            return [mods[:, start + j: start + j + 1] for j in range(n)]

        sing = [vecs(3 * i, 3) for i in range(DS)]
        base = 3 * DS
        imgm = [vecs(base + 6 * i, 6) for i in range(DD)]
        base += 6 * DD
        txtm = [vecs(base + 6 * i, 6) for i in range(DD)]

        pe = torch.cat([t_rope(ids[..., i], AXES[i]) for i in range(3)], dim=-3)[:, None]

        # mask (radiance.py:288-311): +1 attendable padding token then the
        # batched outer product
        m = txt_mask.clone().float()
        for i in range(B):
            ln = int(txt_mask[i].sum())
            if ln < m.shape[1]:
                m[i, ln] = 1
        m = torch.cat([m, torch.ones(B, num_patches)], dim=1)
        full = (m.T @ m)[None, None].repeat(B, NH, 1, 1).int().bool()

        for i, blk in enumerate(self.double_blocks):
            im6, tm6 = imgm[i], txtm[i]
            mods_i = ((im6[0], im6[1], im6[2]), (im6[3], im6[4], im6[5]),
                      (tm6[0], tm6[1], tm6[2]), (tm6[3], tm6[4], tm6[5]))
            img_t, txt = blk(img_t, txt, pe, mods_i, full)
        x = torch.cat([txt, img_t], dim=1)
        for i, blk in enumerate(self.single_blocks):
            x = blk(x, pe, tuple(sing[i]), full)
        x = x[:, txt.shape[1]:]

        nerf_hidden = x.reshape(B * num_patches, H)
        npx = nerf_pixels.reshape(B * num_patches, C, PP * PP).transpose(1, 2)
        img_dct = self.nerf_image_embedder(npx)
        for blk in self.nerf_blocks:
            img_dct = blk(img_dct, nerf_hidden)
        img_dct = self.nerf_final_layer_conv.norm(img_dct).float()
        img_dct = img_dct.transpose(1, 2).reshape(B, num_patches, -1).transpose(1, 2)
        img_dct = F.fold(img_dct, output_size=(Hp, Wp), kernel_size=PP, stride=PP)
        return self.nerf_final_layer_conv.conv(img_dct)


def _state_dict_with_chroma_keys(tm: TRadiance) -> dict:
    """The mirror's module names follow the reference layout 1:1."""
    return {k: v.numpy() for k, v in tm.state_dict().items()}


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
def test_radiance_matches_torch_mirror(scan):
    torch.manual_seed(0)
    tm = TRadiance().eval()
    # the reference zero-inits img_in_patch and the final conv — randomize so
    # the golden actually exercises those paths
    with torch.no_grad():
        nn.init.normal_(tm.img_in_patch.weight, std=0.2)
        nn.init.normal_(tm.img_in_patch.bias, std=0.2)
        nn.init.normal_(tm.nerf_final_layer_conv.conv.weight, std=0.2)
        nn.init.normal_(tm.nerf_final_layer_conv.conv.bias, std=0.2)
    flat = _state_dict_with_chroma_keys(tm)

    rules = radiance_rules(3, PP) + chroma_approximator_rules() + flux_dit_rules(scan)
    tree, unmatched = torch_to_tree(flat, rules)
    assert not unmatched, unmatched[:8]

    rng = np.random.default_rng(0)
    B, Hp, Wp, n_txt = 2, 16, 16, 8
    gh, gw = Hp // PP, Wp // PP
    img = rng.normal(size=(B, Hp, Wp, 3)).astype(np.float32)
    txt = rng.normal(size=(B, n_txt, CTX)).astype(np.float32)
    t = np.asarray([0.25, 0.8], np.float32)
    g = np.zeros((B,), np.float32)
    # same mask for every sample: the reference's batched outer-product mask
    # (radiance.py:305) unions masks across the batch, so a per-sample golden
    # needs identical lengths
    mask = np.zeros((B, n_txt), bool)
    mask[:, :6] = True

    ids = np.asarray(image_position_ids(gh, gw, text_len=n_txt))
    ids_b = np.broadcast_to(ids[None], (B,) + ids.shape).copy()

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(txt),
            torch.from_numpy(mask), torch.from_numpy(t), torch.from_numpy(g),
            torch.from_numpy(ids_b),
        )

    model = get_model_class("chroma_radiance")(
        ModelConfig(arch="chroma_radiance", model_kwargs={"size": "tiny"}))
    import dataclasses

    model.dit_config = dataclasses.replace(model.dit_config, scan_blocks=scan)
    from ai_toolkit_tpu.models.flux_dit import FluxDiT

    model.dit = FluxDiT(model.dit_config)
    assert model.dit_config.depth_double == DD and model.dit_config.pixel_patch == PP

    tokens = pack_pixels_cmajor(jnp.asarray(img), PP)
    pe = multi_axis_rope(jnp.asarray(ids)[None], list(AXES), THETA)
    # our mask already includes the +1 attendable padding token
    our_mask = np.zeros((B, n_txt), bool)
    our_mask[:, :7] = True
    out = model.dit.apply(
        {"params": tree}, tokens, jnp.asarray(txt), jnp.asarray(t),
        jnp.zeros((B, model.dit_config.vec_dim)), pe, jnp.asarray(g),
        jnp.asarray(our_mask), grid_hw=(gh, gw),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_radiance_checkpoint_roundtrip(tmp_path):
    """Single-file checkpoint -> load_variables -> predict; and the model
    refuses a path with no importable checkpoint."""
    from safetensors.numpy import save_file

    torch.manual_seed(1)
    tm = TRadiance()
    flat = {k: v.numpy() for k, v in tm.state_dict().items()}
    f = tmp_path / "chroma-radiance.safetensors"
    save_file(flat, str(f))

    model = get_model_class("chroma_radiance")(
        ModelConfig(arch="chroma_radiance", name_or_path=str(f),
                    model_kwargs={"size": "tiny"}))
    variables = model.load_variables(jax.random.key(0))
    cond = model.encode_prompt(variables, ["a cat"])
    h, w, c = model.latent_shape(32, 32)
    assert (h, w, c) == (32, 32, 3)
    cond["pe"] = model.rope_table(h, w, int(cond["txt"].shape[1]))
    noisy = jax.random.normal(jax.random.key(1), (1, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape and np.isfinite(np.asarray(out)).all()
    # pixels pass through encode/decode untouched (FakeVAE)
    assert np.allclose(np.asarray(model.encode_images(variables, noisy)), np.asarray(noisy))

    # full-model export inverts the import: dit key set matches the reference
    # state dict exactly, and values round-trip
    from safetensors import safe_open

    from ai_toolkit_tpu.io.full_export import export_full_model

    out_dir = tmp_path / "export"
    written = export_full_model(model, variables, str(out_dir), dtype=np.float32)
    dit_file = [p for p in written if "transformer" in p]
    assert dit_file, written
    with safe_open(dit_file[0], "np") as sf:
        exported = {k: sf.get_tensor(k) for k in sf.keys()}
    assert set(exported) == set(flat)
    for k in ("img_in_patch.weight", "nerf_blocks.0.param_generator.weight",
              "double_blocks.0.img_attn.qkv.weight", "nerf_final_layer_conv.conv.weight"):
        np.testing.assert_allclose(exported[k], flat[k], atol=1e-6)

    with pytest.raises(ValueError, match="chroma_radiance"):
        bad = get_model_class("chroma_radiance")(
            ModelConfig(arch="chroma_radiance", name_or_path=str(tmp_path / "nope"),
                        model_kwargs={"size": "tiny"}))
        bad.load_variables(jax.random.key(0))
