"""PixArt golden vs a hand-written torch mirror of diffusers'
``PixArtTransformer2DModel`` (the class the reference loads at
``stable_diffusion_model.py:486-536``): adaLN-single with per-block
scale_shift_table, attention biases, the no-pre-norm cross-attention quirk,
GELU-tanh FF, parameter-free 2D sincos pos embed (mirror implements the
diffusers ``get_2d_sincos_pos_embed`` meshgrid flow verbatim to cross-check
our vectorized version), learned-sigma output, alpha-1024 micro-conds.
Fed through the REAL import rules (``io/dit_importers.pixart_rules``)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

NH, HD = 2, 18  # d = 36: divisible by 3 (micro-cond split) and 4 (pos embed)
DIM = NH * HD
CAP, P, C = 24, 2, 4
N_LAYERS = 2
SAMPLE, INTERP = 8, 1
T = 7


def sincos_pos_embed_diffusers(embed_dim, hp, wp, base_size, interpolation_scale):
    """Verbatim diffusers get_2d_sincos_pos_embed flow (incl. the xy
    meshgrid: first half ends up encoding the column coordinate)."""
    grid_h = np.arange(hp, dtype=np.float64) / (hp / base_size) / interpolation_scale
    grid_w = np.arange(wp, dtype=np.float64) / (wp / base_size) / interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # here w goes first
    grid = np.stack(grid, axis=0)

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def test_pos_embed_matches_diffusers_flow():
    from ai_toolkit_tpu.models.pixart_dit import PixArtConfig, pixart_pos_embed

    cfg = PixArtConfig.tiny(head_dim=HD, sample_size=SAMPLE, interpolation_scale=INTERP)
    for hp, wp in ((4, 4), (4, 2), (2, 6)):
        ours = pixart_pos_embed(cfg, hp, wp)
        ref = sincos_pos_embed_diffusers(DIM, hp, wp, cfg.base_size, INTERP)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-5)


class Attn(nn.Module):
    def __init__(self, cross=False):
        super().__init__()
        kd = DIM
        self.to_q = nn.Linear(DIM, DIM, bias=True)
        self.to_k = nn.Linear(kd, DIM, bias=True)
        self.to_v = nn.Linear(kd, DIM, bias=True)
        self.to_out = nn.ModuleList([nn.Linear(DIM, DIM, bias=True)])

    def forward(self, x, ctx=None, mask=None):
        b, s, _ = x.shape
        src = x if ctx is None else ctx
        t = src.shape[1]
        q = self.to_q(x).view(b, s, NH, HD).transpose(1, 2)
        k = self.to_k(src).view(b, t, NH, HD).transpose(1, 2)
        v = self.to_v(src).view(b, t, NH, HD).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, DIM))


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(6, DIM) / DIM**0.5)
        self.attn1 = Attn()
        self.attn2 = Attn(cross=True)
        ff = nn.Module()
        proj = nn.Module()
        proj.proj = nn.Linear(DIM, 4 * DIM)
        ff.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(4 * DIM, DIM)])
        self.ff = ff

    def forward(self, x, txt, t6, mask):
        b = x.shape[0]
        mods = (self.scale_shift_table[None] + t6.reshape(b, 6, -1)).chunk(6, dim=1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
        h = F.layer_norm(x, (DIM,), eps=1e-6) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h)
        # For PixArt norm2 isn't applied here (diffusers BasicTransformerBlock)
        x = x + self.attn2(x, txt, mask)
        h = F.layer_norm(x, (DIM,), eps=1e-6) * (1 + scale_mlp) + shift_mlp
        f = self.ff.net[2](F.gelu(self.ff.net[0].proj(h), approximate="tanh"))
        return x + gate_mlp * f


class PixArtMirror(nn.Module):
    def __init__(self, micro=False):
        super().__init__()
        self.micro = micro
        pe = nn.Module()
        pe.proj = nn.Conv2d(C, DIM, kernel_size=P, stride=P)
        self.pos_embed = pe
        emb = nn.Module()
        te = nn.Module()
        te.linear_1 = nn.Linear(256, DIM)
        te.linear_2 = nn.Linear(DIM, DIM)
        emb.timestep_embedder = te
        if micro:
            for nm in ("resolution_embedder", "aspect_ratio_embedder"):
                m = nn.Module()
                m.linear_1 = nn.Linear(256, DIM // 3)
                m.linear_2 = nn.Linear(DIM // 3, DIM // 3)
                setattr(emb, nm, m)
        ada = nn.Module()
        ada.emb = emb
        ada.linear = nn.Linear(DIM, 6 * DIM)
        self.adaln_single = ada
        cp = nn.Module()
        cp.linear_1 = nn.Linear(CAP, DIM)
        cp.linear_2 = nn.Linear(DIM, DIM)
        self.caption_projection = cp
        self.transformer_blocks = nn.ModuleList([Block() for _ in range(N_LAYERS)])
        self.scale_shift_table = nn.Parameter(torch.randn(2, DIM) / DIM**0.5)
        self.proj_out = nn.Linear(DIM, P * P * 2 * C)

    def sinusoid(self, t, dim=256):
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, lat, t, txt, txt_mask, res=None, ar=None):
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        x = self.pos_embed.proj(lat).flatten(2).transpose(1, 2)
        pos = sincos_pos_embed_diffusers(DIM, hp, wp, SAMPLE // P, INTERP)
        x = x + torch.from_numpy(pos.astype(np.float32))[None]

        te = self.adaln_single.emb.timestep_embedder
        emb_t = te.linear_2(F.silu(te.linear_1(self.sinusoid(t))))
        cond = emb_t
        if self.micro:
            re_, ae = self.adaln_single.emb.resolution_embedder, self.adaln_single.emb.aspect_ratio_embedder
            r = re_.linear_2(F.silu(re_.linear_1(self.sinusoid(res.flatten())))).reshape(b, -1)
            a = ae.linear_2(F.silu(ae.linear_1(self.sinusoid(ar.flatten())))).reshape(b, -1)
            cond = cond + torch.cat([r, a], dim=1)
        t6 = self.adaln_single.linear(F.silu(cond))

        y = self.caption_projection.linear_2(
            F.gelu(self.caption_projection.linear_1(txt), approximate="tanh"))

        mask = ((1 - txt_mask.float()) * -10000.0)[:, None, None, :]
        for blk in self.transformer_blocks:
            x = blk(x, y, t6, mask)

        shift, scale = (self.scale_shift_table[None] + emb_t[:, None]).chunk(2, dim=1)
        x = F.layer_norm(x, (DIM,), eps=1e-6) * (1 + scale) + shift
        x = self.proj_out(x)
        x = x.reshape(b, hp, wp, P, P, 2 * C)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, 2 * C, h, w)


@pytest.mark.golden
@pytest.mark.parametrize("scan,micro", [(False, False), (True, False), (False, True)])
def test_pixart_matches_torch_mirror(scan, micro):
    from ai_toolkit_tpu.io.dit_importers import pixart_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.flux_dit import pack_latents_cmajor, unpack_latents
    from ai_toolkit_tpu.models.pixart_dit import PixArtConfig, PixArtDiT

    torch.manual_seed(0)
    mirror = PixArtMirror(micro=micro).eval().float()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

    cfg = PixArtConfig.tiny(caption_dim=CAP, head_dim=HD, sample_size=SAMPLE,
                            interpolation_scale=INTERP, scan_blocks=scan,
                            micro_cond=micro)
    tree, unmatched = torch_to_tree(sd, pixart_rules(scan, micro))
    assert not unmatched, unmatched[:8]
    dit = PixArtDiT(cfg)

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    txt = rng.normal(size=(2, T, CAP)).astype(np.float32)
    t = np.array([17.0, 743.0], np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.float32)
    res = np.array([[64.0, 64.0], [64.0, 64.0]], np.float32)
    ar = np.array([1.0, 1.0], np.float32)

    out = dit.apply({"params": tree}, pack_latents_cmajor(jnp.asarray(lat)),
                    jnp.asarray(txt), jnp.asarray(t), 4, 4, jnp.asarray(mask),
                    jnp.asarray(res) if micro else None,
                    jnp.asarray(ar) if micro else None)
    ours = np.asarray(unpack_latents(out, 8, 8)).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t), torch.from_numpy(txt),
                     torch.from_numpy(mask),
                     torch.from_numpy(res) if micro else None,
                     torch.from_numpy(ar) if micro else None).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_pixart_rules_are_invertible():
    from ai_toolkit_tpu.io.dit_importers import pixart_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch

    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in PixArtMirror().state_dict().items()}
    tree, unmatched = torch_to_tree(sd, pixart_rules(False))
    assert not unmatched
    flat = tree_to_torch(tree, pixart_rules(False))
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_allclose(flat[k], sd[k], atol=1e-6, err_msg=k)


@pytest.mark.golden
def test_pixart_checkpoint_dir_import(tmp_path):
    """End-to-end loader: HF dir -> load_pixart_checkpoint (config.json dims,
    micro-cond auto-detect from resolution_embedder keys)."""
    import json
    import os

    from safetensors.numpy import save_file

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    torch.manual_seed(0)
    mirror = PixArtMirror(micro=True).eval().float()
    sd = {k: np.ascontiguousarray(v.numpy()) for k, v in mirror.state_dict().items()}
    tdir = tmp_path / "transformer"
    os.makedirs(tdir)
    save_file(sd, str(tdir / "diffusion_pytorch_model.safetensors"))
    json.dump({
        "in_channels": C, "patch_size": P, "num_attention_heads": NH,
        "attention_head_dim": HD, "num_layers": N_LAYERS, "caption_channels": CAP,
        "sample_size": SAMPLE, "interpolation_scale": INTERP,
        "out_channels": 2 * C,
    }, open(tdir / "config.json", "w"))

    model = get_model_class("pixart")(ModelConfig(
        arch="pixart", name_or_path=str(tmp_path), model_kwargs={"size": "tiny"}))
    import jax

    variables = model.load_variables(jax.random.key(0))
    assert model.dit_config.micro_cond and model.dit_config.head_dim == HD
    # spot-check an imported leaf survives the merge (torch [out,in] -> [in,out])
    got = np.asarray(variables["dit"]["adaln_linear"]["kernel"])
    np.testing.assert_allclose(got, sd["adaln_single.linear.weight"].T, atol=1e-6)
    got = np.asarray(variables["dit"]["res_in"]["in_layer"]["kernel"])
    np.testing.assert_allclose(
        got, sd["adaln_single.emb.resolution_embedder.linear_1.weight"].T, atol=1e-6)
