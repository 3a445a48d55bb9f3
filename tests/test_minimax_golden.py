"""MiniMax-H3 transformer golden: flax MiniMaxH3Transformer vs a hand-written
torch mirror of the vendored reference semantics
(extensions_built_in/diffusion_models/minimax_h3/src/transformer.py: packed
[text | cond | audio | video] sequence, fused-QKV attention with per-head
RMSNorm + partial 96-of-128 rotate-half rope from a shared inv_freq buffer,
SwiGLU fc1=[gate|up], per-(timestep, modality) AdaLN table addressed by
inverse*3+tag, token refiner over the text stream, (cos|sin) timestep
embedding of t in [0,1], two fp32 output heads), loaded through the real
import rules (io/dit_importers.minimax_rules). Also covers the packing
geometry (src/packing.py) against a literal transcription."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.dit_importers import minimax_rules  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models import minimax_packing as pk  # noqa: E402
from ai_toolkit_tpu.models.minimax_dit import (  # noqa: E402
    MiniMaxH3Params,
    MiniMaxH3Transformer,
)


class TRms(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


def apply_rot(x, cos, sin):
    rot = cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    c = cos.to(x.dtype).unsqueeze(2)
    s = sin.to(x.dtype).unsqueeze(2)
    x1, x2 = x_rot.chunk(2, dim=-1)
    rotated = torch.cat([-x2, x1], dim=-1)
    return torch.cat([x_rot * c + rotated * s, x_pass], dim=-1)


class TAttn(nn.Module):
    def __init__(self, hidden, heads, hd, eps):
        super().__init__()
        self.heads, self.hd = heads, hd
        inner = heads * hd
        self.qkv_proj = nn.Linear(hidden, inner * 3, bias=False)
        self.q_norm = TRms(hd, eps)
        self.k_norm = TRms(hd, eps)
        self.out_proj = nn.Linear(inner, hidden, bias=False)

    def forward(self, x, rotary=None, mask=None):
        b, s, _ = x.shape
        q, k, v = self.qkv_proj(x).chunk(3, dim=-1)
        q = q.view(b, s, self.heads, self.hd)
        k = k.view(b, s, self.heads, self.hd)
        v = v.view(b, s, self.heads, self.hd)
        q, k = self.q_norm(q), self.k_norm(k)
        if rotary is not None:
            q = apply_rot(q, *rotary)
            k = apply_rot(k, *rotary)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=mask)
        return self.out_proj(o.transpose(1, 2).reshape(b, s, -1))


class TMlp(nn.Module):
    def __init__(self, hidden, ffn):
        super().__init__()
        self.fc1 = nn.Linear(hidden, ffn * 2, bias=False)
        self.fc2 = nn.Linear(ffn, hidden, bias=False)

    def forward(self, x):
        gate, up = self.fc1(x).chunk(2, dim=-1)
        return self.fc2(F.silu(gate) * up)


class TAdaln(nn.Module):
    def __init__(self, t_dim, hidden, expand, modalities, silu=True, bias=True):
        super().__init__()
        self.expand, self.modalities, self.hidden = expand, modalities, hidden
        self.silu = silu
        self.linear = nn.Linear(t_dim, expand * hidden * modalities, bias=bias)

    def forward(self, temb):
        if self.silu:
            temb = F.silu(temb)
        x = F.linear(temb.float(), self.linear.weight.float(),
                     None if self.linear.bias is None else self.linear.bias.float())
        x = x.view(x.shape[0] * self.modalities, self.expand * self.hidden)
        return x.chunk(self.expand, dim=-1)


class TRefBlock(nn.Module):
    def __init__(self, p):
        super().__init__()
        self.norm1 = TRms(p.hidden_size, p.norm_eps)
        self.norm2 = TRms(p.hidden_size, p.norm_eps)
        self.attn = TAttn(p.hidden_size, p.num_attention_heads,
                          p.attention_head_dim, p.qk_norm_eps)
        self.mlp = TMlp(p.hidden_size, p.ffn_hidden_size)

    def forward(self, x, mask=None):
        x = x + self.attn(self.norm1(x), mask=mask)
        return x + self.mlp(self.norm2(x))


class TBlock(nn.Module):
    def __init__(self, p):
        super().__init__()
        self.norm1 = TRms(p.hidden_size, p.norm_eps)
        self.norm2 = TRms(p.hidden_size, p.norm_eps)
        self.attn = TAttn(p.hidden_size, p.num_attention_heads,
                          p.attention_head_dim, p.qk_norm_eps)
        self.mlp = TMlp(p.hidden_size, p.ffn_hidden_size)
        self.adaln_proj = TAdaln(p.time_embed_dim, p.hidden_size, 6, 3,
                                 silu=True, bias=False)

    def forward(self, x, temb, idx, rotary, mask):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = self.adaln_proj(temb)
        dt = x.dtype
        h = self.norm1(x) * (1 + sc_a[idx].to(dt)) + sh_a[idx].to(dt)
        x = x + g_a[idx].to(dt) * self.attn(h, rotary, mask)
        h = self.norm2(x) * (1 + sc_m[idx].to(dt)) + sh_m[idx].to(dt)
        return x + g_m[idx].to(dt) * self.mlp(h)


class TorchMiniMax(nn.Module):
    def __init__(self, p: MiniMaxH3Params):
        super().__init__()
        self.p = p
        self.video_patch_proj = nn.Linear(p.video_patch_dim, p.hidden_size)
        self.audio_patch_proj = nn.Linear(p.audio_latents_dim, p.hidden_size)
        self.condition_proj = nn.Linear(p.text_dim, p.hidden_size)
        te = nn.Module()
        te.proj_in = nn.Linear(p.timestep_input_dim, p.time_embed_hidden_size)
        te.proj_out = nn.Linear(p.time_embed_hidden_size, p.time_embed_dim)
        self.time_embedder = te
        rope = nn.Module()
        dim = 2 * p.rope_inv_freq_len
        rope.inv_freq = nn.Parameter(
            1.0 / (p.rope_theta ** (torch.arange(0, dim, 2).float() / dim)),
            requires_grad=False)
        self.rope = rope
        tr = nn.Module()
        tr.blocks = nn.ModuleList(
            [TRefBlock(p) for _ in range(p.token_refiner_num_layers)])
        tr.final_norm = TRms(p.hidden_size, p.final_norm_eps)
        self.token_refiner = tr
        self.blocks = nn.ModuleList([TBlock(p) for _ in range(p.num_layers)])
        fl = nn.Module()
        fl.norm = TRms(p.hidden_size, p.final_norm_eps)
        fl.adaln_proj = TAdaln(p.time_embed_dim, p.hidden_size, 2, 1,
                               silu=True, bias=True)
        fl.video_out = nn.Linear(p.hidden_size, p.video_patch_dim)
        fl.audio_out = nn.Linear(p.hidden_size, p.audio_latents_dim)
        self.final_layer = fl

    def temb_of(self, t):
        half = self.p.timestep_input_dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.time_embedder.proj_out(F.silu(self.time_embedder.proj_in(emb)))

    def forward(self, vid, aud, txt, unique_t, inverse, tags, pos, vi, ai, ti):
        p = self.p
        freqs = pos.float().unsqueeze(-1) * self.rope.inv_freq.view(1, 1, 1, -1)
        freqs = freqs.flatten(2, 3)
        freqs = torch.cat([freqs, freqs], dim=-1)
        rotary = (freqs.cos(), freqs.sin())

        v_emb = self.video_patch_proj(vid)
        a_emb = self.audio_patch_proj(aud)
        t_emb = self.condition_proj(txt)

        is_pad = tags < 0
        live = ~is_pad
        mask = live[:, None, None, :]
        tmask = live[:, ti][:, None, None, :]

        for blk in self.token_refiner.blocks:
            t_emb = blk(t_emb, tmask)
        t_emb = self.token_refiner.final_norm(t_emb)

        b, s = tags.shape
        x = t_emb.new_zeros((b, s, t_emb.shape[-1]))
        x = x.index_copy(1, ti, t_emb)
        x = x.index_copy(1, vi, v_emb)
        x = x.index_copy(1, ai, a_emb)

        temb = self.temb_of(unique_t)
        idx = inverse * 3 + tags.clamp(min=0)
        for blk in self.blocks:
            x = blk(x, temb, idx, rotary, mask)

        shift, scale = self.final_layer.adaln_proj(temb)
        h = self.final_layer.norm(x) * (1 + scale[inverse]) + shift[inverse]
        return (self.final_layer.video_out(h).index_select(1, vi),
                self.final_layer.audio_out(h).index_select(1, ai))


def test_minimax_packing_matches_reference_transcription():
    """Numpy packing vs a literal torch transcription of packing.py."""
    lay = pk.build_packed_sequence(np.array([1, 1, 0, 1]), 7, 6, 8, 5,
                                   keyframe_anchors=("first", "last"))
    # layout invariants straight from the reference semantics
    rows_per_frame = (6 // 2) * (8 // 2)
    assert lay.num_condition_video_rows == 2 * rows_per_frame
    assert lay.sequence_length == 4 + 2 * rows_per_frame + 10 + 7 * rows_per_frame
    # text rows on the time axis at their index
    np.testing.assert_allclose(lay.position_ids[:4, 0], np.arange(4))
    # first anchor sits at the media clock origin (= num_text)
    cond0 = lay.position_ids[4: 4 + rows_per_frame]
    np.testing.assert_allclose(cond0[:, 0], 4.0)
    # 'last' anchor = num_text + span - 5/3
    span = np.ones(7) * (5.0 / 3.0)
    for i, f in enumerate((1, 4, 4, 4, 4)):
        span[i::5] *= f
    want_last = 4.0 + span.sum() - 5.0 / 3.0
    cond1 = lay.position_ids[4 + rows_per_frame: 4 + 2 * rows_per_frame]
    np.testing.assert_allclose(cond1[:, 0], want_last)
    # audio: one unit per latent, channel-major, width pinned to grid extremes
    a = lay.position_ids[lay.audio_indices]
    np.testing.assert_allclose(a[:5, 0], 4.0 + np.arange(5))
    np.testing.assert_allclose(a[5:, 0], 4.0 + np.arange(5))
    assert (a[:5, 2] == a[0, 2]).all() and (a[5:, 2] == a[5, 2]).all()
    # video temporal grid: cumulative (1,4,4,4,4) * 5/3 pattern
    v = lay.position_ids[lay.video_indices[2 * rows_per_frame:]]
    t0 = v[::rows_per_frame, 0]
    spans = np.asarray([5.0 / 3.0 * f for f in (1, 4, 4, 4, 4, 1, 4)])
    np.testing.assert_allclose(np.diff(t0), spans[:-1])
    # tags
    assert (lay.token_tags[lay.audio_indices] == pk.AUDIO_TAG).all()
    assert (lay.token_tags[lay.video_indices] == pk.VIDEO_TAG).all()
    assert lay.token_tags[2] == 0 and lay.token_tags[0] == 1

    # frame arithmetic
    assert pk.align_num_frames(1) == 5 and pk.align_num_frames(6) == 22
    assert pk.video_latent_num_frames(22) == 7
    assert pk.audio_latent_num_frames(24) == 40

    # sigma coupling: remap is identity when shifts match; endpoints fixed
    s = np.linspace(0, 1, 11)
    np.testing.assert_allclose(pk.remap_sigma(s, 12.0, 12.0), s, atol=1e-12)
    assert pk.remap_sigma(1.0) == 1.0 and pk.remap_sigma(0.0) == 0.0

    # pad_layouts_to_batch: shorter text right-padded with -1 tags
    lay2 = pk.build_packed_sequence(np.array([1, 1]), 7, 6, 8, 5,
                                    keyframe_anchors=("first", "last"))
    pos, tags, vi, ai, ti, pads = pk.pad_layouts_to_batch([lay, lay2])
    assert pads == [0, 2]
    assert (tags[1, 2:4] == pk.PAD_TAG).all()
    np.testing.assert_allclose(pos[0], lay.position_ids)


@pytest.mark.parametrize("scan", [True, False])
def test_minimax_golden(scan):
    torch.manual_seed(0)
    p = MiniMaxH3Params(
        hidden_size=32, num_layers=2, token_refiner_num_layers=2,
        num_attention_heads=2, attention_head_dim=24, ffn_hidden_size=48,
        latents_dim=4, audio_latents_dim=6, text_dim=16,
        timestep_input_dim=8, time_embed_hidden_size=16, time_embed_dim=12,
        rope_inv_freq_len=4, scan_blocks=scan, remat=False, dtype=jnp.float32)
    ref = TorchMiniMax(p).eval()
    flat = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, minimax_rules(scan))
    assert not unmatched, unmatched[:8]

    lay1 = pk.build_packed_sequence(np.array([1, 1, 0]), 2, 4, 4, 3,
                                    keyframe_anchors=("first",))
    lay2 = pk.build_packed_sequence(np.array([1]), 2, 4, 4, 3,
                                    keyframe_anchors=("first",))
    pos, tags, vi, ai, ti, _ = pk.pad_layouts_to_batch([lay1, lay2])
    b, s = tags.shape
    nv, na, lt = len(vi), len(ai), len(ti)

    rng = np.random.default_rng(0)
    vid = rng.normal(size=(b, nv, p.video_patch_dim)).astype(np.float32)
    aud = rng.normal(size=(b, na, p.audio_latents_dim)).astype(np.float32)
    txt = rng.normal(size=(b, lt, p.text_dim)).astype(np.float32)
    # three distinct timesteps: video t, audio t, cond t (pinned 0.999-ish)
    unique_t = np.asarray([0.2, 0.55, 0.999], np.float32)
    inverse = np.zeros((b, s), np.int64)
    inverse[:, ai] = 1
    inverse[:, vi[:lay1.num_condition_video_rows]] = 2

    with torch.no_grad():
        want_v, want_a = ref(
            torch.from_numpy(vid), torch.from_numpy(aud), torch.from_numpy(txt),
            torch.from_numpy(unique_t), torch.from_numpy(inverse),
            torch.from_numpy(tags), torch.from_numpy(pos.astype(np.float32)),
            torch.from_numpy(vi), torch.from_numpy(ai), torch.from_numpy(ti))

    got_v, got_a = MiniMaxH3Transformer(p).apply(
        {"params": tree}, jnp.asarray(vid), jnp.asarray(aud), jnp.asarray(txt),
        jnp.asarray(unique_t), jnp.asarray(inverse, jnp.int32),
        jnp.asarray(tags, jnp.int32), jnp.asarray(pos, jnp.float32),
        jnp.asarray(vi), jnp.asarray(ai), jnp.asarray(ti))
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), atol=5e-4, rtol=5e-4)


def test_minimax_patchify_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(2, 2, 4, 6, 5)).astype(np.float32)  # NTHWC
    rows = np.asarray(pk.patchify_video_latents(jnp.asarray(lat)))
    # torch reference order: (B, C, T, H, W) -> rows [c, pt, ph, pw]
    tl = torch.from_numpy(lat.transpose(0, 4, 1, 2, 3))
    b, c, t, h, w = tl.shape
    want = tl.reshape(b, c, t, 1, h // 2, 2, w // 2, 2)
    want = want.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, -1, c * 4).numpy()
    np.testing.assert_allclose(rows, want, atol=0, rtol=0)
    back = np.asarray(pk.unpatchify_video_tokens(jnp.asarray(rows), 2, 4, 6, 5))
    np.testing.assert_allclose(back, lat, atol=0, rtol=0)

    a = rng.normal(size=(2, 2, 6, 3)).astype(np.float32)  # B, 2ch, C, T
    packed = np.asarray(pk.pack_audio_latents(jnp.asarray(a)))
    assert packed.shape == (2, 6, 6)
    unpacked = np.asarray(pk.unpack_audio_tokens(jnp.asarray(packed), 3))
    np.testing.assert_allclose(unpacked, a, atol=0, rtol=0)
