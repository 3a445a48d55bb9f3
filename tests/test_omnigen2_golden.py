"""OmniGen2 golden vs a hand-written torch mirror of the reference's vendored
``OmniGen2Transformer2DModel`` (extensions_built_in/diffusion_models/omnigen2/
src/models/transformers/transformer_omnigen2.py: Lumina2 blocks, a second
patch embedder + per-image index embedding for VAE-encoded reference images
(:258-261,339,385), a third modulated refiner stack run per reference image
(:284-295,412-414), and the packed joint sequence [caption | refs | image]
(:585-590)). Rope id scheme per repo.py:66-103: caption token i -> (i,i,i);
ref image j gets axis0 = pe_shift starting at cap_len and advancing by
max(ref_h_tokens, ref_w_tokens); the noise image follows at the final shift.

The mirror packs sequences contiguously per sample exactly like the torch
code; ours keeps the caption slot padded with key masking — the golden pins
that the two layouts agree on the image output. Fed through the REAL import
rules (io/dit_importers.omnigen2_rules) with uneven caption lengths."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from test_lumina2_golden import RMS, Block, build_angles  # noqa: E402

DIM, CAP, P, C = 32, 24, 2, 4
N_LAYERS, N_REF_LAYERS = 2, 1
T_MAX = 6


class OmniGen2Mirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.x_embedder = nn.Linear(P * P * C, DIM)
        self.ref_image_patch_embedder = nn.Linear(P * P * C, DIM)
        self.image_index_embedding = nn.Parameter(torch.randn(5, DIM))
        tce = nn.Module()
        te = nn.Module()
        te.linear_1 = nn.Linear(256, min(DIM, 1024))
        te.linear_2 = nn.Linear(min(DIM, 1024), min(DIM, 1024))
        tce.timestep_embedder = te
        tce.caption_embedder = nn.Sequential(RMS(CAP), nn.Linear(CAP, DIM))
        self.time_caption_embed = tce
        self.noise_refiner = nn.ModuleList([Block(True) for _ in range(N_REF_LAYERS)])
        self.ref_image_refiner = nn.ModuleList([Block(True) for _ in range(N_REF_LAYERS)])
        self.context_refiner = nn.ModuleList([Block(False) for _ in range(N_REF_LAYERS)])
        self.layers = nn.ModuleList([Block(True) for _ in range(N_LAYERS)])
        no = nn.Module()
        no.linear_1 = nn.Linear(min(DIM, 1024), DIM)
        no.linear_2 = nn.Linear(DIM, P * P * C)
        self.norm_out = no

    @staticmethod
    def _patchify(lat):
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        return lat.view(b, c, hp, P, wp, P).permute(0, 2, 4, 3, 5, 1).reshape(
            b, hp * wp, P * P * c)

    def forward(self, lat, t, cap, cap_mask, refs):
        """lat [B,C,H,W]; refs [B,R,C,Hr,Wr] (uniform shapes, >=1 per sample)."""
        b, c, h, w = lat.shape
        hp, wp = h // P, w // P
        n_img = hp * wp
        _, n_r, _, rh, rw = refs.shape
        rhp, rwp = rh // P, rw // P
        n_rtok = rhp * rwp

        half = 128
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        targs = t.float()[:, None] * freqs[None]
        temb = self.time_caption_embed.timestep_embedder.linear_2(
            torch.nn.functional.silu(self.time_caption_embed.timestep_embedder.linear_1(
                torch.cat([torch.cos(targs), torch.sin(targs)], dim=-1))))
        cap = self.time_caption_embed.caption_embedder(cap)

        x = self.x_embedder(self._patchify(lat))
        r = self.ref_image_patch_embedder(
            self._patchify(refs.reshape(b * n_r, c, rh, rw)).reshape(
                b, n_r, n_rtok, P * P * c))
        for j in range(n_r):  # transformer_omnigen2.py:382-386
            r[:, j] = r[:, j] + self.image_index_embedding[j]

        # rope ids (repo.py:66-103): per-sample packed positions
        lens = cap_mask.sum(1)
        step = max(rhp, rwp)
        rows = torch.arange(hp)[:, None].expand(hp, wp).flatten().float()
        cols = torch.arange(wp)[None, :].expand(hp, wp).flatten().float()
        rrows = torch.arange(rhp)[:, None].expand(rhp, rwp).flatten().float()
        rcols = torch.arange(rwp)[None, :].expand(rhp, rwp).flatten().float()

        cap_ids = torch.arange(T_MAX)[None, :, None].expand(b, T_MAX, 3).clone().float()
        ref_ids = torch.zeros(b, n_r, n_rtok, 3)
        for j in range(n_r):
            ref_ids[:, j, :, 0] = (lens.float() + j * step)[:, None]
            ref_ids[:, j, :, 1] = rrows[None]
            ref_ids[:, j, :, 2] = rcols[None]
        img_ids = torch.zeros(b, n_img, 3)
        img_ids[..., 0] = (lens.float() + n_r * step)[:, None]
        img_ids[..., 1] = rows[None]
        img_ids[..., 2] = cols[None]
        cap_ang = build_angles(cap_ids)
        img_ang = build_angles(img_ids)
        ref_ang = build_angles(ref_ids.reshape(b, n_r * n_rtok, 3))

        for blk in self.context_refiner:
            cap = blk(cap, cap_ang, cap_mask.bool())
        for blk in self.noise_refiner:
            x = blk(x, img_ang, None, temb)
        # refine each ref image as its own batch row (:395-414)
        rf = r.reshape(b * n_r, n_rtok, DIM)
        ra = ref_ang.reshape(b * n_r, n_rtok, -1)
        rtemb = temb.repeat_interleave(n_r, dim=0)
        for blk in self.ref_image_refiner:
            rf = blk(rf, ra, None, rtemb)
        r = rf.reshape(b, n_r * n_rtok, DIM)

        # packed joint sequence [cap(:len) | refs | img] (:583-590)
        seq_lens = [int(lens[i]) + n_r * n_rtok + n_img for i in range(b)]
        s_max = max(seq_lens)
        joint = torch.zeros(b, s_max, DIM)
        ang = torch.zeros(b, s_max, cap_ang.shape[-1])
        key_ok = torch.zeros(b, s_max, dtype=torch.bool)
        for i in range(b):
            ln = int(lens[i])
            joint[i, :ln] = cap[i, :ln]
            joint[i, ln:ln + n_r * n_rtok] = r[i]
            joint[i, ln + n_r * n_rtok:seq_lens[i]] = x[i]
            ang[i, :ln] = cap_ang[i, :ln]
            ang[i, ln:ln + n_r * n_rtok] = ref_ang[i]
            ang[i, ln + n_r * n_rtok:seq_lens[i]] = img_ang[i]
            key_ok[i, :seq_lens[i]] = True
        for blk in self.layers:
            joint = blk(joint, ang, key_ok, temb)

        scale = self.norm_out.linear_1(torch.nn.functional.silu(temb))
        joint = torch.nn.functional.layer_norm(joint, (DIM,), eps=1e-6) * (1 + scale[:, None])
        joint = self.norm_out.linear_2(joint)
        out = torch.zeros(b, P * P * C * n_img).view(b, n_img, P * P * C)
        for i in range(b):
            out[i] = joint[i, seq_lens[i] - n_img:seq_lens[i]]
        return out.view(b, hp, wp, P, P, C).permute(0, 5, 1, 3, 2, 4).reshape(b, C, h, w)


def _mirror_and_inputs(n_ref=1):
    torch.manual_seed(0)
    mirror = OmniGen2Mirror().eval().float()
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(2, 8, 8, C)).astype(np.float32)
    refs = rng.normal(size=(2, n_ref, 8, 8, C)).astype(np.float32)
    cap = rng.normal(size=(2, T_MAX, CAP)).astype(np.float32)
    t = np.array([0.15, 0.7], np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)
    return mirror, lat, refs, cap, t, mask


@pytest.mark.golden
@pytest.mark.parametrize("scan", [False, True])
@pytest.mark.parametrize("n_ref", [1, 2])
def test_omnigen2_matches_torch_mirror(scan, n_ref):
    import jax

    from ai_toolkit_tpu.io.dit_importers import omnigen2_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree
    from ai_toolkit_tpu.models.flux_dit import pack_latents, unpack_latents
    from ai_toolkit_tpu.models.omnigen2_dit import (
        OmniGen2Config, OmniGen2DiT, omnigen2_pos_angles)

    mirror, lat, refs, cap, t, mask = _mirror_and_inputs(n_ref)
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    tree, unmatched = torch_to_tree(sd, omnigen2_rules(scan))
    assert not unmatched, unmatched[:8]

    cfg = OmniGen2Config.tiny(scan_blocks=scan)
    dit = OmniGen2DiT(cfg)
    ca, ia, ra = omnigen2_pos_angles(
        cfg, 4, 4, jnp.asarray(mask.sum(1)), T_MAX, ref_hw=(4, 4), n_ref=n_ref)
    packed_refs = jax.vmap(pack_latents, in_axes=1, out_axes=1)(jnp.asarray(refs))
    out = dit.apply({"params": tree}, pack_latents(jnp.asarray(lat)),
                    jnp.asarray(cap), jnp.asarray(t), jnp.asarray(mask, bool),
                    ia, ca, packed_refs, ra)
    ours = np.asarray(unpack_latents(out, 8, 8)).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)), torch.from_numpy(t),
                     torch.from_numpy(cap), torch.from_numpy(mask),
                     torch.from_numpy(refs.transpose(0, 1, 4, 2, 3))).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.golden
def test_omnigen2_rules_are_invertible():
    """tree_to_torch(omnigen2_rules) round-trips (full-model export path)."""
    from ai_toolkit_tpu.io.dit_importers import omnigen2_rules
    from ai_toolkit_tpu.io.torch_import import torch_to_tree, tree_to_torch

    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in OmniGen2Mirror().state_dict().items()}
    tree, unmatched = torch_to_tree(sd, omnigen2_rules(False))
    assert not unmatched
    flat = tree_to_torch(tree, omnigen2_rules(False))
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_allclose(flat[k], sd[k], atol=1e-6, err_msg=k)
