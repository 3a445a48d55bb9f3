"""Golden: flax TIPSv2DPT vs a torch mirror of the reference's vendored
tipsv2.py (DINOv2-style ViT + DPT heads), through the real import rules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ai_toolkit_tpu.models.tipsv2 import (  # noqa: E402
    TIPSConfig,
    TIPSv2DPT,
    tipsv2_tree,
)


def _t(flat, k):
    return torch.from_numpy(flat[k]).float()


def _vit_feats(flat, cfg, x):
    """Mirror of VisionTransformer.get_intermediate_layers (reshape=True,
    return_class_token=True, norm=True)."""
    p, d = cfg.patch_size, cfg.embed_dim
    img = torch.from_numpy(x).permute(0, 3, 1, 2).float()
    h = F.conv2d(img, _t(flat, "vision_encoder.patch_embed.proj.weight"),
                 _t(flat, "vision_encoder.patch_embed.proj.bias"), stride=p)
    b, _, gh, gw = h.shape
    h = h.flatten(2).transpose(1, 2)
    cls = _t(flat, "vision_encoder.cls_token").expand(b, -1, -1)
    h = torch.cat([cls, h], dim=1)
    pos = _t(flat, "vision_encoder.pos_embed")
    side = int(np.sqrt(pos.shape[1] - 1))
    if gh != side or gw != side:
        cp, pp = pos[:, :1], pos[:, 1:]
        pp = F.interpolate(pp.reshape(1, side, side, d).permute(0, 3, 1, 2),
                           size=(gh, gw), mode="bilinear", antialias=True)
        pos = torch.cat([cp, pp.permute(0, 2, 3, 1).reshape(1, -1, d)], dim=1)
    h = h + pos
    reg = _t(flat, "vision_encoder.register_tokens").expand(b, -1, -1)
    h = torch.cat([h[:, :1], reg, h[:, 1:]], dim=1)

    def ln(t, key):
        return F.layer_norm(t, (d,), _t(flat, key + ".weight"),
                            _t(flat, key + ".bias"), eps=1e-6)

    outs = []
    nh = cfg.num_heads
    hd = d // nh
    for i in range(cfg.depth):
        pre = f"vision_encoder.blocks.{i}."
        xn = ln(h, pre + "norm1")
        qkv = xn @ _t(flat, pre + "attn.qkv.weight").T + _t(flat, pre + "attn.qkv.bias")
        q, k, v = qkv.reshape(b, -1, 3, nh, hd).permute(2, 0, 3, 1, 4)
        a = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, -1, d)
        a = a @ _t(flat, pre + "attn.proj.weight").T + _t(flat, pre + "attn.proj.bias")
        h = h + a * _t(flat, pre + "ls1.gamma")
        xn = ln(h, pre + "norm2")
        m = F.gelu(xn @ _t(flat, pre + "mlp.fc1.weight").T + _t(flat, pre + "mlp.fc1.bias"))
        m = m @ _t(flat, pre + "mlp.fc2.weight").T + _t(flat, pre + "mlp.fc2.bias")
        h = h + m * _t(flat, pre + "ls2.gamma")
        if i in cfg.block_indices:
            outs.append(h)
    nr = cfg.num_register_tokens
    feats = []
    for o in outs:
        on = ln(o, "vision_encoder.norm")
        feats.append((on[:, 0], on[:, 1 + nr:].reshape(b, gh, gw, d)
                      .permute(0, 3, 1, 2)))
    return feats, (gh, gw)


def _trunk(flat, cfg, src, feats):
    xs = []
    for i, (cls_tok, patch) in enumerate(feats):
        b, d, gh, gw = patch.shape
        xf = patch.flatten(2).transpose(1, 2)
        ro = cls_tok.unsqueeze(1).expand(-1, xf.shape[1], -1)
        xc = torch.cat([xf, ro], dim=-1)
        xp = F.gelu(xc @ _t(flat, f"{src}.reassemble.readout_projects.{i}.weight").T
                    + _t(flat, f"{src}.reassemble.readout_projects.{i}.bias"))
        x = xp.transpose(1, 2).reshape(b, d, gh, gw)
        x = F.conv2d(x, _t(flat, f"{src}.reassemble.out_projections.{i}.weight"),
                     _t(flat, f"{src}.reassemble.out_projections.{i}.bias"))
        if i == 0:
            x = F.conv_transpose2d(
                x, _t(flat, f"{src}.reassemble.resize_layers.0.weight"),
                _t(flat, f"{src}.reassemble.resize_layers.0.bias"), stride=4)
        elif i == 1:
            x = F.conv_transpose2d(
                x, _t(flat, f"{src}.reassemble.resize_layers.1.weight"),
                _t(flat, f"{src}.reassemble.resize_layers.1.bias"), stride=2)
        elif i == 3:
            x = F.conv2d(x, _t(flat, f"{src}.reassemble.resize_layers.3.weight"),
                         _t(flat, f"{src}.reassemble.resize_layers.3.bias"),
                         stride=2, padding=1)
        x = F.conv2d(x, _t(flat, f"{src}.convs.{i}.weight"), padding=1)
        xs.append(x)

    def preact(x, key):
        r = x
        x = F.conv2d(F.relu(x), _t(flat, key + ".conv1.weight"), padding=1)
        x = F.conv2d(F.relu(x), _t(flat, key + ".conv2.weight"), padding=1)
        return x + r

    def fuse(i, x, residual=None):
        key = f"{src}.fusion_blocks.{i}"
        if residual is not None:
            if residual.shape != x.shape:
                residual = F.interpolate(residual, size=x.shape[2:],
                                         mode="bilinear", align_corners=False)
            x = x + preact(residual, key + ".residual_unit")
        x = preact(x, key + ".main_unit")
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return F.conv2d(x, _t(flat, key + ".out_conv.weight"),
                        _t(flat, key + ".out_conv.bias"))

    out = fuse(0, xs[-1])
    for i in range(1, 4):
        out = fuse(i, out, xs[-(i + 1)])
    return F.conv2d(out, _t(flat, f"{src}.project.weight"),
                    _t(flat, f"{src}.project.bias"), padding=1)


def _mirror(flat, cfg, x):
    feats, _ = _vit_feats(flat, cfg, x)
    h, w = x.shape[1:3]
    head = torch.cat([p for _, p in feats], dim=1)

    t = F.relu(_trunk(flat, cfg, "depth_head", feats)).permute(0, 2, 3, 1)
    out = t @ _t(flat, "depth_head.depth_head.weight").T + _t(flat, "depth_head.depth_head.bias")
    bins = torch.linspace(cfg.min_depth, cfg.max_depth, cfg.num_depth_bins)
    out = F.relu(out) + cfg.min_depth
    out = out / out.sum(-1, keepdim=True)
    depth = torch.einsum("bhwn,n->bhw", out, bins).unsqueeze(1)
    depth = F.interpolate(depth, size=(h, w), mode="bilinear", align_corners=False)

    t = _trunk(flat, cfg, "normals_head", feats).permute(0, 2, 3, 1)
    nrm = t @ _t(flat, "normals_head.normals_head.weight").T + _t(flat, "normals_head.normals_head.bias")
    nrm = F.normalize(nrm, p=2, dim=-1).permute(0, 3, 1, 2)
    nrm = F.interpolate(nrm, size=(h, w), mode="bilinear", align_corners=False)

    t = _trunk(flat, cfg, "segmentation_head", feats).permute(0, 2, 3, 1)
    seg = (t @ _t(flat, "segmentation_head.segmentation_head.weight").T
           + _t(flat, "segmentation_head.segmentation_head.bias")).permute(0, 3, 1, 2)
    seg = F.interpolate(seg, size=(h, w), mode="bilinear", align_corners=False)
    return {"head": head.numpy(), "depth": depth.numpy(),
            "normals": nrm.numpy(), "segmentation": seg.numpy()}


def _random_flat(cfg, rng):
    d = cfg.embed_dim
    flat = {
        "vision_encoder.patch_embed.proj.weight": rng.normal(
            size=(d, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * 0.05,
        "vision_encoder.patch_embed.proj.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
        "vision_encoder.cls_token": rng.normal(size=(1, 1, d)).astype(np.float32) * 0.02,
        "vision_encoder.register_tokens": rng.normal(
            size=(1, cfg.num_register_tokens, d)).astype(np.float32) * 0.02,
        "vision_encoder.pos_embed": rng.normal(
            size=(1, (cfg.img_size // cfg.patch_size) ** 2 + 1, d)).astype(np.float32) * 0.02,
        "vision_encoder.norm.weight": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
        "vision_encoder.norm.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
    }
    for i in range(cfg.depth):
        pre = f"vision_encoder.blocks.{i}."
        flat.update({
            pre + "norm1.weight": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
            pre + "norm1.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
            pre + "attn.qkv.weight": rng.normal(size=(3 * d, d)).astype(np.float32) * 0.05,
            pre + "attn.qkv.bias": rng.normal(size=(3 * d,)).astype(np.float32) * 0.02,
            pre + "attn.proj.weight": rng.normal(size=(d, d)).astype(np.float32) * 0.05,
            pre + "attn.proj.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
            pre + "ls1.gamma": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
            pre + "norm2.weight": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
            pre + "norm2.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
            pre + "mlp.fc1.weight": rng.normal(size=(int(d * cfg.mlp_ratio), d)).astype(np.float32) * 0.05,
            pre + "mlp.fc1.bias": rng.normal(size=(int(d * cfg.mlp_ratio),)).astype(np.float32) * 0.02,
            pre + "mlp.fc2.weight": rng.normal(size=(d, int(d * cfg.mlp_ratio))).astype(np.float32) * 0.05,
            pre + "mlp.fc2.bias": rng.normal(size=(d,)).astype(np.float32) * 0.02,
            pre + "ls2.gamma": rng.normal(size=(d,)).astype(np.float32) * 0.1 + 1,
        })
    ppc = cfg.post_process_channels
    c = cfg.channels
    for src in ("depth_head", "normals_head", "segmentation_head"):
        for i in range(4):
            flat[f"{src}.reassemble.readout_projects.{i}.weight"] = rng.normal(
                size=(d, 2 * d)).astype(np.float32) * 0.05
            flat[f"{src}.reassemble.readout_projects.{i}.bias"] = rng.normal(
                size=(d,)).astype(np.float32) * 0.02
            flat[f"{src}.reassemble.out_projections.{i}.weight"] = rng.normal(
                size=(ppc[i], d, 1, 1)).astype(np.float32) * 0.05
            flat[f"{src}.reassemble.out_projections.{i}.bias"] = rng.normal(
                size=(ppc[i],)).astype(np.float32) * 0.02
            flat[f"{src}.convs.{i}.weight"] = rng.normal(
                size=(c, ppc[i], 3, 3)).astype(np.float32) * 0.05
        flat[f"{src}.reassemble.resize_layers.0.weight"] = rng.normal(
            size=(ppc[0], ppc[0], 4, 4)).astype(np.float32) * 0.05
        flat[f"{src}.reassemble.resize_layers.0.bias"] = rng.normal(
            size=(ppc[0],)).astype(np.float32) * 0.02
        flat[f"{src}.reassemble.resize_layers.1.weight"] = rng.normal(
            size=(ppc[1], ppc[1], 2, 2)).astype(np.float32) * 0.05
        flat[f"{src}.reassemble.resize_layers.1.bias"] = rng.normal(
            size=(ppc[1],)).astype(np.float32) * 0.02
        flat[f"{src}.reassemble.resize_layers.3.weight"] = rng.normal(
            size=(ppc[3], ppc[3], 3, 3)).astype(np.float32) * 0.05
        flat[f"{src}.reassemble.resize_layers.3.bias"] = rng.normal(
            size=(ppc[3],)).astype(np.float32) * 0.02
        for i in range(4):
            for unit in (["main_unit"] + (["residual_unit"] if i > 0 else [])):
                for cv in ("conv1", "conv2"):
                    flat[f"{src}.fusion_blocks.{i}.{unit}.{cv}.weight"] = rng.normal(
                        size=(c, c, 3, 3)).astype(np.float32) * 0.05
            flat[f"{src}.fusion_blocks.{i}.out_conv.weight"] = rng.normal(
                size=(c, c, 1, 1)).astype(np.float32) * 0.05
            flat[f"{src}.fusion_blocks.{i}.out_conv.bias"] = rng.normal(
                size=(c,)).astype(np.float32) * 0.02
        flat[f"{src}.project.weight"] = rng.normal(size=(c, c, 3, 3)).astype(np.float32) * 0.05
        flat[f"{src}.project.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.02
    head_key = {"depth_head": "depth_head", "normals_head": "normals_head",
                "segmentation_head": "segmentation_head"}
    flat["depth_head.depth_head.weight"] = rng.normal(
        size=(cfg.num_depth_bins, c)).astype(np.float32) * 0.05
    flat["depth_head.depth_head.bias"] = rng.normal(
        size=(cfg.num_depth_bins,)).astype(np.float32) * 0.02
    flat["normals_head.normals_head.weight"] = rng.normal(size=(3, c)).astype(np.float32) * 0.05
    flat["normals_head.normals_head.bias"] = rng.normal(size=(3,)).astype(np.float32) * 0.02
    flat["segmentation_head.segmentation_head.weight"] = rng.normal(
        size=(cfg.num_seg_classes, c)).astype(np.float32) * 0.05
    flat["segmentation_head.segmentation_head.bias"] = rng.normal(
        size=(cfg.num_seg_classes,)).astype(np.float32) * 0.02
    return flat


def test_tipsv2_dpt_golden():
    cfg = TIPSConfig.tiny()
    rng = np.random.default_rng(0)
    flat = _random_flat(cfg, rng)
    x = rng.uniform(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    ref = _mirror(flat, cfg, x)
    tree = tipsv2_tree(flat, cfg)
    got = TIPSv2DPT(cfg).apply({"params": tree}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(got["head"]).transpose(0, 3, 1, 2), ref["head"],
        atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got["depth"]).transpose(0, 3, 1, 2), ref["depth"],
        atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(got["normals"]).transpose(0, 3, 1, 2), ref["normals"],
        atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(got["segmentation"]).transpose(0, 3, 1, 2),
        ref["segmentation"], atol=2e-3, rtol=5e-3)


def test_tipsv2_pos_interp_nonnative():
    """Non-native size: pos table bilinear-antialias interp path. The
    antialias filters differ slightly between torch and jax — sanity bound."""
    cfg = TIPSConfig.tiny()
    rng = np.random.default_rng(1)
    flat = _random_flat(cfg, rng)
    x = rng.uniform(size=(1, 28, 70, 3)).astype(np.float32)
    ref = _mirror(flat, cfg, x)
    got = TIPSv2DPT(cfg).apply({"params": tipsv2_tree(flat, cfg)}, jnp.asarray(x))
    g = np.asarray(got["head"]).transpose(0, 3, 1, 2)
    assert g.shape == ref["head"].shape
    err = np.abs(g - ref["head"]).max()
    assert err < 5e-2, err
