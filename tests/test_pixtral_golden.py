"""Golden: flax PixtralVisionEncoder vs a torch mirror of the reference's
vendored tower (toolkit/models/pixtral_vision.py — RMSNorm blocks, 2D
interleaved-complex RoPE, SwiGLU), through the real import rules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ai_toolkit_tpu.models.text_encoders.pixtral_vision import (  # noqa: E402
    PixtralVisionConfig,
    PixtralVisionEncoder,
    load_pixtral_encoder,
    pixtral_encoder_tree,
)


def _torch_mirror(flat, cfg, images):
    """Reference math (pixtral_vision.py:15-167, 182-207, 318-356)."""
    import torch.nn.functional as F

    x = torch.from_numpy(images).permute(0, 3, 1, 2).float()  # [B,3,H,W]
    w = torch.from_numpy(flat["patch_conv.weight"]).float()
    x = F.conv2d(x, w, stride=cfg.patch_size)  # [B,h,gh,gw]
    b, h, gh, gw = x.shape
    x = x.flatten(2).permute(0, 2, 1)  # [B, S, h]

    def rms(x, wname, eps=1e-5):
        wgt = torch.from_numpy(flat[wname]).float()
        out = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
        return out * wgt

    x = rms(x, "ln_pre.weight")

    # 2D rope table (precompute_freqs_cis_2d)
    dim = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (torch.arange(0, dim, 2).float() / dim))
    fh = torch.outer(torch.arange(gh).float(), freqs[::2])
    fw = torch.outer(torch.arange(gw).float(), freqs[1::2])
    f2d = torch.cat([fh[:, None, :].repeat(1, gw, 1),
                     fw[None, :, :].repeat(gh, 1, 1)], dim=-1)
    freqs_cis = torch.polar(torch.ones_like(f2d), f2d).reshape(gh * gw, -1)

    def rope(t):  # [B, S, H, D]
        tc = torch.view_as_complex(t.float().reshape(*t.shape[:-1], -1, 2))
        out = torch.view_as_real(tc * freqs_cis[None, :, None, :]).flatten(-2)
        return out.type_as(t)

    nh, hd = cfg.num_attention_heads, cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.layers.{i}."
        xn = rms(x, pre + "attention_norm.weight")

        def lin(name, inp):
            return inp @ torch.from_numpy(flat[pre + name + ".weight"]).float().T

        q = rope(lin("attention.wq", xn).view(b, -1, nh, hd))
        k = rope(lin("attention.wk", xn).view(b, -1, nh, hd))
        v = lin("attention.wv", xn).view(b, -1, nh, hd)
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2).reshape(b, -1, nh * hd)
        x = x + lin("attention.wo", attn)
        xn = rms(x, pre + "ffn_norm.weight")
        x = x + lin("feed_forward.w2",
                    F.silu(lin("feed_forward.w1", xn)) * lin("feed_forward.w3", xn))
    return x.numpy()


def _random_flat(cfg, rng):
    flat = {}
    h, inter = cfg.hidden_size, cfg.intermediate_size
    flat["patch_conv.weight"] = rng.normal(
        size=(h, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * 0.05
    flat["ln_pre.weight"] = rng.normal(size=(h,)).astype(np.float32) * 0.1 + 1
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.layers.{i}."
        for nm, shape in (("attention.wq", (h, h)), ("attention.wk", (h, h)),
                          ("attention.wv", (h, h)), ("attention.wo", (h, h)),
                          ("feed_forward.w1", (inter, h)),
                          ("feed_forward.w2", (h, inter)),
                          ("feed_forward.w3", (inter, h))):
            flat[pre + nm + ".weight"] = rng.normal(size=shape).astype(np.float32) * 0.05
        flat[pre + "attention_norm.weight"] = rng.normal(size=(h,)).astype(np.float32) * 0.1 + 1
        flat[pre + "ffn_norm.weight"] = rng.normal(size=(h,)).astype(np.float32) * 0.1 + 1
    return flat


def test_pixtral_encoder_golden():
    cfg = PixtralVisionConfig.tiny()
    rng = np.random.default_rng(0)
    flat = _random_flat(cfg, rng)
    # NON-square grid to pin the height/width axis order of the 2D rope
    images = rng.normal(size=(2, 48, 64, 3)).astype(np.float32)

    ref = _torch_mirror(flat, cfg, images)

    tree = pixtral_encoder_tree(flat, cfg)
    model = PixtralVisionEncoder(cfg)
    got = np.asarray(model.apply({"params": tree}, jnp.asarray(images)))

    assert got.shape == ref.shape == (2, (48 // 16) * (64 // 16), cfg.hidden_size)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_pixtral_loader_roundtrip(tmp_path):
    import json

    from safetensors.numpy import save_file

    cfg = PixtralVisionConfig.tiny()
    rng = np.random.default_rng(1)
    flat = _random_flat(cfg, rng)
    (tmp_path / "config.json").write_text(json.dumps({
        "hidden_size": cfg.hidden_size, "image_size": cfg.image_size,
        "patch_size": cfg.patch_size, "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
    }))
    save_file(flat, str(tmp_path / "model.safetensors"))
    model, params = load_pixtral_encoder(str(tmp_path))
    images = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(images)))
    ref = _torch_mirror(flat, cfg, images)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)
