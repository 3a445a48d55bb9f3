"""LDM single-file interop (reference kohya_model_util.py + keymaps/*.json +
saving.py:22-139): export -> single file -> import round-trips exactly, and
the per-key rename functions pin the known public LDM<->diffusers contract.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ai_toolkit_tpu.config.modules import ModelConfig  # noqa: E402
from ai_toolkit_tpu.io.ldm_single_file import (  # noqa: E402
    export_ldm_checkpoint,
    hf_to_openclip,
    load_ldm_checkpoint,
    openclip_to_hf,
    unet_diffusers_to_ldm_key,
    unet_ldm_to_diffusers_key,
    vae_diffusers_to_ldm,
    vae_ldm_to_diffusers,
)
from ai_toolkit_tpu.models.registry import get_model_class  # noqa: E402


# -- contract pins: these correspondences are the public LDM format ---------

SD1_UNET_PAIRS = [  # layers_per_block=2, 4 levels, attention on up 1..3
    ("input_blocks.0.0.weight", "conv_in.weight"),
    ("time_embed.0.weight", "time_embedding.linear_1.weight"),
    ("input_blocks.1.0.in_layers.2.weight", "down_blocks.0.resnets.0.conv1.weight"),
    ("input_blocks.3.0.op.weight", "down_blocks.0.downsamplers.0.conv.weight"),
    ("input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight",
     "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight"),
    ("middle_block.2.out_layers.3.weight", "mid_block.resnets.1.conv2.weight"),
    ("middle_block.1.proj_in.weight", "mid_block.attentions.0.proj_in.weight"),
    ("output_blocks.2.1.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
    ("output_blocks.5.2.conv.weight", "up_blocks.1.upsamplers.0.conv.weight"),
    ("output_blocks.4.0.emb_layers.1.weight",
     "up_blocks.1.resnets.1.time_emb_proj.weight"),
    ("output_blocks.11.0.skip_connection.weight",
     "up_blocks.3.resnets.2.conv_shortcut.weight"),
    ("out.0.weight", "conv_norm_out.weight"),
]

SDXL_EXTRA_PAIRS = [  # 3 levels, attention on up 0..1
    ("label_emb.0.0.weight", "add_embedding.linear_1.weight"),
    ("output_blocks.2.2.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
    ("output_blocks.5.2.conv.weight", "up_blocks.1.upsamplers.0.conv.weight"),
]


def test_unet_key_contract_sd1():
    for ldm, dif in SD1_UNET_PAIRS:
        assert unet_ldm_to_diffusers_key(ldm, 2) == dif, ldm
        assert unet_diffusers_to_ldm_key(dif, 2, 4, (1, 2, 3)) == ldm, dif


def test_unet_key_contract_sdxl():
    for ldm, dif in SDXL_EXTRA_PAIRS:
        assert unet_ldm_to_diffusers_key(ldm, 2) == dif, ldm
        assert unet_diffusers_to_ldm_key(dif, 2, 3, (0, 1)) == ldm, dif


def test_vae_key_contract():
    flat = {
        "encoder.down.1.block.0.nin_shortcut.weight": np.zeros((2, 2, 1, 1), np.float32),
        "decoder.up.0.block.1.norm1.weight": np.zeros((2,), np.float32),
        "decoder.up.3.upsample.conv.bias": np.zeros((2,), np.float32),
        "decoder.mid.attn_1.q.weight": np.zeros((4, 4, 1, 1), np.float32),
        "decoder.mid.attn_1.norm.weight": np.zeros((4,), np.float32),
        "decoder.mid.block_2.conv1.weight": np.zeros((2, 2, 3, 3), np.float32),
        "encoder.norm_out.weight": np.zeros((2,), np.float32),
        "quant_conv.weight": np.zeros((8, 8, 1, 1), np.float32),
    }
    dif = vae_ldm_to_diffusers(flat)
    assert "encoder.down_blocks.1.resnets.0.conv_shortcut.weight" in dif
    assert "decoder.up_blocks.3.resnets.1.norm1.weight" in dif  # reversed
    assert "decoder.up_blocks.0.upsamplers.0.conv.bias" in dif
    assert dif["decoder.mid_block.attentions.0.to_q.weight"].shape == (4, 4)
    assert "decoder.mid_block.attentions.0.group_norm.weight" in dif
    assert "decoder.mid_block.resnets.1.conv1.weight" in dif
    assert "encoder.conv_norm_out.weight" in dif
    back = vae_diffusers_to_ldm(dif)
    assert set(back) == set(flat)
    assert back["decoder.mid.attn_1.q.weight"].shape == (4, 4, 1, 1)


def test_openclip_roundtrip_and_split():
    rng = np.random.default_rng(0)
    d, n_layers = 8, 2
    flat = {"positional_embedding": rng.normal(size=(77, d)).astype(np.float32),
            "token_embedding.weight": rng.normal(size=(49408, d)).astype(np.float32),
            "ln_final.weight": rng.normal(size=(d,)).astype(np.float32),
            "ln_final.bias": rng.normal(size=(d,)).astype(np.float32),
            "text_projection": rng.normal(size=(d, d)).astype(np.float32),
            "logit_scale": np.asarray(1.0, np.float32)}
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}."
        flat[p + "attn.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        flat[p + "attn.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
        flat[p + "attn.out_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        flat[p + "attn.out_proj.bias"] = rng.normal(size=(d,)).astype(np.float32)
        for nm in ("ln_1", "ln_2"):
            flat[p + nm + ".weight"] = rng.normal(size=(d,)).astype(np.float32)
            flat[p + nm + ".bias"] = rng.normal(size=(d,)).astype(np.float32)
        flat[p + "mlp.c_fc.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32)
        flat[p + "mlp.c_fc.bias"] = rng.normal(size=(4 * d,)).astype(np.float32)
        flat[p + "mlp.c_proj.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32)
        flat[p + "mlp.c_proj.bias"] = rng.normal(size=(d,)).astype(np.float32)
    hf = openclip_to_hf(flat)
    # in_proj splits in q,k,v order; text_projection transposes to Linear
    np.testing.assert_array_equal(
        hf["text_model.encoder.layers.0.self_attn.k_proj.weight"],
        flat["transformer.resblocks.0.attn.in_proj_weight"][d:2 * d])
    np.testing.assert_array_equal(
        hf["text_projection.weight"], flat["text_projection"].T)
    back = hf_to_openclip(hf)
    for k, v in flat.items():
        if k == "logit_scale":
            continue  # dropped (runtime constant)
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    # sd2-style: drop the last layer on import, fabricate it back on export
    hf2 = openclip_to_hf(flat, drop_layers_from=1)
    assert not any(".layers.1." in k for k in hf2)
    fab = hf_to_openclip(hf2, fabricate_last_layer=True)
    assert "transformer.resblocks.1.attn.in_proj_weight" in fab
    assert "logit_scale" in fab and "text_projection" in fab


def _leaves_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _leaves_allclose(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-3, rtol=1e-3, err_msg=path)


@pytest.mark.parametrize("arch", ["sd1", "sd2", "sdxl", "sdxl_refiner"])
def test_ldm_export_import_roundtrip(arch, tmp_path):
    """init -> export single file -> import -> identical trees (fp16 quantum).
    Covers UNet numbering, VAE attn reshape, open_clip in_proj merge/split,
    and sd2's fabricated last resblock being re-dropped on import."""
    model = get_model_class(arch)(ModelConfig(arch=arch, model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    f = tmp_path / f"{arch}_ldm.safetensors"
    export_ldm_checkpoint(model, variables, str(f), dtype=np.float32)

    model2 = get_model_class(arch)(
        ModelConfig(arch=arch, name_or_path=str(f), model_kwargs={"size": "tiny"}))
    loaded = model2.load_variables(jax.random.key(1))
    for comp in variables:
        if arch == "sdxl_refiner" and comp == "clip":
            continue  # the refiner checkpoint carries only the OpenCLIP tower
        _leaves_allclose(variables[comp], loaded[comp], comp)


def test_non_ldm_file_refused(tmp_path):
    from safetensors.numpy import save_file

    f = tmp_path / "junk.safetensors"
    save_file({"foo": np.zeros((2,), np.float32)}, str(f))
    model = get_model_class("sd1")(
        ModelConfig(arch="sd1", name_or_path=str(f), model_kwargs={"size": "tiny"}))
    with pytest.raises(ValueError, match="LDM"):
        model.load_variables(jax.random.key(0))
