"""Ideogram-4 caption schema helpers (reference toolkit/ideogram_caption.py):
old-format migration, strict key orders, palette caps, raw-text bbox swap,
digest pass-through, and the upsample ui_script stdout contract."""

import json
import subprocess
import sys

from ai_toolkit_tpu.utils.ideogram_caption import (
    canon_medium,
    digest_caption_string,
    is_ideogram_caption_str,
    normalize_caption_dict,
    normalize_hex,
    swap_bbox_xy_in_text,
    to_model_string,
)


def test_medium_and_hex_canonicalization():
    assert canon_medium("Illustration.") == "illustration"
    assert canon_medium("3D Render") == "3d_render"
    assert canon_medium("oil pastel") == "oil pastel"  # custom preserved
    assert normalize_hex("#abc") == "#AABBCC"
    assert normalize_hex("#A1B2C3") == "#A1B2C3"
    assert normalize_hex("red") is None


def test_old_format_migrates_to_new_branch_order():
    old = {
        "aspect_ratio": "1:1",  # input-only, dropped
        "style_description": {
            "color_palette": ["#abc", "#abc", "bad", "#112233"],
            "photo": "flat vector look",
            "medium": "Illustration.",
            "lighting": "even",
            "aesthetics": "minimal",
        },
        "compositional_deconstruction": {
            "elements": [{"color_palette": ["#fff"], "desc": "a cat",
                          "type": "obj", "bbox": [1, 2, 3, 4]}],
            "background": "white",
        },
    }
    out = normalize_caption_dict(old)
    assert "aspect_ratio" not in out
    style = out["style_description"]
    # art branch: aesthetics, lighting, medium, art_style, color_palette
    assert list(style) == ["aesthetics", "lighting", "medium", "art_style",
                           "color_palette"]
    assert style["medium"] == "illustration"
    assert style["art_style"] == "flat vector look"  # migrated from 'photo'
    assert style["color_palette"] == ["#AABBCC", "#112233"]
    el = out["compositional_deconstruction"]["elements"][0]
    assert list(el) == ["type", "bbox", "desc", "color_palette"]
    assert el["color_palette"] == ["#FFFFFF"]


def test_text_element_order_and_palette_cap():
    el = {"type": "text", "desc": "sign", "text": "OPEN",
          "color_palette": [f"#{i:06x}" for i in range(9)]}
    out = normalize_caption_dict({"compositional_deconstruction": {
        "elements": [el]}})["compositional_deconstruction"]["elements"][0]
    assert list(out) == ["type", "text", "desc", "color_palette"]
    assert len(out["color_palette"]) == 5  # per-element cap


def test_bbox_swap_on_malformed_text():
    raw = 'garbage {"bbox":[120, 40, 80, 900]} trailing'  # x1,y1,x2,y2
    out = swap_bbox_xy_in_text(raw)
    assert '"bbox":[40,80,900,120]' in out  # -> y1,x1,y2,x2 with axis sort
    assert out.startswith("garbage ") and out.endswith(" trailing")
    assert swap_bbox_xy_in_text('"bbox":[0,-5,2000,10]') == '"bbox":[0,0,10,1000]'


def test_digest_passthrough_and_compact_serialization():
    assert digest_caption_string("a plain caption") == "a plain caption"
    assert digest_caption_string('{"not": "a caption"}') == '{"not": "a caption"}'
    cap = {"compositional_deconstruction": {"background": "x", "elements": []},
           "aspect_ratio": "16:9"}
    s = digest_caption_string(json.dumps(cap))
    assert s == '{"compositional_deconstruction":{"background":"x","elements":[]}}'
    assert is_ideogram_caption_str(s) and not is_ideogram_caption_str("plain")


def test_upsample_script_stdout_contract():
    out = subprocess.run(
        [sys.executable, "ui_scripts/upsample_ideogram4_caption.py",
         "a red fox in snow", "--aspect-ratio", "3:2", "--creative"],
        capture_output=True, text=True, timeout=120, check=True,
    )
    data = json.loads(out.stdout.strip())  # stdout is ONE JSON object
    assert "aspect_ratio" not in data
    assert "compositional_deconstruction" in data
    style = data["style_description"]
    assert list(style)[:3] == ["aesthetics", "lighting", "photo"]
    assert all(c.startswith("#") and c == c.upper()
               for c in style.get("color_palette", []))


def test_convert_lora_format_roundtrip(tmp_path):
    """scripts/convert_lora_format.py: peft -> comfy -> kohya -> peft (via
    --arch) round-trips names and tensors (reference convert_cog /
    convert_lora_to_peft_format / convert_diffusers_to_comfy analogs)."""
    import numpy as np
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 32)).astype(np.float32)
    b = rng.normal(size=(32, 4)).astype(np.float32)
    src = {
        "transformer.double_blocks.0.img_attn.qkv.lora_A.weight": a,
        "transformer.double_blocks.0.img_attn.qkv.lora_B.weight": b,
    }
    p_peft = tmp_path / "in.safetensors"
    save_file(src, str(p_peft))

    def run(srcp, dstp, to, *extra):
        subprocess.run(
            [sys.executable, "scripts/convert_lora_format.py", str(srcp),
             str(dstp), "--to", to, *extra],
            capture_output=True, text=True, timeout=300, check=True)

    p_comfy = tmp_path / "c.safetensors"
    run(p_peft, p_comfy, "comfy")
    c = load_file(str(p_comfy))
    assert "diffusion_model.double_blocks.0.img_attn.qkv.lora_A.weight" in c

    p_kohya = tmp_path / "k.safetensors"
    run(p_comfy, p_kohya, "kohya")
    k = load_file(str(p_kohya))
    assert "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight" in k
    assert float(k["lora_unet_double_blocks_0_img_attn_qkv.alpha"]) == 4.0

    p_back = tmp_path / "back.safetensors"
    run(p_kohya, p_back, "peft", "--arch", "flux")
    back = load_file(str(p_back))
    assert set(back) == set(src)
    for key in src:
        np.testing.assert_allclose(back[key], src[key])


def test_convert_kohya_alpha_folded(tmp_path):
    """Review fix r5: kohya alpha != rank must fold into the up weight on
    conversion to peft/comfy (those consumers assume alpha == rank)."""
    import numpy as np
    from safetensors.numpy import load_file, save_file

    down = np.ones((4, 32), np.float32)
    up = np.ones((32, 4), np.float32)
    src = {
        "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight": down,
        "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight": up,
        "lora_unet_double_blocks_0_img_attn_qkv.alpha": np.asarray(16.0, np.float32),
    }
    p = tmp_path / "k.safetensors"
    save_file(src, str(p))
    out = tmp_path / "p.safetensors"
    subprocess.run(
        [sys.executable, "scripts/convert_lora_format.py", str(p), str(out),
         "--to", "peft", "--arch", "flux"],
        capture_output=True, text=True, timeout=300, check=True)
    got = load_file(str(out))
    b = got["transformer.double_blocks.0.img_attn.qkv.lora_B.weight"]
    np.testing.assert_allclose(b, up * (16.0 / 4.0))


def test_llm_generate_tiny_smoke(tmp_path):
    """Review fix r5: the upsample script's --model backend must actually
    run; tiny random-init config dir decodes deterministically."""
    import json

    from ai_toolkit_tpu.utils.llm_generate import generate_text

    json.dump({"vocab_size": 500, "hidden_size": 32, "num_hidden_layers": 1,
               "num_attention_heads": 2, "num_key_value_heads": 1,
               "intermediate_size": 64, "head_dim": 16},
              open(tmp_path / "config.json", "w"))
    out1 = generate_text(str(tmp_path), "a fox", max_new_tokens=4)
    out2 = generate_text(str(tmp_path), "a fox", max_new_tokens=4)
    assert isinstance(out1, str) and out1 == out2


def test_make_lcm_model_fuses_and_exports(tmp_path):
    """scripts/make_lcm_model.py (offline make_lcm_sdxl_model analog): base
    dir + local LoRA -> merged full-model export that differs from the base
    by exactly the fused delta."""
    import numpy as np
    from safetensors.numpy import load_file

    import jax

    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.io.full_export import export_full_model
    from ai_toolkit_tpu.models.registry import get_model_class

    # build a tiny sd15 "checkpoint dir" via full export of a random init
    model = get_model_class("sd15")(ModelConfig(arch="sd15", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    base_dir = tmp_path / "base"
    export_full_model(model, variables, str(base_dir), dtype=np.float32)

    # a one-module kohya LoRA on a known unet linear
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.io.lora_file import save_lora_file
    from ai_toolkit_tpu.models.unet import unet_lora_key_map

    lora = build_lora(variables["unet"],
                      LoRASpec(rank=2, alpha=2, target_patterns=model.lora_targets()),
                      jax.random.key(1))
    km = unet_lora_key_map(lora, num_levels=len(model.unet_config.block_out_channels))
    lpath = tmp_path / "lcm.safetensors"
    save_lora_file(lora, str(lpath), key_map=km, fmt="kohya", prefix="lora_unet",
                   dtype=np.float32)

    out = subprocess.run(
        [sys.executable, "scripts/make_lcm_model.py", str(base_dir), str(lpath),
         str(tmp_path / "merged"), "--arch", "sd15",
         "--model-kwargs", '{"size": "tiny"}'],
        capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-800:]
    merged = load_file(str(tmp_path / "merged" / "unet" /
                           "diffusion_pytorch_model.safetensors"))
    basef = load_file(str(base_dir / "unet" / "diffusion_pytorch_model.safetensors"))
    diffs = [k for k in basef
             if merged[k].shape == basef[k].shape
             and not np.allclose(np.asarray(merged[k], np.float32),
                                 np.asarray(basef[k], np.float32), atol=1e-4)]
    assert diffs, "merge changed nothing"


def test_convert_cog_lora_and_embedding(tmp_path):
    """scripts/convert_cog.py: cog SDXL attn-processor LoRA keys map to kohya
    LDM-module keys (reference scripts/convert_cog.py — whose own keymap file
    is missing upstream; we derive the LDM names structurally) and the
    embedding renames text_encoders_0/1 -> clip_l/clip_g."""
    import numpy as np
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(0)
    down = rng.normal(size=(4, 640)).astype(np.float32)
    up = rng.normal(size=(640, 4)).astype(np.float32)
    lora = {
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.processor."
        "to_q_lora.down.weight": down,
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.processor."
        "to_q_lora.up.weight": up,
        "mid_block.attentions.0.transformer_blocks.3.attn2.processor."
        "to_out_lora.down.weight": down.copy(),
        "up_blocks.0.attentions.1.transformer_blocks.2.attn1.processor."
        "to_v_lora.up.weight": up.copy(),
        # peft-style fork naming must also map
        "unet.down_blocks.2.attentions.1.transformer_blocks.0.attn2."
        "to_k.lora_A.weight": down.copy(),
    }
    emb = {"text_encoders_0": rng.normal(size=(2, 768)).astype(np.float32),
           "text_encoders_1": rng.normal(size=(2, 1280)).astype(np.float32)}
    lp, ep = tmp_path / "l.safetensors", tmp_path / "e.safetensors"
    save_file(lora, str(lp))
    save_file(emb, str(ep))

    out = subprocess.run(
        [sys.executable, "scripts/convert_cog.py", str(lp), str(ep),
         "--lora_output", str(tmp_path / "lk.safetensors"),
         "--embedding_output", str(tmp_path / "ek.safetensors")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-800:]

    k = load_file(str(tmp_path / "lk.safetensors"))
    # SDXL: L = layers_per_block+1 = 3 -> down_blocks.1.attentions.0 is
    # input_blocks.4.1; mid attn is middle_block.1; up_blocks.0.attentions.1
    # is output_blocks.1.1; down_blocks.2.attentions.1 is input_blocks.8.1
    assert ("lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"
            ".lora_down.weight") in k
    assert ("lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"
            ".lora_up.weight") in k
    assert ("lora_unet_middle_block_1_transformer_blocks_3_attn2_to_out_0"
            ".lora_down.weight") in k
    assert ("lora_unet_output_blocks_1_1_transformer_blocks_2_attn1_to_v"
            ".lora_up.weight") in k
    assert ("lora_unet_input_blocks_8_1_transformer_blocks_0_attn2_to_k"
            ".lora_down.weight") in k
    # alpha == rank for every down weight
    assert float(k["lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"
                   ".alpha"][0]) == 4.0
    assert float(k["lora_unet_middle_block_1_transformer_blocks_3_attn2_to_out_0"
                   ".alpha"][0]) == 4.0
    np.testing.assert_array_equal(
        k["lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"
          ".lora_down.weight"], down)

    e = load_file(str(tmp_path / "ek.safetensors"))
    assert set(e) == {"clip_l", "clip_g"}
    np.testing.assert_array_equal(e["clip_l"], emb["text_encoders_0"])
