"""Dataset-driven control-conditioned regeneration.

Analog of the reference's advanced_generator ReferenceGenerator extension
(``/root/reference/extensions_built_in/advanced_generator/
ReferenceGenerator.py``): walk dataset images, derive a depth control map per
image (midas there; our offline control generator here), and regenerate each
image from its caption conditioned on that map, writing image + caption to an
output folder. TPU redesign: one jitted sampling loop reused across items;
control maps cache to disk like dataset control caching.

Config::

    type: reference_generator
    model: {...}                # any control-capable arch
    extras:
      output_folder: out/refgen
      control: depth            # any ControlGenerator type
      generate: {neg: "", seed: -1, walk_seed: true, sample_steps: 20,
                 guidance_scale: 7, ext: png}
    datasets: [{folder_path: ..., caption_ext: txt, resolution: [512]}]
"""

from __future__ import annotations

import os
import random

import jax

from ai_toolkit_tpu.config.modules import GenerateImageConfig, ProcessConfig


class ReferenceGeneratorProcess:
    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        cfg = self.cfg
        extras = cfg.extras
        out_dir = extras.get("output_folder") or os.path.join(
            cfg.training_folder, self.job_name, "reference_gen"
        )
        gen_cfg = dict(extras.get("generate") or {})
        control_type = extras.get("control", "depth")

        from ai_toolkit_tpu.data.control_generator import ControlGenerator
        from ai_toolkit_tpu.data.dataset import FolderDataset
        from ai_toolkit_tpu.generation import generate, save_image_atomic
        from ai_toolkit_tpu.models.registry import get_model_class

        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(0))

        lora = None
        lora_path = extras.get("lora_path")
        if lora_path:
            from ai_toolkit_tpu.io.lora_file import load_lora_file

            lora, _ = load_lora_file(lora_path)

        ctrl_gen = ControlGenerator()
        seed = int(gen_cfg.get("seed", -1))
        walk_seed = bool(gen_cfg.get("walk_seed", False))
        ext = gen_cfg.get("ext", "png")

        outputs = []
        for i, dcfg in enumerate(cfg.datasets):
            ds = FolderDataset(dcfg, model.bucket_divisibility, cfg.trigger_word, seed=42 + i)
            for item in ds.items:
                if item.kind != "image":
                    continue
                stem = os.path.splitext(os.path.basename(item.path))[0]
                ctrl_path = ctrl_gen.get_or_generate(item.path, control_type)
                cur = seed
                if seed == -1:
                    cur = random.randint(0, 1_000_000)
                elif walk_seed:
                    cur = seed + len(outputs)
                bw, bh = item.bucket
                gen = GenerateImageConfig(
                    prompt=item.caption,
                    negative_prompt=gen_cfg.get("neg", ""),
                    width=bw,
                    height=bh,
                    seed=cur,
                    guidance_scale=float(gen_cfg.get("guidance_scale", 7.0)),
                    sample_steps=int(gen_cfg.get("sample_steps", 20)),
                    sampler=gen_cfg.get("sampler"),
                    ctrl_img=ctrl_path,
                )
                img = generate(model, variables, gen, lora=lora)
                out_path = os.path.join(out_dir, f"{stem}.{ext}")
                save_image_atomic(img, out_path)
                with open(os.path.join(out_dir, f"{stem}.txt"), "w") as f:
                    f.write(item.caption)
                outputs.append(out_path)
                print(f"reference_generator: {out_path}")
        print(f"reference_generator: {len(outputs)} images -> {out_dir}")
        return outputs


class BatchImg2ImgProcess:
    """uid 'batch_img2img' (reference advanced_generator Img2ImgGenerator):
    re-render every dataset image via img2img at a denoise strength, prompted
    by its caption. extras.generate: {denoise_strength, neg, seed, walk_seed,
    sample_steps, guidance_scale, ext}."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg

    def run(self):
        cfg = self.cfg
        extras = cfg.extras
        out_dir = extras.get("output_folder") or os.path.join(
            cfg.training_folder, self.job_name, "img2img"
        )
        gen_cfg = dict(extras.get("generate") or {})
        strength = float(gen_cfg.get("denoise_strength", 0.5))

        from ai_toolkit_tpu.data.dataset import FolderDataset
        from ai_toolkit_tpu.generation import generate_img2img, save_image_atomic
        from ai_toolkit_tpu.models.registry import get_model_class

        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(0))
        lora = None
        if extras.get("lora_path"):
            from ai_toolkit_tpu.io.lora_file import load_lora_file

            lora, _ = load_lora_file(extras["lora_path"])

        seed = int(gen_cfg.get("seed", -1))
        walk_seed = bool(gen_cfg.get("walk_seed", False))
        ext = gen_cfg.get("ext", "png")
        outputs = []
        for i, dcfg in enumerate(cfg.datasets):
            ds = FolderDataset(dcfg, model.bucket_divisibility, cfg.trigger_word, seed=42 + i)
            for item in ds.items:
                if item.kind != "image":
                    continue
                stem = os.path.splitext(os.path.basename(item.path))[0]
                cur = random.randint(0, 1_000_000) if seed == -1 else (
                    seed + len(outputs) if walk_seed else seed
                )
                bw, bh = item.bucket
                gen = GenerateImageConfig(
                    prompt=item.caption,
                    negative_prompt=gen_cfg.get("neg", ""),
                    width=bw, height=bh, seed=cur,
                    guidance_scale=float(gen_cfg.get("guidance_scale", 7.0)),
                    sample_steps=int(gen_cfg.get("sample_steps", 20)),
                    sampler=gen_cfg.get("sampler"),
                )
                img = generate_img2img(
                    model, variables, gen, item.load_image(), strength=strength, lora=lora
                )
                out_path = os.path.join(out_dir, f"{stem}.{ext}")
                save_image_atomic(img, out_path)
                with open(os.path.join(out_dir, f"{stem}.txt"), "w") as f:
                    f.write(item.caption)
                outputs.append(out_path)
        print(f"batch_img2img: {len(outputs)} images -> {out_dir}")
        return outputs
