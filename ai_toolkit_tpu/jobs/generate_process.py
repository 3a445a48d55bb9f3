"""Batch generation job (reference GenerateProcess,
``/root/reference/jobs/process/GenerateProcess.py:70-173``)."""

from __future__ import annotations

import os

import jax

from ai_toolkit_tpu.config.modules import GenerateImageConfig, ProcessConfig
from ai_toolkit_tpu.generation import generate, save_image_atomic
from ai_toolkit_tpu.models.registry import get_model_class


class GenerateProcess:
    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg
        self.output_dir = os.path.join(cfg.training_folder, job_name)

    def run(self):
        cfg = self.cfg
        model = get_model_class(cfg.model.arch)(cfg.model)
        variables = model.load_variables(jax.random.key(0))
        lora = None
        lora_path = cfg.extras.get("lora_path")
        if lora_path:
            from ai_toolkit_tpu.io.lora_file import load_lora_file

            lora, _ = load_lora_file(lora_path)
        outputs = []
        for i, item in enumerate(cfg.sample.prompts):
            seed = cfg.sample.seed + (i if cfg.sample.walk_seed else 0)
            gen = GenerateImageConfig.from_sample(cfg.sample, item, seed)
            out = generate(model, variables, gen, lora=lora)
            if hasattr(model, "frame_count_snapper"):  # video / joint AV
                from ai_toolkit_tpu.generation import save_video_atomic, save_wav_atomic

                frames, wav = out
                ext = "webp" if frames.shape[0] > 1 else gen.output_ext
                path = os.path.join(self.output_dir, f"{self.job_name}_{i:04d}.{ext}")
                save_video_atomic(frames, path, fps=gen.fps)
                if wav is not None:
                    save_wav_atomic(wav, os.path.splitext(path)[0] + ".wav")
            elif hasattr(model, "latent_shape_audio"):  # text-to-audio
                from ai_toolkit_tpu.generation import save_wav_atomic

                path = os.path.join(self.output_dir, f"{self.job_name}_{i:04d}.wav")
                save_wav_atomic(
                    out, path, sample_rate=int(gen.extras.get("sample_rate", 44_100))
                )
            else:
                path = os.path.join(
                    self.output_dir, f"{self.job_name}_{i:04d}.{gen.output_ext}"
                )
                save_image_atomic(out, path)
            outputs.append(path)
        return {"images": outputs}
