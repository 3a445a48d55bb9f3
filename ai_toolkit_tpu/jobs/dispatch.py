"""Job dispatch (reference ``toolkit/job.py`` + ``jobs/*Job``).

job kinds: 'train'/'extension' -> training processes; 'extract' -> LoRA
extraction; 'generate' -> batch generation; 'mod' -> LoRA rescale.
"""

from __future__ import annotations

from typing import Any

from ai_toolkit_tpu.config.modules import JobConfig

PROCESS_TYPES = {
    "train_esrgan": "esrgan",
    "esrgan_trainer": "esrgan",
    "slider": "slider",
    "ultimate_slider": "ultimate_slider",
    "ultimate_slider_trainer": "ultimate_slider",
    "image_reference_slider_trainer": "ultimate_slider",
    "concept_replacer": "replacer",
    "concept_slider": "slider",
    "slider_trainer": "slider",
    "train_vae": "vae",
    "vae_trainer": "vae",
    "sd_trainer": "train",
    "diffusion_trainer": "train",
    "ui_trainer": "train",
    "textual_inversion_trainer": "train",
    "generate": "generate",
    "pure_lora_generator": "generate",
    "reference_generator": "refgen",
    "batch_img2img": "img2img",
    "extract_lora": "extract",
    "mod_rescale": "mod",
    "merge_lora": "merge",
    "merge_locon": "merge",
    "captioner": "caption",
    "qwen3_vl_captioner": "caption",
    "ideogram4_captioner": "caption",
    "ace_step_captioner": "caption",
    "dataset_tools": "dataset_tools",
    "super_tagger": "dataset_tools",
}


class Job:
    def __init__(self, job_config: JobConfig):
        self.config = job_config
        self.processes = []
        for proc_cfg in job_config.processes:
            kind = PROCESS_TYPES.get(proc_cfg.type)
            if kind is None:
                # user plugins first (extensions/ modules exposing
                # AI_TOOLKIT_EXTENSIONS, reference toolkit/extension.py:28-57);
                # unmatched types keep the historical fall-through to train
                from ai_toolkit_tpu.jobs.extensions import discover_extension_processes

                ext = discover_extension_processes().get(proc_cfg.type)
                if ext is not None:
                    self.processes.append(ext(job_config.name, proc_cfg))
                    continue
                kind = "train"
            if kind == "train":
                from ai_toolkit_tpu.jobs.train_process import SDTrainProcess

                self.processes.append(SDTrainProcess(job_config.name, proc_cfg))
            elif kind == "generate":
                from ai_toolkit_tpu.jobs.generate_process import GenerateProcess

                self.processes.append(GenerateProcess(job_config.name, proc_cfg))
            elif kind == "refgen":
                from ai_toolkit_tpu.jobs.reference_generator_process import (
                    ReferenceGeneratorProcess,
                )

                self.processes.append(ReferenceGeneratorProcess(job_config.name, proc_cfg))
            elif kind == "img2img":
                from ai_toolkit_tpu.jobs.reference_generator_process import (
                    BatchImg2ImgProcess,
                )

                self.processes.append(BatchImg2ImgProcess(job_config.name, proc_cfg))
            elif kind == "extract":
                from ai_toolkit_tpu.jobs.extract_process import ExtractLoraProcess

                self.processes.append(ExtractLoraProcess(job_config.name, proc_cfg))
            elif kind == "mod":
                from ai_toolkit_tpu.jobs.mod_process import ModRescaleLoraProcess

                self.processes.append(ModRescaleLoraProcess(job_config.name, proc_cfg))
            elif kind == "vae":
                from ai_toolkit_tpu.jobs.train_vae_process import VAETrainProcess

                self.processes.append(VAETrainProcess(job_config.name, proc_cfg))
            elif kind == "merge":
                from ai_toolkit_tpu.jobs.merge_process import MergeLoraProcess

                self.processes.append(MergeLoraProcess(job_config.name, proc_cfg))
            elif kind == "ultimate_slider":
                from ai_toolkit_tpu.jobs.ultimate_slider_process import UltimateSliderProcess

                self.processes.append(UltimateSliderProcess(job_config.name, proc_cfg))
            elif kind == "slider":
                from ai_toolkit_tpu.jobs.slider_process import TrainSliderProcess

                self.processes.append(TrainSliderProcess(job_config.name, proc_cfg))
            elif kind == "esrgan":
                from ai_toolkit_tpu.jobs.train_esrgan_process import ESRGANTrainProcess

                self.processes.append(ESRGANTrainProcess(job_config.name, proc_cfg))
            elif kind == "replacer":
                from ai_toolkit_tpu.jobs.concept_replacer_process import ConceptReplacerProcess

                self.processes.append(ConceptReplacerProcess(job_config.name, proc_cfg))
            elif kind == "caption":
                from ai_toolkit_tpu.jobs.caption_process import CaptionProcess

                self.processes.append(CaptionProcess(job_config.name, proc_cfg))
            elif kind == "dataset_tools":
                from ai_toolkit_tpu.jobs.dataset_tools_process import DatasetToolsProcess

                self.processes.append(DatasetToolsProcess(job_config.name, proc_cfg))
            else:
                raise ValueError(f"unknown process type {proc_cfg.type}")

    def run(self) -> list[Any]:
        return [p.run() for p in self.processes]


def get_job(raw_config: dict) -> Job:
    return Job(JobConfig.from_raw(raw_config))


def run_job(raw_config: dict):
    return get_job(raw_config).run()
