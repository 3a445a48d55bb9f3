from .lora import (
    LoRASpec,
    build_lora,
    count_lora_params,
    lora_paths,
    merge_lora,
    scale_lora,
    unmerge_lora,
)

__all__ = [
    "LoRASpec",
    "build_lora",
    "count_lora_params",
    "lora_paths",
    "merge_lora",
    "scale_lora",
    "unmerge_lora",
]
