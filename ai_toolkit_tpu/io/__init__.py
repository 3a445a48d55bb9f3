from .lora_file import load_lora_file, save_lora_file
from .checkpoint import CheckpointManager

__all__ = ["load_lora_file", "save_lora_file", "CheckpointManager"]
