from .clip import CLIPTextConfig, CLIPTextModel
from .t5 import T5Config, T5Encoder

__all__ = ["CLIPTextConfig", "CLIPTextModel", "T5Config", "T5Encoder"]
