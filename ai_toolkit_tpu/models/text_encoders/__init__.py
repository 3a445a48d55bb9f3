from .clip import CLIPTextConfig, CLIPTextModel
from .llm import LLMConfig, LLMEncoder
from .t5 import T5Config, T5Encoder

__all__ = [
    "CLIPTextConfig",
    "CLIPTextModel",
    "LLMConfig",
    "LLMEncoder",
    "T5Config",
    "T5Encoder",
]
