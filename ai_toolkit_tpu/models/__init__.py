from .registry import get_model_class, register_model, MODEL_REGISTRY

__all__ = ["get_model_class", "register_model", "MODEL_REGISTRY"]
