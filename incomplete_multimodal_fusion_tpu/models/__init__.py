from . import layers, adapters, multimae

__all__ = ["layers", "adapters", "multimae"]
