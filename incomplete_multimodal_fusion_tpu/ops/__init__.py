from . import posemb, patches, masking, attention

__all__ = ["posemb", "patches", "masking", "attention"]
