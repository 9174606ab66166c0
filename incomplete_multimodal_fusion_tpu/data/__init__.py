from . import synthetic, dfc2023

__all__ = ["synthetic", "dfc2023"]
