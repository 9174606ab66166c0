from . import mesh, sharding, sp

__all__ = ["mesh", "sharding", "sp"]
