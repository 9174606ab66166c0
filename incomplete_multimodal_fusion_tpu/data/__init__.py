from . import synthetic, dfc2023, coco_instance, quadruplet

__all__ = ["synthetic", "dfc2023", "coco_instance", "quadruplet"]
