from . import synthetic, dfc2023, coco_instance, quadruplet, ade_odgt

__all__ = ["synthetic", "dfc2023", "coco_instance", "quadruplet", "ade_odgt"]
