from . import schedules, optim, pretrain

__all__ = ["schedules", "optim", "pretrain"]
