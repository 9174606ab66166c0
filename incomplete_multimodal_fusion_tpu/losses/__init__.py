from .masked import (masked_mse_loss, masked_l1_loss, masked_cross_entropy_loss,
                     LOSS_FNS, PATCH_LOSS_FNS)
from .contrastive import (
    dino_loss,
    byol_loss,
    vicreg_loss,
    hard_negative_loss,
    DINOCenterState,
    dino_center_loss,
)
from .balancing import no_weighting, uncertainty_weighting, init_uncertainty_params

__all__ = [
    "masked_mse_loss",
    "masked_l1_loss",
    "masked_cross_entropy_loss",
    "LOSS_FNS",
    "PATCH_LOSS_FNS",
    "dino_loss",
    "byol_loss",
    "vicreg_loss",
    "hard_negative_loss",
    "DINOCenterState",
    "dino_center_loss",
    "no_weighting",
    "uncertainty_weighting",
    "init_uncertainty_params",
]
