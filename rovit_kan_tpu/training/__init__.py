from rovit_kan_tpu.training.losses import (  # noqa: F401
    focal_loss,
    ordinal_bce_loss,
    uncertainty_loss,
    kan_regression_loss,
    joint_loss,
)
from rovit_kan_tpu.training.optimizer import build_optimizer, cosine_lr  # noqa: F401
