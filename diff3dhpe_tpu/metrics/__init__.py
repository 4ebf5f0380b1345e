from diff3dhpe_tpu.metrics.metrics import (
    mpjpe,
    weighted_mpjpe,
    n_mpjpe,
    p_mpjpe,
    mean_velocity_error,
    mean_velocity_error_train,
    pck,
    auc,
)

__all__ = [
    "mpjpe",
    "weighted_mpjpe",
    "n_mpjpe",
    "p_mpjpe",
    "mean_velocity_error",
    "mean_velocity_error_train",
    "pck",
    "auc",
]
