from diff3dhpe_tpu.engine.steps import (
    TrainState,
    build_train_state,
    make_train_step,
    make_eval_step,
    make_denoise_fn,
)

__all__ = [
    "TrainState",
    "build_train_state",
    "make_train_step",
    "make_eval_step",
    "make_denoise_fn",
]
