from diff3dhpe_tpu.utils.misc import deterministic_random

__all__ = ["deterministic_random"]
