from diff3dhpe_tpu.models.mixste import MixSTEDenoiser
from diff3dhpe_tpu.models.registry import HPE_model, MODEL_REGISTRY

__all__ = ["MixSTEDenoiser", "HPE_model", "MODEL_REGISTRY"]
