from diff3dhpe_tpu.io.export import export_eval_step, restore_eval_step
from diff3dhpe_tpu.io.torch_convert import convert_torch_state_dict, load_matching_params

__all__ = [
    "convert_torch_state_dict",
    "export_eval_step",
    "load_matching_params",
    "restore_eval_step",
]
