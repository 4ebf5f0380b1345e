from diff3dhpe_tpu.io.torch_convert import convert_torch_state_dict, load_matching_params

__all__ = ["convert_torch_state_dict", "load_matching_params"]
