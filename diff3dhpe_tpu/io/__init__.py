from diff3dhpe_tpu.io.torch_convert import convert_torch_state_dict

__all__ = ["convert_torch_state_dict"]
