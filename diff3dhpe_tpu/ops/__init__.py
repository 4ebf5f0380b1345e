from diff3dhpe_tpu.ops.attention import grand_attention

__all__ = ["grand_attention"]
