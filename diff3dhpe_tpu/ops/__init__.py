from diff3dhpe_tpu.ops.attention import (
    grand_attention,
    grand_attention_pallas,
    grand_attention_pallas_3d,
    packed_grand_attention,
    fused_grand_attention,
)

__all__ = [
    "grand_attention",
    "grand_attention_pallas",
    "grand_attention_pallas_3d",
    "packed_grand_attention",
    "fused_grand_attention",
]
