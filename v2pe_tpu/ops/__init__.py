from v2pe_tpu.ops.rope import compute_rope_cos_sin, apply_rotary
from v2pe_tpu.ops.norms import rms_norm, layer_norm
from v2pe_tpu.ops.attention import flash_attention

__all__ = [
    "compute_rope_cos_sin",
    "apply_rotary",
    "rms_norm",
    "layer_norm",
    "flash_attention",
]
