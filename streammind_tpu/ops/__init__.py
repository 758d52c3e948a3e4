from .scan import (
    causal_conv1d,
    causal_conv1d_update,
    selective_scan,
    selective_scan_assoc,
    selective_scan_pallas,
    selective_scan_ref,
    selective_state_update,
)
from .attention import (
    attention,
    decode_attention,
    flash_attention,
    mha_reference,
)
from .norms import add_norm, layer_norm, rms_norm
from .rotary import apply_rope, rope_cos_sin, rope_frequencies
