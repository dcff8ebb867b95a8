"""Pallas TPU kernels (the native-performance layer).

Kernels run compiled on TPU; on CPU they run through the Pallas interpreter
(set `interpret_mode(True)` — the tests do this) so the whole suite stays
hardware-independent.

STATUS: forward + custom-VJP numerics verified against the XLA oracles in
tests/test_pallas.py (interpreter) AND compiled/executed on the real v5e chip
(nine-view formulation; VMEM-budgeted row tiles). Measured on-chip vs XLA at the
UNet's shapes: parity at >=128 channels; XLA ~2.5x faster at the 64-channel
224^2 level (the 128-lane padding wastes half the MXU for any matmul-form conv,
and XLA's native conv handles it better). Production paths therefore default to
XLA; the Pallas path is selected via `fused_conv3x3_or_fallback` or explicit
calls, and is the substrate for future multi-layer-fusion work where XLA cannot
follow (e.g. ConvStack kept resident in VMEM).
"""

from unet_goolenet_tpu.ops.pallas import conv as _conv_mod
from unet_goolenet_tpu.ops.pallas.conv import (
    fused_conv3x3,
    fused_conv3x3_or_fallback,
    conv_transpose2x2_pallas,
    max_pool2x2_pallas,
)


def interpret_mode(on: bool = True) -> None:
    """Force interpreter execution (for CPU tests)."""
    _conv_mod._INTERPRET = on


__all__ = [
    "fused_conv3x3",
    "fused_conv3x3_or_fallback",
    "conv_transpose2x2_pallas",
    "max_pool2x2_pallas",
    "interpret_mode",
]
