"""Pallas TPU kernels (the native-performance layer).

Kernels run compiled on TPU; on CPU they run through the Pallas interpreter
(set `interpret_mode(True)` — the tests do this) so the whole suite stays
hardware-independent.

STATUS: forward + custom-VJP numerics verified against the XLA oracles in
tests/test_pallas.py (interpreter) AND compiled/executed on the real v5e chip
(nine-view formulation; VMEM-budgeted row tiles). The transposed-conv backward
(dx one matmul per row tile, dw/db revisited-accumulator) and the maxpool
first-max backward are Pallas/exact-torch-parity too. Measured on-chip vs XLA
at the UNet's shapes: single-conv parity at >=128 channels; XLA ~2.5x faster at
the 64-channel 224^2 level (the 128-lane padding wastes half the MXU for any
matmul-form conv, and XLA's native conv handles it better) -> single convs
default to XLA. `fused_convstack2` fuses a whole ConvBatchNorm PAIR in one
VMEM residency (the intermediate never touches HBM) for levels whose image
fits VMEM; measured on-chip (benchmarks/pallas_stack_bench.py, RTT-amortised
100-step scans): parity at down2, 9-21% behind XLA at the weights-heavy
levels — XLA's conv+epilogue fusion is already at the HBM/MXU roofline for
these shapes, so production dispatch stays XLA across the board (a measured
decision, not a gap; the kernels remain the substrate + oracle-tested
reference for future hardware where the trade-off shifts).
"""

from unet_goolenet_tpu.ops.pallas import conv as _conv_mod
from unet_goolenet_tpu.ops.pallas import up1 as _up1_mod
from unet_goolenet_tpu.ops.pallas.conv import (
    fused_conv3x3,
    fused_conv3x3_or_fallback,
    fused_convstack2,
    fused_convstack2_or_fallback,
    conv_transpose2x2_pallas,
    max_pool2x2_pallas,
)
from unet_goolenet_tpu.ops.pallas.up1 import fused_up1_outc


def interpret_mode(on: bool = True) -> None:
    """Force interpreter execution (for CPU tests)."""
    _conv_mod._INTERPRET = on
    _up1_mod._INTERPRET = on


__all__ = [
    "fused_conv3x3",
    "fused_conv3x3_or_fallback",
    "fused_convstack2",
    "fused_convstack2_or_fallback",
    "conv_transpose2x2_pallas",
    "max_pool2x2_pallas",
    "fused_up1_outc",
    "interpret_mode",
]
