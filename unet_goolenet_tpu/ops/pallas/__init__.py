"""Pallas TPU kernels (the native-performance layer).

Kernels run compiled on TPU; on CPU they run through the Pallas interpreter
(set `interpret_mode(True)` — the tests do this) so the whole suite stays
hardware-independent.

STATUS: numerics (forward + custom VJPs) are verified against the XLA oracles in
tests/test_pallas.py. On this dev environment's remote TPU the halo-DMA conv
kernel currently trips two Mosaic limitations (HBM DMA slices need 128-aligned
minor dims; a C=128 variant faulted the worker), so production paths default to
the XLA ops — which XLA:TPU already lowers to MXU-optimal convs — and the Pallas
path is opt-in via `fused_conv3x3_or_fallback`/explicit calls. Revisit on real
hardware where kernel crashes don't cost an hour of tunnel recovery.
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
