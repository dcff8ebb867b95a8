"""XLA-level operator layer (NHWC).

Every op here has a plain `jax.lax`/`jnp` implementation that serves as the parity
oracle; hot ops additionally have Pallas TPU kernels under `ops.pallas` selected via
`impl=` arguments or the global default in `ops.dispatch`.
"""

from unet_goolenet_tpu.ops.conv import (
    conv2d,
    conv_transpose2x2,
    fold_batchnorm,
    conv2d_bn_act,
)
from unet_goolenet_tpu.ops.pool import (
    max_pool2d,
    avg_pool2d,
    global_avg_pool,
    global_max_pool,
    adaptive_avg_pool,
)
from unet_goolenet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_valid,
    resize_nearest,
)
from unet_goolenet_tpu.ops.wavelet import (
    haar_dwt2,
    wavelet_enhance,
    wavelet_enhance_padded,
)
from unet_goolenet_tpu.ops.bbox import mask_to_bbox, crop_and_resize, roi_from_mask

__all__ = [
    "conv2d",
    "conv_transpose2x2",
    "fold_batchnorm",
    "conv2d_bn_act",
    "max_pool2d",
    "avg_pool2d",
    "global_avg_pool",
    "global_max_pool",
    "adaptive_avg_pool",
    "resize_bilinear",
    "resize_bilinear_valid",
    "resize_nearest",
    "haar_dwt2",
    "wavelet_enhance",
    "wavelet_enhance_padded",
    "mask_to_bbox",
    "crop_and_resize",
    "roi_from_mask",
]
