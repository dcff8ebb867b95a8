"""unet_goolenet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) two-stage breast-ultrasound
lesion grading framework.

Re-implements the full capability surface of the reference BY-Elysia/UNet-GooLeNet
(a PyTorch research codebase) as an idiomatic TPU framework:

  * stage 1: attention-gated UNet with a dual-stream transformer bottleneck
    (reference: 分割/nets/basicUnet.py, 分割/nets/tasks.py)
  * stage 2: GoogLeNet (Inception + aux heads) over mask-derived ROI crops
    (reference: 分类/ROI_main.py:86-95)
  * fused on-device segment -> bbox -> crop -> classify pipeline with zero host
    round trips (reference path: 分类/test.py, 分类/util/roi.py)

Layout convention: all image tensors are NHWC; conv weights are HWIO.
"""

__version__ = "0.1.0"
