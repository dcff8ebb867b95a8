"""flax.linen building blocks mirroring the reference's model zoo, NHWC layout."""

from unet_goolenet_tpu.nn.init import torch_conv_init, torch_bias_init, torch_linear_init
from unet_goolenet_tpu.nn.blocks import (
    ConvBatchNorm,
    ConvStack,
    DownBlock,
    UpBlock,
    UpBlockAlig,
    CoordAtt,
    CoordAtt3,
    DeepBlock,
    Dilation,
    DepthwiseSeparableConv,
)
from unet_goolenet_tpu.nn.transformer import (
    FeedForward,
    SelfAttention,
    CrossAttention,
    MultiAttention,
    TransformerDecoder,
)

__all__ = [
    "torch_conv_init",
    "torch_bias_init",
    "torch_linear_init",
    "ConvBatchNorm",
    "ConvStack",
    "DownBlock",
    "UpBlock",
    "UpBlockAlig",
    "CoordAtt",
    "CoordAtt3",
    "DeepBlock",
    "Dilation",
    "DepthwiseSeparableConv",
    "FeedForward",
    "SelfAttention",
    "CrossAttention",
    "MultiAttention",
    "TransformerDecoder",
]
