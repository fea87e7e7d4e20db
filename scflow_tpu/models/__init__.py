"""Model layer: encoders, correlation, GRU, decoders, refiners."""
from .corr import corr_lookup, correlation_pyramid  # noqa: F401
from .decoder import (  # noqa: F401
    RAFTDecoder,
    SCFlowDecoder,
    SCFlowOutputs,
    convex_upsample,
)
from .encoder import RAFTEncoder  # noqa: F401
from .gru import ConvGRU  # noqa: F401
from .heads import FlowMaskEmbed, MotionEncoder, PoseHead, XHead  # noqa: F401
from .layers import (  # noqa: F401
    BasicBlock,
    ConvBlock,
    downsample_flow,
    resize_bilinear_align_corners,
    upsample_flow,
)
from .refiner import RAFTRefiner, SCFlowRefiner  # noqa: F401
from .backbone import Bottleneck, ResNet  # noqa: F401
