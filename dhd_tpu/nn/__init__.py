from .layers import (
    ASPP,
    BasicBlock,
    ConvBNReLU,
    Mlp,
    SELayer,
    upsample_bilinear_align,
)
from .resnet import CustomResNet, ResNet50, TinyCNN
from .fpn import CustomFPN, FPN_LSS
from .unet import UNet
from .depthnet import DepthNet, HeightNet
from .sfa import SFA
from .occ_head import OccHead
from .swin import SwinTransformer

__all__ = [
    "ASPP", "BasicBlock", "ConvBNReLU", "Mlp", "SELayer",
    "upsample_bilinear_align",
    "CustomResNet", "ResNet50", "TinyCNN",
    "CustomFPN", "FPN_LSS", "UNet",
    "DepthNet", "HeightNet", "SFA", "OccHead", "SwinTransformer",
]
