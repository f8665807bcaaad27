from .layers import ConvNormAct, Norm, Scale, activation_from_cfg
from .blocks import FastBlock, FasterBlock, FastestBlock
from .lfd_resnet import LFDResNet, lfd_resnet_output_info
from .resnet import ResNet, resnet_output_info
from .necks import SimpleNeck, FPN, SimpleFPN
from .heads import LFDHead, LFDHeadV1, FCOSHead
from .detector import LFD, DetectionNet, pad_to_multiple
from .lfdv2 import LFDv2, LFDv2Q
from .fcos import FCOS, FCOSv1

__all__ = [
    "ConvNormAct", "Norm", "Scale", "activation_from_cfg",
    "FastBlock", "FasterBlock", "FastestBlock",
    "LFDResNet", "lfd_resnet_output_info",
    "ResNet", "resnet_output_info",
    "SimpleNeck", "FPN", "SimpleFPN",
    "LFDHead", "LFDHeadV1", "FCOSHead",
    "LFD", "DetectionNet", "pad_to_multiple",
    "LFDv2", "LFDv2Q", "FCOS", "FCOSv1",
]
