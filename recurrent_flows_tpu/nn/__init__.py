from .layers import (
    ActFun,
    NormLayer,
    SimpleParamNet,
    conv2d,
    act,
)
from .convlstm import ConvLSTMCell, conv_lstm_scan
from .vgg import VGGDownscaler, VGGUpscaler

__all__ = [
    "ActFun",
    "NormLayer",
    "SimpleParamNet",
    "conv2d",
    "act",
    "ConvLSTMCell",
    "conv_lstm_scan",
    "VGGDownscaler",
    "VGGUpscaler",
]
