"""Pallas TPU kernels for the hot ops."""

from .dw_conv import depthwise_conv3d, dw_conv_supported

__all__ = ["depthwise_conv3d", "dw_conv_supported"]
