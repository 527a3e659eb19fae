from admmnet_tpu.models.nets import ADMMNet, PhiEstADMMNet
from admmnet_tpu.models.layers import GLayer, HLayer, PhiLayer, ZLayer
from admmnet_tpu.models.peak_head import PeakSearchHead

__all__ = [
    "ADMMNet",
    "PhiEstADMMNet",
    "GLayer",
    "HLayer",
    "PhiLayer",
    "ZLayer",
    "PeakSearchHead",
]
