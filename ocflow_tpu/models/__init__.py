"""Model zoo (L2): flax modules, NHWC, selected by string key via registry."""

from ocflow_tpu.models.registry import build, available, register
from ocflow_tpu.models.simple_flow_net import SimpleFlowNet
from ocflow_tpu.models.pwc_net import FlowNetCV
from ocflow_tpu.models.flow_net_s import FlowNetS, FlowNetC

__all__ = [
    "build",
    "available",
    "register",
    "SimpleFlowNet",
    "FlowNetCV",
    "FlowNetS",
    "FlowNetC",
]
