"""Model zoo (L2): flax modules, NHWC, selected by string key via registry."""

from ocflow_tpu.models.registry import build, available, register
from ocflow_tpu.models.simple_flow_net import SimpleFlowNet
from ocflow_tpu.models.pwc_net import FlowNetCV, PWCNet
from ocflow_tpu.models.flow_net_s import FlowNetS, FlowNetC
from ocflow_tpu.models.flow_net import FlowNet
from ocflow_tpu.models.efficient_flow_net import EFlowNet, EFlowNet2
from ocflow_tpu.models.occlusion_nets import (
    SimpleOcclusionNet,
    OcclusionNetS,
    OcclusionNetC,
)
from ocflow_tpu.models.flow_occ_nets import (
    SimpleFlowOccNet,
    FlowOccNetS,
    FlowOccNetC,
    FlowOccNetCV,
    FlowOccNetCV2,
    FlowOccNet,
)
from ocflow_tpu.models.inpainting_net import InpaintingNet
from ocflow_tpu.models.ocflownet import OCFlowNet
from ocflow_tpu.models.gated_conv import (
    InpaintSANet,
    InpaintSANetOrg,
    InpaintSADiscriminator,
    InpaintSADiscriminatorOrg,
    SelfAttention,
)

__all__ = [
    "build",
    "available",
    "register",
    "SimpleFlowNet",
    "FlowNetCV",
    "PWCNet",
    "FlowNetS",
    "FlowNetC",
    "FlowNet",
    "EFlowNet",
    "EFlowNet2",
    "SimpleOcclusionNet",
    "OcclusionNetS",
    "OcclusionNetC",
    "SimpleFlowOccNet",
    "FlowOccNetS",
    "FlowOccNetC",
    "FlowOccNetCV",
    "FlowOccNetCV2",
    "FlowOccNet",
    "InpaintingNet",
    "InpaintSANet",
    "InpaintSANetOrg",
    "InpaintSADiscriminator",
    "InpaintSADiscriminatorOrg",
    "SelfAttention",
    "OCFlowNet",
]
