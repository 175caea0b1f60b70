"""String-key model registry, mirroring the reference's constructor dispatch
(models/flow_model.py:22-40, models/model.py:170-187, test.py:39-47).

``build(family, key, **kwargs)`` returns an un-initialized flax module.
Families: 'flow', 'occ', 'flow_occ', 'inpainting', 'discriminator'.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Dict[str, Callable[..., Any]]] = {}


def register(family: str, key: str):
    def deco(ctor):
        _REGISTRY.setdefault(family, {})[key] = ctor
        return ctor

    return deco


def build(family: str, key: str, **kwargs):
    try:
        fam = _REGISTRY[family]
    except KeyError:
        raise ValueError(f"Unknown model family: {family!r}; have {sorted(_REGISTRY)}")
    try:
        ctor = fam[key]
    except KeyError:
        raise ValueError(
            f"Unsupported model: {key!r} for family {family!r}; have {sorted(fam)}"
        )
    return ctor(**kwargs)


def available(family: str | None = None):
    if family is None:
        return {f: sorted(ks) for f, ks in _REGISTRY.items()}
    return sorted(_REGISTRY.get(family, {}))


def _populate():
    """Lazy imports so the registry module itself stays dependency-light."""
    from ocflow_tpu.models.simple_flow_net import SimpleFlowNet
    from ocflow_tpu.models.pwc_net import FlowNetCV, PWCNet
    from ocflow_tpu.models.flow_net_s import FlowNetS, FlowNetC

    register("flow", "simple")(SimpleFlowNet)
    register("flow", "pwc")(FlowNetCV)
    register("flow", "pwcnet")(PWCNet)
    register("flow", "flownets")(FlowNetS)
    register("flow", "flownetc")(FlowNetC)

    try:
        from ocflow_tpu.models.flow_net import FlowNet

        register("flow", "flownet")(FlowNet)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.efficient_flow_net import EFlowNet, EFlowNet2

        register("flow", "eflownet")(EFlowNet)
        register("flow", "eflownet2")(EFlowNet2)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.occlusion_nets import (
            SimpleOcclusionNet,
            OcclusionNetS,
            OcclusionNetC,
        )

        register("occ", "simple")(SimpleOcclusionNet)
        register("occ", "occnets")(OcclusionNetS)
        register("occ", "occnetc")(OcclusionNetC)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.flow_occ_nets import (
            SimpleFlowOccNet,
            FlowOccNetS,
            FlowOccNetC,
            FlowOccNetCV,
            FlowOccNetCV2,
            FlowOccNet,
        )

        register("flow_occ", "simple")(SimpleFlowOccNet)
        register("flow_occ", "flowoccnets")(FlowOccNetS)
        register("flow_occ", "flowoccnetc")(FlowOccNetC)
        register("flow_occ", "pwoc")(FlowOccNetCV)
        register("flow_occ", "pwoc2")(FlowOccNetCV2)
        register("flow_occ", "flowoccnet")(FlowOccNet)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.inpainting_net import InpaintingNet

        register("inpainting", "simple")(InpaintingNet)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.ocflownet import OCFlowNet

        register("pipeline", "ocflownet")(OCFlowNet)
    except ImportError:
        pass
    try:
        from ocflow_tpu.models.gated_conv import (
            InpaintSANet,
            InpaintSANetOrg,
            InpaintSADiscriminator,
            InpaintSADiscriminatorOrg,
        )

        register("inpainting", "gated")(InpaintSANet)
        register("inpainting", "gated_org")(InpaintSANetOrg)
        register("discriminator", "gated")(InpaintSADiscriminator)
        register("discriminator", "gated_org")(InpaintSADiscriminatorOrg)
    except ImportError:
        pass


_populate()
