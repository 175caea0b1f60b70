"""Loss library: pure jnp functions (all jittable, NHWC layout)."""

from ocflow_tpu.losses.photometric import (
    robust_l1,
    photometric_error,
    census_transform,
    census_loss,
)
from ocflow_tpu.losses.smoothness import (
    image_gradient,
    edge_aware_smoothness_loss,
    first_order_smoothness_loss,
    second_order_smoothness_loss,
)
from ocflow_tpu.losses.classification import (
    binary_cross_entropy,
    focal_bce_loss,
)
from ocflow_tpu.losses.reconstruction import (
    masked_l1_loss,
    recon_loss,
)
from ocflow_tpu.losses.gan import sn_dis_loss, sn_gen_loss

__all__ = [
    "robust_l1",
    "photometric_error",
    "census_transform",
    "census_loss",
    "image_gradient",
    "edge_aware_smoothness_loss",
    "first_order_smoothness_loss",
    "second_order_smoothness_loss",
    "binary_cross_entropy",
    "focal_bce_loss",
    "masked_l1_loss",
    "recon_loss",
    "sn_dis_loss",
    "sn_gen_loss",
]
