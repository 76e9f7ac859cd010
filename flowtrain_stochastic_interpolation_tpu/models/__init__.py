"""Model zoo: 2D/3D attention UNets (unconditional + conditional variants).

Mirrors the reference export surface
(``/root/reference/src/flowtrain/models/__init__.py:1-6``): Unet2D, Unet3D,
Unet3DCond (v1), Unet3DCondV2, Unet3DCondV3, plus persistence helpers.
"""

from functools import partial

from flowtrain_stochastic_interpolation_tpu.models.unet import UNet, UNet2D, UNet3D
from flowtrain_stochastic_interpolation_tpu.models.unet_cond import (
    EmbedATb,
    MixATb,
    UNet3DCond,
)
from flowtrain_stochastic_interpolation_tpu.models import layers, attention, resize

# reference-style aliases
Unet2D = UNet2D
Unet3D = UNet3D
Unet3DCond = partial(UNet3DCond, variant="v1")
Unet3DCondV2 = partial(UNet3DCond, variant="v2")
Unet3DCondV3 = partial(UNet3DCond, variant="v3")

__all__ = [
    "UNet",
    "UNet2D",
    "UNet3D",
    "UNet3DCond",
    "Unet3DCondV2",
    "Unet3DCondV3",
    "EmbedATb",
    "MixATb",
    "layers",
    "attention",
    "resize",
]
