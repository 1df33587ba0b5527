"""Pure JAX/Pallas ops used across models, engines and the data path.

Layout convention: video tensors are channel-last ``(B, T, H, W, C)``
("BTHWC") throughout the framework — the TPU-friendly layout (lane dimension
= channels).  The reference uses torch's ``(B, C, T, H, W)``; converters live
in :mod:`vfd_gan_tpu.ops.image`.
"""

from vfd_gan_tpu.ops.losses import (
    bce,
    bce_smooth,
    l2_loss,
    weighted_bce,
)
from vfd_gan_tpu.ops.image import (
    gray2rgb,
    minmax_normalize,
    rgb_to_gray,
    threshold,
    to_channel_first,
    to_channel_last,
)
from vfd_gan_tpu.ops.morphology import morphology_open, video_open

__all__ = [
    "bce",
    "bce_smooth",
    "l2_loss",
    "weighted_bce",
    "gray2rgb",
    "minmax_normalize",
    "rgb_to_gray",
    "threshold",
    "to_channel_first",
    "to_channel_last",
    "morphology_open",
    "video_open",
]
