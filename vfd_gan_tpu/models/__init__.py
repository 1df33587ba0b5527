"""Model zoo: every model family from the reference (SURVEY.md §2 C8a-C8g).

* ``mygan``     — the proposed U-Net GAN (Generator + DualDisc)
* ``stcnn``     — (2+1)D residual AutoEncoder ("c2plus1d")
* ``xception3d``— Xception-3D mask predictor
* ``convlstm``  — 3-layer ConvLSTM mask predictor
* ``anogan``    — DCGAN video GAN baseline
* ``ganomaly``  — encoder-decoder-encoder anomaly model (2-D per frame)
"""

from vfd_gan_tpu.models.anogan import AnoDiscriminator, AnoGenerator, Z_DIM
from vfd_gan_tpu.models.convlstm import ConvLSTMLayer, ConvLSTMModel
from vfd_gan_tpu.models.ganomaly import (
    DcganDecoder,
    DcganEncoder,
    GanomalyDiscriminator,
    GanomalyGenerator,
    ganomaly_anomaly_score,
)
from vfd_gan_tpu.models.mygan import DualDisc, Generator, SpatialDisc, TemporalDisc
from vfd_gan_tpu.models.stcnn import AutoEncoder, C2Plus1dBlock
from vfd_gan_tpu.models.xception3d import Xception3D


def build_mask_model(name: str, cfg, dtype, axis_name=None, mesh=None):
    """Supervised mask predictors selectable via ``--model``
    (reference dispatch: lib/train_stcnn.py:52-66).  ``mesh`` is only
    consulted by the opt-in ``--moe_experts`` Xception variant (expert
    dispatch over its ``ep`` axis)."""
    if name == "c2plus1d":
        return AutoEncoder(dtype=dtype, axis_name=axis_name)
    if name == "xception":
        return Xception3D(dtype=dtype, axis_name=axis_name,
                          in_channels=cfg.ich,
                          width_mult=getattr(cfg, "xwidth", 1.0),
                          moe_experts=getattr(cfg, "moe_experts", 0),
                          mesh=mesh)
    if name == "clstm":
        return ConvLSTMModel(dtype=dtype, axis_name=axis_name)
    raise ValueError(f"unknown supervised model {name!r}")


__all__ = [
    "AnoDiscriminator", "AnoGenerator", "Z_DIM",
    "ConvLSTMLayer", "ConvLSTMModel",
    "DcganDecoder", "DcganEncoder", "GanomalyDiscriminator",
    "GanomalyGenerator", "ganomaly_anomaly_score",
    "DualDisc", "Generator", "SpatialDisc", "TemporalDisc",
    "AutoEncoder", "C2Plus1dBlock", "Xception3D",
    "build_mask_model",
]
