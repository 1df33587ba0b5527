"""Post-training serving optimisations: BN folding + int8 quantisation.

Beyond-reference capability (the reference serves nothing — its `test.py`
only sweeps checkpoints for curves).  The serving forward here is the MyGAN
generator in inference mode; v5e int8 matmul peak is 2x bf16, so the conv
stack — where all the FLOPs are — runs int8 with per-output-channel weight
scales and per-site calibrated activation scales (see quant/qmygan.py).
"""

from vfd_gan_tpu.quant.fold import fold_generator_bn  # noqa: F401
