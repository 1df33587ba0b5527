"""vfd_gan_tpu: TPU-native video forgery detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``umaionigiri/vfd_gan`` (see SURVEY.md): a (2+1)D-convolutional U-Net GAN that
predicts per-pixel forgery masks from 16-frame video clips, adversarially
supervised by dual spatial + temporal(optical-flow) discriminators, plus
comparison models ((2+1)D autoencoder, Xception-3D, ConvLSTM, AnoGAN,
GANomaly) and pixel-level ROC/PR/F1 evaluation.

Everything on the compute path — augmentation, optical flow, morphology,
model forward/backward — runs on device under ``jit``; training is a
``shard_map`` data-parallel step over a ``jax.sharding.Mesh``.
"""

from vfd_gan_tpu.config import Config, parse_args

__version__ = "0.1.0"
__all__ = ["Config", "parse_args", "__version__"]
