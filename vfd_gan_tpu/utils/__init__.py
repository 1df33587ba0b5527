from vfd_gan_tpu.utils.init import (
    bn_scale_init,
    dcgan_normal_init,
    torch_default_init,
)

__all__ = ["bn_scale_init", "dcgan_normal_init", "torch_default_init"]
