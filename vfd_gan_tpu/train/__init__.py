from vfd_gan_tpu.train.state import NetState, make_adam
from vfd_gan_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

__all__ = ["NetState", "make_adam", "restore_checkpoint", "save_checkpoint"]
