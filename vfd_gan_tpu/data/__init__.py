from vfd_gan_tpu.data.dataset import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.video_io import (
    count_frames,
    mask_edge_frames,
    read_clip,
    write_video,
)

__all__ = [
    "ClipBatchIterator",
    "MdfVideoDataset",
    "count_frames",
    "mask_edge_frames",
    "read_clip",
    "write_video",
]
