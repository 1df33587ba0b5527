"""Dataset path derivation, clip indexing quirks, decode, and batching."""


import numpy as np
import pytest

from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.dataset import derive_triple
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.data.video_io import count_frames, read_clip


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vids"))
    return make_dataset(root, n_train=2, n_test=1, frames=24, size=48)


def test_derive_triple():
    data, real, mask = derive_triple("/data/vids/clip7/[Fake]clip7.mp4")
    assert real == "/data/vids/clip7/[Original]clip7.mp4"
    assert mask == "/data/vids/clip7/[Mask]clip7.mp4"


def test_count_and_read(tiny_dataset):
    train_list, _ = tiny_dataset
    with open(train_list) as f:
        first = f.readline().strip()
    assert count_frames(first) == 24
    clip = read_clip(first, 8, 8)
    assert clip.shape == (8, 48, 48, 3) and clip.dtype == np.uint8
    resized = read_clip(first, 0, 4, resize_to=(32, 32))
    assert resized.shape == (4, 32, 32, 3)


def test_mask_prep_is_edge_map(tiny_dataset):
    train_list, _ = tiny_dataset
    with open(train_list) as f:
        fake = f.readline().strip()
    mask_path = derive_triple(fake)[2]
    m = read_clip(mask_path, 0, 4, mask=True)
    assert m.shape == (4, 48, 48, 1)
    vals = np.unique(m)
    assert set(vals.tolist()) <= {0, 255}
    # edges, not filled regions: far fewer white pixels than the square area
    assert 0 < (m > 0).mean() < 0.2


def test_window_indexing_quirk(tiny_dataset):
    # 24 frames, nfr=8 -> 3 windows/video; reference quirk: index k maps to
    # window k-1 (clamped), so index 0 and 1 both hit frame 0
    # (lib/data.py:84-89).
    train_list, _ = tiny_dataset
    ds = MdfVideoDataset(train_list, nfr=8)
    assert len(ds) == 4 * 3  # 2 fake + 2 original entries x 3 windows
    assert ds._records[0].first_frame == 0
    assert ds._records[1].first_frame == 0
    assert ds._records[2].first_frame == 8
    # boundary index: cum[0] == 3 >= 3 selects video 0's *last* window —
    # so the final window is reachable only at the boundary and the next
    # video's window 0 lands at index cum+1 (reference boundary arithmetic)
    assert (ds._records[3].video_idx, ds._records[3].first_frame) == (0, 16)
    assert (ds._records[4].video_idx, ds._records[4].first_frame) == (1, 0)


def test_fake_vs_original_items(tiny_dataset):
    train_list, _ = tiny_dataset
    ds = MdfVideoDataset(train_list, nfr=8, staging=32)
    fake_idx = next(i for i in range(len(ds)) if ds.is_fake(i))
    orig_idx = next(i for i in range(len(ds)) if not ds.is_fake(i))

    d, r, m, lb = ds[fake_idx]
    assert d.shape == (8, 32, 32, 3) and m.shape == (8, 32, 32, 1)
    assert lb.tolist() == [1.0] * 8
    assert not np.array_equal(d, r)          # fake differs from original

    d, r, m, lb = ds[orig_idx]
    assert np.array_equal(d, r)              # real == data (lib/data.py:75)
    assert m.max() == 0                      # zero mask (lib/data.py:72)
    assert lb.tolist() == [0.0] * 8


def test_batch_iterator_workers_match_single_thread(tiny_dataset):
    train_list, _ = tiny_dataset
    ds = MdfVideoDataset(train_list, nfr=8, staging=32)
    single = list(ClipBatchIterator(ds, 3, shuffle=False))
    multi = list(ClipBatchIterator(ds, 3, shuffle=False, workers=3))
    assert len(single) == len(multi)
    for a, b in zip(single, multi):
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_batch_iterator_shapes_and_drop_last(tiny_dataset):
    train_list, _ = tiny_dataset
    ds = MdfVideoDataset(train_list, nfr=8, staging=32)
    it = ClipBatchIterator(ds, batch_size=5, seed=0)
    batches = list(it)
    assert len(batches) == len(ds) // 5      # drop_last
    b = batches[0]
    assert b["data"].shape == (5, 8, 32, 32, 3)
    assert b["mask"].shape == (5, 8, 32, 32, 1)
    assert b["label"].shape == (5, 8)
