"""On-device synthetic data mode (--synthetic_data): stream contract +
engine-loop integration (the soak path, VERDICT r3 item 3)."""

import glob
import json
import os

import numpy as np

from vfd_gan_tpu.data.device_synthetic import DeviceSyntheticIterator


def test_stream_shapes_and_classes():
    it = DeviceSyntheticIterator(4, 8, 40, n_batches=3, seed=0)
    batches = list(it)
    assert len(batches) == 3
    b = batches[0]
    assert b["data"].shape == (4, 8, 40, 40, 3) and b["data"].dtype == np.uint8
    assert b["real"].shape == (4, 8, 40, 40, 3)
    assert b["mask"].shape == (4, 8, 40, 40, 1) and b["mask"].dtype == np.uint8
    assert b["label"].shape == (4, 8)
    assert list(b["index"]) == [0, 1, 2, 3]
    # masks binary {0,255}; both clip classes appear across the stream
    m = np.asarray(b["mask"])
    assert set(np.unique(m)) <= {0, 255}
    labs = np.concatenate([np.asarray(x["label"])[:, 0] for x in batches])
    assert 0.0 in labs and 1.0 in labs
    # fake clips have edge GT; original clips have blank GT and data == real
    for x in batches:
        m = np.asarray(x["mask"])
        lab = np.asarray(x["label"])[:, 0]
        for j in range(4):
            if lab[j] == 1.0:
                assert m[j].sum() > 0
            else:
                assert m[j].sum() == 0
                np.testing.assert_array_equal(np.asarray(x["data"])[j],
                                              np.asarray(x["real"])[j])


def test_stream_is_exactly_resumable():
    """Same (seed, epoch, index) -> bit-identical batch: the property the
    engines' exact-resume checkpointing relies on."""
    a = DeviceSyntheticIterator(2, 8, 24, n_batches=4, seed=3)
    full = [np.asarray(b["data"]) for b in a]          # epoch 0
    full1 = [np.asarray(b["data"]) for b in a]         # epoch 1

    b = DeviceSyntheticIterator(2, 8, 24, n_batches=4, seed=3)
    b.epoch, b.skip_batches = 0, 2                     # resume mid-epoch-0
    tail = [np.asarray(x["data"]) for x in b]
    np.testing.assert_array_equal(tail[0], full[2])
    np.testing.assert_array_equal(tail[1], full[3])
    # next pass shuffles forward, not a repeat
    nxt = [np.asarray(x["data"]) for x in b]
    np.testing.assert_array_equal(nxt[0], full1[0])
    assert not np.array_equal(full[0], full1[0])


def test_trainer_cli_synthetic_mode(tmp_path):
    """Full engine loop (train steps + periodic sweep + checkpoint rule +
    metrics.jsonl) off --synthetic_data, no dataset on disk."""
    from vfd_gan_tpu.cli.trainer import main

    main(["--model", "clstm", "--synthetic_data", "3",
          "--synthetic_test_batches", "2", "--isize", "16", "--nfr", "8",
          "--batchsize", "2", "--ep", "2", "--freq", "3",
          "--compute_dtype", "float32", "--no-tensorboard",
          "--result_root", str(tmp_path)])

    metrics = glob.glob(str(tmp_path / "clstm" / "*" / "*" / "metrics.jsonl"))
    assert metrics, os.listdir(tmp_path)
    recs = [json.loads(ln) for ln in open(metrics[0])]
    assert recs and all(np.isfinite(r["loss/err/train"]) for r in recs)
    # the sweep scored a two-class pixel set (not NaN/degenerate)
    assert any(np.isfinite(r.get("score/roc", float("nan"))) for r in recs)


def test_thick_masks_survive_opening():
    """--synthetic_thick_masks: GT is the filled square (not the 1-px
    boundary ring), so it survives the engines' 5x5 th-plane opening and
    the scored sweep ROC can move (tools/soak.py --learning)."""
    import jax.numpy as jnp

    from vfd_gan_tpu.ops.morphology import video_open

    thin = DeviceSyntheticIterator(4, 8, 40, n_batches=1, seed=0)
    thick = DeviceSyntheticIterator(4, 8, 40, n_batches=1, seed=0,
                                    thick_masks=True)
    bt, bk = next(iter(thin)), next(iter(thick))
    # same clips, fatter GT: thick mask strictly contains the ring
    np.testing.assert_array_equal(np.asarray(bt["data"]),
                                  np.asarray(bk["data"]))
    mt = np.asarray(bt["mask"], np.float32) / 255
    mk = np.asarray(bk["mask"], np.float32) / 255
    assert mk.sum() > mt.sum() > 0
    assert (mk >= mt).all()
    opened_thick = np.asarray(video_open(jnp.asarray(mk), use_pallas=False))
    opened_thin = np.asarray(video_open(jnp.asarray(mt), use_pallas=False))
    assert opened_thick.sum() > 0.5 * mk.sum()   # filled region survives
    # the 1-px ring is mostly erased (vertical edges of slow squares leave
    # a small th-plane remnant; horizontal edges and moving parts vanish)
    assert opened_thin.sum() < 0.3 * mt.sum()
