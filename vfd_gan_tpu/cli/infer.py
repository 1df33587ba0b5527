"""Inference/serving CLI: stream a video through a trained mask model.

A deployment capability beyond the reference's metric-only eval: windows an
input video into ``nfr``-frame clips, runs the (jitted, fixed-shape) mask
model over them, and writes

* ``<out>/mask.mp4``    — the predicted per-pixel forgery-mask video
* ``<out>/overlay.mp4`` — input with the thresholded+opened mask burned in
  red (threshold 0.5 + 5x5 opening, the reference's post-processing,
  lib/utils.py:139-152)
* ``<out>/scores.csv``  — per-frame mean mask score (a clip/frame-level
  forgery signal)

Model dispatch and checkpoint loading follow the eval CLI (substring rules,
test.py:115-144); reference ``.pth`` checkpoints load through
``--torch_ckpt`` using the torch_compat converters.
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

import jax
import jax.numpy as jnp

from vfd_gan_tpu.data.video_io import count_frames, read_clip, write_video
from vfd_gan_tpu.ops.image import threshold
from vfd_gan_tpu.ops.morphology import video_open


def build_parser():
    p = argparse.ArgumentParser(description="stream a video into mask output")
    p.add_argument("--video", required=True)
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (or .pth with --torch_ckpt)")
    p.add_argument("--torch_ckpt", action="store_true",
                   help="treat --ckpt as a reference .pth file")
    p.add_argument("--out", required=True)
    p.add_argument("--isize", type=int, default=128)
    p.add_argument("--morph_plane", choices=("th", "hw"), default="th",
                   help="opening plane: th = reference cv2 quirk (PARITY.md), hw = per-frame")
    p.add_argument("--nfr", type=int, default=16)
    p.add_argument("--quant", choices=("none", "int8"), default="none",
                   help="int8: BN-fold + post-training-quantise the MyGAN "
                        "generator's convs (quant/qmygan.py)")
    p.add_argument("--calib_plist", default="",
                   help="videos for int8 activation calibration")
    p.add_argument("--calib_clips", type=int, default=8)
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="compute dtype (params stay float32; ignored with "
                        "--quant int8) — bfloat16 is the measured-fastest "
                        "float dtype on v5e (BENCH_NOTES.md)")
    return p


def _load(ckpt: str, torch_ckpt: bool):
    from vfd_gan_tpu.cli.evaluate_models import load_model
    if not torch_ckpt:
        return load_model(ckpt, None)
    # reference .pth path: infer converter kind from the filename
    from vfd_gan_tpu.utils import torch_compat as tc
    if "netG" in ckpt or "ganbase" in ckpt or "mygan" in ckpt:
        from vfd_gan_tpu.models.mygan import Generator
        model, kind, name = Generator(), "mygan_generator", "Propose model[GAN]"
    elif "c2plus1d" in ckpt:
        from vfd_gan_tpu.models.stcnn import AutoEncoder
        model, kind, name = AutoEncoder(), "c2plus1d", "(2+1)DCNN"
    elif "xception" in ckpt:
        from vfd_gan_tpu.models.xception3d import Xception3D
        model, kind, name = Xception3D(), "xception", "XceptionNet"
    elif "clstm" in ckpt:
        from vfd_gan_tpu.models.convlstm import ConvLSTMModel
        model, kind, name = ConvLSTMModel(), "clstm", "ConvLSTM"
    else:
        raise SystemExit(f"cannot infer model type from path: {ckpt}")
    variables = jax.tree_util.tree_map(jnp.asarray, tc.load_pth(ckpt, kind))
    return model, variables, name


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    model, variables, name = _load(args.ckpt, args.torch_ckpt)
    if args.quant == "int8":
        from vfd_gan_tpu.quant.qmygan import build_int8_serving
        variables, fwd = build_int8_serving(
            model, variables, isize=args.isize, nfr=args.nfr,
            calib_plist=args.calib_plist, calib_clips=args.calib_clips)
        name += " [int8]"
        apply_fn = jax.jit(fwd)
    else:
        if args.dtype == "bfloat16":
            model = model.clone(dtype=jnp.bfloat16)
            name += " [bf16]"
        apply_fn = jax.jit(lambda v, x: model.apply(v, x, False))
    print(f"model: {name}")
    post_fn = jax.jit(
        lambda p: video_open(threshold(p), args.morph_plane))

    n_frames = count_frames(args.video)
    n_clips = n_frames // args.nfr
    if n_clips == 0:
        raise SystemExit(f"video too short: {n_frames} < {args.nfr} frames")

    masks, overlays, scores = [], [], []
    for c in range(n_clips):
        frames = read_clip(args.video, c * args.nfr, args.nfr,
                           resize_to=(args.isize, args.isize))
        x = jnp.asarray(frames[None]).astype(jnp.float32) / 255.0 * 2.0 - 1.0
        pred = apply_fn(variables, x)
        opened = post_fn(pred)
        p = np.asarray(pred)[0, ..., 0]                     # (T, H, W)
        m = np.asarray(opened)[0, ..., 0]
        masks.append((p * 255).astype(np.uint8))
        overlay = frames.copy()
        overlay[..., 0] = np.where(m > 0.5, 255, overlay[..., 0])
        overlays.append(overlay)
        scores.extend(p.reshape(args.nfr, -1).mean(axis=1).tolist())

    mask_video = np.concatenate(masks)[..., None].repeat(3, axis=-1)
    write_video(os.path.join(args.out, "mask.mp4"), mask_video)
    write_video(os.path.join(args.out, "overlay.mp4"),
                np.concatenate(overlays))
    with open(os.path.join(args.out, "scores.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "mean_mask_score"])
        for i, s in enumerate(scores):
            w.writerow([i, f"{s:.6f}"])
    print(f"wrote {args.out}/mask.mp4, overlay.mp4, scores.csv "
          f"({n_clips} clips, {len(scores)} frames)")


if __name__ == "__main__":
    main()
