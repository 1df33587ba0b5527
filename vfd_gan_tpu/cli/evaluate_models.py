"""Standalone multi-checkpoint comparison eval — reference ``test.py`` UX.

Reference semantics (test.py:146-206) preserved:

* ``--test_data_path`` (path list) + ``--test_model_list_path`` (text file of
  checkpoint paths), ``--metric roc|pr``.
* Loader: test transforms, batchsize, drop_last, **shuffle=False**
  (test.py:159 — unlike the in-training sweeps).
* Model dispatch by checkpoint-path substring: 'ganbase'/'mygan' -> the GAN
  generator, 'c2plus1d' -> AutoEncoder, 'xception' -> Xception3D,
  'clstm' -> ConvLSTMModel (test.py:115-144).
* Scores are the **raw sigmoid masks** (not morphologised — test.py:181-186;
  threshold/morphology still computed, only for optional image dumps).
* All models' ROC (or PR) curves are overlaid on one shared figure saved as
  ``{metric}_curve.png``; per-model AUC/EER in the legend; F1 printed.

The argument-passing bugs in the reference's local evaluate() dispatch
(test.py:43,47) are not reproduced.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset  # noqa: E402
from vfd_gan_tpu.eval.metrics import evaluate, pr_auc, roc_auc_with_eer  # noqa: E402
from vfd_gan_tpu.ops.augment import normalize_clips  # noqa: E402
from vfd_gan_tpu.train.checkpoints import restore_checkpoint  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser(description="multi-checkpoint comparison eval")
    p.add_argument("--gpu", type=str, default="0")  # compat, unused
    p.add_argument("--isize", type=int, default=128)
    p.add_argument("--nfr", type=int, default=16)
    p.add_argument("--batchsize", type=int, default=4)
    p.add_argument("--metric", type=str, default="roc", choices=["roc", "pr"])
    p.add_argument("--test_data_path", type=str, required=True)
    p.add_argument("--test_model_list_path", type=str, required=True)
    p.add_argument("--result_path", type=str, default="results/test")
    return p


# Reference path-substring dispatch table (test.py:115-144), in the
# reference's if/elif order; "mygan" added as a synonym since this
# framework's run dirs use the model name rather than "ganbase".
_SUBSTRING_DISPATCH = (
    ("ganbase", "mygan_generator", "Propose model[GAN]"),
    ("mygan", "mygan_generator", "Propose model[GAN]"),
    ("c2plus1d", "c2plus1d", "(2+1)DCNN"),
    ("xception", "xception", "XceptionNet"),
    ("clstm", "clstm", "ConvLSTM"),
)


def _build(kind):
    if kind == "mygan_generator":
        from vfd_gan_tpu.models.mygan import Generator
        return Generator()
    if kind == "c2plus1d":
        from vfd_gan_tpu.models.stcnn import AutoEncoder
        return AutoEncoder()
    if kind == "xception":
        from vfd_gan_tpu.models.xception3d import Xception3D
        return Xception3D()
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel
    return ConvLSTMModel()


def _model_from_params(params):
    """Structure-based dispatch for Orbax checkpoints (authoritative since
    the parameter tree is already loaded; covers --ae GAN checkpoints whose
    generator is the AutoEncoder, models/mygannet.py:224-230)."""
    if "dconv1" in params and "uconv1" in params:
        from vfd_gan_tpu.models.mygan import Generator

        # width from the tree, not the default: --ngf runs must load too
        ngf = params["dconv1"]["stconv"]["temporal_kernel"].shape[-1]
        return Generator(ngf=int(ngf)), "Propose model[GAN]"
    if "down1" in params:
        return _build("c2plus1d"), "(2+1)DCNN"
    if "entry1" in params:
        return _build("xception"), "XceptionNet"
    if "clstm1" in params:
        return _build("clstm"), "ConvLSTM"
    raise SystemExit("cannot infer model type from checkpoint structure")


def load_model(ckpt_path: str, args):
    """Checkpoint restore + model dispatch.

    The model list may freely mix this framework's Orbax run directories
    and reference ``.pth`` files (test.py:163).  ``.pth`` paths use the
    reference's path-substring dispatch (test.py:115-144) routed through
    ``torch_compat.load_pth`` (``module.`` DataParallel prefixes handled);
    Orbax checkpoints dispatch on parameter-tree structure, which also
    resolves ``--ae`` runs stored under a mygan run dir.
    """
    if ckpt_path.endswith((".pth", ".pt")):
        from vfd_gan_tpu.utils.torch_compat import load_pth
        for sub, kind, name in _SUBSTRING_DISPATCH:
            if sub in ckpt_path:
                return _build(kind), load_pth(ckpt_path, kind), name
        raise SystemExit("Weight path not found.")   # reference: test.py:134
    tree = restore_checkpoint(ckpt_path)
    # engines save either {"netG": state, ...} (GANs) or {"state": ...}
    net = tree.get("netG", tree.get("state"))
    variables = {"params": net["params"], "batch_stats": net["batch_stats"]}
    model, name = _model_from_params(net["params"])
    return model, variables, name


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.result_path, exist_ok=True)

    ds = MdfVideoDataset(args.test_data_path, args.nfr, staging=args.isize)
    loader = ClipBatchIterator(ds, args.batchsize, shuffle=False)
    model_list = [ln.rstrip() for ln in open(args.test_model_list_path)
                  if ln.strip()]

    fig = plt.figure()
    results = {}
    for ckpt in model_list:
        print(f"\n {ckpt}")
        model, variables, name = load_model(ckpt, args)
        apply_fn = jax.jit(lambda v, x: model.apply(v, x, False))

        gts, predicts = [], []
        for batch in loader:
            data, _, gt = normalize_clips(jnp.asarray(batch["data"]),
                                          jnp.asarray(batch["real"]),
                                          jnp.asarray(batch["mask"]))
            pred = apply_fn(variables, data)
            gts.append(np.asarray(gt))
            predicts.append(np.asarray(pred))      # raw sigmoid scores

        labels = np.asarray(np.stack(gts), dtype=np.int32).ravel()
        scores = np.asarray(np.stack(predicts)).ravel()

        eer = None
        if args.metric == "roc":
            area, eer, fpr, tpr = roc_auc_with_eer(labels, scores)
            plt.plot(fpr, tpr, lw=2,
                     label="%s: (AUC = %0.2f, EER = %0.2f)" % (name, area, eer))
            plt.plot([eer], [1 - eer], marker="o", markersize=5, color="navy")
        else:
            area, precision, recall = pr_auc(labels, scores)
            plt.plot(recall, precision, lw=2,
                     label="%s: (AUC = %0.2f)" % (name, area))
        f1 = evaluate(labels, scores, metric="f1_score")
        results[name] = {"auc": area, "f1": f1, "eer": eer}
        print("%s / %s == %f" % (ckpt, args.metric, area))
        print("%s / f1 == %f" % (ckpt, f1))

    plt.plot([0, 1], [1, 0], color="navy", lw=1, linestyle=":")
    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.05])
    if args.metric == "roc":
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.title("Receiver operating characteristic")
    else:
        plt.xlabel("Recall")
        plt.ylabel("Precision")
        plt.title("Precision-Recall Curve")
    plt.legend(loc="lower right")
    out = os.path.join(args.result_path, f"{args.metric}_curve.png")
    plt.savefig(out)
    plt.close(fig)
    print(f"saved {out}")
    return results


if __name__ == "__main__":
    main()
