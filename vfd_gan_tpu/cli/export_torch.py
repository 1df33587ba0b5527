"""Export an Orbax checkpoint to reference-format ``.pth`` files.

The reverse of the ``.pth`` ingestion path: a run trained here can hand its
weights back to the PyTorch reference — its ``test.py`` checkpoint-list
sweep (``/root/reference/test.py:115-144,163``) or any torch deployment —
as ``torch.save({'epoch', 'state_dict'})`` files matching the reference's
own save format (lib/train_gan.py:52-57).

GAN checkpoints (``{"netG", "netD", ...}``) export a reference-named
``<stem>_netG.pth`` / ``<stem>_netD.pth`` pair; supervised checkpoints
(``{"state", ...}``) export one ``<stem>.pth``.  The model family is
inferred from the parameter-tree structure, same rules as
``cli/evaluate_models.py``.  GANomaly has no loadable torch counterpart
(the reference's copy is dead code with broken imports,
models/ganomaly.py:18-20) and is rejected with a message.

Usage::

    python -m vfd_gan_tpu.cli.export_torch --ckpt <orbax dir> [--out DIR]
"""

from __future__ import annotations

import argparse
import os


def _g_kind(params: dict) -> str:
    if "dconv1" in params and "uconv1" in params:
        return "mygan_generator"
    if "down1" in params:
        return "c2plus1d"                       # --ae generator swap
    if "up1_tkernel" in params:
        return "anogan_generator"
    if "enc1" in params:
        raise SystemExit(
            "GANomaly checkpoints have no reference .pth counterpart "
            "(the reference's GANomaly is dead code, models/ganomaly.py:18-20)")
    raise SystemExit("cannot infer generator type from checkpoint structure")


def _d_kind(params: dict) -> str:
    if "spatdisc" in params:
        return "mygan_dualdisc"
    if "conv1_kernel" in params:
        return "anogan_discriminator"
    raise SystemExit(
        "cannot infer discriminator type from checkpoint structure")


def _sup_kind(params: dict) -> str:
    if "down1" in params:
        return "c2plus1d"
    if "entry1" in params:
        return "xception"
    if "clstm1" in params:
        return "clstm"
    raise SystemExit("cannot infer model type from checkpoint structure")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint directory (a run's weights/<name>)")
    p.add_argument("--out", default=".",
                   help="output directory for the .pth file(s)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vfd_gan_tpu.train.checkpoints import restore_checkpoint
    from vfd_gan_tpu.utils.torch_export import save_pth

    tree = restore_checkpoint(args.ckpt)
    loop = tree.get("loop") or {}
    epoch = int(loop.get("epoch", tree.get("step", 0)))
    stem = os.path.basename(os.path.normpath(args.ckpt))
    os.makedirs(args.out, exist_ok=True)

    def vars_of(net):
        return {"params": net["params"], "batch_stats": net["batch_stats"]}

    written = []
    if "netG" in tree:
        for net, kind_of in (("netG", _g_kind), ("netD", _d_kind)):
            kind = kind_of(tree[net]["params"])
            path = os.path.join(args.out, f"{stem}_{net}.pth")
            save_pth(path, vars_of(tree[net]), kind, epoch=epoch)
            written.append((path, kind))
    elif "state" in tree:
        kind = _sup_kind(tree["state"]["params"])
        path = os.path.join(args.out, f"{stem}.pth")
        save_pth(path, vars_of(tree["state"]), kind, epoch=epoch)
        written.append((path, kind))
    else:
        raise SystemExit("unrecognised checkpoint tree "
                         f"(keys: {sorted(tree)})")
    for path, kind in written:
        print(f"wrote {path}  [{kind}]")


if __name__ == "__main__":
    main()
