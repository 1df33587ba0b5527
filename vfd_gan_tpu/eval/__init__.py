from vfd_gan_tpu.eval.metrics import evaluate, pr_auc, roc_auc_with_eer

__all__ = ["evaluate", "pr_auc", "roc_auc_with_eer"]
