"""Loss functions with reference-identical semantics.

Reference definitions: lib/utils.py:59-79 (l2_loss, weighted_bce, bce_smooth)
and ``torch.nn.BCELoss`` used by engines (models/mygannet.py:267,
lib/train_stcnn.py:90, models/anogan.py:138).
"""

from __future__ import annotations

import jax.numpy as jnp

# torch.nn.BCELoss clamps each elementwise log at -100 for stability.
_TORCH_BCE_LOG_FLOOR = -100.0


def l2_loss(x: jnp.ndarray, y: jnp.ndarray, size_average: bool = True):
    """Mean (or elementwise) squared error (reference: lib/utils.py:59-63)."""
    sq = jnp.square(x - y)
    return jnp.mean(sq) if size_average else sq


def weighted_bce(pred: jnp.ndarray, target: jnp.ndarray, pos_weight: float | None = 2.0):
    """Weighted binary cross entropy (reference: lib/utils.py:65-71).

    Quirk preserved: the weight multiplies the *negative* (background) term,
    i.e. it up-weights true-negative confidence, not positives.  Inputs are
    clamped to [1e-8, 1 - 1e-8] before the logs, as in the reference.
    """
    p = jnp.clip(pred, 1e-8, 1.0 - 1e-8)
    if pos_weight is not None:
        ll = target * jnp.log(p) + pos_weight * (1.0 - target) * jnp.log(1.0 - p)
    else:
        ll = target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)
    return -jnp.mean(ll)


def bce(pred: jnp.ndarray, target: jnp.ndarray):
    """``torch.nn.BCELoss`` equivalent: mean over elements, logs clamped at -100."""
    log_p = jnp.maximum(jnp.log(pred), _TORCH_BCE_LOG_FLOOR)
    log_1mp = jnp.maximum(jnp.log1p(-pred), _TORCH_BCE_LOG_FLOOR)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1mp)


def bce_smooth(pred: jnp.ndarray, target: jnp.ndarray, smooth_eps: float | None = None):
    """BCE with optional label smoothing (reference: lib/utils.py:73-79).

    With smoothing the target becomes ``(target + eps) / 2`` — the reference's
    in-place ``add_(eps).div_(2)``.
    """
    eps = smooth_eps or 0.0
    if eps > 0:
        target = (target + eps) / 2.0
    return bce(pred, target)
