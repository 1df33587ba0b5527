"""Self-calibrating sharded-vs-replica equivalence gates.

The dp/sp/tp equivalence checks (tests/test_dp_equivalence.py, the
``dryrun_multichip`` driver gate) compare a sharded train step against a
1-device replica.  Round 3 used constants calibrated at one config
(flow_scale 1.0) — a trap: legitimate default changes shifted the
reduction-reassociation noise past the fixed rtol while signalling nothing
wrong (VERDICT r3 weak-7).

This module measures the noise floor AT TEST TIME instead: run the same
step on an intermediate sharding (e.g. dp2) as a YARDSTICK.  The yardstick
vs the replica differs only by cross-device reduction reassociation — one
live sample of exactly the noise the real comparison contains.  The gate
then demands the candidate (full mesh) stay within ``K x yardstick``,
floored (yardstick can be luckily tiny) and CAPPED (so a bug that corrupts
yardstick and candidate identically cannot inflate the tolerance past the
semantic-bug scale: unsynced gradients / per-replica BN statistics move
metrics by O(10-100%) rel and params by O(weight scale 2e-2) — orders
above every cap here).
"""

from __future__ import annotations

import numpy as np

# Safety factor over the single noise sample, and the envelope bounds.
# Caps sit ~10x below the smallest semantic-bug signal; floors sit at the
# f32 single-step reassociation scale measured across round-2/3 configs.
K = 10.0
REL_FLOOR, REL_CAP = 2e-4, 1e-2
ABS_FLOOR, ABS_CAP = 1e-4, 2e-3


def max_rel_delta(m1: dict, m2: dict) -> float:
    """Largest relative difference across two metric dicts."""
    worst = 0.0
    for k in m1:
        a, b = float(m1[k]), float(m2[k])
        worst = max(worst, abs(a - b) / max(abs(a), abs(b), 1e-6))
    return worst


def max_abs_delta(leaves1, leaves2) -> float:
    """Largest absolute elementwise difference across two leaf lists."""
    return max((float(np.max(np.abs(a - b))) for a, b in
                zip(leaves1, leaves2)), default=0.0)


def calibrated_tols(yard_metrics: float, yard_leaves: float
                    ) -> tuple[float, float]:
    """(rtol for metrics, atol for leaves) from measured yardstick deltas."""
    rtol = float(np.clip(K * yard_metrics, REL_FLOOR, REL_CAP))
    atol = float(np.clip(K * yard_leaves, ABS_FLOOR, ABS_CAP))
    return rtol, atol


def assert_replica_equivalence(replica, yardstick, candidate,
                               label: str = "") -> tuple[float, float]:
    """Gate: ``candidate`` ~= ``replica`` within tolerances calibrated from
    ``yardstick`` ~= ``replica``.  Each argument is ``(metrics_dict,
    leaf_list)``.  Returns the tolerances used (for logging)."""
    rm, rl = replica
    ym, yl = yardstick
    cm, cl = candidate
    assert set(rm) == set(cm) == set(ym)
    for k, v in rm.items():
        assert np.isfinite(v) and np.isfinite(cm[k]), (label, k)
    # a candidate/yardstick missing trailing state leaves must fail the
    # gate, not silently shorten the elementwise zip below
    assert len(rl) == len(cl) == len(yl), \
        (label, "leaf count", len(rl), len(cl), len(yl))
    rtol, atol = calibrated_tols(max_rel_delta(rm, ym),
                                 max_abs_delta(rl, yl))
    for k in rm:
        np.testing.assert_allclose(
            cm[k], rm[k], rtol=rtol, atol=1e-6,
            err_msg=f"{label} metric {k} (rtol calibrated {rtol:.2e})")
    for i, (a, b) in enumerate(zip(rl, cl)):
        np.testing.assert_allclose(
            a, b, atol=atol,
            err_msg=f"{label} leaf {i} (atol calibrated {atol:.2e})")
    return rtol, atol
