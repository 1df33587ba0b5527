"""Pallas bilinear-warp kernel vs the XLA gather path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from vfd_gan_tpu.ops.flow import _bilinear_warp
from vfd_gan_tpu.ops.pallas.warp import bilinear_warp_pallas

rng = np.random.default_rng(17)


def _case(n, h, w, c, scale):
    fields = rng.normal(size=(n, h, w, c)).astype(np.float32)
    fx = (rng.normal(size=(n, h, w)) * scale).astype(np.float32)
    fy = (rng.normal(size=(n, h, w)) * scale).astype(np.float32)
    return jnp.asarray(fields), jnp.asarray(fx), jnp.asarray(fy)


def test_warp_matches_xla_gather_small_flow():
    fields, fx, fy = _case(2, 32, 32, 5, scale=1.5)
    want = _bilinear_warp(fields, fx, fy, use_pallas=False)
    got = bilinear_warp_pallas(fields, fx, fy, interpret=True)
    # bf16 two-hot weights: |err| <~ 2^-8 * |field local variation|
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_warp_matches_xla_gather_large_flow_and_clamping():
    # displacements far beyond the image bounds exercise the clamp path
    fields, fx, fy = _case(1, 16, 48, 3, scale=30.0)
    want = _bilinear_warp(fields, fx, fy, use_pallas=False)
    got = bilinear_warp_pallas(fields, fx, fy, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_warp_nonpow2_height_and_odd_block():
    # H = 24 pads the select tree to 32 and picks a non-16 row block
    fields, fx, fy = _case(1, 24, 40, 5, scale=3.0)
    want = _bilinear_warp(fields, fx, fy, use_pallas=False)
    got = bilinear_warp_pallas(fields, fx, fy, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_warp_v3_matches_v2():
    # the production channel-planar kernel vs the superseded interleaved
    # one: same bf16 rounding points, so they agree to bf16 resolution
    fields, fx, fy = _case(2, 32, 32, 5, scale=4.0)
    v2 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v2")
    v3 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v3")
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v2), atol=1e-2)


def test_warp_v4_matches_v3():
    # the folded-channel-loop experiment (kept for bench comparisons only —
    # measured slower on device, BENCH_NOTES.md round 3) must stay correct
    fields, fx, fy = _case(2, 32, 32, 5, scale=4.0)
    v3 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v3")
    v4 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v4")
    np.testing.assert_allclose(np.asarray(v4), np.asarray(v3), atol=1e-2)


def test_warp_v5_matches_v3_at_128():
    # banded kernel (band 48 at H=128): identical output while every
    # 8-row block's sample rows span <= band-16 (zero vertical weight rows
    # contribute exactly nothing, so the sum is bit-for-bit v3's)
    fields, fx, fy = _case(1, 128, 128, 5, scale=4.0)
    fy = jnp.clip(fy, -11.0, 11.0)   # 8-row block span <= 29 <= band-18
    v3 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v3")
    v5 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v5")
    np.testing.assert_allclose(np.asarray(v5), np.asarray(v3), atol=1e-5)


def test_warp_v5_matches_v3_at_64():
    fields, fx, fy = _case(1, 64, 64, 5, scale=2.0)
    fy = jnp.clip(fy, -3.0, 3.0)     # 8-row block span <= 13 <= band-18
    v3 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v3")
    v5 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v5")
    np.testing.assert_allclose(np.asarray(v5), np.asarray(v3), atol=1e-5)


def test_warp_v5_small_plane_falls_back_to_v3():
    fields, fx, fy = _case(1, 32, 32, 5, scale=4.0)
    v3 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v3")
    v5 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v5")
    np.testing.assert_allclose(np.asarray(v5), np.asarray(v3), atol=0.0)


def test_warp_v5_large_flow_is_clamped_displacement_warp():
    # the wrapper clamps |flow_y| to the per-height bound (11 at H=128), so
    # v5 with arbitrary flows equals v3 with the clamped flow — everywhere,
    # deterministically, independent of block composition
    fields, fx, fy = _case(1, 128, 128, 5, scale=0.5)
    fy = fy.at[0, 0, ::2].set(100.0)      # half of block 0 points 100 rows down
    fy = fy.at[0, 77, 3].set(-55.0)
    v5 = bilinear_warp_pallas(fields, fx, fy, interpret=True, variant="v5")
    want = bilinear_warp_pallas(fields, fx, jnp.clip(fy, -11.0, 11.0),
                                interpret=True, variant="v3")
    np.testing.assert_allclose(np.asarray(v5), np.asarray(want), atol=1e-5)


def test_warp_integer_flow_is_near_exact():
    # integer displacements make the two-hot weights exactly {0, 1}; the
    # matmul then moves exact field values (bf16 rounding of 0/1 is exact)
    fields = jnp.asarray(rng.normal(size=(1, 16, 16, 2)).astype(np.float32))
    fx = jnp.full((1, 16, 16), 3.0, jnp.float32)
    fy = jnp.full((1, 16, 16), -2.0, jnp.float32)
    want = _bilinear_warp(fields, fx, fy, use_pallas=False)
    got = bilinear_warp_pallas(fields, fx, fy, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
