"""Pallas patch-gather kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.ops.patches import (
    PSIZE,
    gather_patches_pallas,
    gather_patches_xla,
)


def test_pallas_gather_matches_xla(rng):
    Ha, Wa = 200, 300
    n = 37  # deliberately not a multiple of the kernel's per-step K
    atlas = jnp.asarray(rng.uniform(0, 255, (Ha, Wa)).astype(np.float32))
    corner = jnp.asarray(
        np.stack(
            [rng.integers(0, Ha - PSIZE, n), rng.integers(0, Wa - PSIZE, n)], -1
        ).astype(np.int32)
    )
    expected = np.asarray(gather_patches_xla(atlas, corner))
    got = np.asarray(gather_patches_pallas(atlas, corner, interpret=True))
    assert got.shape == (n, PSIZE, PSIZE)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-4)


def test_pallas_gather_uint8_and_bf16(rng):
    """The atlas dtype knob (ops/orb.py ships uint8): per-dtype row
    alignment (32/16) and exact bf16 one-hot un-shift."""
    Ha, Wa = 200, 300
    n = 21
    vals = rng.integers(0, 256, (Ha, Wa))
    corner = jnp.asarray(
        np.stack(
            [rng.integers(0, Ha - PSIZE, n), rng.integers(0, Wa - PSIZE, n)], -1
        ).astype(np.int32)
    )
    for dt in (np.uint8, jnp.bfloat16):
        atlas = jnp.asarray(vals.astype(np.float32)).astype(dt)
        expected = np.asarray(gather_patches_xla(atlas, corner))
        got = np.asarray(gather_patches_pallas(atlas, corner, interpret=True))
        np.testing.assert_array_equal(got, expected)


def test_pallas_gather_edge_corners(rng):
    """Corners at the extreme valid positions (alignment padding paths)."""
    Ha, Wa = 128, 200
    atlas = jnp.asarray(rng.uniform(0, 255, (Ha, Wa)).astype(np.float32))
    cs = [(0, 0), (Ha - PSIZE, Wa - PSIZE), (1, Wa - PSIZE), (Ha - PSIZE, 1), (7, 127)]
    corner = jnp.asarray(np.array(cs, np.int32))
    expected = np.asarray(gather_patches_xla(atlas, corner))
    got = np.asarray(gather_patches_pallas(atlas, corner, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-4)
