"""Tests for Hamming matching kernels and search modes."""

import numpy as np
import jax.numpy as jnp

from tpuslam.matching import (
    hamming_distance,
    hamming_matrix,
    match_nn_ratio,
    rotation_consistency_mask,
    search_for_initialization,
)
from tpuslam.matching.search import resolve_duplicates


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def np_hamming(a, b):
    return np.unpackbits(
        (a ^ b).view(np.uint8), axis=-1
    ).sum(axis=-1)


class TestHamming:
    def test_matches_numpy(self, rng):
        a = rand_desc(rng, 32)
        b = rand_desc(rng, 32)
        d = np.asarray(hamming_distance(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(d, np_hamming(a, b))

    def test_matrix(self, rng):
        a = rand_desc(rng, 16)
        b = rand_desc(rng, 24)
        m = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        assert m.shape == (16, 24)
        for i in [0, 7, 15]:
            for j in [0, 11, 23]:
                assert m[i, j] == np_hamming(a[i], b[j])

    def test_zero_distance(self, rng):
        a = rand_desc(rng, 8)
        d = np.asarray(hamming_distance(jnp.asarray(a), jnp.asarray(a)))
        assert np.all(d == 0)


def corrupt(rng, desc, nbits):
    """Flip nbits random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(nbits):
            b = rng.integers(0, 256)
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestNNRatio:
    def test_finds_corrupted_twin(self, rng):
        t = rand_desc(rng, 64)
        q = corrupt(rng, t, 10)  # ~<=10 bits away from its twin
        mask = jnp.ones((64, 64), dtype=bool)
        idx, dist, valid = match_nn_ratio(jnp.asarray(q), jnp.asarray(t), mask, 50, 0.9)
        idx, dist, valid = map(np.asarray, (idx, dist, valid))
        assert valid.sum() > 55
        assert np.all(idx[valid] == np.nonzero(valid)[0])

    def test_mask_excludes(self, rng):
        t = rand_desc(rng, 16)
        q = t.copy()
        mask = jnp.zeros((16, 16), dtype=bool)
        _, _, valid = match_nn_ratio(jnp.asarray(q), jnp.asarray(t), mask)
        assert not np.any(np.asarray(valid))

    def test_ratio_rejects_ambiguous(self, rng):
        t = rand_desc(rng, 2)
        t[1] = t[0]  # two identical targets -> d1 == d2 -> ratio fails
        q = t[:1].copy()
        mask = jnp.ones((1, 2), dtype=bool)
        _, _, valid = match_nn_ratio(jnp.asarray(q), jnp.asarray(t), mask, 50, 0.9)
        assert not bool(valid[0])


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self, rng):
        n = 100
        a_q = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        a_t = a_q - 0.5  # consistent rotation offset
        bad = rng.choice(n, 15, replace=False)
        a_t[bad] = rng.uniform(0, 2 * np.pi, 15)  # outlier rotations
        valid = np.ones(n, bool)
        keep = np.asarray(
            rotation_consistency_mask(jnp.asarray(a_q), jnp.asarray(a_t), jnp.asarray(valid))
        )
        good = np.setdiff1d(np.arange(n), bad)
        assert keep[good].mean() > 0.95
        assert keep[bad].mean() < 0.5


class TestResolveDuplicates:
    def test_keeps_best_per_target(self):
        idx = jnp.asarray(np.array([3, 3, 5, 3], np.int32))
        dist = jnp.asarray(np.array([10, 4, 7, 4], np.int32))
        valid = jnp.asarray(np.ones(4, bool))
        keep = np.asarray(resolve_duplicates(idx, dist, valid, 8))
        # target 3: queries 0(10), 1(4), 3(4) -> keep query 1 (tie -> lowest)
        np.testing.assert_array_equal(keep, [False, True, True, False])


class TestSearchForInitialization:
    def test_synthetic_flow(self, rng):
        """Two 'frames' whose keypoints differ by a small translation."""
        n = 128
        xy1 = np.stack([rng.uniform(50, 270, n), rng.uniform(50, 190, n)], -1).astype(
            np.float32
        )
        shift = np.array([8.0, -5.0], np.float32)
        xy2 = xy1 + shift
        desc1 = rand_desc(rng, n)
        desc2 = corrupt(rng, desc1, 8)
        # Shuffle frame-2 order to make the matching nontrivial.
        perm = rng.permutation(n)
        xy2 = xy2[perm]
        desc2 = desc2[perm]
        zeros = np.zeros(n, np.float32)
        lv = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        idx, dist, ok = search_for_initialization(
            jnp.asarray(xy1), jnp.asarray(desc1), jnp.asarray(lv), jnp.asarray(zeros),
            jnp.asarray(valid),
            jnp.asarray(xy2), jnp.asarray(desc2), jnp.asarray(lv), jnp.asarray(zeros),
            jnp.asarray(valid),
            window=30.0,
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        inv = np.argsort(perm)  # frame-1 index i lives at slot inv[i] in frame 2
        assert ok.sum() > 0.85 * n
        assert np.all(idx[ok] == inv[np.nonzero(ok)[0]])
