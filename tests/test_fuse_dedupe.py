"""Fuse-target dedupe for the fused LocalMapping epoch (advisor r4 high
finding): the two-hop fuse set must keep ALL distinct neighbors, direct
targets first — a broken parking index here silently reduced
SearchInNeighbors to a single neighbor."""

import numpy as np
import jax.numpy as jnp

from tpuslam.pipeline.steps import dedupe_fuse_targets


def test_dedupe_keeps_all_distinct_neighbors():
    # nn_fuse=5 direct targets [5,7,9,11,13], hops with duplicates+invalid.
    ext = jnp.asarray(
        [5, 7, 9, 11, 13,          # direct
         7, 2, 5, -1, 3, 13, 9],   # hops: dups of direct + new {2,3}
        jnp.int32,
    )
    out = np.asarray(dedupe_fuse_targets(ext, K=64, nn_fuse=5))
    # Direct targets compact first (order within tiers is stable).
    assert list(out[:5]) == [5, 7, 9, 11, 13]
    # New hop neighbors survive; padding is -1.
    assert set(out[5:]) - {-1} == {2, 3}
    assert len(out) == 10


def test_dedupe_drops_duplicates_and_invalid():
    ext = jnp.asarray([4, 4, 4, -1, -1, 4, 4, 4], jnp.int32)
    out = np.asarray(dedupe_fuse_targets(ext, K=8, nn_fuse=4))
    assert (out >= 0).sum() == 1 and out[0] == 4


def test_dedupe_overflow_prefers_direct_targets():
    # 3 direct + 9 distinct hops > 2*nn_fuse=6 slots: all direct kept,
    # hop overflow dropped (documented static cost cap).
    ext = jnp.asarray([0, 1, 2] + list(range(10, 19)), jnp.int32)
    out = np.asarray(dedupe_fuse_targets(ext, K=32, nn_fuse=3))
    assert list(out[:3]) == [0, 1, 2]
    kept_hops = set(out[3:]) - {-1}
    assert len(kept_hops) == 3 and kept_hops <= set(range(10, 19))
    assert len(set(out[out >= 0])) == int((out >= 0).sum())  # no dups
