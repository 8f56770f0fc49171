"""Distributed BA on the virtual 8-device CPU mesh: both decompositions
(observation-parallel GSPMD and point-sharded shard_map) must match the
single-device solver."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpuslam.optim.ba import bundle_adjustment
from tpuslam.parallel.dist_ba import (
    distributed_bundle_adjustment,
    make_mesh,
    point_sharded_bundle_adjustment,
    route_edges_to_point_shards,
)


def _problem(rng, P=128):
    from __graft_entry__ import _synthetic_ba_problem

    return _synthetic_ba_problem(rng, K=6, P=P, n_obs_per_kf=64)


def _mean_chi2(prob, chi2):
    v = np.asarray(prob.valid)
    return float(np.asarray(chi2)[v].mean())


class TestDistributedBA:
    """Both decompositions are algebraically identical to the single-device
    solver (same sums, different reduction order). The solver's trace-
    relative Hll/Hpp damping floor keeps the 3x3 point-block inverses
    insensitive to that ordering, so parameters agree tightly."""

    def test_observation_parallel_matches_single(self, rng):
        cam, prob = _problem(rng)
        mesh = make_mesh(8)
        R1, t1, X1, c1 = jax.jit(
            lambda p: bundle_adjustment(cam, p, iters=4, cg_iters=20)
        )(prob)
        R2, t2, X2, c2 = distributed_bundle_adjustment(
            cam, prob, mesh, iters=4, cg_iters=20
        )
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-3)
        # And it genuinely converges.
        _, _, _, c0 = jax.jit(
            lambda p: bundle_adjustment(cam, p, iters=0, cg_iters=1)
        )(prob)
        assert _mean_chi2(prob, c2) < 0.05 * _mean_chi2(prob, c0)

    def test_point_sharded_matches_single(self, rng):
        cam, prob = _problem(rng)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("points",))
        R1, t1, X1, c1 = jax.jit(
            lambda p: bundle_adjustment(cam, p, iters=4, cg_iters=20)
        )(prob)
        R2, t2, X2, c2 = point_sharded_bundle_adjustment(
            cam, prob, mesh, iters=4, cg_iters=20
        )
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-3)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-3)
        # chi2 comes back in the original edge order.
        v = np.asarray(prob.valid)
        np.testing.assert_allclose(
            np.asarray(c1)[v], np.asarray(c2)[v], atol=5e-2
        )

    def test_edge_routing_round_trip(self, rng):
        _, prob = _problem(rng)
        n = 8
        routed, perm = route_edges_to_point_shards(prob, n)
        E_pad = routed.kf.shape[0]
        assert E_pad % n == 0
        per = E_pad // n
        blk = prob.X.shape[0] // n
        pt_r = np.asarray(routed.pt)
        valid_r = np.asarray(routed.valid)
        # Every routed edge's point lies in its shard's block.
        for s in range(n):
            seg = slice(s * per, (s + 1) * per)
            assert np.all((pt_r[seg] >= s * blk) & (pt_r[seg] < (s + 1) * blk))
        # Real edges map back to the original arrays.
        keep = perm >= 0
        assert keep.sum() == prob.kf.shape[0]
        np.testing.assert_array_equal(
            np.asarray(routed.kf)[keep], np.asarray(prob.kf)[perm[keep]]
        )
        assert not valid_r[~keep].any()


class TestTrackerDistBA:
    """The Tracker pipeline's own BA entry points (_global_ba, _local_ba)
    run point-sharded when TrackerConfig.dist_ba_devices is set, and match
    the single-device path (VERDICT r1 item 6: P7 as a feature, not a
    library)."""

    def _tracker(self, cam, n_dev):
        from tpuslam.pipeline.tracker import Tracker, TrackerConfig

        return Tracker(
            TrackerConfig(
                cam=cam,
                max_keyframes=8,
                max_points=128,
                enable_loop_closing=False,
                dist_ba_devices=n_dev,
            )
        )

    def test_tracker_global_and_local_ba_distributed(self, rng):
        from tpuslam.testing import map_from_ba_problem as _map_from_ba_problem

        cam, prob = _problem(rng)
        m = _map_from_ba_problem(cam, prob, max_kf=8, n_kp=80, max_pt=128)
        tr_single = self._tracker(cam, 0)
        tr_dist = self._tracker(cam, len(jax.devices()))
        assert tr_dist._ba_mesh is not None

        g1 = tr_single._global_ba(m, iters=4)
        g2 = tr_dist._global_ba(m, iters=4)
        np.testing.assert_allclose(
            np.asarray(g1.kf_R), np.asarray(g2.kf_R), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g1.pt_xyz), np.asarray(g2.pt_xyz), atol=1e-3
        )

        l1 = tr_single._local_ba(g1, 5)
        l2 = tr_dist._local_ba(g1, 5)
        np.testing.assert_allclose(
            np.asarray(l1.kf_R), np.asarray(l2.kf_R), atol=1e-4
        )
        # Same observations detached by the chi2 prune.
        np.testing.assert_array_equal(
            np.asarray(l1.kf_obs_pt) >= 0, np.asarray(l2.kf_obs_pt) >= 0
        )


class TestCollectivePayload:
    """The point-sharded solver's cross-shard traffic is the packed pose
    system (O(K) bytes), NOT the point blocks (O(P)): points are fully
    local to their shard; only the reduced camera system rides the psum
    (SURVEY.md section 2.4 P7; measured in SCALING_r04.json)."""

    def test_payload_is_O_K_not_O_P(self, rng):
        from tpuslam.testing import synthetic_ba_problem
        from tools.bench_scaling import collective_report

        cam, prob_p1 = synthetic_ba_problem(rng, K=6, P=256, n_obs_per_kf=64)
        _, prob_p4 = synthetic_ba_problem(rng, K=6, P=1024, n_obs_per_kf=64)
        _, prob_k2 = synthetic_ba_problem(rng, K=12, P=256, n_obs_per_kf=64)

        kw = dict(iters=2, cg_iters=4)
        b_p1 = collective_report(cam, prob_p1, 4, **kw)["total"]
        b_p4 = collective_report(cam, prob_p4, 4, **kw)["total"]
        b_k2 = collective_report(cam, prob_k2, 4, **kw)["total"]

        # 4x the points: identical collective bytes.
        assert b_p4 == b_p1
        # 2x the keyframes: payload grows (linearly in K).
        assert b_p1 < b_k2 <= 2 * b_p1 + 64
