"""Map-scale machinery (VERDICT r1 item 2): the ops whose naive forms are
O(K·P) in memory must stay exact while never materializing the (K, P)
incidence — blocked covisibility, single-row shared counts, and the
covisibility-local TrackLocalMap subset."""

import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.geometry.se3 import se3_apply
from tpuslam.mapstate.core import (
    FrameFeatures,
    covisibility_weights,
    make_empty_map,
    observation_incidence,
    shared_point_counts,
)
from tpuslam.pipeline.steps import local_keyframe_mask, track_local_map

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)


def _random_map(rng, K=8, N=40, P=100, n_valid_kf=6, n_valid_pt=80):
    m = make_empty_map(K, N, P)
    obs = np.full((K, N), -1, np.int32)
    for k in range(n_valid_kf):
        sel = rng.choice(P, N // 2, replace=False)
        obs[k, : N // 2] = sel
    pt_valid = np.zeros(P, bool)
    pt_valid[:n_valid_pt] = True
    return m._replace(
        kf_valid=m.kf_valid.at[:n_valid_kf].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:n_valid_kf].set(True),
        kf_obs_pt=jnp.asarray(obs),
        pt_xyz=jnp.asarray(rng.uniform(-2, 2, (P, 3)).astype(np.float32)),
        pt_valid=jnp.asarray(pt_valid),
        n_kf=jnp.asarray(n_valid_kf),
        n_pt=jnp.asarray(P),
    )


class TestBlockedCovisibility:
    def test_blocked_matches_single_matmul(self, rng):
        m = _random_map(rng)
        w_single = np.asarray(covisibility_weights(m))  # P=100 <= block
        w_blocked = np.asarray(covisibility_weights(m, block=7))
        np.testing.assert_allclose(w_blocked, w_single, atol=1e-5)

    def test_shared_counts_match_incidence_row(self, rng):
        m = _random_map(rng)
        inc = np.asarray(observation_incidence(m))
        for anchor in (0, 3, 5):
            expect = inc @ inc[anchor]
            got = np.asarray(shared_point_counts(m, jnp.int32(anchor)))
            np.testing.assert_allclose(got, expect, atol=1e-5)


class TestLocalMapSubset:
    def _scene_map_and_frame(self, rng, K=6, P=512, P_live=400, N=96):
        """Map points in front of the origin camera; every live point
        observed by at least one keyframe; frame keypoints = projections of
        a subset. P_live < P so a max_local_pts between them exercises the
        subset path without truncating any candidate."""
        m = make_empty_map(K, N, P)
        X = np.stack(
            [
                rng.uniform(-2, 2, P),
                rng.uniform(-1.5, 1.5, P),
                rng.uniform(4, 9, P),
            ],
            -1,
        ).astype(np.float32)
        obs = np.full((K, N), -1, np.int32)
        for k in range(K):
            sel = np.arange(P_live)[(np.arange(P_live) % K) == k][:N]
            obs[k, : len(sel)] = sel
        # Viewing normal = direction camera -> point and scale range around
        # the actual viewing distance (MapPoint::UpdateNormalAndDepth for
        # octave-0 observations); the test camera sits at the origin.
        d0 = np.linalg.norm(X, axis=-1)
        normals = X / d0[:, None]
        m = m._replace(
            kf_valid=m.kf_valid.at[:K].set(True),
            kf_kp_valid=m.kf_kp_valid.at[:K].set(True),
            kf_obs_pt=jnp.asarray(obs),
            pt_xyz=jnp.asarray(X),
            pt_valid=jnp.asarray(np.arange(P) < P_live),
            pt_normal=jnp.asarray(normals.astype(np.float32)),
            pt_min_dist=jnp.asarray(0.2 * d0),
            pt_max_dist=jnp.asarray(1.05 * d0),
            pt_desc=jnp.asarray(
                rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
            ),
            n_kf=jnp.asarray(K),
            n_pt=jnp.asarray(P),
        )
        # Frame at the origin observing a subset of points exactly.
        vis = np.arange(0, P_live, 3)[:N]
        uv = np.asarray(CAM.fx) * X[vis, :2] / X[vis, 2:3] + np.array(
            [CAM.cx, CAM.cy], np.float32
        )
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < 320) & (uv[:, 1] >= 0) & (uv[:, 1] < 240)
        )
        n = len(vis)
        xy = np.zeros((N, 2), np.float32)
        xy[:n] = uv
        desc = np.zeros((N, 8), np.uint32)
        desc[:n] = np.asarray(m.pt_desc)[vis]
        valid = np.zeros(N, bool)
        valid[:n] = inside
        feats = FrameFeatures(
            xy=jnp.asarray(xy),
            level=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
            u_right=jnp.full(N, -1.0),
            depth=jnp.zeros(N),
        )
        return m, feats

    def test_subset_matches_dense_when_local_covers_all(self, rng):
        """With every keyframe in the local mask and capacity for all valid
        points, the subset path accepts exactly the dense path's matches."""
        m, feats = self._scene_map_and_frame(rng)
        inv_s2 = jnp.ones(8)
        R0, t0 = jnp.eye(3), jnp.zeros(3)
        obs0 = jnp.full(feats.xy.shape[0], -1, jnp.int32)
        out_d = track_local_map(CAM, m, R0, t0, feats, obs0, inv_s2)
        out_s = track_local_map(
            CAM, m, R0, t0, feats, obs0, inv_s2,
            local_kf_mask=jnp.ones(m.capacity_kf, bool),
            max_local_pts=448,  # > the 400 live points: no truncation
        )
        assert int(out_d[3]) > 20  # non-vacuous: the dense path does match
        np.testing.assert_array_equal(np.asarray(out_d[2]), np.asarray(out_s[2]))
        np.testing.assert_allclose(
            np.asarray(out_d[0]), np.asarray(out_s[0]), atol=1e-5
        )
        assert int(out_s[3]) == int(out_d[3])
        np.testing.assert_array_equal(np.asarray(out_d[4]), np.asarray(out_s[4]))

    def test_subset_restricts_to_masked_keyframes(self, rng):
        """Masking out a keyframe removes its exclusive points from the
        candidate set: matches fall only on points observed by masked KFs."""
        m, feats = self._scene_map_and_frame(rng)
        inv_s2 = jnp.ones(8)
        R0, t0 = jnp.eye(3), jnp.zeros(3)
        obs0 = jnp.full(feats.xy.shape[0], -1, jnp.int32)
        mask = jnp.zeros(m.capacity_kf, bool).at[0].set(True)
        out = track_local_map(
            CAM, m, R0, t0, feats, obs0, inv_s2,
            local_kf_mask=mask, max_local_pts=448,
        )
        obs = np.asarray(out[2])
        assert (obs >= 0).sum() > 0  # non-vacuous
        kf0_pts = set(np.asarray(m.kf_obs_pt[0])[np.asarray(m.kf_obs_pt[0]) >= 0])
        for p in obs[obs >= 0]:
            assert int(p) in kf0_pts

    def test_local_keyframe_mask_votes(self, rng):
        m, feats = self._scene_map_and_frame(rng)
        # Pretend the frame matched the points of KF 2 only.
        obs = np.asarray(m.kf_obs_pt[2]).copy()
        mask = np.asarray(local_keyframe_mask(m, jnp.asarray(obs), max_kfs=3))
        assert mask[2]
        assert mask.sum() <= 13  # 3 voters + up-to-10 covis neighbors


class TestAdviceFixes:
    """Regression tests for the round-2 advisor findings."""

    def test_subset_truncation_keeps_newest_points(self, rng):
        """When the local candidate set overflows max_local_pts, the kept
        ids must be the NEWEST (highest) point ids — the freshly
        triangulated structure the frame most likely observes."""
        m, feats = TestLocalMapSubset._scene_map_and_frame(self, rng)
        inv_s2 = jnp.ones(8)
        N = feats.xy.shape[0]
        cap = 64  # far below the 400 live candidates -> truncation
        # Rebuild the frame to observe NEWEST points (ids 336..399), which
        # the truncated candidate set must retain.
        P_live = 400
        vis = np.arange(P_live - 2 * cap, P_live, 2)[: N]
        X = np.asarray(m.pt_xyz)
        uv = np.asarray(CAM.fx) * X[vis, :2] / X[vis, 2:3] + np.array(
            [CAM.cx, CAM.cy], np.float32
        )
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < 320) & (uv[:, 1] >= 0) & (uv[:, 1] < 240)
        )
        n = len(vis)
        xy = np.zeros((N, 2), np.float32)
        xy[:n] = uv
        desc = np.zeros((N, 8), np.uint32)
        desc[:n] = np.asarray(m.pt_desc)[vis]
        valid = np.zeros(N, bool)
        valid[:n] = inside
        feats = feats._replace(
            xy=jnp.asarray(xy), desc=jnp.asarray(desc), valid=jnp.asarray(valid)
        )
        obs0 = jnp.full(N, -1, jnp.int32)
        out = track_local_map(
            CAM, m, jnp.eye(3), jnp.zeros(3), feats, obs0, inv_s2,
            local_kf_mask=jnp.ones(m.capacity_kf, bool), max_local_pts=cap,
        )
        obs = np.asarray(out[2])
        matched = obs[obs >= 0]
        assert len(matched) > 0
        # Every match must come from the top-`cap` candidate ids.
        live_ids = np.sort(
            np.unique(np.asarray(m.kf_obs_pt)[np.asarray(m.kf_obs_pt) >= 0])
        )
        newest = set(live_ids[-cap:].tolist())
        for p in matched:
            assert int(p) in newest

    def test_local_keyframe_mask_zero_votes_falls_back_to_ref(self, rng):
        m, feats = TestLocalMapSubset._scene_map_and_frame(self, rng)
        obs = jnp.full(feats.xy.shape[0], -1, jnp.int32)  # nothing matched
        mask_no_ref = np.asarray(local_keyframe_mask(m, obs, max_kfs=3))
        assert mask_no_ref.sum() == 0  # no arbitrary KF-0 neighborhood
        mask_ref = np.asarray(
            local_keyframe_mask(m, obs, max_kfs=3, ref_kf=jnp.int32(2))
        )
        assert mask_ref[2]

    def test_shared_counts_dedup_duplicate_slots(self, rng):
        """A point id held in two keypoint slots of one KF counts once."""
        m = _random_map(rng)
        obs = np.asarray(m.kf_obs_pt).copy()
        # KF 1 holds point obs[1,0] twice.
        dup = obs[1, 0]
        obs[1, 1] = dup
        m2 = m._replace(kf_obs_pt=jnp.asarray(obs))
        inc = np.asarray(observation_incidence(m2))  # clamped to 1
        for anchor in (0, 1, 3):
            expect = inc @ inc[anchor]
            got = np.asarray(shared_point_counts(m2, jnp.int32(anchor)))
            np.testing.assert_allclose(got, expect, atol=1e-5)


class TestPointCompaction:
    def test_compact_point_slots_roundtrip(self, rng):
        from tpuslam.mapstate.core import compact_point_slots

        m = _random_map(rng, K=8, N=40, P=100, n_valid_kf=6, n_valid_pt=80)
        # Invalidate a scattered subset (as culling would).
        kill = np.zeros(100, bool)
        kill[rng.choice(80, 30, replace=False)] = True
        pt_valid = np.asarray(m.pt_valid) & ~kill
        obs = np.asarray(m.kf_obs_pt).copy()
        obs[(obs >= 0) & ~pt_valid[np.maximum(obs, 0)]] = -1
        m = m._replace(
            pt_valid=jnp.asarray(pt_valid), kf_obs_pt=jnp.asarray(obs)
        )
        xyz_of = {
            i: np.asarray(m.pt_xyz[i]) for i in range(100) if pt_valid[i]
        }
        m2, remap = compact_point_slots(m)
        remap = np.asarray(remap)
        assert int(m2.n_pt) == int(pt_valid.sum())
        # Valid points live in a prefix, data carried over.
        v2 = np.asarray(m2.pt_valid)
        assert v2[: int(m2.n_pt)].all() and not v2[int(m2.n_pt):].any()
        for old, new in enumerate(remap):
            if new >= 0:
                np.testing.assert_allclose(
                    np.asarray(m2.pt_xyz[new]), xyz_of[old]
                )
        # Creation order preserved (stable): remap is increasing on valid.
        valid_new = remap[remap >= 0]
        assert (np.diff(valid_new) > 0).all()
        # Observations point at the same 3D points.
        obs2 = np.asarray(m2.kf_obs_pt)
        for k in range(8):
            for s in range(40):
                if obs[k, s] >= 0:
                    assert obs2[k, s] == remap[obs[k, s]]
                else:
                    assert obs2[k, s] == -1
