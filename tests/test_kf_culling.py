"""Keyframe culling with spanning-tree reparenting
(KeyFrame::SetBadFlag + the mTcp trajectory walk,
/root/reference/src/KeyFrame.cc:453-545, System.cc:377-381)."""

import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.se3 import so3_exp
from tpuslam.mapstate.core import make_empty_map
from tpuslam.pipeline.steps import cull_keyframes


def _map_with_redundant_kf(rng):
    """KFs 0..3 all observe the same 20 points; KF 2 is fully redundant."""
    m = make_empty_map(6, 32, 64)
    n_pt = 20
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:n_pt].set(
            jnp.asarray(rng.uniform(-1, 1, (n_pt, 3)).astype(np.float32))
        ),
        pt_valid=m.pt_valid.at[:n_pt].set(True),
        n_pt=jnp.asarray(n_pt),
        n_kf=jnp.asarray(4),
        kf_valid=m.kf_valid.at[:4].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:4, :n_pt].set(True),
        kf_obs_pt=m.kf_obs_pt.at[:4, :n_pt].set(
            jnp.broadcast_to(jnp.arange(n_pt, dtype=jnp.int32), (4, n_pt))
        ),
        kf_t=m.kf_t.at[:4].set(
            jnp.asarray([[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0]])
        ),
    )
    return m


def test_cull_records_parent_and_relative_pose(rng):
    m = _map_with_redundant_kf(rng)
    protect = np.zeros(6, bool)
    protect[[0, 1, 3]] = True  # only KF 2 may be culled
    m2, culled = cull_keyframes(m, jnp.int32(3), jnp.asarray(protect))
    culled = np.asarray(culled)
    assert culled[2] and culled.sum() == 1
    assert not bool(m2.kf_valid[2])
    parent = int(m2.kf_parent[2])
    assert parent in (0, 1, 3) and parent != 2
    # rel ∘ T_parent reproduces the culled pose.
    R_rec = np.asarray(m2.kf_rel_R[2]) @ np.asarray(m2.kf_R[parent])
    t_rec = np.asarray(m2.kf_rel_R[2]) @ np.asarray(m2.kf_t[parent]) + np.asarray(
        m2.kf_rel_t[2]
    )
    np.testing.assert_allclose(R_rec, np.asarray(m.kf_R[2]), atol=1e-6)
    np.testing.assert_allclose(t_rec, np.asarray(m.kf_t[2]), atol=1e-6)


def test_trajectory_follows_parent_after_correction(rng):
    """A frame referencing a culled KF must move when the PARENT's pose is
    later corrected (pose graph / GBA) — the frozen-pose failure the
    spanning tree fixes."""
    from tpuslam.pipeline.tracker import Tracker, TrackerConfig
    from tpuslam.geometry.camera import PinholeCamera

    m = _map_with_redundant_kf(rng)
    protect = np.zeros(6, bool)
    protect[[0, 1, 3]] = True
    m2, _ = cull_keyframes(m, jnp.int32(3), jnp.asarray(protect))
    parent = int(m2.kf_parent[2])

    cam = PinholeCamera(fx=100.0, fy=100.0, cx=50.0, cy=50.0)
    tr = Tracker(TrackerConfig(cam=cam, enable_loop_closing=False))
    tr.map = m2
    # One frame whose reference keyframe is the culled KF 2 (identity rel).
    tr.trajectory = [(0, 2, np.eye(3), np.zeros(3), False)]

    (fid, R0, t0, lost), = tr.export_trajectory()
    np.testing.assert_allclose(t0, np.asarray(m.kf_t[2]), atol=1e-6)

    # Apply a correction to the parent.
    dR = np.asarray(so3_exp(jnp.asarray([0.0, 0.3, 0.0])))
    dt = np.array([0.5, -0.2, 0.1], np.float32)
    m3 = m2._replace(
        kf_R=m2.kf_R.at[parent].set(jnp.asarray(dR) @ m2.kf_R[parent]),
        kf_t=m2.kf_t.at[parent].set(
            jnp.asarray(dR @ np.asarray(m2.kf_t[parent]) + dt)
        ),
    )
    tr.map = m3
    (fid, R1, t1, lost), = tr.export_trajectory()
    # Expected: T_frame = rel2 ∘ T_parent_corrected.
    R_exp = np.asarray(m2.kf_rel_R[2]) @ np.asarray(m3.kf_R[parent])
    t_exp = np.asarray(m2.kf_rel_R[2]) @ np.asarray(m3.kf_t[parent]) + np.asarray(
        m2.kf_rel_t[2]
    )
    np.testing.assert_allclose(R1, R_exp, atol=1e-6)
    np.testing.assert_allclose(t1, t_exp, atol=1e-6)
    assert np.linalg.norm(t1 - t0) > 0.1  # it actually moved
