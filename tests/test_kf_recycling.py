"""Keyframe slot recycling: tracking continues past keyframe capacity by
reusing culled slots (the fixed-capacity SoA form of the reference's
unbounded pointer map), with trajectory/point references rebased onto
spanning-tree parents before reuse."""

import numpy as np
import jax.numpy as jnp

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline import SensorType, System
from tpuslam.sfm import horn_sim3

from synthetic import StepWallScene, orbit_trajectory

BASELINE_M = 0.12
CAM = PinholeCamera(
    fx=350.0, fy=350.0, cx=160.0, cy=120.0, bf=350.0 * BASELINE_M,
    width=320, height=240,
)


def test_tracking_survives_keyframe_capacity():
    """A stereo run needing more keyframes than capacity: without recycling
    keyframe insertion stops dead at the watermark; with it the run stays
    OK and the trajectory stays accurate."""
    rng = np.random.default_rng(5)
    scene = StepWallScene(rng)
    n_frames = 36
    poses = orbit_trajectory(n_frames, step=0.05)
    sys_ = System(
        CAM, SensorType.STEREO, orb=ORBConfig(n_features=400),
        max_keyframes=10, max_points=8000, kf_max_frames=2,
        local_ba_window=3,  # small protect window so culling can fire
        # This static scene tracks too well for the reference's c2 gate
        # (n_tracked < 0.75 * ref_matches) to ever fire; raise the ratio so
        # keyframes keep coming and the CAPACITY machinery (the thing under
        # test) actually engages.
        kf_ref_ratio_depth=0.99,
    )
    for i, (R, t) in enumerate(poses):
        R, t = np.asarray(R), np.asarray(t)
        imgL = scene.render(CAM, R, t)
        imgR = scene.render(CAM, R, t - np.array([BASELINE_M, 0, 0], np.float32))
        sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 10.0)

    assert sys_.map_stats()["state"] == "OK"
    # Capacity was reached and slots were actually recycled.
    assert int(sys_.tracker.map.n_kf) == 10
    assert sys_.tracker.n_recycled_kf_slots > 0

    est, gt = [], []
    for fid, R, t, lost in sys_.tracker.export_trajectory():
        if lost:
            continue
        est.append(-R.T @ t)
        Rg, tg = poses[fid]
        gt.append(-np.asarray(Rg).T @ np.asarray(tg))
    assert len(est) >= n_frames - 4
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    # A 10-keyframe budget over a 36-frame sweep is a bounded-memory
    # (odometry-like) regime: the map forgets left-behind regions, so global
    # ATE degrades by design. The guarantees recycling must keep are LOCAL:
    # per-frame relative motion stays accurate and tracking never dies.
    from tpuslam.io.native import evaluate_rpe

    rpe = evaluate_rpe(est, gt, delta=1)
    assert rpe < 0.04, f"recycled-capacity stereo RPE {rpe:.4f}"  # ~half the 0.05 per-step motion
    # And the trajectory is still globally sane (same order of magnitude).
    s, Ra, ta = horn_sim3(
        jnp.asarray(est.astype(np.float32)), jnp.asarray(gt.astype(np.float32)),
        jnp.ones(len(est)), fix_scale=True,
    )
    al = est.astype(np.float32) @ np.asarray(Ra).T + np.asarray(ta)
    ate = float(np.sqrt(np.mean(np.sum((al - gt) ** 2, -1))))
    assert ate < 0.5, f"recycled-capacity stereo ATE {ate:.4f}"
