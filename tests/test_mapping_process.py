"""Mapping/loop-closing in a SEPARATE PROCESS (multi-host P1 form):
tracking ships MapState snapshots to a worker process and adopts the
results — see tpuslam/parallel/mapping_worker.py."""

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


def test_stereo_mapping_in_separate_process():
    rng = np.random.default_rng(5)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(16, step=0.05)
    sys_ = System(
        CAM, SensorType.STEREO, orb=ORBConfig(n_features=400),
        max_keyframes=24, max_points=6000, kf_max_frames=8,
        mapping_process=True,
    )
    try:
        for i, (R, t) in enumerate(poses):
            R, t = np.asarray(R), np.asarray(t)
            imgL = scene.render(CAM, R, t)
            imgR = scene.render(
                CAM, R, t - np.array([BASELINE_M, 0, 0], np.float32)
            )
            sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 10.0)
        stats = sys_.map_stats()
        assert stats["state"] == "OK"
        assert stats["n_points"] > 150

        est, gt = [], []
        for fid, R, t, lost in sys_.tracker.export_trajectory():
            if lost:
                continue
            est.append(-R.T @ t)
            Rg, tg = poses[fid]
            gt.append(-np.asarray(Rg).T @ np.asarray(tg))
        assert len(est) >= 14
        est = np.asarray(est, np.float32)
        gt = np.asarray(gt, np.float32)
        s, Ra, ta = horn_sim3(
            jnp.asarray(est), jnp.asarray(gt), jnp.ones(len(est)), fix_scale=True
        )
        al = est @ np.asarray(Ra).T + np.asarray(ta)
        ate = float(np.sqrt(np.mean(np.sum((al - gt) ** 2, -1))))
        assert ate < 0.06, f"process-mapping stereo ATE {ate:.4f}"
    finally:
        sys_.shutdown()
    # shutdown() drained the worker and closed the process.
    assert sys_.tracker._remote_mapper is None
