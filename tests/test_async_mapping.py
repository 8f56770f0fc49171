"""Async mapping: tracking continues on snapshots while mapping/loop work
runs on the background worker (the reference's thread concurrency, P1/P5)."""

import numpy as np
import jax.numpy as jnp

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline import System, SensorType
from tpuslam.sfm import horn_sim3

from synthetic import StepWallScene, orbit_trajectory

BASELINE_M = 0.12
CAM = PinholeCamera(
    fx=350.0, fy=350.0, cx=160.0, cy=120.0, bf=350.0 * BASELINE_M,
    width=320, height=240,
)


class TestAsyncMapping:
    def test_stereo_async_matches_sync_quality(self):
        rng = np.random.default_rng(5)
        scene = StepWallScene(rng)
        poses = orbit_trajectory(20, step=0.05)
        sys_ = System(
            CAM, SensorType.STEREO, orb=ORBConfig(n_features=500),
            max_keyframes=30, max_points=8000, kf_max_frames=8,
            async_mapping=True,
        )
        for i, (R, t) in enumerate(poses):
            R, t = np.asarray(R), np.asarray(t)
            imgL = scene.render(CAM, R, t)
            imgR = scene.render(CAM, R, t - np.array([BASELINE_M, 0, 0], np.float32))
            sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 10.0)
        stats = sys_.map_stats()
        assert stats["state"] == "OK"
        assert stats["n_points"] > 200

        est, gt = [], []
        for fid, R, t, lost in sys_.tracker.export_trajectory():
            if lost:
                continue
            est.append(-R.T @ t)
            Rg, tg = poses[fid]
            gt.append(-np.asarray(Rg).T @ np.asarray(tg))
        assert len(est) >= 18
        est = np.asarray(est, np.float32)
        gt = np.asarray(gt, np.float32)
        s, Ra, ta = horn_sim3(jnp.asarray(est), jnp.asarray(gt), jnp.ones(len(est)),
                              fix_scale=True)
        al = est @ np.asarray(Ra).T + np.asarray(ta)
        ate = float(np.sqrt(np.mean(np.sum((al - gt) ** 2, -1))))
        assert ate < 0.06, f"async stereo ATE {ate:.4f}"
        # The worker must be drained by export_trajectory.
        assert sys_.tracker._mapping_future is None
