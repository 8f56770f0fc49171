"""End-to-end stereo and RGB-D SLAM on synthetic sequences.

Counterparts of the reference's stereo_kitti / rgbd_tum drivers
(BASELINE.json configs #2, #3) on rendered scenes. Depth sensors give true
scale, so ATE is evaluated with rigid (SE3, fixed scale) alignment.
"""

import numpy as np
import jax.numpy as jnp
import pytest

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


def ate_rigid(est, gt):
    s, R, t = horn_sim3(
        jnp.asarray(np.asarray(est, np.float32)),
        jnp.asarray(np.asarray(gt, np.float32)),
        jnp.ones(len(est)),
        fix_scale=True,
    )
    aligned = np.asarray(est) @ np.asarray(R).T + np.asarray(t)
    return float(np.sqrt(np.mean(np.sum((aligned - np.asarray(gt)) ** 2, -1))))


def collect(sys_, poses):
    est, gt = [], []
    for frame_id, R, t, lost in sys_.tracker.export_trajectory():
        if lost:
            continue
        est.append(-R.T @ t)
        Rg, tg = poses[frame_id]
        gt.append(-np.asarray(Rg).T @ np.asarray(tg))
    return est, gt


@pytest.fixture(scope="module")
def stereo_run():
    rng = np.random.default_rng(5)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(25, step=0.05)
    sys_ = System(
        CAM, SensorType.STEREO, orb=ORBConfig(n_features=500),
        max_keyframes=30, max_points=8000, kf_max_frames=8,
    )
    for i, (R, t) in enumerate(poses):
        R = np.asarray(R)
        t = np.asarray(t)
        imgL = scene.render(CAM, R, t)
        # Right camera: shifted by the baseline along the camera x-axis.
        imgR = scene.render(CAM, R, t - np.array([BASELINE_M, 0, 0], np.float32))
        sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 10.0)
    return sys_, poses


@pytest.fixture(scope="module")
def rgbd_run():
    rng = np.random.default_rng(6)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(25, step=0.05)
    sys_ = System(
        CAM, SensorType.RGBD, orb=ORBConfig(n_features=500),
        max_keyframes=30, max_points=8000, kf_max_frames=8,
    )
    for i, (R, t) in enumerate(poses):
        img, depth = scene.render(CAM, np.asarray(R), np.asarray(t), with_depth=True)
        sys_.track_rgbd(jnp.asarray(img), jnp.asarray(depth), i / 10.0)
    return sys_, poses


class TestStereoEndToEnd:
    def test_first_frame_initializes(self, stereo_run):
        sys_, _ = stereo_run
        stats = sys_.map_stats()
        assert stats["state"] == "OK"
        assert stats["n_keyframes"] >= 2
        assert stats["n_points"] > 200

    def test_metric_scale_and_ate(self, stereo_run):
        sys_, poses = stereo_run
        est, gt = collect(sys_, poses)
        assert len(est) >= 23, f"only {len(est)} tracked"
        # True scale: total path length should match within 5%.
        span_e = np.linalg.norm(est[-1] - est[0])
        span_g = np.linalg.norm(gt[-1] - gt[0])
        assert abs(span_e - span_g) / span_g < 0.05, (span_e, span_g)
        ate = ate_rigid(est, gt)
        assert ate < 0.05, f"stereo ATE {ate:.4f} m"


class TestRGBDEndToEnd:
    def test_first_frame_initializes(self, rgbd_run):
        sys_, _ = rgbd_run
        stats = sys_.map_stats()
        assert stats["state"] == "OK"
        assert stats["n_keyframes"] >= 2
        assert stats["n_points"] > 200

    def test_metric_scale_and_ate(self, rgbd_run):
        sys_, poses = rgbd_run
        est, gt = collect(sys_, poses)
        assert len(est) >= 23, f"only {len(est)} tracked"
        span_e = np.linalg.norm(est[-1] - est[0])
        span_g = np.linalg.norm(gt[-1] - gt[0])
        assert abs(span_e - span_g) / span_g < 0.05, (span_e, span_g)
        ate = ate_rigid(est, gt)
        assert ate < 0.05, f"rgbd ATE {ate:.4f} m"
