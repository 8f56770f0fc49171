"""End-to-end monocular SLAM on a synthetic sequence: init, tracking,
keyframing, local BA, trajectory export, ATE after Sim3 alignment.

This is the CPU-runnable counterpart of the reference's mono_tum driver
(BASELINE.json config #1), with the dataset replaced by a rendered scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline import System, SensorType
from tpuslam.sfm import horn_sim3

from synthetic import StepWallScene, orbit_trajectory

CAM = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0, width=320, height=240)


@pytest.fixture(scope="module")
def slam_run():
    rng = np.random.default_rng(11)
    scene = StepWallScene(rng)
    n_frames = 36
    poses = orbit_trajectory(n_frames, step=0.045)
    # 800 features ~ the reference's mono proportions (TUM1.yaml nFeatures
    # 1000): MonocularInitialization demands 100 level-0 matches
    # (Tracking.cc:606,637), and level 0 holds ~22% of the feature budget —
    # a 400-feature config starves initialization for a third of the
    # sequence, which is an extractor-budget artifact, not a tracking one.
    sys = System(
        CAM,
        SensorType.MONOCULAR,
        orb=ORBConfig(n_features=800),
        max_keyframes=40,
        max_points=6000,
        kf_max_frames=10,
    )
    for i, (R, t) in enumerate(poses):
        img = scene.render(CAM, R, t)
        sys.track_monocular(jnp.asarray(img), timestamp=i / 30.0)
    return sys, poses


class TestMonoEndToEnd:
    def test_initializes_and_tracks(self, slam_run):
        sys, poses = slam_run
        stats = sys.map_stats()
        assert stats["state"] == "OK", f"tracker ended in {stats['state']}"
        assert stats["n_keyframes"] >= 3
        assert stats["n_points"] > 150

    def test_trajectory_accuracy_sim3(self, slam_run):
        sys, poses = slam_run
        traj = sys.tracker.export_trajectory()
        est, gt = [], []
        for frame_id, R, t, lost in traj:
            if lost:
                continue
            est.append(-R.T @ t)  # camera center
            Rg, tg = poses[frame_id]
            gt.append(-Rg.T @ tg)
        assert len(est) > 25, f"only {len(est)} tracked frames"
        est = np.asarray(est, np.float32)
        gt = np.asarray(gt, np.float32)
        # Sim3 alignment (mono scale is free).
        s, R, t = horn_sim3(jnp.asarray(est), jnp.asarray(gt), jnp.ones(len(est)))
        aligned = float(s) * est @ np.asarray(R).T + np.asarray(t)
        ate = np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1)))
        # Motion span ~1.6 world units; demand sub-2% ATE.
        assert ate < 0.03, f"ATE RMSE {ate:.4f}"

    def test_tum_export_format(self, slam_run, tmp_path):
        sys, _ = slam_run
        p = tmp_path / "traj.txt"
        sys.save_trajectory_tum(str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) > 25
        row = lines[0].split()
        assert len(row) == 8
        q = np.array([float(x) for x in row[4:]])
        assert abs(np.linalg.norm(q) - 1.0) < 1e-3

    def test_kitti_export_format(self, slam_run, tmp_path):
        sys, _ = slam_run
        p = tmp_path / "traj_kitti.txt"
        sys.save_trajectory_kitti(str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) > 25
        assert len(lines[0].split()) == 12
