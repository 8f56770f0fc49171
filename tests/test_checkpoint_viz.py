"""Checkpoint/resume, localization mode, and offline rendering tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline import System, SensorType
from tpuslam.utils import Metrics

from synthetic import StepWallScene, orbit_trajectory

BASELINE_M = 0.12
CAM = PinholeCamera(
    fx=350.0, fy=350.0, cx=160.0, cy=120.0, bf=350.0 * BASELINE_M,
    width=320, height=240,
)


@pytest.fixture(scope="module")
def mapped_run():
    rng = np.random.default_rng(5)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(14, step=0.05)
    sys_ = System(
        CAM, SensorType.STEREO, orb=ORBConfig(n_features=400),
        max_keyframes=20, max_points=5000, kf_max_frames=6,
    )
    frames = []
    for i, (R, t) in enumerate(poses):
        R, t = np.asarray(R), np.asarray(t)
        imgL = scene.render(CAM, R, t)
        imgR = scene.render(CAM, R, t - np.array([BASELINE_M, 0, 0], np.float32))
        frames.append((imgL, imgR))
        sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 10.0)
    assert sys_.map_stats()["state"] == "OK"
    return sys_, frames, poses


class TestCheckpoint:
    def test_save_load_roundtrip(self, mapped_run, tmp_path):
        sys_, frames, poses = mapped_run
        p = str(tmp_path / "map.npz")
        sys_.save_map(p)
        from tpuslam.io.checkpoint import load_map

        m = load_map(p)
        assert int(m.n_kf) == int(sys_.tracker.map.n_kf)
        np.testing.assert_array_equal(
            np.asarray(m.pt_valid), np.asarray(sys_.tracker.map.pt_valid)
        )
        np.testing.assert_allclose(
            np.asarray(m.kf_R), np.asarray(sys_.tracker.map.kf_R)
        )

    def test_localize_against_loaded_map(self, mapped_run, tmp_path):
        """Map-once / localize-later: a fresh System loads the checkpoint and
        relocalizes from a frame of the mapped sequence."""
        sys_, frames, poses = mapped_run
        p = str(tmp_path / "map2.npz")
        sys_.save_map(p)

        sys2 = System(
            CAM, SensorType.STEREO, orb=ORBConfig(n_features=400),
            max_keyframes=20, max_points=5000,
        )
        sys2.load_map(p, localization=True)
        # Feed a mid-sequence frame: should relocalize (PnP against map).
        i = 7
        imgL, imgR = frames[i]
        r = sys2.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), 99.0)
        assert r is not None, "relocalization against loaded map failed"
        R_est, t_est = r
        C_est = -R_est.T @ t_est
        Rg, tg = np.asarray(poses[i][0]), np.asarray(poses[i][1])
        C_gt = -Rg.T @ tg
        assert np.linalg.norm(C_est - C_gt) < 0.1
        # Localization mode must not grow the map.
        assert int(sys2.tracker.map.n_kf) == int(sys_.tracker.map.n_kf)


class TestViz:
    def test_render_map_topdown(self, mapped_run, tmp_path):
        sys_, frames, poses = mapped_run
        p = tmp_path / "map.png"
        sys_.render_map(str(p))
        from PIL import Image

        img = Image.open(p)
        assert img.size == (800, 800)
        arr = np.asarray(img)
        # Should contain dark map points and the green trajectory.
        assert (arr < 100).any()
        assert ((arr[:, :, 1] > 120) & (arr[:, :, 0] < 80)).any()

    def test_draw_frame(self, mapped_run, tmp_path):
        sys_, frames, poses = mapped_run
        from tpuslam.viz import draw_frame

        feats = sys_.tracker._last_feats
        obs = sys_.tracker._last_obs
        img = draw_frame(
            frames[-1][0],
            np.asarray(feats.xy),
            np.asarray(feats.valid),
            np.asarray(obs) >= 0,
            state_text="OK | test",
        )
        p = tmp_path / "frame.png"
        img.save(p)
        assert p.stat().st_size > 1000


class TestMetrics:
    def test_stage_timer(self):
        met = Metrics()
        with met.stage("track"):
            x = sum(range(1000))
        met.inc("frames")
        rep = met.report()
        assert rep["counters"]["frames"] == 1
        assert rep["stages"]["track"]["n"] == 1
        assert rep["stages"]["track"]["median_ms"] >= 0.0


class TestBoWRelocalization:
    def test_reloc_via_bow_candidates(self, mapped_run):
        """Force LOST, then relocalize: with a trained vocabulary the BoW
        candidate path must produce keyframe candidates and succeed."""
        from tpuslam.pipeline.tracker import TrackingState

        sys_, frames, poses = mapped_run
        tr = sys_.tracker
        assert tr.loop_closer is not None and tr.loop_closer.voc is not None, (
            "vocabulary should have been trained during mapping"
        )
        tr.state = TrackingState.LOST
        i = 9
        feats = tr._frame_features_stereo(
            jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1])
        )
        cands = tr._reloc_candidate_kfs(feats)
        assert cands, "BoW query returned no relocalization candidates"
        r = sys_.track_stereo(
            jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]), 123.0
        )
        assert r is not None
        assert sys_.tracker.state == TrackingState.OK
        R_est, t_est = r
        C_est = -R_est.T @ t_est
        Rg, tg = np.asarray(poses[i][0]), np.asarray(poses[i][1])
        C_gt = -Rg.T @ tg
        assert np.linalg.norm(C_est - C_gt) < 0.1


class TestLiveViewer:
    def test_http_roundtrip(self):
        """LiveViewer serves the page and a map snapshot over real HTTP."""
        import json
        import urllib.request

        from tpuslam.mapstate.core import make_empty_map
        from tpuslam.viz.server import LiveViewer

        m = make_empty_map(8, 16, 64)
        m = m._replace(
            pt_xyz=m.pt_xyz.at[:3].set(jnp.asarray([[0.0, 0, 2], [1, 0, 3], [0, 1, 4]])),
            pt_valid=m.pt_valid.at[:3].set(True),
            kf_valid=m.kf_valid.at[0].set(True),
            n_kf=jnp.asarray(1),
        )
        v = LiveViewer(port=0)  # OS-assigned free port
        try:
            v.update(
                m,
                trajectory=[np.zeros(3), np.ones(3)],
                cam_R=np.eye(3),
                cam_t=np.zeros(3),
                status="OK",
            )
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/", timeout=10
            ).read()
            assert b"tpuslam live viewer" in page
            state = json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{v.port}/state", timeout=10
                ).read()
            )
            assert len(state["points"]) == 3
            assert len(state["kfs"]) == 1
            assert len(state["traj"]) == 2
            assert state["cam"] is not None
            assert state["status"] == "OK"
        finally:
            v.close()

    def test_system_attach_viewer(self):
        """System.attach_viewer publishes after tracked frames."""
        from tpuslam.viz.server import LiveViewer

        # Minimal check that the hook is wired; full tracking covered by
        # integration tests.
        import urllib.request, json
        from tpuslam.geometry.camera import PinholeCamera
        from tpuslam.pipeline import SensorType, System

        cam = PinholeCamera(fx=100.0, fy=100.0, cx=32.0, cy=32.0, width=64, height=64)
        sys_ = System(cam, SensorType.MONOCULAR)
        v = sys_.attach_viewer(port=0)
        try:
            img = np.zeros((64, 64), np.float32)
            sys_.track_monocular(img, 0.0)  # no features; state machine only
            state = json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{v.port}/state", timeout=10
                ).read()
            )
            assert "frame=1" in state["status"]
        finally:
            v.close()
