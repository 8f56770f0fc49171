"""MultiTracker: B independent sessions with a batched front end
(pipeline/multi.py — the user-facing form of the frames/s/chip batching)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.synthetic import StepWallScene, orbit_trajectory
from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline.multi import MultiTracker
from tpuslam.pipeline.tracker import TrackerConfig, TrackingState

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    """The batched MultiTracker programs are the largest compiles in the
    suite; after ~35 other tests the accumulated XLA:CPU jit state makes
    that compile segfault (suite-order crash, VERDICT r4). Dropping every
    cached executable + trace before this module compiles keeps the
    sequential full-suite run green; tests themselves are unchanged."""
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
    yield


def _config():
    return TrackerConfig(
        cam=CAM,
        orb=ORBConfig(n_features=500),
        max_keyframes=32,
        max_points=8192,
        enable_loop_closing=False,
        # The reference's 100-match init gate assumes a 1000-feature
        # budget; scale it to this test's 500.
        init_min_matches=60,
    )


def test_two_streams_track_independently():
    rng = np.random.default_rng(0)
    scenes = [StepWallScene(np.random.default_rng(s)) for s in (1, 2)]
    n = 20
    trajs = [
        orbit_trajectory(n, step=0.05, yaw_rate=0.003),
        orbit_trajectory(n, step=0.04, yaw_rate=-0.002),
    ]
    mt = MultiTracker.uniform(_config(), 2)
    ok_counts = [0, 0]
    for i in range(n):
        imgs = np.stack(
            [scenes[b].render(CAM, *trajs[b][i]) for b in range(2)]
        ).astype(np.float32)
        outs = mt.track_monocular(jnp.asarray(imgs), i)
        for b, o in enumerate(outs):
            if o is not None:
                ok_counts[b] += 1
    mt.shutdown()
    # Both streams must initialize and track through most of the run.
    for b in range(2):
        assert mt.trackers[b].state == TrackingState.OK, (b, ok_counts)
        assert ok_counts[b] >= n // 2, (b, ok_counts)
    # Sessions are independent: distinct maps, both populated.
    n0 = int(np.asarray(mt.trackers[0].map.pt_valid).sum())
    n1 = int(np.asarray(mt.trackers[1].map.pt_valid).sum())
    assert n0 > 100 and n1 > 100
    # Trajectories differ (different scenes/trajectories).
    t0 = mt.trackers[0].export_trajectory()
    t1 = mt.trackers[1].export_trajectory()
    assert len(t0) > 5 and len(t1) > 5


def test_multi_matches_single_stream():
    """A MultiTracker stream must produce the same trajectory as a plain
    Tracker fed the identical frames (the batched front end is exact)."""
    from tpuslam.pipeline.tracker import Tracker

    scene = StepWallScene(np.random.default_rng(3))
    n = 14
    poses = orbit_trajectory(n, step=0.05, yaw_rate=0.003)
    frames = [scene.render(CAM, R, t).astype(np.float32) for R, t in poses]

    single = Tracker(_config())
    for i, f in enumerate(frames):
        single.track_monocular(jnp.asarray(f), i)
    mt = MultiTracker.uniform(_config(), 2)
    for i, f in enumerate(frames):
        mt.track_monocular(jnp.asarray(np.stack([f, f])), i)
    ts = single.export_trajectory()
    tm = mt.trackers[0].export_trajectory()
    assert len(ts) == len(tm)
    for (fa, Ra, ta, la), (fb, Rb, tb, lb) in zip(ts, tm):
        assert fa == fb and la == lb
        np.testing.assert_allclose(ta, tb, atol=1e-4)
    mt.shutdown()
    single.shutdown()
