"""Long-sequence soak test (VERDICT r2 item 4): 1000+ frames through the
full System with every capacity/async mechanism engaged at once —
async mapping worker with the InterruptBA protocol, keyframe slot
recycling + force eviction (tiny max_keyframes), loop closing with the
async abortable GBA worker, and distributed BA over the virtual CPU mesh.
This is the only place the recycling x loop-closing x async-GBA
interactions run together.

Stereo: monocular bootstrap + the 0.9 ref-ratio insertion gate assume
LocalMapping keeps pace with the camera, which a 2-core test host cannot
do — stereo's metric scale and close-point insertion pressure make the
endurance scenario about the CAPACITY machinery (the thing under test)
rather than about host speed. (Mono endurance is covered at smaller scale
by test_integration_mono and the head-to-head harness on the TPU.)

Run with `pytest -m soak` (excluded from the default fast/slow tiers —
~40 min on a 2-core host). Numbers recorded in BASELINE.md.
"""

import os
import sys
import time

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.seqgen import RoomScene, circle_loop_trajectory  # noqa: E402
from tpuslam.geometry.camera import PinholeCamera  # noqa: E402
from tpuslam.ops.orb import ORBConfig  # noqa: E402
from tpuslam.pipeline import SensorType, System  # noqa: E402

pytestmark = pytest.mark.soak

BASELINE_M = 0.12
CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=260.0 * BASELINE_M)
N_FRAMES = 1000
LOOPS = 2.15  # two full revisits


def _ate_se3(est, gt):
    """SE3-aligned ATE RMSE between matched (frame_id -> position) dicts."""
    ids = sorted(set(est) & set(gt))
    A = np.stack([est[i] for i in ids])
    B = np.stack([gt[i] for i in ids])
    mu_a, mu_b = A.mean(0), B.mean(0)
    Ac, Bc = A - mu_a, B - mu_b
    H = Ac.T @ Bc
    U, S, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    t = mu_b - R @ mu_a
    err = (R @ A.T).T + t - B
    return float(np.sqrt((err**2).sum(axis=1).mean())), len(ids)


def test_soak_1000_frames_loop_twice():
    rng = np.random.default_rng(42)
    scene = RoomScene(rng)
    # ease: start from rest (async mapping's cold-compile window passes
    # before real motion begins — a robot starting at standstill).
    poses = circle_loop_trajectory(N_FRAMES, radius=1.5, loops=LOOPS, ease=0.08)

    sys_ = System(
        CAM,
        SensorType.STEREO,
        orb=ORBConfig(n_features=500),
        max_keyframes=40,      # force slot recycling well before the end
        max_points=12_000,     # force point-slot compaction
        async_mapping=True,
        # 2 shards, not 8: an N-participant CPU all-reduce needs N device
        # threads scheduled concurrently; on this 2-core host the 8-way
        # rendezvous times out under load and XLA aborts. Real hardware
        # gives each participant its own chip; the 8-way form is covered
        # (unloaded) by dryrun_multichip and test_dist_ba.
        dist_ba_devices=2,
        kf_max_frames=10,
    )
    tracked = 0
    t0 = time.time()
    for i, (R, t) in enumerate(poses):
        img = scene.render(CAM.fx, CAM.fy, CAM.cx, CAM.cy, 320, 240, R, t,
                           ssaa=1)
        tR = np.asarray(t) + np.array([-BASELINE_M, 0.0, 0.0], np.float32)
        imgR = scene.render(CAM.fx, CAM.fy, CAM.cx, CAM.cy, 320, 240, R, tR,
                            ssaa=1)
        out = sys_.track_stereo(
            jnp.asarray(img.astype(np.float32)),
            jnp.asarray(imgR.astype(np.float32)), i / 30.0,
        )
        if out is not None:
            tracked += 1
        if i % 100 == 0:
            print(f"frame {i}: tracked={tracked} state={sys_.state.name} "
                  f"kf={int(sys_.tracker.map.n_kf)} "
                  f"recycled={sys_.tracker.n_recycled_kf_slots} "
                  f"loops={sys_.tracker.loop_closer.n_loops_closed} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    sys_.shutdown()

    # Tracking must survive the whole run.
    assert tracked >= 0.9 * N_FRAMES, tracked
    # Capacity machinery engaged (40-slot cap vs ~80+ insertions).
    assert sys_.tracker.n_recycled_kf_slots > 0
    # Loop closing fired on a revisit.
    assert sys_.tracker.loop_closer.n_loops_closed >= 1
    # Final trajectory accuracy (SE3; stereo scale is metric). The loop is
    # ~9.4 m long; demand cm-level RMSE.
    est = {}
    for fid, R, t, lost in sys_.tracker.export_trajectory():
        if not lost:
            est[fid] = -R.T @ t
    gt = {}
    for i, (R, t) in enumerate(poses):
        gt[i] = -np.asarray(R).T @ np.asarray(t)
    ate, n = _ate_se3(est, gt)
    recent_ids = {i for i in est if i >= N_FRAMES - 300}
    ate_recent, n_recent = _ate_se3(
        {i: est[i] for i in recent_ids}, gt
    )
    print(f"soak ATE RMSE (SE3): full {ate:.4f} m over {n} poses, "
          f"last-300 {ate_recent:.4f} m over {n_recent}; "
          f"tracked {tracked}/{N_FRAMES}; "
          f"recycled {sys_.tracker.n_recycled_kf_slots} KF slots; "
          f"loops closed {sys_.tracker.loop_closer.n_loops_closed}")
    assert n >= 0.85 * N_FRAMES
    # Full-trajectory bound is loose by design: with only 40 keyframe
    # slots, ~80 forced evictions resolve early poses through long frozen
    # relative-pose chains the later loop correction can only partially
    # repair (the reference never runs this regime — it assumes unbounded
    # memory). What must stay tight is the LIVE map: the last 300 frames
    # resolve against resident keyframes.
    assert ate < 0.5, ate
    assert ate_recent < 0.12, ate_recent
