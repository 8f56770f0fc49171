"""Monocular AR demo: live-feed tracking + plane detection + cube overlay.

Counterpart of the reference's AR example
(/root/reference/Examples/ROS/ORB_SLAM2/src/AR/ros_mono_ar.cc): frames are
pushed through the live-feed adapter (the ROS-subscriber analog), a
dominant plane is RANSAC-fitted to the well-observed map points, and a
virtual cube resting on it is rendered into each frame.

Usage: python examples/ar_demo.py [n_frames] [out_dir]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    import jax.numpy as jnp

    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.io.live import LiveRunner
    from tpuslam.ops.orb import ORBConfig
    from tpuslam.pipeline import SensorType, System
    from tpuslam.viz.ar import detect_plane, draw_ar_cube
    from tpuslam.viz.render import draw_frame

    from synthetic import StepWallScene, orbit_trajectory

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ar_demo"
    import os

    os.makedirs(out_dir, exist_ok=True)

    cam = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    rng = np.random.default_rng(11)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(n_frames, step=0.045)
    sys_ = System(cam, SensorType.MONOCULAR, orb=ORBConfig(n_features=400),
                  max_keyframes=60, max_points=8000, kf_max_frames=10)

    results = {}
    runner = LiveRunner(
        sys_, on_result=lambda i, ts, pose: results.__setitem__(ts, pose)
    )
    runner.start()
    frames = {}
    for i, (R, t) in enumerate(poses):
        img = scene.render(cam, np.asarray(R), np.asarray(t))
        frames[float(i)] = img
        runner.push(jnp.asarray(img), float(i))
        # Lock-step for the demo: every frame contributes to the map. (A
        # real camera would just keep pushing — the runner drops stale
        # frames when tracking lags, see tests/test_ar_live.py.)
        while runner.n_tracked + runner.n_dropped < runner.n_pushed:
            time.sleep(0.02)
    runner.stop()
    print(f"pushed={runner.n_pushed} tracked={runner.n_tracked} "
          f"dropped={runner.n_dropped} state={sys_.state.name}")

    # Plane from well-observed map points (ViewerAR gates at >5 obs).
    m = sys_.tracker.map
    obs_cnt = np.zeros(m.capacity_pt)
    has = np.asarray((m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None])
    np.add.at(obs_cnt, np.asarray(m.kf_obs_pt)[has], 1)
    well = jnp.asarray(obs_cnt >= 3) & m.pt_valid
    R_last = np.asarray(sys_.tracker._last_R)
    t_last = np.asarray(sys_.tracker._last_t)
    cam_center = jnp.asarray(-R_last.T @ t_last)
    plane = detect_plane(jax.random.PRNGKey(0), m.pt_xyz, well, cam_center)
    if not bool(plane.success):
        print("no plane found (need >= 50 well-observed points)")
        return
    print(f"plane: normal={np.asarray(plane.normal).round(3)} "
          f"inliers={int(plane.inliers.sum())}")

    # Overlay the cube on the frames that tracked.
    n_out = 0
    for ts, pose in sorted(results.items()):
        if pose is None:
            continue
        R, t = pose
        img = draw_ar_cube(frames[ts], cam, R, t, plane, size=0.4)
        img.save(f"{out_dir}/ar_{int(ts):04d}.png")
        n_out += 1
    print(f"wrote {n_out} AR frames to {out_dir}")


if __name__ == "__main__":
    main()
