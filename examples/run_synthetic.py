"""End-to-end demo on the synthetic renderer (no dataset required).

Runs mono and stereo SLAM on a rendered staircase scene, prints per-frame
state, tracking time, and final Sim3/SE3-aligned ATE. This is the quickest
way to see the whole pipeline run (see .claude/skills/verify/SKILL.md).

Usage: python examples/run_synthetic.py [mono|stereo|rgbd] [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# Honor JAX_PLATFORMS=cpu: the axon sitecustomize re-pins jax_platforms via
# jax.config at interpreter start, so the env var alone is not enough.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    import jax.numpy as jnp

    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.ops.orb import ORBConfig
    from tpuslam.pipeline import SensorType, System
    from tpuslam.sfm import horn_sim3

    from synthetic import StepWallScene, orbit_trajectory

    mode = sys.argv[1] if len(sys.argv) > 1 else "mono"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    baseline = 0.12
    cam = PinholeCamera(
        fx=350.0, fy=350.0, cx=160.0, cy=120.0,
        bf=350.0 * baseline if mode != "mono" else 0.0,
        width=320, height=240,
    )
    rng = np.random.default_rng(11)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(n_frames, step=0.045)
    sensor = {"mono": SensorType.MONOCULAR, "stereo": SensorType.STEREO,
              "rgbd": SensorType.RGBD}[mode]
    # init_min_matches scales with the feature budget: the reference's 100
    # assumes a 1000-feature configuration (Tracking.cc:637); this demo
    # runs 400 features on a quarter-size image.
    sys_ = System(cam, sensor, orb=ORBConfig(n_features=400),
                  max_keyframes=60, max_points=8000, kf_max_frames=10,
                  init_min_matches=60)

    times = []
    for i, (R, t) in enumerate(poses):
        R, t = np.asarray(R), np.asarray(t)
        t0 = time.perf_counter()
        if mode == "mono":
            r = sys_.track_monocular(jnp.asarray(scene.render(cam, R, t)), i / 30.0)
        elif mode == "stereo":
            imgL = scene.render(cam, R, t)
            imgR = scene.render(cam, R, t - np.array([baseline, 0, 0], np.float32))
            r = sys_.track_stereo(jnp.asarray(imgL), jnp.asarray(imgR), i / 30.0)
        else:
            img, depth = scene.render(cam, R, t, with_depth=True)
            r = sys_.track_rgbd(jnp.asarray(img), jnp.asarray(depth), i / 30.0)
        times.append(time.perf_counter() - t0)
        print(f"frame {i:3d}: {sys_.state.name:16s} {times[-1]*1000:7.1f} ms")

    print(sys_.map_stats())
    print(f"median frame time: {np.median(times)*1000:.1f} ms")

    est, gt = [], []
    for fid, R, t, lost in sys_.tracker.export_trajectory():
        if lost:
            continue
        est.append(-R.T @ t)
        Rg, tg = poses[fid]
        gt.append(-np.asarray(Rg).T @ np.asarray(tg))
    if len(est) > 5:
        est = np.asarray(est, np.float32)
        gt = np.asarray(gt, np.float32)
        fix = mode != "mono"
        s, Ra, ta = horn_sim3(jnp.asarray(est), jnp.asarray(gt),
                              jnp.ones(len(est)), fix_scale=fix)
        al = float(s) * est @ np.asarray(Ra).T + np.asarray(ta)
        ate = np.sqrt(np.mean(np.sum((al - gt) ** 2, -1)))
        print(f"ATE RMSE ({'SE3' if fix else 'Sim3'}-aligned): {ate:.4f} over {len(est)} frames")
    sys_.save_trajectory_tum(f"/tmp/synthetic_{mode}_traj.txt")
    print(f"trajectory: /tmp/synthetic_{mode}_traj.txt")


if __name__ == "__main__":
    main()
