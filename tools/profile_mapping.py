"""Profile the LocalMapping epoch (mapping_front + local BA) on the real
chip, stage by stage — the round-5 target is an order-of-magnitude cut of
the ~1.9 s/keyframe epoch of round 4 (VERDICT r5 item 1).

Builds a representative map by tracking a short synthetic orbit at the
e2e-bench operating point (64 KFs cap, 16k points, 1000 features), then
times each mapping stage in isolation with the tunnel RTT amortized.

Usage: python tools/profile_mapping.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from synthetic import StepWallScene, orbit_trajectory
    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.ops.orb import ORBConfig
    from tpuslam.pipeline import steps
    from tpuslam.pipeline.tracker import Tracker, TrackerConfig

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rng = np.random.default_rng(3)
    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    scene = StepWallScene(rng)
    poses = orbit_trajectory(n_frames, step=0.02, yaw_rate=0.002)
    cfg = TrackerConfig(
        cam=cam, orb=ORBConfig(n_features=1000),
        max_keyframes=64, max_points=16384,
        enable_loop_closing=False, async_mapping=False,
    )
    tracker = Tracker(cfg)
    t0 = time.perf_counter()
    for i, img in enumerate(scene.render(cam, R, t) for R, t in poses):
        tracker.track_monocular(jnp.asarray(img), i)
    print(f"built map in {time.perf_counter()-t0:.1f}s: "
          f"{int(tracker.map.n_kf)} KFs, {int(tracker.map.n_pt)} pts")
    m = tracker.map
    ki = int(np.asarray(m.kf_frame_id).argmax())

    def bench(label, fn, n=10):
        out = fn()  # compile
        jax.block_until_ready(out.kf_R if hasattr(out, "kf_R") else out)
        np.asarray(out.kf_R[0] if hasattr(out, "kf_R") else out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out.kf_R[0] if hasattr(out, "kf_R") else out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:36s} {dt:9.2f} ms")
        return dt

    nn = 20
    front = lambda: steps.mapping_front(
        cfg.cam, m, jnp.int32(ki), tracker.inv_sigma2, jnp.float32(3.0),
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        nn_tri=nn, nn_fuse=nn, fuse_hop=cfg.fuse_second_hop,
        window=cfg.local_ba_window,
    )
    bench("mapping_front (full)", front)
    # Stage isolation: triangulation only (fuse_hop=0, nn_fuse=1 ~ minimal)
    bench("mapping_front nn_fuse=1 hop=0", lambda: steps.mapping_front(
        cfg.cam, m, jnp.int32(ki), tracker.inv_sigma2, jnp.float32(3.0),
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        nn_tri=nn, nn_fuse=1, fuse_hop=0, window=cfg.local_ba_window,
    ))
    bench("mapping_front nn_tri=1 full fuse", lambda: steps.mapping_front(
        cfg.cam, m, jnp.int32(ki), tracker.inv_sigma2, jnp.float32(3.0),
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        nn_tri=1, nn_fuse=nn, fuse_hop=cfg.fuse_second_hop,
        window=cfg.local_ba_window,
    ))
    max_edges = cfg.local_ba_max_edges or 32 * cfg.orb.n_features
    bench("local_bundle_adjustment (4 it)", lambda: steps.local_bundle_adjustment(
        cfg.cam, m, jnp.int32(ki), tracker.inv_sigma2,
        window=cfg.local_ba_window, n_levels=cfg.orb.n_levels,
        iters=4, max_edges=max_edges, active_max=cfg.local_ba_active_max,
    ))


if __name__ == "__main__":
    main()
