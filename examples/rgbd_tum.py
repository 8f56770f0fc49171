"""RGB-D TUM driver (counterpart of /root/reference/Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py <settings.yaml> <sequence_dir> <associations.txt> [out.txt]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from tpuslam.io import TUMSequence, load_settings
    from tpuslam.pipeline import SensorType, System

    settings = load_settings(sys.argv[1])
    seq = TUMSequence(sys.argv[2], association=sys.argv[3],
                      depth_factor=settings.depth_map_factor or 1.0 / 5000.0)
    out = sys.argv[4] if len(sys.argv) > 4 else "CameraTrajectory.txt"

    sys_ = System(
        settings.cam,
        SensorType.RGBD,
        orb=settings.orb,
        kf_max_frames=int(settings.fps),
        th_depth_factor=settings.th_depth_factor,
    )
    times = []
    for t, gray, depth in seq:
        t0 = time.perf_counter()
        sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth), t)
        times.append(time.perf_counter() - t0)
    print(f"median tracking time: {np.median(times)*1000:.1f} ms")
    print(sys_.map_stats())
    sys_.save_trajectory_tum(out)
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
