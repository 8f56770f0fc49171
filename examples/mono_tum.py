"""Monocular TUM driver (counterpart of
/root/reference/Examples/Monocular/mono_tum.cc).

Usage: python examples/mono_tum.py <settings.yaml> <sequence_dir> [out.txt]
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
    seq = TUMSequence(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "KeyFrameTrajectory.txt"

    sys_ = System(
        settings.cam,
        SensorType.MONOCULAR,
        orb=settings.orb,
        kf_max_frames=int(settings.fps),
        th_depth_factor=settings.th_depth_factor,
    )
    times = []
    for t, gray, _ in seq:
        t0 = time.perf_counter()
        sys_.track_monocular(jnp.asarray(gray), t)
        times.append(time.perf_counter() - t0)
    print(f"median tracking time: {np.median(times)*1000:.1f} ms")
    print(f"mean tracking time:   {np.mean(times)*1000:.1f} ms")
    print(sys_.map_stats())
    sys_.save_trajectory_tum(out)
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
