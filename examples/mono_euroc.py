"""Monocular EuRoC driver (counterpart of
/root/reference/Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py <settings.yaml> <mav0_root> [timestamps.txt] [out.txt]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from tpuslam.io import EuRoCSequence, load_settings
    from tpuslam.pipeline import SensorType, System

    settings = load_settings(sys.argv[1], width=752, height=480)
    ts = sys.argv[3] if len(sys.argv) > 3 else None
    seq = EuRoCSequence(sys.argv[2], timestamps=ts, stereo=False)
    out = sys.argv[4] if len(sys.argv) > 4 else "KeyFrameTrajectory.txt"

    sys_ = System(
        settings.cam, SensorType.MONOCULAR, orb=settings.orb,
        kf_max_frames=int(settings.fps),
    )
    times = []
    for t, left, _ in seq:
        t0 = time.perf_counter()
        sys_.track_monocular(jnp.asarray(left), t)
        times.append(time.perf_counter() - t0)
    print(f"median tracking time: {np.median(times)*1000:.1f} ms")
    print(sys_.map_stats())
    sys_.save_trajectory_tum(out)


if __name__ == "__main__":
    main()
