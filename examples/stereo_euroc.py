"""Stereo EuRoC driver with online rectification (counterpart of
/root/reference/Examples/Stereo/stereo_euroc.cc, incl. its
initUndistortRectifyMap/remap preprocessing).

Usage: python examples/stereo_euroc.py <EuRoC.yaml> <mav0_root> [timestamps.txt] [out.txt]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from tpuslam.io import EuRoCSequence, load_settings
    from tpuslam.io.rectify import StereoRectifier
    from tpuslam.pipeline import SensorType, System

    settings = load_settings(sys.argv[1], width=752, height=480)
    ts = sys.argv[3] if len(sys.argv) > 3 else None
    seq = EuRoCSequence(sys.argv[2], timestamps=ts, stereo=True)
    out = sys.argv[4] if len(sys.argv) > 4 else "CameraTrajectory.txt"

    if settings.left_rect is None:
        raise SystemExit("settings file lacks LEFT./RIGHT. rectification blocks")
    rect = StereoRectifier(
        settings.left_rect, settings.right_rect, settings.cam.width, settings.cam.height
    )

    sys_ = System(
        settings.cam,
        SensorType.STEREO,
        orb=settings.orb,
        kf_max_frames=int(settings.fps),
        th_depth_factor=settings.th_depth_factor,
    )
    times = []
    for t, left, right in seq:
        left, right = rect(left, right)
        t0 = time.perf_counter()
        sys_.track_stereo(jnp.asarray(left), jnp.asarray(right), t)
        times.append(time.perf_counter() - t0)
    print(f"median tracking time: {np.median(times)*1000:.1f} ms")
    print(sys_.map_stats())
    sys_.save_trajectory_tum(out)
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
