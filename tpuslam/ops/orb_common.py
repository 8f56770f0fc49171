"""Shared ORB front-end constants (no jax imports at module scope beyond np)."""

import numpy as np

# FAST-9/16 Bresenham circle of radius 3, clockwise from 12 o'clock:
# (dx, dy) pixel offsets (cv::FAST's circle, used by
# /root/reference/src/ORBextractor.cc:976 via OpenCV).
FAST_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)
