"""Lie groups, camera models and multi-view geometry primitives.

Everything here is pure jax.numpy, broadcasts over arbitrary leading batch
dimensions, and is safe under jit/vmap/grad.
"""

from tpuslam.geometry.se3 import (
    hat,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_compose,
    se3_inverse,
    se3_apply,
    quat_to_rotmat,
    rotmat_to_quat,
)
from tpuslam.geometry.sim3 import (
    sim3_exp,
    sim3_log,
    sim3_compose,
    sim3_inverse,
    sim3_apply,
)
from tpuslam.geometry.camera import (
    PinholeCamera,
    project,
    unproject,
    distort,
    undistort_points,
)
from tpuslam.geometry.triangulation import triangulate_dlt, triangulate_two_view
