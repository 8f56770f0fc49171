"""Pipeline orchestration: tracking, local mapping, loop closing, System.

The reference runs four pthreads over a shared mutex-protected map
(/root/reference/src/System.cc:95-123). Here the per-frame hot path is a
handful of jit-compiled step functions over immutable MapState snapshots,
orchestrated by a host-side Tracker/System; mapping work (triangulation,
local BA) runs as batched jitted jobs between frames — same semantics as
the reference's thread protocol (SURVEY.md P1-P6) without locks.
"""

from tpuslam.pipeline.tracker import Tracker, TrackerConfig, TrackingState
from tpuslam.pipeline.system import System, SensorType
