"""Utilities: metrics/tracing, profiling helpers."""

from tpuslam.utils.metrics import Metrics, StageTimer
