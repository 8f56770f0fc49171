"""Geometric solvers: two-view initialization, EPnP, Horn/Sim3 — all as
fixed-size vmapped RANSAC over hypothesis batches (the TPU-native form of
the reference's sequential samplers in Initializer.cc / PnPsolver.cc /
Sim3Solver.cc)."""

from tpuslam.sfm.initializer import initialize_two_view, TwoViewResult
from tpuslam.sfm.pnp import pnp_ransac
from tpuslam.sfm.sim3solver import sim3_ransac, horn_sim3
