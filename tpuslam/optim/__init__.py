"""Nonlinear least-squares optimization: pose-only GN/LM, bundle adjustment
with Schur-complement CG, Sim3 and pose-graph optimization.

TPU-native replacement for the reference's g2o usage
(/root/reference/src/Optimizer.cc): instead of building sparse graphs with
pointer vertices/edges and a CSparse-style Cholesky, problems are expressed
over fixed-capacity arrays (poses [K], points [P], observations as COO edge
lists [E]) and solved with batched Gauss-Newton / Levenberg-Marquardt whose
linear systems are either tiny dense (pose-only: 6x6) or matrix-free
preconditioned CG on the Schur complement (BA) — all jit-compiled.
"""

from tpuslam.optim.pose import pose_optimization, PoseObs
from tpuslam.optim.ba import BAProblem, bundle_adjustment
from tpuslam.optim.robust import huber_weight, CHI2_MONO, CHI2_STEREO
