"""Distributed bundle adjustment over a device mesh.

Observation-parallel decomposition: the edge (observation) arrays shard
along the `edges` mesh axis; poses and points stay replicated. Inside
bundle_adjustment every per-edge quantity (residuals, Jacobian blocks,
Schur mat-vec partial products) is computed on the shard that owns the
edge, and the scatter-adds into the (K, 6, 6) / (P, 3, 3) systems become
XLA all-reduces over ICI — the psum-reduced Schur assembly described in
SURVEY.md section 2.4 P7, with zero changes to the solver itself (GSPMD
partitions the single-program BA under these shardings).

This is the analog of data parallelism for SLAM: the model state (map) is
small (poses+points), the observations are the big batch. Keyframe/point
model sharding (the FSDP analog) comes in later rounds once map capacities
outgrow a single chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.optim.ba import BAProblem, bundle_adjustment

EDGE_AXIS = "edges"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n_devices devices, axis name `edges`."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (EDGE_AXIS,))


def _pad_edges(prob: BAProblem, multiple: int) -> BAProblem:
    """Pad edge arrays so E divides the mesh size (padding edges invalid)."""
    E = prob.kf.shape[0]
    rem = (-E) % multiple
    if rem == 0:
        return prob
    return prob._replace(
        kf=jnp.pad(prob.kf, (0, rem)),
        pt=jnp.pad(prob.pt, (0, rem)),
        uvr=jnp.pad(prob.uvr, ((0, rem), (0, 0)), constant_values=-1.0),
        inv_sigma2=jnp.pad(prob.inv_sigma2, (0, rem)),
        valid=jnp.pad(prob.valid, (0, rem), constant_values=False),
    )


def shard_ba_problem(prob: BAProblem, mesh: Mesh) -> BAProblem:
    """Place edge arrays sharded over the mesh, state replicated."""
    n = mesh.devices.size
    prob = _pad_edges(prob, n)
    edge = NamedSharding(mesh, P(EDGE_AXIS))
    edge2 = NamedSharding(mesh, P(EDGE_AXIS, None))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return BAProblem(
        R=put(prob.R, repl),
        t=put(prob.t, repl),
        X=put(prob.X, repl),
        kf=put(prob.kf, edge),
        pt=put(prob.pt, edge),
        uvr=put(prob.uvr, edge2),
        inv_sigma2=put(prob.inv_sigma2, edge),
        valid=put(prob.valid, edge),
        fixed_kf=put(prob.fixed_kf, repl),
        fixed_pt=put(prob.fixed_pt, repl),
    )


def distributed_bundle_adjustment(
    cam: PinholeCamera,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
    use_huber: bool = True,
    cg_iters: int = 40,
):
    """Run BA with edges sharded over `mesh`. Same result as the single-chip
    solver; XLA inserts the ICI collectives for the Schur reductions."""
    prob = shard_ba_problem(prob, mesh)
    edge = NamedSharding(mesh, P(EDGE_AXIS))
    repl = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda p: bundle_adjustment(
            cam, p, iters=iters, use_huber=use_huber, cg_iters=cg_iters
        ),
        out_shardings=(repl, repl, repl, edge),
    )
    return fn(prob)
