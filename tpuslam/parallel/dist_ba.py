"""Distributed bundle adjustment over a device mesh.

Two decompositions, the SLAM analogs of data and model parallelism:

1. **Observation-parallel** (`distributed_bundle_adjustment`): edge
   (observation) arrays shard along the `edges` mesh axis; poses and points
   stay replicated. GSPMD partitions the single-program BA under these
   shardings and turns the scatter-adds into the (K, 6, 6) / (P, 3, 3)
   systems into ICI all-reduces — the psum-reduced Schur assembly of
   SURVEY.md §2.4 P7, with zero changes to the solver.

2. **Point-sharded / model-parallel** (`point_sharded_bundle_adjustment`):
   the point state itself is split into contiguous blocks, one per device,
   and every edge is routed to the shard that owns its point. Under
   `shard_map`, all point-side work (Hll assembly, 3x3 inverses, Schur
   back-substitution) is shard-local with NO communication; only the small
   pose-side system (K x 6) crosses ICI, as explicit psums inside the
   solver (`bundle_adjustment(axis_name=...)`). Poses are deliberately
   replicated rather than reduce_scattered: K <= a few hundred keyframes is
   tiny next to P, and the scaling-book rule is to replicate small state and
   shard the big axis. This is the decomposition that scales map capacity
   with slice size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.optim.ba import BAProblem, bundle_adjustment

EDGE_AXIS = "edges"
PT_AXIS = "points"


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


def route_edges_to_point_shards(prob: BAProblem, n_shards: int):
    """Reorder + pad edges so shard s holds exactly the edges of point block
    s (host-side preprocessing for the point-sharded solver).

    Points are split into n_shards contiguous blocks of P/n_shards. Returns
    (prob_routed, perm (E_pad,) int64) where prob_routed's edge arrays are
    laid out [shard0 edges + padding, shard1 edges + padding, ...] with
    E_pad = n_shards * max_edges_per_shard, and perm maps routed positions
    back to original edge indices (-1 for padding).
    """
    Pn = prob.X.shape[0]
    assert Pn % n_shards == 0, "pad point capacity to a multiple of the mesh"
    blk = Pn // n_shards
    pt = np.asarray(prob.pt)
    owner = pt // blk
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_shards)
    per = int(counts.max())
    E_pad = n_shards * per
    perm = np.full(E_pad, -1, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for s in range(n_shards):
        sl = order[starts[s] : starts[s] + counts[s]]
        perm[s * per : s * per + counts[s]] = sl

    def take(a, fill=0):
        out = np.full((E_pad,) + a.shape[1:], fill, a.dtype)
        out[perm >= 0] = np.asarray(a)[perm[perm >= 0]]
        return jnp.asarray(out)

    # Padding edges point at slot 0 OF THEIR OWN BLOCK so local indices stay
    # in range; their valid mask is False.
    pt_routed = np.where(
        perm >= 0,
        np.asarray(prob.pt)[np.maximum(perm, 0)],
        np.repeat(np.arange(n_shards) * blk, per),
    ).astype(np.int32)
    routed = prob._replace(
        kf=take(np.asarray(prob.kf)),
        pt=jnp.asarray(pt_routed),
        uvr=take(np.asarray(prob.uvr)),
        inv_sigma2=take(np.asarray(prob.inv_sigma2)),
        valid=jnp.asarray(
            np.where(perm >= 0, np.asarray(prob.valid)[np.maximum(perm, 0)], False)
        ),
    )
    return routed, perm


def point_sharded_bundle_adjustment(
    cam: PinholeCamera,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
    use_huber: bool = True,
    cg_iters: int = 40,
):
    """Model-parallel BA: point blocks + their edges sharded over `mesh`
    (axis `points`), pose state replicated, pose-system reductions psum'd.

    Same stationary points as the single-chip solver. Returns
    (R, t, X, edge_chi2) with edge_chi2 in the ORIGINAL edge order
    (padding-edge entries dropped).
    """
    from jax import shard_map

    n = mesh.devices.size
    P0 = prob.X.shape[0]
    pad_p = (-P0) % n
    if pad_p:
        prob = prob._replace(
            X=jnp.pad(prob.X, ((0, pad_p), (0, 0))),
            fixed_pt=jnp.pad(prob.fixed_pt, (0, pad_p), constant_values=True),
        )
    Pn = prob.X.shape[0]
    blk = Pn // n
    routed, perm = route_edges_to_point_shards(prob, n)

    pt_s = NamedSharding(mesh, P(PT_AXIS))
    repl = NamedSharding(mesh, P())

    def body(R, t, X_blk, kf, pt_local, uvr, inv_sigma2, valid,
             fixed_kf, fixed_pt_blk):
        local = BAProblem(
            R=R, t=t, X=X_blk, kf=kf, pt=pt_local, uvr=uvr,
            inv_sigma2=inv_sigma2, valid=valid,
            fixed_kf=fixed_kf, fixed_pt=fixed_pt_blk,
        )
        return bundle_adjustment(
            cam, local, iters=iters, use_huber=use_huber,
            cg_iters=cg_iters, axis_name=PT_AXIS,
        )

    # Local point indices within each shard's block.
    shard_of_edge = jnp.repeat(jnp.arange(n, dtype=jnp.int32), routed.kf.shape[0] // n)
    pt_local = routed.pt - shard_of_edge * blk

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(), P(PT_AXIS), P(PT_AXIS), P(PT_AXIS), P(PT_AXIS),
            P(PT_AXIS), P(PT_AXIS), P(), P(PT_AXIS),
        ),
        out_specs=(P(), P(), P(PT_AXIS), P(PT_AXIS)),
    )
    R, t, X, chi2_routed = jax.jit(fn)(
        prob.R, prob.t, prob.X, routed.kf, pt_local, routed.uvr,
        routed.inv_sigma2, routed.valid, prob.fixed_kf, prob.fixed_pt,
    )
    # Un-route chi2 to original edge order; drop point-capacity padding.
    E = prob.kf.shape[0]
    chi2 = jnp.zeros((E,))
    keep = perm >= 0
    chi2 = chi2.at[jnp.asarray(perm[keep])].set(chi2_routed[jnp.asarray(np.nonzero(keep)[0])])
    return R, t, X[:P0], chi2
