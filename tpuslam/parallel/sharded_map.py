"""Sharded map residency: point blocks live on different devices/hosts.

ROADMAP item 13 / SURVEY.md §5 "long-context" analog: the reference handles
map growth only by culling; the TPU-native answer is to shard the map's BIG
axis — the point arrays (positions, descriptors, normals, counters) — into
contiguous blocks over the mesh, with the small keyframe state replicated
(the scaling-book rule: shard the large axis, replicate the small one).
Map capacity then scales with slice size instead of one chip's HBM.

What each operation needs:

- **Projection matching / frustum queries** (Tracking::TrackLocalMap): each
  shard projects and matches ITS point block against the (replicated)
  frame's keypoints — per-point outputs stay sharded, no communication at
  all. `sharded_search_local_points` demonstrates the placement; under
  GSPMD the single-chip code partitions unchanged.
- **Covisibility** (KeyFrame::UpdateConnections): shared-point counts are a
  sum of per-block incidence products — one (K, K) psum
  (`sharded_covisibility_weights`).
- **Local/global BA**: already point-sharded (`parallel/dist_ba.py`).

Keyframe state (poses, keypoint tables, observation tables) is replicated:
K <= a few hundred at 2 MB/KF is small next to P, and every shard needs the
observation table to find its own block's rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.mapstate.core import MapState

PT_AXIS = "points"

# MapState fields whose leading axis is point capacity.
_POINT_FIELDS = (
    "pt_xyz", "pt_valid", "pt_desc", "pt_normal", "pt_min_dist",
    "pt_max_dist", "pt_ref_kf", "pt_first_kf", "pt_found", "pt_visible",
)


def pad_point_capacity(m: MapState, multiple: int) -> MapState:
    """Grow point capacity to a multiple of the mesh size (new slots
    invalid)."""
    Pn = m.capacity_pt
    rem = (-Pn) % multiple
    if rem == 0:
        return m
    rep = {}
    for f in _POINT_FIELDS:
        a = getattr(m, f)
        pad = [(0, rem)] + [(0, 0)] * (a.ndim - 1)
        rep[f] = jnp.pad(a, pad)
    return m._replace(**rep)


def shard_map_state(m: MapState, mesh: Mesh) -> MapState:
    """Place the map with point arrays sharded over `mesh` (axis `points`)
    and keyframe arrays replicated."""
    n = mesh.devices.size
    m = pad_point_capacity(m, n)
    repl = NamedSharding(mesh, P())
    rep = {}
    for f, a in m._asdict().items():
        if f in _POINT_FIELDS:
            spec = P(PT_AXIS, *([None] * (a.ndim - 1)))
            rep[f] = jax.device_put(a, NamedSharding(mesh, spec))
        else:
            rep[f] = jax.device_put(a, repl)
    return MapState(**rep)


def sharded_covisibility_weights(m: MapState, mesh: Mesh) -> jnp.ndarray:
    """(K, K) covisibility weights with the incidence product computed
    per point block and psum-reduced (the distributed form of
    mapstate.covisibility_weights; KeyFrame.cc:289-379 semantics)."""
    from jax import shard_map

    n = mesh.devices.size
    m = pad_point_capacity(m, n)
    K, N = m.kf_obs_pt.shape
    Pn = m.capacity_pt
    blk = Pn // n

    def body(kf_obs_pt, kf_kp_valid, kf_valid, pt_valid_blk):
        shard = jax.lax.axis_index(PT_AXIS)
        lo = shard * blk
        has = (kf_obs_pt >= 0) & kf_kp_valid & kf_valid[:, None]
        local = kf_obs_pt - lo
        mine = has & (local >= 0) & (local < blk)
        col = jnp.where(mine, local, blk)  # park foreign rows in scratch col
        inc = jnp.zeros((K, blk + 1))
        inc = inc.at[jnp.arange(K)[:, None], col].add(mine.astype(jnp.float32))
        inc = jnp.minimum(inc[:, :blk], 1.0) * pt_valid_blk[None, :]
        w = inc @ inc.T
        return jax.lax.psum(w, PT_AXIS)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(PT_AXIS)),
        out_specs=P(),
    )
    w = jax.jit(fn)(
        m.kf_obs_pt, m.kf_kp_valid, m.kf_valid, m.pt_valid.astype(jnp.float32)
    )
    return w - jnp.diag(jnp.diag(w))


def sharded_search_local_points(
    cam: PinholeCamera,
    m: MapState,
    mesh: Mesh,
    R: jnp.ndarray,
    t: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_level: jnp.ndarray,
    kp_angle: jnp.ndarray,
    kp_valid: jnp.ndarray,
    radius_px: float = 15.0,
):
    """Project every resident map point into the frame and match against the
    (replicated) frame keypoints — each device handles its own point block,
    with no cross-device communication (per-point outputs stay sharded).

    Returns (idx (P,), dist (P,), ok (P,)) with the same values as the
    dense single-device search. The SLAM analog of sharded-KV attention
    lookups: query state replicated, database sharded.
    """
    from tpuslam.geometry.camera import project
    from tpuslam.geometry.se3 import se3_apply
    from tpuslam.matching.search import search_by_projection_points

    n = mesh.devices.size
    m = pad_point_capacity(m, n)
    Pn = m.capacity_pt
    pt_sh = NamedSharding(mesh, P(PT_AXIS))
    pt_sh2 = NamedSharding(mesh, P(PT_AXIS, None))
    repl = NamedSharding(mesh, P())

    def body(pt_xyz, pt_desc, pt_valid, R, t, kp_xy, kp_desc, kp_level,
             kp_angle, kp_valid):
        pc = se3_apply(R, t, pt_xyz)
        uv = project(cam, pc)
        in_front = pc[:, 2] > 0.1
        return search_by_projection_points(
            uv, pt_desc, pt_valid & in_front,
            jnp.full(Pn, radius_px),
            jnp.zeros(Pn, jnp.int32),
            jnp.full(Pn, 7, jnp.int32),
            kp_xy, kp_desc, kp_level, kp_angle, kp_valid,
        )

    fn = jax.jit(
        body,
        in_shardings=(pt_sh2, pt_sh2, pt_sh, repl, repl, repl, repl, repl,
                      repl, repl),
        out_shardings=(pt_sh, pt_sh, pt_sh),
    )
    return fn(
        m.pt_xyz, m.pt_desc, m.pt_valid, R, t,
        kp_xy, kp_desc, kp_level, kp_angle, kp_valid,
    )
