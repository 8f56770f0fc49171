"""MapState: the SoA map and its pure update functions.

Layout (capacities are static; validity masks carve out the live set):

- keyframes: poses T_cw, per-slot keypoint arrays (copied from the frame at
  insertion, like the KeyFrame constructor /root/reference/src/KeyFrame.cc:31),
  and the observation table kf_obs_pt (K, N) mapping each keypoint slot to a
  map-point index (-1 = none) — the array form of both KeyFrame::mvpMapPoints
  and MapPoint::mObservations (the reference stores this relation twice,
  pointer-linked in both directions; one table gives us both directions via
  masked reductions).
- map points: positions, representative descriptor (min-median-Hamming over
  observations, MapPoint::ComputeDistinctiveDescriptors
  /root/reference/src/MapPoint.cc:242), viewing normal + scale range
  (UpdateNormalAndDepth :330), found/visible counters.

Covisibility (KeyFrame::UpdateConnections /root/reference/src/KeyFrame.cc:289)
is derived on demand as one matmul over observation incidence — never stored.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.matching.hamming import hamming_matrix


class FrameFeatures(NamedTuple):
    """Per-frame keypoint arrays (capacity N), the array form of Frame
    (/root/reference/src/Frame.cc): undistorted coords, octave, angle,
    descriptor, stereo virtual-right coord (<0 = mono), depth (0 = unknown)."""

    xy: jnp.ndarray      # (N, 2)
    level: jnp.ndarray   # (N,)
    angle: jnp.ndarray   # (N,)
    desc: jnp.ndarray    # (N, 8) uint32
    valid: jnp.ndarray   # (N,)
    u_right: jnp.ndarray # (N,)
    depth: jnp.ndarray   # (N,)


class MapState(NamedTuple):
    # Keyframes.
    kf_R: jnp.ndarray        # (K, 3, 3) world->cam
    kf_t: jnp.ndarray        # (K, 3)
    kf_valid: jnp.ndarray    # (K,)
    kf_frame_id: jnp.ndarray # (K,) source frame id
    kf_kp_xy: jnp.ndarray    # (K, N, 2)
    kf_kp_level: jnp.ndarray # (K, N)
    kf_kp_angle: jnp.ndarray # (K, N)
    kf_kp_desc: jnp.ndarray  # (K, N, 8)
    kf_kp_valid: jnp.ndarray # (K, N)
    kf_kp_uright: jnp.ndarray# (K, N)
    kf_obs_pt: jnp.ndarray   # (K, N) int32 point index or -1
    # Spanning tree for culled keyframes (KeyFrame::SetBadFlag reparenting,
    # /root/reference/src/KeyFrame.cc:453-545 + the mTcp walk in
    # System::SaveTrajectoryTUM :377-381): when a KF is culled its pose is
    # recorded RELATIVE to a surviving parent, so trajectory references keep
    # following later pose-graph / GBA corrections.
    kf_parent: jnp.ndarray   # (K,) int32 parent kf of CULLED kfs, else -1
    kf_rel_R: jnp.ndarray    # (K, 3, 3) T_k = rel ∘ T_parent for culled kfs
    kf_rel_t: jnp.ndarray    # (K, 3)
    # Map points.
    pt_xyz: jnp.ndarray      # (P, 3)
    pt_valid: jnp.ndarray    # (P,)
    pt_desc: jnp.ndarray     # (P, 8)
    pt_normal: jnp.ndarray   # (P, 3)
    pt_min_dist: jnp.ndarray # (P,)
    pt_max_dist: jnp.ndarray # (P,)
    pt_ref_kf: jnp.ndarray   # (P,)
    pt_first_kf: jnp.ndarray # (P,) kf at creation (for culling rules)
    pt_found: jnp.ndarray    # (P,) float32 counters
    pt_visible: jnp.ndarray  # (P,)
    # Watermarks.
    n_kf: jnp.ndarray        # () int32
    n_pt: jnp.ndarray        # () int32

    @property
    def capacity_kf(self):
        return self.kf_R.shape[0]

    @property
    def capacity_pt(self):
        return self.pt_xyz.shape[0]


def make_empty_map(max_kf: int, n_features: int, max_pt: int) -> MapState:
    K, N, P = max_kf, n_features, max_pt
    return MapState(
        kf_R=jnp.broadcast_to(jnp.eye(3), (K, 3, 3)).copy(),
        kf_t=jnp.zeros((K, 3)),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.zeros((K,), jnp.int32),
        kf_kp_xy=jnp.zeros((K, N, 2)),
        kf_kp_level=jnp.zeros((K, N), jnp.int32),
        kf_kp_angle=jnp.zeros((K, N)),
        kf_kp_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_kp_uright=jnp.full((K, N), -1.0),
        kf_obs_pt=jnp.full((K, N), -1, jnp.int32),
        kf_parent=jnp.full((K,), -1, jnp.int32),
        kf_rel_R=jnp.broadcast_to(jnp.eye(3), (K, 3, 3)).copy(),
        kf_rel_t=jnp.zeros((K, 3)),
        pt_xyz=jnp.zeros((P, 3)),
        pt_valid=jnp.zeros((P,), bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3)),
        pt_min_dist=jnp.zeros((P,)),
        pt_max_dist=jnp.full((P,), jnp.inf),
        pt_ref_kf=jnp.zeros((P,), jnp.int32),
        pt_first_kf=jnp.zeros((P,), jnp.int32),
        pt_found=jnp.ones((P,)),
        pt_visible=jnp.ones((P,)),
        n_kf=jnp.int32(0),
        n_pt=jnp.int32(0),
    )


def insert_keyframe(
    m: MapState,
    feats: FrameFeatures,
    R: jnp.ndarray,
    t: jnp.ndarray,
    frame_id,
    obs_pt: jnp.ndarray,
    slot: int | None = None,
) -> tuple:
    """Insert a keyframe at the next slot, or at an explicit recycled `slot`
    (a previously-culled keyframe's slot, chosen host-side once capacity is
    reached — see Tracker._recycle_kf_slot; the watermark stays put).
    obs_pt: (N,) point index per keypoint (-1 none). Returns
    (new_map, kf_index). No-op when full and no slot given."""
    if slot is not None:
        ki = jnp.int32(slot)
        full = jnp.asarray(False)
    else:
        k = m.n_kf
        full = k >= m.capacity_kf
        ki = jnp.minimum(k, m.capacity_kf - 1)

    m = m._replace(
        kf_R=jnp.where(full, m.kf_R, m.kf_R.at[ki].set(R)),
        kf_t=jnp.where(full, m.kf_t, m.kf_t.at[ki].set(t)),
        kf_valid=jnp.where(full, m.kf_valid, m.kf_valid.at[ki].set(True)),
        kf_frame_id=jnp.where(
            full, m.kf_frame_id, m.kf_frame_id.at[ki].set(jnp.int32(frame_id))
        ),
        kf_kp_xy=jnp.where(full, m.kf_kp_xy, m.kf_kp_xy.at[ki].set(feats.xy)),
        kf_kp_level=jnp.where(full, m.kf_kp_level, m.kf_kp_level.at[ki].set(feats.level)),
        kf_kp_angle=jnp.where(full, m.kf_kp_angle, m.kf_kp_angle.at[ki].set(feats.angle)),
        kf_kp_desc=jnp.where(full, m.kf_kp_desc, m.kf_kp_desc.at[ki].set(feats.desc)),
        kf_kp_valid=jnp.where(full, m.kf_kp_valid, m.kf_kp_valid.at[ki].set(feats.valid)),
        kf_kp_uright=jnp.where(
            full, m.kf_kp_uright, m.kf_kp_uright.at[ki].set(feats.u_right)
        ),
        kf_obs_pt=jnp.where(full, m.kf_obs_pt, m.kf_obs_pt.at[ki].set(obs_pt)),
        kf_parent=jnp.where(full, m.kf_parent, m.kf_parent.at[ki].set(-1)),
        n_kf=jnp.where(full | (slot is not None), m.n_kf, m.n_kf + 1),
    )
    return m, ki


def insert_points(
    m: MapState,
    xyz: jnp.ndarray,
    desc: jnp.ndarray,
    ref_kf,
    new_valid: jnp.ndarray,
    normal: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
) -> tuple:
    """Append a batch of B candidate points at the watermark.

    Only rows with new_valid are created. Returns (new_map, indices (B,))
    where indices are the assigned point slots (valid rows only meaningful).
    Rows beyond capacity are dropped (mask cleared).
    """
    B = xyz.shape[0]
    # Assign consecutive slots to valid rows.
    order = jnp.cumsum(new_valid.astype(jnp.int32)) - 1  # rank among valid
    idx = m.n_pt + order
    in_cap = idx < m.capacity_pt
    ok = new_valid & in_cap
    slot = jnp.where(ok, idx, m.capacity_pt - 1)  # park drops at last slot

    # Scatter; parked rows may collide but their mask is not set unless a
    # real row targets that slot.
    pt_xyz = m.pt_xyz.at[slot].set(jnp.where(ok[:, None], xyz, m.pt_xyz[slot]))
    pt_desc = m.pt_desc.at[slot].set(jnp.where(ok[:, None], desc, m.pt_desc[slot]))
    pt_normal = m.pt_normal.at[slot].set(
        jnp.where(ok[:, None], normal, m.pt_normal[slot])
    )
    pt_min = m.pt_min_dist.at[slot].set(jnp.where(ok, min_dist, m.pt_min_dist[slot]))
    pt_max = m.pt_max_dist.at[slot].set(jnp.where(ok, max_dist, m.pt_max_dist[slot]))
    pt_ref = m.pt_ref_kf.at[slot].set(
        jnp.where(ok, jnp.int32(ref_kf), m.pt_ref_kf[slot])
    )
    pt_first = m.pt_first_kf.at[slot].set(
        jnp.where(ok, jnp.int32(ref_kf), m.pt_first_kf[slot])
    )
    pt_valid = m.pt_valid.at[slot].set(jnp.where(ok, True, m.pt_valid[slot]))
    n_new = jnp.sum(ok.astype(jnp.int32))
    m = m._replace(
        pt_xyz=pt_xyz,
        pt_desc=pt_desc,
        pt_normal=pt_normal,
        pt_min_dist=pt_min,
        pt_max_dist=pt_max,
        pt_ref_kf=pt_ref,
        pt_first_kf=pt_first,
        pt_valid=pt_valid,
        pt_found=m.pt_found.at[slot].set(jnp.where(ok, 1.0, m.pt_found[slot])),
        pt_visible=m.pt_visible.at[slot].set(jnp.where(ok, 1.0, m.pt_visible[slot])),
        n_pt=jnp.minimum(m.n_pt + n_new, m.capacity_pt),
    )
    return m, jnp.where(ok, slot, -1)


@jax.jit
def compact_point_slots(m: MapState):
    """Re-pack valid points to the front of the point arrays and remap every
    observation — point-slot recycling at the watermark (the TPU-native form
    of the reference's unbounded point set, /root/reference/src/Map.cc:40:
    it deletes culled MapPoints outright; fixed-capacity SoA arrays compact
    instead). The stable sort preserves creation order, so monotonic-id
    assumptions (newest-first local-map selection) stay true.

    Returns (compacted_map, old_to_new (P,) int32 with -1 for culled slots);
    the caller must remap any slot references it holds outside the map
    (tracker _last_obs) and invalidate index-based snapshots (in-flight GBA).
    """
    P = m.capacity_pt
    perm = jnp.argsort(jnp.where(m.pt_valid, 0, 1), stable=True)
    old_to_new = jnp.full((P,), -1, jnp.int32).at[perm].set(
        jnp.arange(P, dtype=jnp.int32)
    )
    old_to_new = jnp.where(m.pt_valid, old_to_new, -1)
    obs = m.kf_obs_pt
    obs_new = jnp.where(
        obs >= 0, old_to_new[jnp.maximum(obs, 0)], obs
    )

    def g(a):
        return a[perm]

    return m._replace(
        pt_xyz=g(m.pt_xyz),
        pt_valid=g(m.pt_valid),
        pt_desc=g(m.pt_desc),
        pt_normal=g(m.pt_normal),
        pt_min_dist=g(m.pt_min_dist),
        pt_max_dist=g(m.pt_max_dist),
        pt_ref_kf=g(m.pt_ref_kf),
        pt_first_kf=g(m.pt_first_kf),
        pt_found=g(m.pt_found),
        pt_visible=g(m.pt_visible),
        kf_obs_pt=obs_new,
        n_pt=jnp.sum(m.pt_valid.astype(jnp.int32)),
    ), old_to_new


def observation_incidence(m: MapState) -> jnp.ndarray:
    """(K, P) float32 incidence matrix from the observation table."""
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.where(has, m.kf_obs_pt, P)  # park invalid in scratch col
    # Culled points do not count (the reference detaches observations in
    # MapPoint::SetBadFlag); keeps this in lockstep with
    # parallel.sharded_map.sharded_covisibility_weights.
    has = has & jnp.pad(m.pt_valid, (0, 1))[pt]
    inc = jnp.zeros((K, P + 1))
    inc = inc.at[jnp.arange(K)[:, None], pt].add(has.astype(jnp.float32))
    return jnp.minimum(inc[:, :P], 1.0)


def covisibility_weights(m: MapState, block: int = 16384) -> jnp.ndarray:
    """(K, K) covisibility weights: shared-point counts between keyframes
    (KeyFrame::UpdateConnections semantics, threshold applied by callers).

    Matmuls over the incidence matrix — the MXU-native form of the
    reference's per-KF hash-map counting (KeyFrame.cc:289-379). Above
    `block` points the (K, P) incidence is never materialized: point
    blocks are scattered and reduced one at a time under lax.scan, so
    memory stays O(K·block) at KITTI-00 scale (1.4k KFs, 150k+ points)
    while the FLOPs ride the MXU unchanged."""
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    if P <= block:
        inc = observation_incidence(m)
        w = inc @ inc.T
        return w - jnp.diag(jnp.diag(w))

    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.where(has, m.kf_obs_pt, P)
    has = has & jnp.pad(m.pt_valid, (0, 1))[pt]
    nb = -(-P // block)
    rows = jnp.arange(K)[:, None]

    def body(acc, off):
        local = pt - off
        in_blk = has & (local >= 0) & (local < block)
        li = jnp.where(in_blk, local, block)
        inc = jnp.zeros((K, block + 1)).at[rows, li].add(
            in_blk.astype(jnp.float32)
        )[:, :block]
        inc = jnp.minimum(inc, 1.0)
        return acc + inc @ inc.T, None

    w, _ = jax.lax.scan(
        body, jnp.zeros((K, K)), jnp.arange(nb, dtype=jnp.int32) * block
    )
    return w - jnp.diag(jnp.diag(w))


def shared_point_counts(m: MapState, anchor) -> jnp.ndarray:
    """(K,) shared-valid-point counts of every keyframe with `anchor` —
    one covisibility ROW without forming the (K, P) incidence (a (P,)
    scatter + a (K, N) gather): the scalable form of
    `observation_incidence(m) @ observation_incidence(m)[anchor]`."""
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.where(has, m.kf_obs_pt, P)
    has = has & jnp.pad(m.pt_valid, (0, 1))[pt]
    mark = jnp.zeros((P + 1,), bool).at[jnp.where(has[anchor], pt[anchor], P)].set(
        True
    ).at[P].set(False)
    # Per-row dedup: count each point ONCE per keyframe even if a fuse/merge
    # path ever leaves the same point id in two keypoint slots — keeps this
    # row in lockstep with observation_incidence's min(inc, 1) clamp. Sort
    # the hit ids per row and count first occurrences.
    v = jnp.sort(jnp.where(has & mark[pt], pt, P), axis=1)
    first = jnp.concatenate(
        [jnp.ones((K, 1), bool), v[:, 1:] != v[:, :-1]], axis=1
    )
    return jnp.sum(first & (v < P), axis=1).astype(jnp.float32)


def compute_point_descriptors(m: MapState, pt_mask: jnp.ndarray, max_obs: int = 16) -> MapState:
    """Refresh representative descriptors for masked points.

    For each point, gather up to max_obs observing keypoints' descriptors and
    pick the one minimizing the median Hamming distance to the others
    (MapPoint::ComputeDistinctiveDescriptors, MapPoint.cc:242-307).
    """
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    flat_pt = jnp.where(
        (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None], m.kf_obs_pt, P
    ).reshape(-1)
    flat_desc = m.kf_kp_desc.reshape(-1, 8)
    # For each point, find up to max_obs observing edge indices: sort edges by
    # point id and pick each point's first occurrences.
    order = jnp.argsort(flat_pt)
    sorted_pt = flat_pt[order]
    pos = jnp.arange(sorted_pt.shape[0])
    is_start = jnp.concatenate([jnp.array([True]), sorted_pt[1:] != sorted_pt[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, pos, -1))
    rank = pos - start
    # Scatter edge order index into (P, max_obs).
    tgt_ok = (sorted_pt < P) & (rank < max_obs)
    rows = jnp.where(tgt_ok, sorted_pt, P)
    cols = jnp.where(tgt_ok, rank, 0)
    table = jnp.full((P + 1, max_obs), -1, jnp.int32).at[rows, cols].set(
        jnp.where(tgt_ok, order.astype(jnp.int32), -1)
    )[:P]
    has_obs = table >= 0
    descs = flat_desc[jnp.maximum(table, 0)]  # (P, max_obs, 8)

    # Pairwise Hamming per point.
    x = jnp.bitwise_xor(descs[:, :, None, :], descs[:, None, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    pair_ok = has_obs[:, :, None] & has_obs[:, None, :]
    d = jnp.where(pair_ok, d, jnp.nan)
    med = jnp.nanmedian(d, axis=2)  # (P, max_obs) median distance to others
    med = jnp.where(has_obs, jnp.where(jnp.isnan(med), jnp.inf, med), jnp.inf)
    best = jnp.argmin(med, axis=1)
    new_desc = jnp.take_along_axis(descs, best[:, None, None], axis=1)[:, 0]
    any_obs = jnp.any(has_obs, axis=1)
    use = pt_mask & m.pt_valid & any_obs
    return m._replace(pt_desc=jnp.where(use[:, None], new_desc, m.pt_desc))


def update_point_normals(m: MapState, scale_factors: jnp.ndarray) -> MapState:
    """Refresh viewing normals and scale-invariance distance ranges
    (MapPoint::UpdateNormalAndDepth, MapPoint.cc:330-383).

    normal = mean of unit vectors from observing camera centers to the point;
    [min, max] distance from the reference KF's observation octave with the
    0.8 / 1.2 margins.
    """
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.where(has, m.kf_obs_pt, P)
    # Camera centers: C = -R^T t.
    C = -jnp.einsum("kij,ki->kj", m.kf_R, m.kf_t)  # (K, 3)
    # Edge-wise accumulation to bound memory at (K*N, 3) instead of (K, P, 3).
    Xe = m.pt_xyz[jnp.minimum(pt, P - 1).reshape(-1)]
    Ce = jnp.repeat(C, N, axis=0)
    ve = Xe - Ce
    ve = ve / jnp.maximum(jnp.linalg.norm(ve, axis=-1, keepdims=True), 1e-9)
    flat_pt = pt.reshape(-1)
    ok = has.reshape(-1)
    nsum = jnp.zeros((P + 1, 3)).at[flat_pt].add(jnp.where(ok[:, None], ve, 0.0))[:P]
    ncnt = jnp.zeros((P + 1,)).at[flat_pt].add(ok.astype(jnp.float32))[:P]
    normal = nsum / jnp.maximum(ncnt[:, None], 1.0)

    # Distance range from the reference KF.
    ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
    Cr = C[ref]
    dist = jnp.linalg.norm(m.pt_xyz - Cr, axis=-1)
    # Octave of the observation in the ref KF: find the keypoint slot.
    obs_in_ref = m.kf_obs_pt[ref] == jnp.arange(P)[:, None]  # (P, N)
    slot = jnp.argmax(obs_in_ref, axis=1)
    has_ref = jnp.any(obs_in_ref, axis=1)
    octave = m.kf_kp_level[ref, slot]
    sf = scale_factors[jnp.clip(octave, 0, scale_factors.shape[0] - 1)]
    n_levels = scale_factors.shape[0]
    max_dist = dist * sf
    min_dist = max_dist / scale_factors[n_levels - 1]
    upd = m.pt_valid & (ncnt > 0)
    return m._replace(
        pt_normal=jnp.where(upd[:, None], normal, m.pt_normal),
        pt_min_dist=jnp.where(upd & has_ref, 0.8 * min_dist, m.pt_min_dist),
        pt_max_dist=jnp.where(upd & has_ref, 1.2 * max_dist, m.pt_max_dist),
    )
