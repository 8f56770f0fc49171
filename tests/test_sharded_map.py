"""Sharded map residency (parallel/sharded_map.py) vs dense equivalents,
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.mapstate.core import covisibility_weights, make_empty_map
from tpuslam.parallel.sharded_map import (
    PT_AXIS,
    pad_point_capacity,
    shard_map_state,
    sharded_covisibility_weights,
    sharded_search_local_points,
)

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)


def _random_map(rng, K=6, N=32, Pcap=100):
    m = make_empty_map(K, N, Pcap)
    n_pt = 60
    xyz = np.stack(
        [rng.uniform(-2, 2, n_pt), rng.uniform(-1.5, 1.5, n_pt), rng.uniform(3, 9, n_pt)],
        -1,
    ).astype(np.float32)
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:n_pt].set(jnp.asarray(xyz)),
        pt_valid=m.pt_valid.at[:n_pt].set(True),
        pt_desc=m.pt_desc.at[:n_pt].set(
            jnp.asarray(rng.integers(0, 2**32, (n_pt, 8), dtype=np.uint32))
        ),
        kf_valid=m.kf_valid.at[:K].set(True),
        n_kf=jnp.asarray(K),
        n_pt=jnp.asarray(n_pt),
    )
    # Random observation table: each KF observes a random subset.
    obs = np.full((K, N), -1, np.int32)
    for k in range(K):
        picks = rng.choice(n_pt, N // 2, replace=False)
        obs[k, : N // 2] = picks
    m = m._replace(
        kf_obs_pt=jnp.asarray(obs),
        kf_kp_valid=jnp.ones((K, N), bool),
    )
    return m, n_pt


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), (PT_AXIS,))


def test_sharded_covisibility_matches_dense(rng):
    m, _ = _random_map(rng)
    mesh = _mesh()
    dense = np.asarray(covisibility_weights(m))
    sharded = np.asarray(sharded_covisibility_weights(m, mesh))
    np.testing.assert_allclose(sharded, dense, atol=1e-5)


def test_sharded_covisibility_matches_dense_with_culled_points(rng):
    # Culled points still referenced by kf_obs_pt must not contribute to
    # covisibility in EITHER path (the dense side applies the same pt_valid
    # mask as the sharded one).
    m, n_pt = _random_map(rng)
    culled = rng.choice(n_pt, n_pt // 3, replace=False)
    pt_valid = np.asarray(m.pt_valid).copy()
    pt_valid[culled] = False
    m = m._replace(pt_valid=jnp.asarray(pt_valid))
    mesh = _mesh()
    dense = np.asarray(covisibility_weights(m))
    sharded = np.asarray(sharded_covisibility_weights(m, mesh))
    np.testing.assert_allclose(sharded, dense, atol=1e-5)
    # And a culled-point observation genuinely drops the weight.
    obs = np.asarray(m.kf_obs_pt)
    shared_01 = set(obs[0][obs[0] >= 0]) & set(obs[1][obs[1] >= 0])
    expect = sum(1 for p in shared_01 if pt_valid[p])
    assert dense[0, 1] == expect


def test_sharded_search_matches_dense(rng):
    from tpuslam.geometry.camera import project
    from tpuslam.geometry.se3 import se3_apply
    from tpuslam.matching.search import search_by_projection_points

    m, n_pt = _random_map(rng)
    mesh = _mesh()
    R = jnp.eye(3)
    t = jnp.zeros(3)
    nk = 40
    # Half the keypoints are true re-detections: placed at the projection of
    # a map point with its exact descriptor (plus sub-radius jitter).
    from tpuslam.geometry.camera import project as _project
    from tpuslam.geometry.se3 import se3_apply as _apply

    uv_true = np.asarray(_project(CAM, _apply(R, t, m.pt_xyz[:20])))
    kp_xy_np = rng.uniform(0, 240, (nk, 2)).astype(np.float32)
    kp_xy_np[:20] = uv_true + rng.uniform(-3, 3, (20, 2))
    kp_desc_np = rng.integers(0, 2**32, (nk, 8), dtype=np.uint32)
    kp_desc_np[:20] = np.asarray(m.pt_desc[:20])
    kp_xy = jnp.asarray(kp_xy_np)
    kp_desc = jnp.asarray(kp_desc_np)
    kp_level = jnp.zeros(nk, jnp.int32)
    kp_angle = jnp.zeros(nk)
    kp_valid = jnp.ones(nk, bool)

    idx_s, dist_s, ok_s = sharded_search_local_points(
        CAM, m, mesh, R, t, kp_xy, kp_desc, kp_level, kp_angle, kp_valid
    )

    mp = pad_point_capacity(m, 8)
    Pn = mp.capacity_pt
    pc = se3_apply(R, t, mp.pt_xyz)
    uv = project(CAM, pc)
    idx_d, dist_d, ok_d = search_by_projection_points(
        uv, mp.pt_desc, mp.pt_valid & (pc[:, 2] > 0.1),
        jnp.full(Pn, 15.0), jnp.zeros(Pn, jnp.int32), jnp.full(Pn, 7, jnp.int32),
        kp_xy, kp_desc, kp_level, kp_angle, kp_valid,
    )
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_d))
    ok = np.asarray(ok_d)
    np.testing.assert_array_equal(np.asarray(idx_s)[ok], np.asarray(idx_d)[ok])
    assert ok.sum() > 0  # the scene produces real matches


def test_shard_map_state_placement(rng):
    m, _ = _random_map(rng)
    mesh = _mesh()
    ms = shard_map_state(m, mesh)
    assert ms.capacity_pt % 8 == 0
    # Point arrays sharded, keyframe arrays replicated.
    assert len(ms.pt_xyz.sharding.device_set) == 8
    assert ms.kf_R.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(ms.pt_xyz)[: m.capacity_pt], np.asarray(m.pt_xyz)
    )
