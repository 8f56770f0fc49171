"""Host-side tracking orchestrator: the state machine of the reference's
Tracking thread (/root/reference/src/Tracking.cc) over jitted step functions.

States mirror Tracking.h:81-87 — NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST.
The per-frame flow is GrabImage -> (init | motion-model track -> local-map
track) -> keyframe decision -> mapping work (triangulate + local BA), with
the mapping stage running synchronously between frames in this single-host
configuration (the reference's LocalMapping thread hand-off, SURVEY.md P5,
becomes a direct call; the distributed layer makes it async).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import PinholeCamera, undistort_points
from tpuslam.geometry.se3 import se3_apply, se3_compose, se3_inverse
from tpuslam.mapstate.core import (
    FrameFeatures,
    MapState,
    compute_point_descriptors,
    insert_keyframe,
    insert_points,
    make_empty_map,
    update_point_normals,
)
from tpuslam.matching.search import search_for_initialization, match_nn_ratio
from tpuslam.ops.orb import ORBConfig, extract_orb
from tpuslam.optim.ba import BAProblem, bundle_adjustment
from tpuslam.pipeline import steps
from tpuslam.sfm.initializer import initialize_two_view
from tpuslam.sfm.pnp import pnp_ransac


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    cam: PinholeCamera
    orb: ORBConfig = ORBConfig()
    # Map capacity. Defaults hold a full KITTI-00-scale session (the
    # reference grows ~1.4k KFs there) without force-eviction; the
    # capacity-scaling machinery (blocked covisibility, local-subset
    # TrackLocalMap, CG pose graph, point-slot compaction) keeps per-frame
    # cost flat at this size. Small demos/tests should pass smaller
    # capacities for faster compiles.
    max_keyframes: int = 1536
    max_points: int = 200_000
    # Keyframe cadence (Tracking::NeedNewKeyFrame, Tracking.cc:1029):
    # mMaxFrames = fps; ref-ratio 0.9 mono / 0.75 stereo+RGB-D
    # (Tracking.cc:1073-1079).
    kf_max_frames: int = 30
    kf_min_frames: int = 1
    kf_ref_ratio: float = 0.9
    kf_ref_ratio_depth: float = 0.75
    min_inliers_ok: int = 30       # TrackLocalMap acceptance (Tracking.cc:1020)
    min_inliers_motion: int = 10   # motion-model acceptance (Tracking.cc:962)
    local_ba_window: int = 8
    # LocalMapping breadth (/root/reference/src/LocalMapping.cc:207,454):
    # triangulate / fuse against the nn best covisible neighbors, nn = 10
    # stereo/RGB-D, 20 mono (0 = that auto rule); fusion extends the target
    # set with `fuse_second_hop` neighbors of each neighbor and runs BOTH
    # directions per pair (LocalMapping.cc:466-488,489-552).
    tri_neighbors: int = 0
    fuse_neighbors: int = 0
    fuse_second_hop: int = 5
    # Local BA cost caps: the solver runs on a compacted edge block
    # (active-graph edges first; steps.local_bundle_adjustment) with a
    # DENSE reduced-camera solve over the `local_ba_active_max` most
    # covisible adjustable keyframes (optim.ba.dense_schur_bundle_
    # adjustment). 0 edges = auto: 32 x n_features, so stereo/RGB-D
    # configs with 2000 keypoints are not silently truncated (advisor r4
    # medium finding) while mono 1000-kp configs stay at 32k.
    local_ba_max_edges: int = 0
    local_ba_active_max: int = 32
    # Truncated-CG budget for the DISTRIBUTED/global solvers (the dense
    # local path does not use CG).
    local_ba_cg_iters: int = 40
    init_min_matches: int = 100    # MonocularInitialization (Tracking.cc:606,637)
    # Stereo/RGB-D: close-point depth threshold factor; th_depth =
    # th_depth_factor x baseline (ThDepth in the YAMLs, Tracking.cc:144-147).
    th_depth_factor: float = 40.0
    depth_map_factor: float = 1.0  # RGB-D depth image scale (DepthMapFactor)
    enable_loop_closing: bool = True
    # Run mapping + loop closing on a background worker thread (the
    # reference's LocalMapping/LoopClosing threads); tracking continues on
    # the latest published snapshot and adopts results at frame boundaries.
    async_mapping: bool = False
    # Run that worker in a SEPARATE PROCESS (multi-host form: mapping/loop
    # on another host of the slice; see parallel/mapping_worker.py). Implies
    # async_mapping. The worker defaults to CPU so it never contends for the
    # tracker's chip; set mapping_process_platform for a pod's mapping host.
    mapping_process: bool = False
    mapping_process_platform: str = "cpu"
    # TrackLocalMap candidate cap: above this many map points, per-frame
    # matching is restricted to the covisibility-local point set (the
    # reference's 80-KF local map, Tracking.cc:1283-1337) gathered into a
    # fixed-size block, keeping per-frame cost flat as the map grows.
    # 0 = auto (subset path kicks in when max_points > 16384).
    local_map_max_pts: int = 0
    # Distributed bundle adjustment (SURVEY.md §2.4 P7): when >= 2, global
    # BA and local BA run point-sharded over a 1-D mesh of the first
    # `dist_ba_devices` devices (point blocks + their edges per device,
    # pose system psum'd over ICI; parallel/dist_ba.py). 0 = single-device.
    dist_ba_devices: int = 0


class Tracker:
    """Single-session SLAM tracker. Mono first; stereo/RGB-D via depth input."""

    def __init__(self, config: TrackerConfig):
        self.cfg = config
        self.state = TrackingState.NO_IMAGES_YET
        # Keyframe keypoint capacity is 2x: monocular initialization extracts
        # twice the features (Tracking.cc:125-133 mpIniORBextractor), and the
        # two bootstrap keyframes retain them.
        self.kp_capacity = 2 * config.orb.n_features
        self.map: MapState = make_empty_map(
            config.max_keyframes, self.kp_capacity, config.max_points
        )
        nl = config.orb.n_levels
        sf = config.orb.scale_factor
        self.scale_factors = jnp.asarray([sf**l for l in range(nl)], jnp.float32)
        self.inv_sigma2 = jnp.asarray(
            [1.0 / (sf**l) ** 2 for l in range(nl)], jnp.float32
        )
        self._extract = jax.jit(lambda img: extract_orb(img, config.orb))
        init_orb = dataclasses.replace(config.orb, n_features=self.kp_capacity)
        self._extract_init = jax.jit(lambda img: extract_orb(img, init_orb))
        # Init reference frame.
        self._init_feats: Optional[FrameFeatures] = None
        self._init_frame_id = -1
        # Last frame.
        self._last_feats: Optional[FrameFeatures] = None
        self._last_obs: Optional[jnp.ndarray] = None
        self._last_R = jnp.eye(3)
        self._last_t = jnp.zeros(3)
        self._velocity = None  # (R, t) of T_cur * T_last^-1
        self._frames_since_kf = 0
        self._last_kf_idx = -1
        self._key = jax.random.PRNGKey(0)
        # Host mirror of the keyframe watermark (m.n_kf): keyframe slots are
        # assigned host-side, so creation never syncs on the device scalar.
        self._n_kf_host = 0
        # Host copy of the current pose, refreshed from the fused step's
        # packed fetch — track_* return it without an extra device sync.
        self._last_pose_np = None
        # Dispatch / sync accounting (per-frame budget: 1 fused dispatch +
        # 1 packed fetch on the steady-state path).
        self.stats = {
            "dispatches": 0, "syncs": 0, "fused_frames": 0, "slow_frames": 0
        }
        # Per-stage wall-clock telemetry (the reference's only telemetry is
        # the drivers' median/mean print, mono_tum.cc:116-124; here every
        # pipeline stage is timed — metrics.report() for the breakdown).
        from tpuslam.utils.metrics import Metrics

        self.metrics = Metrics()
        # Post-relocalization bookkeeping (mnLastRelocFrameId): gates the
        # ref-KF tracking window, the TrackLocalMap inlier threshold, and
        # keyframe insertion (Tracking.cc:327,1020,1041).
        self._last_reloc_frame_id = -(10**9)
        # Localization-only mode (System::ActivateLocalizationMode,
        # /root/reference/src/System.cc:240-272): track against a frozen map.
        self.localization_mode = False
        # Localization-mode visual odometry (Tracking.cc:355-414): temporal
        # points unprojected from the last frame's close stereo/RGB-D depths
        # keep tracking alive through map-sparse regions. _vo_mode plays
        # mbVO (last frame tracked mostly VO points, not the map).
        self._vo_mode = False
        self._vo_xyz = None    # (N, 3) world pos per last-frame keypoint
        self._vo_valid = None  # (N,) VO-point mask
        # Async mapping worker (single-slot, mirrors SetAcceptKeyFrames).
        self._mapping_future = None
        self._mapping_pool = None
        # InterruptBA analog (Tracking.cc:1097-1105 sets mbAbortBA when a
        # keyframe is wanted while LocalMapping is busy; g2o polls the flag,
        # Optimizer.cc:65-66): the mapping job checks this between stages
        # and truncates its optional work (remaining fusion pairs, local BA
        # chunks) so the tracker is never starved of keyframes.
        import threading

        self._mapping_interrupt = threading.Event()
        # Point-slot compaction hand-off: when a mapping job compacts the
        # point arrays, the old->new remap is applied to the tracker's own
        # slot references (_last_obs) at adoption time.
        self._pending_pt_remap = None
        # Async global BA (the reference's transient, abortable GBA thread,
        # LoopClosing.cc:579,645): a generation counter plays mnFullBAIdx —
        # results from a superseded generation are discarded (:416,658).
        self._gba_pool = None
        self._gba_future = None
        self._gba_generation = 0
        self._remote_mapper = None
        if config.async_mapping or config.mapping_process:
            import concurrent.futures

            self._mapping_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="local-mapping"
            )
            self._gba_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="global-ba"
            )
        if config.mapping_process:
            # Mapping/loop in a separate process (multi-host P1): the local
            # mapping thread just ships snapshots over IPC. The worker owns
            # the loop-closing state and runs GBA inline, so the local GBA
            # pool is unused in this mode.
            from tpuslam.parallel.mapping_worker import RemoteMappingWorker

            self._remote_mapper = RemoteMappingWorker(
                config, platform=config.mapping_process_platform
            )
        # Distributed-BA mesh (model-parallel point sharding over ICI).
        self._ba_mesh = None
        if config.dist_ba_devices >= 2:
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < config.dist_ba_devices:
                raise ValueError(
                    f"dist_ba_devices={config.dist_ba_devices} but only "
                    f"{len(devs)} devices are visible"
                )
            self._ba_mesh = Mesh(
                np.array(devs[: config.dist_ba_devices]), ("points",)
            )
        # Loop closing (scale fixed once depth-based init is used).
        self._depth_mode = False
        self.loop_closer = None
        if config.enable_loop_closing:
            from tpuslam.pipeline.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(config.max_keyframes, fix_scale=False)
        # Trajectory: frame_id -> (ref_kf, R_rel, t_rel, lost_flag); poses are
        # recovered at export against optimized KF poses, mirroring
        # System::SaveTrajectoryTUM (/root/reference/src/System.cc:337-396).
        self.trajectory = []
        self.n_frames = 0
        self.n_recycled_kf_slots = 0

    # ------------------------------------------------------------------ util

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @staticmethod
    def _fetch(*scalars):
        """Materialize several device scalars in ONE device->host transfer
        (each separate int()/float() costs a full round trip on the
        tunneled TPU; the per-frame budget is <= 2 transfers)."""
        packed = jnp.stack([jnp.asarray(s).astype(jnp.float32) for s in scalars])
        return np.asarray(packed)

    def _frame_features(self, img: jnp.ndarray, init: bool = False) -> FrameFeatures:
        f = self._extract_init(img) if init else self._extract(img)
        xy = f.xy
        c = self.cfg.cam
        if abs(c.k1) > 1e-12 or abs(c.k2) > 1e-12:
            xy = undistort_points(c, xy)
        n = xy.shape[0]
        return FrameFeatures(
            xy=xy,
            level=f.level,
            angle=f.angle,
            desc=f.desc,
            valid=f.valid,
            u_right=jnp.full((n,), -1.0),
            depth=jnp.zeros((n,)),
        )

    def _pad_feats(self, feats: FrameFeatures) -> FrameFeatures:
        """Pad a frame's keypoint arrays to the keyframe capacity."""
        n = feats.xy.shape[0]
        cap = self.kp_capacity
        if n == cap:
            return feats
        pad = cap - n

        def p(a, fill=0.0):
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, width, constant_values=fill)

        return FrameFeatures(
            xy=p(feats.xy),
            level=p(feats.level),
            angle=p(feats.angle),
            desc=p(feats.desc),
            valid=p(feats.valid, False),
            u_right=p(feats.u_right, -1.0),
            depth=p(feats.depth),
        )

    def _record_pose(self, frame_id, R, t, lost=False):
        ref = self._last_kf_idx
        if ref >= 0:
            Rr, tr = se3_compose(
                R, t, *se3_inverse(self.map.kf_R[ref], self.map.kf_t[ref])
            )
        else:
            Rr, tr = R, t
        self.trajectory.append(
            (frame_id, ref, np.asarray(Rr), np.asarray(tr), lost)
        )

    # ------------------------------------------------------- initialization

    def _try_initialize(self, feats: FrameFeatures, frame_id: int) -> bool:
        cfg = self.cfg
        if self._init_feats is None or int(jnp.sum(self._init_feats.valid)) <= cfg.init_min_matches:
            self._init_feats = feats
            self._init_frame_id = frame_id
            return False
        ref = self._init_feats
        idx, dist, ok = search_for_initialization(
            ref.xy, ref.desc, ref.level, ref.angle, ref.valid,
            feats.xy, feats.desc, feats.level, feats.angle, feats.valid,
            window=100.0,
        )
        n_matches = int(jnp.sum(ok))
        if n_matches < cfg.init_min_matches:
            self._init_feats = feats  # reset reference (Tracking.cc:633-645)
            self._init_frame_id = frame_id
            return False
        res = initialize_two_view(
            self._next_key(), cfg.cam.K, ref.xy, feats.xy[idx], ok
        )
        if not bool(res.success):
            return False
        return self._create_initial_map(ref, feats, idx, res, frame_id)

    def _create_initial_map(self, ref, cur, idx, res, frame_id):
        """CreateInitialMapMonocular (/root/reference/src/Tracking.cc:689):
        two keyframes, triangulated points, global BA, median-depth scale."""
        cfg = self.cfg
        N = ref.xy.shape[0]
        good = res.inliers
        X = res.points
        # Scale so median depth = 1 (Tracking.cc:738-760).
        depths = jnp.where(good, X[:, 2], jnp.nan)
        med = jnp.nanmedian(depths)
        med = jnp.where(jnp.isnan(med) | (med <= 0), 1.0, med)
        X = X / med
        t2 = res.t / med

        m = self.map
        # Insert points first (slot indices known before KF insertion).
        r2v = X - (-(res.R.T @ t2))
        d2 = jnp.linalg.norm(r2v, axis=-1)
        sf2 = self.scale_factors[jnp.clip(cur.level[idx], 0, cfg.orb.n_levels - 1)]
        max_d = d2 * sf2
        min_d = max_d / self.scale_factors[-1]
        m, slots = insert_points(
            m,
            X,
            cur.desc[idx],
            1,  # ref kf will be index 1
            good,
            r2v / jnp.maximum(jnp.linalg.norm(r2v, axis=-1, keepdims=True), 1e-9),
            0.8 * min_d,
            1.2 * max_d,
        )
        obs0 = jnp.where(good, slots, -1).astype(jnp.int32)
        # KF1's obs table is per-KF1-keypoint: scatter through idx.
        obs1 = jnp.full((N,), -1, jnp.int32)
        obs1 = obs1.at[idx].set(jnp.where(good, slots, obs1[idx]))

        m, k0 = insert_keyframe(m, ref, jnp.eye(3), jnp.zeros(3), self._init_frame_id, obs0)
        m, k1 = insert_keyframe(m, cur, res.R, t2, frame_id, obs1)

        # Full BA on the initial map (Tracking.cc:738 GlobalBundleAdjustemnt
        # with 20 iterations).
        m = self._global_ba(m, iters=20)

        # Weak-geometry rejection (Tracking.cc:744-749 spirit): on
        # quasi-degenerate scenes a wrong H decomposition passes the
        # triangulation gates but global BA collapses the baseline relative
        # to the (unit-median) scene depth. Reject and retry with new frames.
        depths_ba = jnp.where(m.pt_valid, m.pt_xyz[:, 2], jnp.nan)
        med_ba = jnp.nanmedian(depths_ba)
        baseline = jnp.linalg.norm(m.kf_t[1])
        if not bool(jnp.isfinite(med_ba)) or float(baseline) < 0.02 * max(
            float(med_ba), 1e-6
        ):
            self.map = make_empty_map(
                self.cfg.max_keyframes, self.kp_capacity, self.cfg.max_points
            )
            self._init_feats = None
            return False

        m = update_point_normals(m, self.scale_factors)
        self.map = m

        self.state = TrackingState.OK
        self._last_feats = cur
        self._last_obs = obs1
        self._last_R = m.kf_R[1]
        self._last_t = m.kf_t[1]
        self._velocity = None
        self._last_kf_idx = 1
        self._frames_since_kf = 0
        self._n_kf_host = 2
        self._record_pose(frame_id, self._last_R, self._last_t)
        return True

    def _global_ba(self, m: MapState, iters: int = 20) -> MapState:
        K, N = m.kf_obs_pt.shape
        kfi = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        pti = m.kf_obs_pt.reshape(-1)
        has = (pti >= 0) & m.kf_kp_valid.reshape(-1) & m.kf_valid[kfi]
        uvr = jnp.concatenate(
            [m.kf_kp_xy.reshape(K * N, 2), m.kf_kp_uright.reshape(K * N, 1)], axis=-1
        )
        inv_s2 = self.inv_sigma2[jnp.clip(m.kf_kp_level.reshape(-1), 0, len(self.inv_sigma2) - 1)]
        prob = BAProblem(
            R=m.kf_R,
            t=m.kf_t,
            X=m.pt_xyz,
            kf=kfi,
            pt=jnp.maximum(pti, 0),
            uvr=uvr,
            inv_sigma2=inv_s2,
            valid=has & m.pt_valid[jnp.maximum(pti, 0)],
            fixed_kf=~m.kf_valid | (jnp.arange(K) == 0),
            fixed_pt=~m.pt_valid,
        )
        R, t, X, _ = self._run_ba(prob, iters=iters)
        return m._replace(kf_R=R, kf_t=t, pt_xyz=X)

    def _run_ba(self, prob: BAProblem, iters: int):
        """Dispatch a BA problem to the single-device solver or, when a mesh
        is configured, the point-sharded model-parallel solver (point blocks
        + their edges per device, pose system psum'd; parallel/dist_ba.py).
        Both reach the same stationary points."""
        if self._ba_mesh is None:
            return bundle_adjustment(self.cfg.cam, prob, iters=iters)
        from tpuslam.parallel.dist_ba import point_sharded_bundle_adjustment

        return point_sharded_bundle_adjustment(
            self.cfg.cam, prob, self._ba_mesh, iters=iters
        )

    def _local_ba(self, m: MapState, center_kf: int, iters: int = 8) -> MapState:
        """Local BA around the newest keyframe. Single-device: one jitted
        program (steps.local_bundle_adjustment). With a distributed mesh:
        the same covisibility-window problem assembled host-side and solved
        point-sharded, then the same chi2 outlier detach
        (Optimizer.cc:705-720)."""
        cfg = self.cfg
        if self._ba_mesh is None:
            max_edges = cfg.local_ba_max_edges or 32 * cfg.orb.n_features
            return steps.local_bundle_adjustment(
                cfg.cam, m, jnp.int32(center_kf), self.inv_sigma2,
                window=cfg.local_ba_window, n_levels=cfg.orb.n_levels,
                iters=iters, max_edges=max_edges,
                active_max=cfg.local_ba_active_max,
            )
        K, N = m.kf_obs_pt.shape
        kfi, pti, uvr, has, fixed_kf, fixed_pt = steps.build_local_ba_problem(
            m, jnp.int32(center_kf), cfg.local_ba_window, 0
        )
        inv_s2 = self.inv_sigma2[
            jnp.clip(m.kf_kp_level.reshape(-1), 0, len(self.inv_sigma2) - 1)
        ]
        prob = BAProblem(
            R=m.kf_R, t=m.kf_t, X=m.pt_xyz,
            kf=kfi, pt=pti, uvr=uvr, inv_sigma2=inv_s2,
            valid=has & m.pt_valid[pti],
            fixed_kf=fixed_kf, fixed_pt=fixed_pt,
        )
        R, t, X, chi2 = self._run_ba(prob, iters=iters)
        stereo_e = uvr[:, 2] >= 0
        th = jnp.where(stereo_e, 7.815, 5.991)
        bad = prob.valid & (chi2 > th)
        obs = jnp.where(bad, -1, m.kf_obs_pt.reshape(-1))
        return m._replace(kf_R=R, kf_t=t, pt_xyz=X, kf_obs_pt=obs.reshape(K, N))

    # ------------------------------------------- global BA (async, abortable)

    def _gba_job(self, m_snap: MapState, gen: int, iters: int):
        """Chunked global BA over a map snapshot; aborts between chunks when
        a newer generation supersedes it (the reference's mbStopGBA poll via
        g2o's force-stop flag, LoopClosing.cc:414-423, Optimizer.cc:65-66).

        `iters` is rounded UP to a multiple of the chunk size (iters=8 runs
        10 LM iterations): fixed-size chunks keep ONE compiled trace, and a
        few extra LM iterations of a converging BA are harmless — callers
        wanting an exact budget should pass a chunk multiple."""
        chunk = 5
        mm = m_snap
        done = 0
        while done < iters:
            if gen != self._gba_generation:
                return None  # aborted
            # Fixed-size chunks: ONE compiled trace regardless of `iters`
            # (a distinct static iters per call would each trace anew), and
            # at most `chunk` LM iterations of wasted work on abort.
            mm = self._global_ba(mm, iters=chunk)
            done += chunk
        return (
            mm.kf_R, mm.kf_t, mm.pt_xyz, gen,
            np.asarray(m_snap.kf_frame_id), np.asarray(m_snap.kf_valid),
            int(m_snap.n_pt),
        )

    def _schedule_gba(self, m: MapState, iters: int = 10) -> MapState:
        """Run global BA for a freshly corrected loop. Synchronous without the
        async worker; otherwise dispatched to the GBA thread, aborting any
        stale run (LoopClosing::CorrectLoop :411-423)."""
        self._gba_generation += 1
        if self._gba_pool is None:
            return self._global_ba(m, iters=iters)
        if self._gba_future is not None and not self._gba_future.done():
            # The bumped generation makes the running job exit at its next
            # chunk boundary; don't block on it.
            pass
        self._gba_future = self._gba_pool.submit(
            self._gba_job, m, self._gba_generation, iters
        )
        return m

    def _poll_gba(self, m: MapState) -> MapState:
        """Adopt a finished global BA into the (possibly advanced) map:
        snapshot keyframes/points take the optimized estimates directly;
        keyframes and points created during the run are corrected through
        the last snapshot keyframe / their reference keyframe (the spanning-
        tree propagation of LoopClosing::RunGlobalBundleAdjustment
        :677-737)."""
        f = self._gba_future
        if f is None or not f.done():
            return m
        self._gba_future = None
        res = f.result()
        if res is None:
            return m
        R_g, t_g, X_g, gen, snap_fid, snap_valid, n_pt_s = res
        if gen != self._gba_generation:
            return m  # superseded (mnFullBAIdx mismatch, :658)
        K = m.capacity_kf
        # Snapshot membership by FRAME ID, not slot watermark: keyframes
        # created during the run may occupy recycled slots below it. The
        # anchor is the newest valid snapshot keyframe.
        anchor = int(np.argmax(np.where(snap_valid, snap_fid, -1)))
        # Post-snapshot KFs: T_k_new = (T_k ∘ T_anchor^-1) ∘ T_anchor_gba.
        Ra_i, ta_i = se3_inverse(m.kf_R[anchor], m.kf_t[anchor])
        Rrel, trel = se3_compose(m.kf_R, m.kf_t, Ra_i, ta_i)
        R_post, t_post = se3_compose(Rrel, trel, R_g[anchor], t_g[anchor])
        pre_k = (m.kf_frame_id == jnp.asarray(snap_fid))[:, None]
        R_new = jnp.where(pre_k[..., None], R_g, R_post)
        t_new = jnp.where(pre_k, t_g, t_post)
        # Post-snapshot points: preserve camera-frame coords in the ref KF.
        ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
        Xc = se3_apply(m.kf_R[ref], m.kf_t[ref], m.pt_xyz)
        Rr_i, tr_i = se3_inverse(R_new[ref], t_new[ref])
        X_post = se3_apply(Rr_i, tr_i, Xc)
        pre_p = (jnp.arange(m.capacity_pt) < n_pt_s)[:, None]
        X_new = jnp.where(pre_p, X_g, X_post)
        return m._replace(kf_R=R_new, kf_t=t_new, pt_xyz=X_new)

    # ------------------------------------------------------------- tracking

    def _track_local_map(self, m: MapState, R, t, feats, obs):
        """TrackLocalMap dispatch: whole-map candidates for small maps, the
        covisibility-local subset (local_keyframe_mask + fixed-size point
        gather) when the map is large (Tracking.cc:982,1283-1337)."""
        cfg = self.cfg
        cap = cfg.local_map_max_pts or (
            16384 if m.capacity_pt > 16384 else 0
        )
        kwargs = {}
        if cap and cap < m.capacity_pt:
            kwargs = dict(
                local_kf_mask=steps.local_keyframe_mask(
                    m, obs, ref_kf=jnp.int32(max(self._last_kf_idx, 0))
                ),
                max_local_pts=cap,
            )
        return steps.track_local_map(
            cfg.cam, m, R, t, feats, obs, self.inv_sigma2,
            scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
            cand_cap=self._cand_cap(), **kwargs,
        )

    def _cand_cap(self) -> int:
        """TrackLocalMap candidate-compaction cap: only frustum-surviving
        points reach the Hamming matrix (steps.track_local_map cand_cap).
        Sized to half the local subset — the visible fraction of the local
        point set is far smaller in practice."""
        cap = self._local_subset_cap() or self.map.capacity_pt
        return min(8192, cap) if cap > 4096 else 0

    def _predict_pose(self):
        if self._velocity is not None:
            Rv, tv = self._velocity
            return se3_compose(Rv, tv, self._last_R, self._last_t)
        return self._last_R, self._last_t

    def _ref_kf_estimate(self, feats: FrameFeatures):
        """TrackReferenceKeyFrame (Tracking.cc:809): BoW-style descriptor
        match against the reference keyframe from the last frame's pose.
        Returns (ok, R, t, obs)."""
        ref = self._last_kf_idx
        if ref < 0:
            return False, None, None, None
        R, t, obs, n_matches, n_inl = steps.track_reference_keyframe(
            self.cfg.cam, self.map, jnp.int32(ref), feats,
            self._last_R, self._last_t, self.inv_sigma2,
        )
        # >= 15 matches to attempt, >= 10 map inliers to accept
        # (Tracking.cc:821,851).
        nm, ni = self._fetch(n_matches, n_inl)  # one transfer
        if nm < 15 or ni < 10:
            return False, None, None, None
        return True, R, t, obs

    def _accept_thr(self, frame_id: int) -> int:
        """TrackLocalMap acceptance threshold; stricter right after
        relocalization (Tracking.cc:1020: < 50 inliers within mMaxFrames of
        a reloc fails TrackLocalMap)."""
        cfg = self.cfg
        if frame_id < self._last_reloc_frame_id + cfg.kf_max_frames:
            return max(cfg.min_inliers_ok, 50)
        return cfg.min_inliers_ok

    def _local_subset_cap(self) -> int:
        cfg = self.cfg
        cap = cfg.local_map_max_pts or (
            16384 if self.map.capacity_pt > 16384 else 0
        )
        return cap if 0 < cap < self.map.capacity_pt else 0

    def _track_frame(self, feats: FrameFeatures, frame_id: int,
                     img: Optional[jnp.ndarray] = None) -> bool:
        """Steady-state OK-path frame: ONE fused jitted dispatch + ONE
        packed scalar fetch (steps.fused_track_frame; the whole
        Tracking::Track OK path, /root/reference/src/Tracking.cc:327-528).
        Rare failures fall back to multi-dispatch slow paths.

        `img` (mono only): fuse ORB extraction + undistortion into the same
        program (`feats` is then ignored and produced by the device)."""
        cfg = self.cfg
        # Adopt any finished background mapping result (snapshot swap).
        self._poll_mapping()
        if self.localization_mode and self._depth_mode:
            return self._track_frame_localization(feats, frame_id)
        thr = self._accept_thr(frame_id)
        # Right after relocalization the velocity is distrusted and tracking
        # goes through the reference keyframe (Tracking.cc:327-338).
        has_vel = (
            self._velocity is not None
            and frame_id >= self._last_reloc_frame_id + 2
        )
        vel_R, vel_t = self._velocity if has_vel else (jnp.eye(3), jnp.zeros(3))
        common = dict(
            min_inliers_motion=cfg.min_inliers_motion,
            max_local_pts=self._local_subset_cap(),
            cand_cap=self._cand_cap(),
        )
        import time as _time

        _t_disp = _time.perf_counter()
        if img is not None:
            out = steps.fused_track_frame_image(
                cfg.cam, cfg.orb, self.map, img,
                self._last_feats, self._last_obs, self._last_R, self._last_t,
                vel_R, vel_t, jnp.asarray(has_vel),
                jnp.int32(max(self._last_kf_idx, 0)), self.inv_sigma2,
                jnp.float32(thr), **common,
            )
            feats = out[0]
            out = out[1:]
        else:
            out = steps.fused_track_frame(
                cfg.cam, self.map, self._last_feats, self._last_obs,
                self._last_R, self._last_t, vel_R, vel_t,
                jnp.asarray(has_vel), feats,
                jnp.int32(max(self._last_kf_idx, 0)), self.inv_sigma2,
                jnp.float32(self._th_depth), jnp.float32(thr),
                scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
                depth=self._depth_mode, **common,
            )
        self.metrics.timer.samples["track.dispatch"].append(
            _time.perf_counter() - _t_disp
        )
        R, t, obs, vel_R2, vel_t2, pt_visible, pt_found, packed = out
        self.stats["dispatches"] += 1
        with self.metrics.stage("track.fetch"):
            p = np.asarray(packed)  # THE per-frame device->host sync
        self.stats["syncs"] += 1
        accept = p[steps.FUSED_ACCEPT] > 0.5
        used_mm = p[steps.FUSED_USED_MM] > 0.5

        if accept:
            self.stats["fused_frames"] += 1
            self.map = self.map._replace(
                pt_visible=pt_visible, pt_found=pt_found
            )
            self._velocity = (vel_R2, vel_t2)
            self._last_R, self._last_t = R, t
            self._last_feats = feats
            self._last_obs = obs
            self._frames_since_kf += 1
            n_tracked = int(p[steps.FUSED_N_TRACKED])
            gates = p[steps.FUSED_GATES:steps.FUSED_GATES + 4]
            if self._need_new_keyframe(n_tracked, frame_id, gates):
                self._create_keyframe(feats, obs, R, t, frame_id)
                self._last_pose_np = None
                # Record AFTER keyframe creation: sync-mode mapping refines
                # the pose with local BA and updates _last_R/_last_t.
                self._record_pose(frame_id, self._last_R, self._last_t)
            else:
                # Trajectory entry straight from the packed fetch — no
                # extra device sync (System::SaveTrajectoryTUM stores the
                # same KF-relative pose, System.cc:337-396).
                o = steps.FUSED_REL
                rel_R = p[o:o + 9].reshape(3, 3).astype(np.float64)
                rel_t = p[o + 9:o + 12].astype(np.float64)
                self.trajectory.append(
                    (frame_id, self._last_kf_idx, rel_R, rel_t, False)
                )
                o = steps.FUSED_POSE
                self._last_pose_np = (
                    p[o:o + 9].reshape(3, 3), p[o + 9:o + 12]
                )
            return True

        if used_mm:
            # The motion model cleared its gates on a few aliased matches
            # yet landed at a pose TrackLocalMap rejects; retry the frame
            # through the reference-keyframe path before declaring LOST
            # (robustness addition over the reference, which goes LOST
            # here — Tracking.cc:462).
            self.stats["slow_frames"] += 1
            ok, R2, t2, obs2 = self._ref_kf_estimate(feats)
            if ok:
                R, t, obs, n_inl, visible, found = self._track_local_map(
                    self.map, R2, t2, feats, obs2
                )
                g = steps.keyframe_gates(
                    self.map, jnp.int32(max(self._last_kf_idx, 0)), feats,
                    obs, jnp.float32(self._th_depth), depth=self._depth_mode,
                )
                packed2 = self._fetch(n_inl, g[0], g[1], g[2], g[3])
                n_tracked = int(packed2[0])
                if n_tracked >= thr:
                    self.map = self.map._replace(
                        pt_visible=self.map.pt_visible
                        + visible.astype(jnp.float32),
                        pt_found=self.map.pt_found + found.astype(jnp.float32),
                    )
                    Rl_inv, tl_inv = se3_inverse(self._last_R, self._last_t)
                    self._velocity = se3_compose(R, t, Rl_inv, tl_inv)
                    self._last_R, self._last_t = R, t
                    self._last_feats = feats
                    self._last_obs = obs
                    self._frames_since_kf += 1
                    self._last_pose_np = None
                    if self._need_new_keyframe(n_tracked, frame_id, packed2[1:]):
                        self._create_keyframe(feats, obs, R, t, frame_id)
                    self._record_pose(
                        frame_id, self._last_R, self._last_t
                    )
                    return True
        return False

    def _need_new_keyframe(self, n_tracked: int, frame_id: int, gates) -> bool:
        """NeedNewKeyFrame (/root/reference/src/Tracking.cc:1029), full
        policy: post-relocalization gate, mapping-idle condition c1b,
        stereo/RGB-D close-point pressure (bNeedToInsertClose) and weak-
        tracking c1c, ref-ratio 0.9 mono / 0.75 depth / 0.4 tiny map.

        `gates` is the pre-fetched (4,) scalar pack from
        steps.keyframe_gates — no device sync happens here."""
        cfg = self.cfg
        if self.localization_mode:
            return False  # mbOnlyTracking (Tracking.cc:1031)
        n_kf = int(gates[0])
        # Do not insert right after relocalization on an established map
        # (Tracking.cc:1040-1041).
        if (
            frame_id < self._last_reloc_frame_id + cfg.kf_max_frames
            and n_kf > cfg.kf_max_frames
        ):
            return False
        ref_matches = int(gates[1])
        idle = self._mapping_future is None or self._mapping_future.done()
        # Close-point pressure (Tracking.cc:1054-1070): many close depths
        # could become points but few are tracked.
        need_close = False
        if self._depth_mode:
            need_close = (gates[2] < 100) and (gates[3] > 70)
        if n_kf < 2:
            th_ref = 0.4
        elif self._depth_mode:
            th_ref = cfg.kf_ref_ratio_depth
        else:
            th_ref = cfg.kf_ref_ratio
        c1a = self._frames_since_kf >= cfg.kf_max_frames
        c1b = self._frames_since_kf >= cfg.kf_min_frames and idle
        c1c = self._depth_mode and (
            n_tracked < 0.25 * ref_matches or need_close
        )
        c2 = (n_tracked < th_ref * ref_matches or need_close) and n_tracked > 15
        if not ((c1a or c1b or c1c) and c2):
            # A keyframe is WANTED but the idle gate blocked c1b: interrupt
            # the in-flight mapping job (Tracking.cc:1097-1105 InterruptBA)
            # so it finishes early and the next frame can insert.
            if not idle and c2 and self._frames_since_kf >= cfg.kf_min_frames:
                self._signal_mapping_interrupt()
            return False
        if idle:
            return True
        # Mapping busy: the reference interrupts BA and lets stereo/RGB-D
        # insert if the queue holds < 3 keyframes (Tracking.cc:1092-1105);
        # this pipeline's queue is single-slot and _create_keyframe joins
        # the in-flight job (the InterruptBA analog), so depth sensors
        # proceed. Mono waits one (truncated) job — EXCEPT at the hard
        # cadence limit c1a: the reference assumes LocalMapping always
        # keeps up with the frame rate and simply drops the keyframe
        # (Tracking.cc:1104); when mapping is slower than the camera (host
        # CPU testing, or a pathological map), dropping forever guarantees
        # LOST, so the hard limit inserts through the join instead
        # (documented deviation — bounded wait beats starvation).
        self._signal_mapping_interrupt()
        return self._depth_mode or c1a

    def _signal_mapping_interrupt(self):
        """InterruptBA (Tracking.cc:1097-1105): truncate the in-flight
        mapping job's optional stages. In mapping_process mode the event
        lives in the worker process, so it is forwarded over IPC
        (RemoteMappingWorker.interrupt)."""
        self._mapping_interrupt.set()
        if self._remote_mapper is not None:
            self._remote_mapper.interrupt()

    # ------------------------------------------ localization-mode tracking

    def _track_frame_localization(self, feats: FrameFeatures, frame_id: int) -> bool:
        """Localization-only tracking for stereo/RGB-D with temporal
        visual-odometry points (/root/reference/src/Tracking.cc:343-421):
        the motion model tracks the last frame's map points PLUS VO points
        unprojected from its close depths, so tracking survives map-sparse
        regions; when the last frame tracked mostly VO points (mbVO),
        relocalization runs in parallel and is preferred when it succeeds."""
        cfg = self.cfg
        m = self.map
        last = self._last_feats
        # Last-frame point table: map points, then VO points where no map
        # point is held (UpdateLastFrame, Tracking.cc:859-916 — VO creation
        # happened at the end of the previous frame, _update_vo_points).
        tag0 = self._last_obs
        has_map = (tag0 >= 0) & last.valid & m.pt_valid[jnp.maximum(tag0, 0)]
        xyz = m.pt_xyz[jnp.maximum(tag0, 0)]
        tags = jnp.where(has_map, tag0, -1)
        has = has_map
        if self._vo_xyz is not None:
            vo = self._vo_valid & ~has_map & last.valid
            xyz = jnp.where(vo[:, None], self._vo_xyz, xyz)
            has = has_map | vo

        def run_motion_model():
            R_pred, t_pred = self._predict_pose()
            for th in (7.0, 14.0):
                R, t, ct, cx, n_map, n_tot, n_m = steps.track_motion_model_pts(
                    cfg.cam, last, xyz, tags, has, R_pred, t_pred, feats,
                    self.inv_sigma2, scale_factor=cfg.orb.scale_factor,
                    n_levels=cfg.orb.n_levels, th=th,
                )
                # Acceptance: >= 20 matches pre-opt (Tracking.cc:944-947)
                # and > 20 total (map + VO) inliers (Tracking.cc:970).
                if int(n_m) >= 20 and int(n_tot) > 20:
                    return R, t, ct, cx, int(n_map)
            return None

        mm = None
        used_reloc = False
        if not self._vo_mode:
            mm = run_motion_model() if self._velocity is not None else None
            if mm is None and self._last_kf_idx >= 0:
                # TrackReferenceKeyFrame path (Tracking.cc:364-366).
                R, t, obs, n_matches, n_inl = steps.track_reference_keyframe(
                    cfg.cam, m, jnp.int32(self._last_kf_idx), feats,
                    self._last_R, self._last_t, self.inv_sigma2,
                )
                if int(n_matches) >= 15 and int(n_inl) >= 10:
                    ct = jnp.where(obs >= 0, obs, -2)
                    cx = jnp.where(
                        (obs >= 0)[:, None], m.pt_xyz[jnp.maximum(obs, 0)], 0.0
                    )
                    mm = (R, t, ct, cx, int(n_inl))
        else:
            # mbVO: compute both the motion-model and the relocalization
            # pose; prefer relocalization (Tracking.cc:369-410).
            mm = run_motion_model() if self._velocity is not None else None
            used_reloc = self._relocalize(feats, frame_id)
            if used_reloc:
                self._vo_mode = False
        if not used_reloc and mm is None:
            return False

        if used_reloc:
            # _relocalize already polished with TrackLocalMap and set the
            # frame state; only the VO bookkeeping remains.
            R, t = self._last_R, self._last_t
            cur_tag = jnp.where(self._last_obs >= 0, self._last_obs, -2)
            cur_xyz = jnp.zeros((feats.xy.shape[0], 3))
            self._record_pose(frame_id, R, t)
        else:
            R, t, cur_tag, cur_xyz, n_map = mm
            self._vo_mode = n_map < 10  # mbVO update (Tracking.cc:965-968)
            if not self._vo_mode:
                # TrackLocalMap over the frozen map (Tracking.cc:430-436:
                # skipped while mbVO). VO matches don't join this pose
                # refinement (they are temporal, not in the map).
                obs_map = jnp.where(cur_tag >= 0, cur_tag, -1)
                R, t, obs_map, n_inl, visible, found = self._track_local_map(
                    m, R, t, feats, obs_map
                )
                if int(n_inl) < cfg.min_inliers_ok:
                    return False
                self.map = self.map._replace(
                    pt_visible=self.map.pt_visible + visible.astype(jnp.float32),
                    pt_found=self.map.pt_found + found.astype(jnp.float32),
                )
                cur_tag = jnp.where(
                    obs_map >= 0, obs_map, jnp.where(cur_tag == -1, -1, -2)
                )
            Rl_inv, tl_inv = se3_inverse(self._last_R, self._last_t)
            self._velocity = se3_compose(R, t, Rl_inv, tl_inv)
            self._last_R, self._last_t = R, t
            self._last_feats = feats
            self._last_obs = jnp.where(cur_tag >= 0, cur_tag, -1)
            self._record_pose(frame_id, R, t)
        self._frames_since_kf += 1
        self._update_vo_points(feats, cur_tag, cur_xyz, R, t)
        return True

    def _update_vo_points(self, feats, cur_tag, cur_xyz, R, t):
        """Create the NEXT frame's temporal VO points (Tracking::
        UpdateLastFrame, /root/reference/src/Tracking.cc:859-916): unproject
        keypoints with valid depth that track no map point — every one
        closer than th_depth, topped up to the 100 nearest. Carried-forward
        VO matches (tag -1) keep their triangulated position."""
        from tpuslam.geometry.camera import unproject

        c = self.cfg.cam
        d = feats.depth
        has_d = (d > 0) & feats.valid
        untracked = cur_tag < 0
        order_d = jnp.where(has_d, d, jnp.inf)
        rank = jnp.argsort(jnp.argsort(order_d))
        create = has_d & untracked & ((d < self._th_depth) | (rank < 100))
        Xc = unproject(c, feats.xy, d)
        Ri, ti = se3_inverse(R, t)
        Xw = se3_apply(Ri, ti, Xc)
        carried = cur_tag == -1
        self._vo_xyz = jnp.where(carried[:, None], cur_xyz, Xw)
        self._vo_valid = carried | create

    def _create_keyframe(self, feats, obs, R, t, frame_id):
        cfg = self.cfg
        n = feats.xy.shape[0]
        if n < self.kp_capacity:
            feats = self._pad_feats(feats)
            obs = jnp.pad(obs, (0, self.kp_capacity - n), constant_values=-1)
        # Back-pressure: one mapping job in flight (the reference's
        # SetAcceptKeyFrames protocol, LocalMapping.cc:55) — adopt the
        # previous result before inserting on top of it.
        self._join_mapping()
        slot = None
        if self._n_kf_host >= self.map.capacity_kf:
            slot = self._recycle_kf_slot()
            if slot is None:
                return  # full, nothing recyclable
        # The slot is known host-side (watermark mirror or recycled slot),
        # so keyframe creation never syncs on a device scalar.
        ki_int = self._n_kf_host if slot is None else slot
        m, _ = insert_keyframe(self.map, feats, R, t, frame_id, obs, slot=slot)
        if slot is None:
            self._n_kf_host += 1
        # Stereo/RGB-D: densify with close depth points
        # (Tracking::CreateNewKeyFrame stereo path, Tracking.cc:1115-1186).
        if self._depth_mode:
            m = self._add_depth_points(m, ki_int, feats, R, t)

        if self._mapping_pool is not None:
            # Publish the inserted-KF snapshot and hand the mapping work to
            # the background worker (the LocalMapping/LoopClosing threads of
            # the reference, SURVEY.md P1/P5): tracking continues against
            # this immutable snapshot; the job's result is adopted at a
            # frame boundary.
            self.map = m
            self._last_kf_idx = ki_int
            self._frames_since_kf = 0
            self._mapping_future = self._mapping_pool.submit(
                self._mapping_job, m, ki_int
            )
            return

        m = self._mapping_compute(m, ki_int)
        self.map = m
        self._apply_pt_remap()
        self._last_kf_idx = ki_int
        self._frames_since_kf = 0
        # Keep the tracker's pose in sync with the BA-refined keyframe.
        self._last_R = self.map.kf_R[ki_int]
        self._last_t = self.map.kf_t[ki_int]
        self._velocity = None

    def _force_evict_kf(self) -> bool:
        """Mark the least-useful valid keyframe culled (observations
        detached, spanning-tree parent + relative pose recorded) so its slot
        can be recycled. Eviction picks the valid KF least covisible with
        the current reference KF (tie: oldest), protecting the origin pair,
        the current KF, and the recent window."""
        from tpuslam.mapstate.core import shared_point_counts

        m = self.map
        valid = np.asarray(m.kf_valid)
        fid = np.asarray(m.kf_frame_id).astype(np.int64)
        protect = {0, 1, self._last_kf_idx}
        fids = fid.copy()
        fids[~valid] = -1
        recent = np.argsort(-fids)[: self.cfg.local_ba_window]
        protect |= {int(k) for k in recent if fids[k] >= 0}
        cands = [int(k) for k in np.nonzero(valid)[0] if int(k) not in protect]
        if not cands:
            return False
        anchor = self._last_kf_idx if self._last_kf_idx >= 0 else int(np.argmax(fids))
        shared = np.asarray(shared_point_counts(m, anchor))
        slot = min(cands, key=lambda k: (float(shared[k]), int(fid[k])))
        # Parent: most covisible survivor; fall back to the newest survivor.
        # (np.array: np.asarray of a jax array is a read-only view.)
        s_row = np.array(shared_point_counts(m, slot))
        s_row[slot] = -1.0
        s_row[~valid] = -1.0
        p = int(np.argmax(s_row))
        if s_row[p] <= 0:
            fids2 = fids.copy()
            fids2[slot] = -1
            p = int(np.argmax(fids2))
        pR = np.asarray(m.kf_R[slot]) @ np.asarray(m.kf_R[p]).T
        pt_ = np.asarray(m.kf_t[slot]) - pR @ np.asarray(m.kf_t[p])
        self.map = m._replace(
            kf_valid=m.kf_valid.at[slot].set(False),
            kf_obs_pt=m.kf_obs_pt.at[slot].set(-1),
            kf_parent=m.kf_parent.at[slot].set(p),
            kf_rel_R=m.kf_rel_R.at[slot].set(jnp.asarray(pR)),
            kf_rel_t=m.kf_rel_t.at[slot].set(jnp.asarray(pt_)),
        )
        return True

    def _recycle_kf_slot(self):
        """Pick a culled keyframe slot for reuse once capacity is reached —
        the TPU-native form of the reference's unbounded pointer map (it
        deletes culled KeyFrames outright; fixed-capacity SoA arrays recycle
        slots instead). Every reference to the slot is rebased onto its
        spanning-tree parent first: recorded trajectory entries, other
        culled KFs' parent pointers, and point reference keyframes. Returns
        the slot index, or None if nothing is recyclable."""
        m = self.map
        valid = np.asarray(m.kf_valid)
        parent = np.asarray(m.kf_parent)
        cand = np.nonzero(~valid & (parent >= 0))[0]
        if len(cand) == 0:
            # No culled slot: force-evict the least-useful keyframe
            # (sliding-window marginalization — a bounded-memory policy the
            # unbounded reference never needs; redundancy culling alone
            # starves once nothing is 90% redundant).
            if not self._force_evict_kf():
                return None
            m = self.map
            valid = np.asarray(m.kf_valid)
            parent = np.asarray(m.kf_parent)
            cand = np.nonzero(~valid & (parent >= 0))[0]
        fid = np.asarray(m.kf_frame_id)
        slot = int(cand[np.argmin(fid[cand])])  # oldest culled slot
        self.n_recycled_kf_slots += 1
        p = int(parent[slot])
        pR = np.asarray(m.kf_rel_R[slot])
        pt_ = np.asarray(m.kf_rel_t[slot])

        # Trajectory entries referencing the slot: compose the slot's
        # relative pose into the stored frame-relative pose.
        self.trajectory = [
            (fi, p, Rr @ pR, Rr @ pt_ + tr, lost) if ref == slot else
            (fi, ref, Rr, tr, lost)
            for (fi, ref, Rr, tr, lost) in self.trajectory
        ]
        # Culled KFs whose parent is the slot: splice the chain.
        kids = np.nonzero((parent == slot) & ~valid)[0]
        kf_parent = m.kf_parent
        kf_rel_R = m.kf_rel_R
        kf_rel_t = m.kf_rel_t
        for k in kids:
            k = int(k)
            kf_rel_t = kf_rel_t.at[k].set(
                jnp.asarray(np.asarray(m.kf_rel_R[k]) @ pt_) + m.kf_rel_t[k]
            )
            kf_rel_R = kf_rel_R.at[k].set(jnp.asarray(np.asarray(m.kf_rel_R[k]) @ pR))
            kf_parent = kf_parent.at[k].set(p)
        # Points referencing the slot follow the parent.
        ref_hit = m.pt_ref_kf == slot
        first_hit = m.pt_first_kf == slot
        self.map = m._replace(
            kf_parent=kf_parent,
            kf_rel_R=kf_rel_R,
            kf_rel_t=kf_rel_t,
            pt_ref_kf=jnp.where(ref_hit, p, m.pt_ref_kf),
            pt_first_kf=jnp.where(first_hit, p, m.pt_first_kf),
        )
        return slot

    # ------------------------------------------------- mapping (sync/async)

    def _mapping_job(self, m, ki_int):
        if self._remote_mapper is not None:
            # Ship the snapshot to the mapping process (blocking IPC on this
            # worker thread; tracking is not blocked).
            m2, pt_remap, bow_rows, voc_blob = self._remote_mapper.process(
                m, ki_int, self._depth_mode
            )
            if pt_remap is not None:
                self._pending_pt_remap = np.asarray(pt_remap)
            self._apply_bow_feedback(bow_rows, voc_blob)
            return m2, ki_int
        return self._mapping_compute(m, ki_int), ki_int

    def _apply_bow_feedback(self, bow_rows, voc_blob):
        """Mirror the mapping worker's keyframe BoW rows into the tracker's
        own loop closer so relocalization keeps BoW candidates in
        mapping_process mode (the reference's Tracking queries the shared
        KeyFrameDatabase, /root/reference/src/Tracking.cc:1400 ->
        KeyFrameDatabase.cc:199). The worker ships its vocabulary once, so
        both sides transform descriptors identically even when the
        vocabulary was trained on the fly."""
        lc = self.loop_closer
        if lc is None or (not bow_rows and voc_blob is None):
            return
        if voc_blob is not None and lc.voc is None:
            from tpuslam.place.vocabulary import Vocabulary

            lc.voc = Vocabulary(
                centers=tuple(jnp.asarray(c) for c in voc_blob["centers"]),
                word_weight=jnp.asarray(voc_blob["word_weight"]),
                k=voc_blob["k"],
                levels=voc_blob["levels"],
                centers_valid=(
                    None if voc_blob["centers_valid"] is None else
                    tuple(jnp.asarray(v) for v in voc_blob["centers_valid"])
                ),
            )
            lc._tried_default = True
        if lc.voc is None or not bow_rows:
            return
        from tpuslam.place.database import SparseBow, SparseKeyFrameDatabase

        if lc.db is None:
            lc.db = SparseKeyFrameDatabase(
                lc.voc.n_words, lc.max_keyframes, bow_rows[0][2].shape[0]
            )
        for slot, fid, words, weight in bow_rows:
            bow = SparseBow(jnp.asarray(words), jnp.asarray(weight))
            lc._bow[slot] = bow
            lc.db.add(slot, bow)
            lc._slot_fid[slot] = fid

    def _apply_pt_remap(self):
        """Apply a pending point-slot compaction remap to the tracker's own
        slot references (see _mapping_compute; old slots may immediately be
        reused by different points, so stale references must be rewritten,
        not just validity-gated)."""
        r = self._pending_pt_remap
        if r is None:
            return
        self._pending_pt_remap = None
        if self._last_obs is not None:
            obs = np.asarray(self._last_obs)
            self._last_obs = jnp.asarray(
                np.where(obs >= 0, r[np.minimum(np.maximum(obs, 0), len(r) - 1)], obs)
                .astype(np.int32)
            )

    def _adopt_mapping_result(self, result):
        m, ki_int = result
        self.map = m
        self._apply_pt_remap()
        # The job this interrupt targeted is over (remote jobs poll their
        # own event, forwarded by _signal_mapping_interrupt).
        self._mapping_interrupt.clear()
        # The motion model was estimated against the pre-BA map; carrying it
        # across the snapshot swap compounds the BA correction into the
        # prediction and diverges. Re-estimate from scratch next frame (the
        # sync path does the same via its velocity reset).
        self._velocity = None

    def _join_mapping(self):
        if self._mapping_future is not None:
            self._adopt_mapping_result(self._mapping_future.result())
            self._mapping_future = None

    def _poll_mapping(self):
        f = self._mapping_future
        if f is not None and f.done():
            self._adopt_mapping_result(f.result())
            self._mapping_future = None

    @staticmethod
    def _best_covisible(m, ki_int, n: int):
        """Indices of the up-to-n keyframes sharing the most map points with
        keyframe ki_int (KeyFrame::GetBestCovisibilityKeyFrames semantics,
        /root/reference/src/KeyFrame.cc:226). Falls back to the n most
        recent keyframes when no covisibility edges exist yet."""
        from tpuslam.mapstate.core import shared_point_counts

        shared = np.array(shared_point_counts(m, ki_int))  # writable copy
        shared[ki_int] = 0.0
        shared[~np.asarray(m.kf_valid)] = 0.0
        order = np.argsort(-shared)[:n]
        best = [int(k) for k in order if shared[k] > 0]
        if not best:
            # Frame-id recency fallback (slot order stops tracking time once
            # culled slots are recycled).
            fids = np.asarray(m.kf_frame_id).copy()
            fids[~np.asarray(m.kf_valid)] = -1
            fids[ki_int] = -1
            best = [int(k) for k in np.argsort(-fids)[:n] if fids[k] >= 0]
        return best

    def _mapping_compute(self, m, ki_int):
        """The LocalMapping + LoopClosing work for one new keyframe, as a
        pure snapshot -> snapshot function (runs on the worker thread in
        async mode). Set TPUSLAM_STAGE_SYNC=1 to block per stage so
        metrics.report() attributes device time to the right stage."""
        import contextlib
        import os as _os

        _sync = _os.environ.get("TPUSLAM_STAGE_SYNC")

        @contextlib.contextmanager
        def _stage(name):
            with self.metrics.stage("map." + name):
                yield
                if _sync:
                    jax.block_until_ready(m.kf_R)

        cfg = self.cfg
        # Adopt a finished (non-superseded) global BA first — the reference
        # applies GBA results under the map lock with LocalMapping stopped
        # (LoopClosing.cc:656-737); here the single mapping worker owns the
        # snapshot, so the merge is race-free by construction.
        m = self._poll_gba(m)
        # Point-slot recycling: when the watermark nears capacity, compact
        # culled slots out (the reference's Map deletes culled MapPoints,
        # Map.cc:45-52; fixed-capacity arrays re-pack instead). Slot indices
        # change, so any in-flight GBA snapshot is invalidated and the
        # tracker's own slot references are remapped at adoption.
        if int(m.n_pt) >= int(0.95 * m.capacity_pt):
            from tpuslam.mapstate.core import compact_point_slots

            m, remap = compact_point_slots(m)
            self._pending_pt_remap = np.asarray(remap)
            self._gba_generation += 1  # index-based GBA snapshot now stale
        # The whole LocalMapping epoch — triangulation vs the 10 (stereo) /
        # 20 (mono) best covisible neighbors (LocalMapping.cc:207-244),
        # recent-point culling, two-hop bidirectional fusion, descriptor
        # refresh, redundant-KF culling — runs as ONE jitted program
        # (steps.mapping_front): one device dispatch instead of the former
        # ~60-100, which is what lets the mapping job keep up with the
        # fused per-frame tracking path. The interrupt protocol's
        # truncation points are now between front / BA chunks (the
        # reference's mbAbortBA aborts mostly inside BA too,
        # Optimizer.cc:65-66).
        self._mapping_interrupt.clear()
        nn_auto = 10 if self._depth_mode else 20
        with _stage("front"):
            m = steps.mapping_front(
                cfg.cam, m, jnp.int32(ki_int), self.inv_sigma2,
                jnp.float32(2.0 if self._depth_mode else 3.0),
                scale_factor=cfg.orb.scale_factor,
                n_levels=cfg.orb.n_levels,
                nn_tri=cfg.tri_neighbors or nn_auto,
                nn_fuse=cfg.fuse_neighbors or nn_auto,
                fuse_hop=cfg.fuse_second_hop,
                window=cfg.local_ba_window,
            )
        # Local BA around the new keyframe (distributed when a mesh is
        # configured; see _local_ba), in two abortable chunks — the
        # reference's mbAbortBA polls inside g2o (Optimizer.cc:65-66);
        # here the boundary between chunks is the poll point.
        with _stage("local_ba"):
            m = self._local_ba(m, ki_int, iters=4)
            if not self._mapping_interrupt.is_set():
                m = self._local_ba(m, ki_int, iters=4)
            m = update_point_normals(m, self.scale_factors)
        # Loop closing on the fresh keyframe (the reference's LoopClosing
        # thread hand-off, LocalMapping.cc:87).
        if self.loop_closer is not None:
            with _stage("loop"):
                self.loop_closer.fix_scale = self._depth_mode
                m2, closed = self.loop_closer.on_keyframe(
                    m, cfg.cam, ki_int,
                    ba_fn=lambda mm: self._schedule_gba(mm, iters=10),
                )
                if closed:
                    m = update_point_normals(m2, self.scale_factors)
                    # The closure's point fusion merged duplicates away
                    # (MapPoint::Replace); forward the replacement to the
                    # tracker's live references (compose with any pending
                    # compaction remap from this same epoch) so tracking
                    # continues on the surviving loop points — that is what
                    # bridges covisibility across the loop and stops the
                    # detector re-firing on every revisit keyframe.
                    rl = self.loop_closer.last_point_remap
                    if rl is not None:
                        r1 = self._pending_pt_remap
                        if r1 is None:
                            self._pending_pt_remap = rl
                        else:
                            self._pending_pt_remap = np.where(
                                r1 >= 0, rl[np.maximum(r1, 0)], -1
                            ).astype(np.int32)
        return m

    # --------------------------------------------------------- relocalization

    def _reloc_candidate_kfs(self, feats: FrameFeatures):
        """BoW relocalization candidates (Tracking::Relocalization ->
        KeyFrameDatabase::DetectRelocalizationCandidates,
        /root/reference/src/KeyFrameDatabase.cc:199): query the keyframe
        database with the frame's BoW vector — no min-score gate and no
        covisible exclusion, unlike loop detection."""
        lc = self.loop_closer
        if lc is None or lc.voc is None or lc.db is None:
            return None
        from tpuslam.mapstate.core import covisibility_weights
        from tpuslam.place.vocabulary import sparse_bow_vector

        v = sparse_bow_vector(lc.voc, feats.desc, feats.valid)
        covis = covisibility_weights(self.map)
        idx, ok = lc.db.query(
            v,
            jnp.zeros(self.map.capacity_kf, bool),
            covis,
            min_score=0.0,
            max_candidates=3,
        )
        cands = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        return cands or None

    def _match_frame_to_kf_points(self, feats: FrameFeatures, kf: int):
        """Match current-frame keypoints against one keyframe's map points
        (the SearchByBoW step of Relocalization, Tracking.cc:1419). Returns
        (pt_idx (N,), valid (N,)) over current keypoints."""
        m = self.map
        obs_k = m.kf_obs_pt[kf]
        has_k = (obs_k >= 0) & m.kf_kp_valid[kf] & m.pt_valid[jnp.maximum(obs_k, 0)]
        pair = feats.valid[:, None] & has_k[None, :]
        idx, dist, ok = match_nn_ratio(
            feats.desc, m.kf_kp_desc[kf], pair, max_dist=50, nn_ratio=0.75
        )
        return jnp.where(ok, obs_k[idx], -1), ok

    def _relocalize(self, feats: FrameFeatures, frame_id: int) -> bool:
        """Relocalization (Tracking::Relocalization, Tracking.cc:1393): BoW
        keyframe candidates -> per-candidate descriptor matching -> EPnP
        RANSAC -> pose optimization -> two rounds of projective widening to
        reach 50 inliers (Tracking.cc:1462-1533) -> local-map polish. Falls
        back to brute-force matching over all map points when no vocabulary
        has been trained yet."""
        m = self.map
        cfg = self.cfg
        n = feats.xy.shape[0]
        cand_kfs = self._reloc_candidate_kfs(feats)

        attempts = []  # (pt_idx (N,), valid (N,), source_kf or -1)
        if cand_kfs:
            for kf in cand_kfs:
                pt_idx, ok = self._match_frame_to_kf_points(feats, kf)
                if int(jnp.sum(ok)) >= 15:
                    attempts.append((pt_idx, ok, kf))
        if not attempts:
            # Brute force over all points (small-map fallback).
            pair = m.pt_valid[:, None] & feats.valid[None, :]
            idx, dist, ok = match_nn_ratio(
                m.pt_desc, feats.desc, pair, max_dist=50, nn_ratio=0.75
            )
            if int(jnp.sum(ok)) < 15:
                return False
            pt_idx = jnp.full((n,), -1, jnp.int32)
            pt_idx = pt_idx.at[idx].set(
                jnp.where(ok, jnp.arange(m.capacity_pt, dtype=jnp.int32), pt_idx[idx])
            )
            attempts.append((pt_idx, pt_idx >= 0, -1))

        best = None  # (n_inl, R, t, obs)
        for pt_idx, ok, kf in attempts:
            r = pnp_ransac(
                self._next_key(), cfg.cam.K,
                m.pt_xyz[jnp.maximum(pt_idx, 0)], feats.xy,
                jnp.ones(n), ok & (pt_idx >= 0),
                min_inliers=15,
            )
            if not bool(r.success):
                continue
            sel = ok & (pt_idx >= 0) & r.inliers
            obs = jnp.where(sel, pt_idx, -1)
            R, t, obs, n_inl = steps.optimize_frame_pose(
                cfg.cam, m, feats, obs, r.R, r.t, self.inv_sigma2
            )
            n_good = int(n_inl)
            if n_good < 10:
                continue
            if n_good < 50 and kf >= 0:
                # First widening: project the candidate KF's points with the
                # PnP pose, coarse window (Tracking.cc:1499-1508).
                obs, n_add = steps.reloc_search_by_projection(
                    cfg.cam, m, jnp.int32(kf), R, t, feats, obs,
                    scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
                    window=10.0, max_desc_dist=100,
                )
                if n_good + int(n_add) >= 50:
                    R, t, obs, n_inl = steps.optimize_frame_pose(
                        cfg.cam, m, feats, obs, R, t, self.inv_sigma2
                    )
                    n_good = int(n_inl)
                    if 30 < n_good < 50:
                        # Second widening: narrower window, stricter
                        # descriptor gate (Tracking.cc:1513-1533).
                        obs, n_add = steps.reloc_search_by_projection(
                            cfg.cam, m, jnp.int32(kf), R, t, feats, obs,
                            scale_factor=cfg.orb.scale_factor,
                            n_levels=cfg.orb.n_levels,
                            window=3.0, max_desc_dist=64,
                        )
                        if n_good + int(n_add) >= 50:
                            R, t, obs, n_inl = steps.optimize_frame_pose(
                                cfg.cam, m, feats, obs, R, t, self.inv_sigma2
                            )
                            n_good = int(n_inl)
            # Acceptance: >= 50 inliers on the BoW-candidate path
            # (Tracking.cc:1536 bMatch); the brute-force fallback (kf < 0,
            # a small-map extension the reference lacks) accepts the
            # configured minimum and leaves the rest to the local-map gate.
            accept = 50 if kf >= 0 else cfg.min_inliers_ok
            if n_good >= accept and (best is None or n_good > best[0]):
                best = (n_good, R, t, obs)
            if n_good >= 50:
                break
        if best is None:
            return False
        n_good, R, t, obs = best
        # Local-map polish (the Track() continuation after a successful
        # relocalization, Tracking.cc:423).
        R, t, obs, n_inl, visible, found = self._track_local_map(
            m, R, t, feats, obs
        )
        if int(n_inl) < cfg.min_inliers_ok:
            return False
        self._last_R, self._last_t = R, t
        self._last_feats = feats
        self._last_obs = obs
        self._velocity = None
        self._last_reloc_frame_id = frame_id
        return True

    def reset(self):
        """Full system reset (System::Reset -> Tracking::Reset,
        /root/reference/src/System.cc:306, Tracking.cc:1556): clear the map,
        the loop-closing state, and return to NOT_INITIALIZED."""
        self._join_mapping()
        # Abort + discard any in-flight global BA (stale generation).
        self._gba_generation += 1
        self._gba_future = None
        self._pending_pt_remap = None
        self.map = make_empty_map(
            self.cfg.max_keyframes, self.kp_capacity, self.cfg.max_points
        )
        self.state = TrackingState.NO_IMAGES_YET
        self._init_feats = None
        self._last_feats = None
        self._last_obs = None
        self._last_R = jnp.eye(3)
        self._last_t = jnp.zeros(3)
        self._velocity = None
        self._frames_since_kf = 0
        self._last_kf_idx = -1
        self._n_kf_host = 0
        self._last_pose_np = None
        self._depth_mode = False
        self.trajectory = []
        self.n_recycled_kf_slots = 0
        if self.loop_closer is not None:
            from tpuslam.pipeline.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(
                self.cfg.max_keyframes, fix_scale=False, voc=self.loop_closer.voc
            )
        if self._remote_mapper is not None:
            self._remote_mapper.reset()

    # ------------------------------------------------------------- public API

    def _pose_out(self):
        """Current T_cw as host arrays; served from the fused step's packed
        fetch when fresh (no extra device sync on steady-state frames)."""
        if self._last_pose_np is not None:
            R, t = self._last_pose_np
            return np.asarray(R), np.asarray(t)
        return np.asarray(self._last_R), np.asarray(self._last_t)

    def track_monocular(self, img: jnp.ndarray, frame_id: int):
        """Process one grayscale frame; returns T_cw (R, t) or None."""
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            self.n_frames += 1
            self.state = TrackingState.NOT_INITIALIZED
            feats = self._frame_features(img, init=True)
            if self._try_initialize(feats, frame_id):
                return self._pose_out()
            return None
        self.n_frames += 1
        self._last_pose_np = None
        if self.state == TrackingState.OK:
            # Extraction fused into the tracking program (one dispatch).
            return self._after_ok_track(
                self._track_frame(None, frame_id,
                                  img=jnp.asarray(img, jnp.float32)),
                frame_id,
            )
        return self._lost_track(self._frame_features(img), frame_id)

    def track_monocular_features(self, feats: FrameFeatures, frame_id: int):
        """track_monocular over precomputed FrameFeatures — the entry the
        multi-stream front end uses after batching extraction across
        sessions (pipeline.multi.MultiTracker). Only valid once
        initialized (the init path extracts at 2x feature budget)."""
        self.n_frames += 1
        self._last_pose_np = None
        if self.state == TrackingState.OK:
            return self._after_ok_track(
                self._track_frame(feats, frame_id), frame_id
            )
        return self._lost_track(feats, frame_id)

    def _after_ok_track(self, ok: bool, frame_id: int):
        if ok:
            return self._pose_out()
        self.state = TrackingState.LOST
        # Auto-reset when lost right after initialization (Tracking.cc:
        # 494-502): a <=5-KF map is not worth relocalizing against —
        # rebootstrap instead.
        if (
            not self.localization_mode
            and int(np.asarray(self.map.kf_valid).sum()) <= 5
        ):
            self.reset()
            return None
        self._record_pose(frame_id, self._last_R, self._last_t, lost=True)
        return None

    def _lost_track(self, feats: FrameFeatures, frame_id: int):
        if self._relocalize(feats, frame_id):
            self.state = TrackingState.OK
            self._record_pose(frame_id, self._last_R, self._last_t)
            return self._pose_out()
        self._record_pose(frame_id, self._last_R, self._last_t, lost=True)
        return None

    # ------------------------------------------------- stereo / RGB-D input

    @property
    def _th_depth(self) -> float:
        return self.cfg.th_depth_factor * self.cfg.cam.baseline

    def _frame_features_stereo(self, imgL, imgR) -> FrameFeatures:
        return steps.stereo_frame_features(
            imgL, imgR, self.cfg.orb, self.cfg.cam.fx, self.cfg.cam.bf
        )

    def _frame_features_rgbd(self, img, depth_map) -> FrameFeatures:
        """RGB-D Frame construction (Frame::ComputeStereoFromRGBD,
        /root/reference/src/Frame.cc:875): look up the depth image at each
        (distorted) keypoint and synthesize the virtual right coordinate."""
        feats = self._frame_features(img)
        c = self.cfg.cam
        H, W = depth_map.shape
        # Depth is sampled at the raw (pre-undistortion) detection location;
        # _frame_features already replaced xy with undistorted coords, so we
        # re-extract raw coords here.
        raw = self._extract(img)
        xs = jnp.clip(jnp.round(raw.xy[:, 0]).astype(jnp.int32), 0, W - 1)
        ys = jnp.clip(jnp.round(raw.xy[:, 1]).astype(jnp.int32), 0, H - 1)
        d = depth_map[ys, xs] * self.cfg.depth_map_factor
        has_d = (d > 0) & feats.valid
        u_right = jnp.where(has_d, feats.xy[:, 0] - c.bf / jnp.maximum(d, 1e-6), -1.0)
        return feats._replace(u_right=u_right, depth=jnp.where(has_d, d, 0.0))

    def _initialize_with_depth(self, feats: FrameFeatures, frame_id: int) -> bool:
        """StereoInitialization (/root/reference/src/Tracking.cc:531): one
        keyframe at the origin; map points unprojected from every keypoint
        with valid depth."""
        # The reference gates on > 500 keypoints with its 1000-feature budget
        # (Tracking.cc:533); scale the gate to half the configured budget.
        if int(jnp.sum(feats.valid)) < max(self.cfg.orb.n_features // 2, 50):
            return False
        c = self.cfg.cam
        from tpuslam.geometry.camera import unproject

        has_d = (feats.depth > 0) & feats.valid
        X = unproject(c, feats.xy, feats.depth)  # camera frame == world
        n = feats.xy.shape[0]
        dist = jnp.linalg.norm(X, axis=-1)
        sf = self.scale_factors[jnp.clip(feats.level, 0, self.cfg.orb.n_levels - 1)]
        max_d = dist * sf
        min_d = max_d / self.scale_factors[-1]
        normal = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9)

        # Improvement over the reference (which only gates on keypoint
        # count): refuse to bootstrap from a frame with too few valid
        # depths — otherwise an empty map enters the OK state.
        if int(jnp.sum(has_d)) < 50:
            return False

        feats_p = self._pad_feats(feats)
        m = self.map
        m, slots = insert_points(
            m, X, feats.desc, 0, has_d, normal, 0.8 * min_d, 1.2 * max_d
        )
        obs = jnp.where(has_d, slots, -1).astype(jnp.int32)
        obs_p = jnp.pad(obs, (0, self.kp_capacity - n), constant_values=-1) if n < self.kp_capacity else obs
        m, k0 = insert_keyframe(m, feats_p, jnp.eye(3), jnp.zeros(3), frame_id, obs_p)
        m = update_point_normals(m, self.scale_factors)
        self.map = m
        self._depth_mode = True

        self.state = TrackingState.OK
        self._last_feats = feats
        self._last_obs = obs
        self._last_R = jnp.eye(3)
        self._last_t = jnp.zeros(3)
        self._velocity = None
        self._last_kf_idx = 0
        self._frames_since_kf = 0
        self._n_kf_host = 1
        self._record_pose(frame_id, self._last_R, self._last_t)
        return True

    def _add_depth_points(self, m, ki_int, feats_p, R, t):
        """Stereo/RGB-D keyframe densification (Tracking::CreateNewKeyFrame,
        /root/reference/src/Tracking.cc:1115): unproject close (depth <
        th_depth) unmatched keypoints of the new KF into new map points."""
        from tpuslam.geometry.camera import unproject
        from tpuslam.geometry.se3 import se3_apply, se3_inverse

        c = self.cfg.cam
        obs_kf = m.kf_obs_pt[ki_int]
        free = (obs_kf < 0) & feats_p.valid & (feats_p.depth > 0) & (
            feats_p.depth < self._th_depth
        )
        Xc = unproject(c, feats_p.xy, feats_p.depth)
        Ri, ti = se3_inverse(R, t)
        Xw = se3_apply(Ri, ti, Xc)
        dist = jnp.linalg.norm(Xc, axis=-1)
        sf = self.scale_factors[jnp.clip(feats_p.level, 0, self.cfg.orb.n_levels - 1)]
        max_d = dist * sf
        min_d = max_d / self.scale_factors[-1]
        C = -(R.T @ t)
        vecs = Xw - C
        normal = vecs / jnp.maximum(jnp.linalg.norm(vecs, axis=-1, keepdims=True), 1e-9)
        m, slots = insert_points(
            m, Xw, feats_p.desc, ki_int, free, normal, 0.8 * min_d, 1.2 * max_d
        )
        created = free & (slots >= 0)
        new_obs = jnp.where(created, slots, obs_kf)
        return m._replace(kf_obs_pt=m.kf_obs_pt.at[ki_int].set(new_obs))

    def track_stereo(self, img_left: jnp.ndarray, img_right: jnp.ndarray, frame_id: int):
        """Process one rectified stereo pair; returns T_cw (R, t) or None
        (System::TrackStereo, /root/reference/src/System.cc:126)."""
        feats = self._frame_features_stereo(
            jnp.asarray(img_left, jnp.float32), jnp.asarray(img_right, jnp.float32)
        )
        return self._track_with_depth(feats, frame_id)

    def track_rgbd(self, img: jnp.ndarray, depth_map: jnp.ndarray, frame_id: int):
        """Process one RGB-D frame (System::TrackRGBD, System.cc:177)."""
        feats = self._frame_features_rgbd(
            jnp.asarray(img, jnp.float32), jnp.asarray(depth_map, jnp.float32)
        )
        return self._track_with_depth(feats, frame_id)

    def track_depth_features(self, feats: FrameFeatures, frame_id: int):
        """Stereo/RGB-D tracking over precomputed FrameFeatures (u_right +
        depth filled) — the multi-stream batched-front-end entry."""
        return self._track_with_depth(feats, frame_id)

    def _track_with_depth(self, feats: FrameFeatures, frame_id: int):
        self.n_frames += 1
        self._last_pose_np = None
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            self.state = TrackingState.NOT_INITIALIZED
            if self._initialize_with_depth(feats, frame_id):
                return self._pose_out()
            return None
        if self.state == TrackingState.OK:
            return self._after_ok_track(
                self._track_frame(feats, frame_id), frame_id
            )
        return self._lost_track(feats, frame_id)

    def shutdown(self):
        """Join in-flight mapping/GBA work and stop the worker pools and the
        mapping process (System::Shutdown, /root/reference/src/System.cc:316
        spins until LocalMapping/LoopClosing/GBA finish)."""
        self._join_mapping()
        if self._gba_future is not None:
            self._gba_future.result()
            self.map = self._poll_gba(self.map)
        if self._remote_mapper is not None:
            self._remote_mapper.close()
            self._remote_mapper = None
        for pool in (self._mapping_pool, self._gba_pool):
            if pool is not None:
                pool.shutdown(wait=True)
        self._mapping_pool = self._gba_pool = None

    def export_trajectory(self):
        self._join_mapping()
        if self._gba_future is not None:
            self._gba_future.result()  # let a running GBA finish, then merge
            self.map = self._poll_gba(self.map)
        """Final camera trajectory: compose each frame's stored relative pose
        with its (optimized) reference keyframe pose
        (System::SaveTrajectoryTUM semantics). Returns list of
        (frame_id, R_cw (3,3) np, t_cw (3,) np, lost)."""
        out = []
        kf_R = np.asarray(self.map.kf_R)
        kf_t = np.asarray(self.map.kf_t)
        # Culled keyframes resolve through their spanning-tree parent chain
        # (T_k = rel_k ∘ ... ∘ T_surviving), the reference's mTcp walk
        # (System::SaveTrajectoryTUM, System.cc:377-381) — so culled refs
        # keep following pose-graph / GBA corrections.
        kf_valid = np.asarray(self.map.kf_valid)
        parent = np.asarray(self.map.kf_parent)
        rel_R = np.asarray(self.map.kf_rel_R)
        rel_t = np.asarray(self.map.kf_rel_t)
        eff_R = kf_R.copy()
        eff_t = kf_t.copy()
        for k in range(len(kf_R)):
            if kf_valid[k] or parent[k] < 0:
                continue
            A_R, A_t = np.eye(3), np.zeros(3)
            j = k
            for _ in range(len(kf_R)):  # chain is acyclic; bound defensively
                if kf_valid[j] or parent[j] < 0:
                    break
                A_R, A_t = A_R @ rel_R[j], A_R @ rel_t[j] + A_t
                j = parent[j]
            eff_R[k] = A_R @ kf_R[j]
            eff_t[k] = A_R @ kf_t[j] + A_t
        for frame_id, ref, Rr, tr, lost in self.trajectory:
            if ref >= 0:
                R = Rr @ eff_R[ref]
                t = Rr @ eff_t[ref] + tr
            else:
                R, t = Rr, tr
            out.append((frame_id, R, t, lost))
        return out
