"""MultiTracker: B independent SLAM sessions sharing one chip.

The frames/s/chip headline (bench.py) comes from batching the fixed-cost
front end across camera streams; this is the user-facing form of that
batching (the reference's System is strictly single-stream,
/root/reference/src/System.cc:229 — a multi-robot / multi-camera
deployment runs N processes instead; on a TPU that wastes the chip).

Design: per-frame ORB extraction — the dominant fixed cost — runs as ONE
batched kernel launch over all streams (ops.orb.extract_orb_batched, the
same path __graft_entry__.entry_batched benches); the per-stream host
state machines (matching, pose, mapping, loop closing) then run on the
shared jit cache, so every stream after the first compiles nothing.
Streams are fully independent sessions: separate maps, trajectories, and
loop closers; one stream going LOST does not disturb the others.

Mono streams still initializing use their own 2x-budget extraction
(Tracking.cc:125-133) until bootstrapped — only the steady state batches.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import undistort_points
from tpuslam.mapstate.core import FrameFeatures
from tpuslam.ops.orb import extract_orb_batched
from tpuslam.pipeline.tracker import Tracker, TrackerConfig, TrackingState


class MultiTracker:
    """B independent monocular or stereo sessions with a batched front end.

    configs: one TrackerConfig per stream (same ORB config + image size
    required — that is what makes one batched launch possible)."""

    def __init__(self, configs: Sequence[TrackerConfig]):
        assert len(configs) >= 1
        orb0 = configs[0].orb
        for c in configs[1:]:
            if c.orb != orb0:
                raise ValueError("all streams must share one ORBConfig")
        self.trackers: List[Tracker] = [Tracker(c) for c in configs]
        self._extract_batched = jax.jit(
            lambda imgs: extract_orb_batched(imgs, orb0)
        )

        def _stereo_post(fL, fR, imgL, imgR, fx, bf):
            """Per-stream pyramid + row-banded stereo match, jitted (the
            eager form dispatched op-by-op per frame and cancelled the
            batched-front-end win for stereo). fx/bf are traced, so all
            streams share ONE compiled program."""
            from tpuslam.ops.image import build_pyramid
            from tpuslam.ops.stereo import stereo_match

            pyrL = build_pyramid(imgL, orb0.n_levels, orb0.scale_factor)
            pyrR = build_pyramid(imgR, orb0.n_levels, orb0.scale_factor)
            u_right, depth, ok = stereo_match(fL, fR, pyrL, pyrR, orb0, fx, bf)
            n = fL.xy.shape[0]
            return FrameFeatures(
                xy=fL.xy,
                level=fL.level,
                angle=fL.angle,
                desc=fL.desc,
                valid=fL.valid,
                u_right=jnp.where(ok, u_right, -1.0),
                depth=jnp.where(ok, depth, 0.0),
            )

        self._stereo_post = jax.jit(_stereo_post)

    @classmethod
    def uniform(cls, config: TrackerConfig, n_streams: int) -> "MultiTracker":
        return cls([dataclasses.replace(config) for _ in range(n_streams)])

    @property
    def n_streams(self) -> int:
        return len(self.trackers)

    def _features_from_batch(self, fb, b: int, tracker: Tracker) -> FrameFeatures:
        xy = fb.xy[b]
        c = tracker.cfg.cam
        if abs(c.k1) > 1e-12 or abs(c.k2) > 1e-12:
            xy = undistort_points(c, xy)
        n = xy.shape[0]
        return FrameFeatures(
            xy=xy,
            level=fb.level[b],
            angle=fb.angle[b],
            desc=fb.desc[b],
            valid=fb.valid[b],
            u_right=jnp.full((n,), -1.0),
            depth=jnp.zeros((n,)),
        )

    def track_monocular(self, imgs, frame_id: int):
        """imgs: (B, H, W) grayscale batch, one frame per stream. Returns a
        list of per-stream results ((R, t) or None)."""
        imgs = jnp.asarray(imgs, jnp.float32)
        assert imgs.shape[0] == self.n_streams
        steady = [
            t.state in (TrackingState.OK, TrackingState.LOST)
            for t in self.trackers
        ]
        fb = self._extract_batched(imgs) if any(steady) else None
        out = []
        for b, tracker in enumerate(self.trackers):
            if steady[b]:
                feats = self._features_from_batch(fb, b, tracker)
                out.append(tracker.track_monocular_features(feats, frame_id))
            else:
                # Initializing: per-stream 2x-budget extraction.
                out.append(tracker.track_monocular(imgs[b], frame_id))
        return out

    def track_stereo(self, imgs_left, imgs_right, frame_id: int):
        """Stereo batch: all left+right images extracted in ONE 2B-image
        launch, then per-stream jitted row-banded stereo matching +
        tracking."""
        from tpuslam.ops.orb import ORBFeatures

        imgs_left = jnp.asarray(imgs_left, jnp.float32)
        imgs_right = jnp.asarray(imgs_right, jnp.float32)
        B = self.n_streams
        fb = self._extract_batched(
            jnp.concatenate([imgs_left, imgs_right], axis=0)
        )
        out = []
        for b, tracker in enumerate(self.trackers):
            cfg = tracker.cfg
            fL = ORBFeatures(*(leaf[b] for leaf in fb))
            fR = ORBFeatures(*(leaf[B + b] for leaf in fb))
            feats = self._stereo_post(
                fL, fR, imgs_left[b], imgs_right[b],
                jnp.float32(cfg.cam.fx), jnp.float32(cfg.cam.bf),
            )
            out.append(tracker.track_depth_features(feats, frame_id))
        return out

    def export_trajectories(self):
        return [t.export_trajectory() for t in self.trackers]

    def shutdown(self):
        for t in self.trackers:
            t.shutdown()
