"""Public System facade, the counterpart of ORB_SLAM2::System
(/root/reference/include/System.h:49-177): construct with camera settings
and sensor type, feed frames, save trajectories.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.geometry.se3 import rotmat_to_quat
from tpuslam.ops.orb import ORBConfig
from tpuslam.pipeline.tracker import Tracker, TrackerConfig, TrackingState


class SensorType(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class System:
    """Facade: System::TrackMonocular / SaveTrajectoryTUM / SaveTrajectoryKITTI
    (/root/reference/src/System.cc:229,337,434)."""

    def __init__(
        self,
        cam: PinholeCamera,
        sensor: SensorType = SensorType.MONOCULAR,
        orb: Optional[ORBConfig] = None,
        **tracker_kwargs,
    ):
        self.sensor = sensor
        cfg = TrackerConfig(cam=cam, orb=orb or ORBConfig(), **tracker_kwargs)
        self.tracker = Tracker(cfg)
        self._timestamps = {}
        self._viewer = None
        self._viewer_every = 1

    def attach_viewer(self, viewer=None, every: int = 1, port: int = 8642):
        """Attach a live web viewer (tpuslam.viz.LiveViewer) that refreshes
        after every `every`-th tracked frame — the counterpart of the
        reference's `bUseViewer` ctor flag (System.cc:107-111). Returns the
        viewer (viewer.port tells you where it listens)."""
        if viewer is None:
            from tpuslam.viz.server import LiveViewer

            viewer = LiveViewer(port=port)
        self._viewer = viewer
        self._viewer_every = max(1, every)
        return viewer

    def _push_viewer(self):
        if self._viewer is None or self.tracker.n_frames % self._viewer_every:
            return
        tr = self.tracker
        kf_R = np.asarray(tr.map.kf_R)
        kf_t = np.asarray(tr.map.kf_t)
        traj = []
        for frame_id, ref, Rr, tr_rel, lost in tr.trajectory[-500:]:
            if lost:
                continue
            if ref >= 0:
                R = Rr @ kf_R[ref]
                t = Rr @ kf_t[ref] + tr_rel
            else:
                R, t = Rr, tr_rel
            traj.append(-R.T @ t)
        self._viewer.update(
            tr.map,
            trajectory=traj,
            cam_R=np.asarray(tr._last_R),
            cam_t=np.asarray(tr._last_t),
            status=f"{tr.state.name}  KFs={int(tr.map.n_kf)} "
            f"pts={int(np.asarray(tr.map.pt_valid).sum())} frame={tr.n_frames}",
        )

    def track_monocular(self, img, timestamp: float):
        frame_id = self.tracker.n_frames
        self._timestamps[frame_id] = timestamp
        out = self.tracker.track_monocular(jnp.asarray(img, jnp.float32), frame_id)
        self._push_viewer()
        return out

    def track_stereo(self, img_left, img_right, timestamp: float):
        frame_id = self.tracker.n_frames
        self._timestamps[frame_id] = timestamp
        out = self.tracker.track_stereo(img_left, img_right, frame_id)
        self._push_viewer()
        return out

    def track_rgbd(self, img, depth, timestamp: float):
        frame_id = self.tracker.n_frames
        self._timestamps[frame_id] = timestamp
        out = self.tracker.track_rgbd(img, depth, frame_id)
        self._push_viewer()
        return out

    @property
    def state(self) -> TrackingState:
        return self.tracker.state

    def map_stats(self):
        m = self.tracker.map
        return {
            "n_keyframes": int(m.n_kf),
            "n_points": int(np.asarray(m.pt_valid).sum()),
            "state": self.tracker.state.name,
        }

    def reset(self):
        """Clear the map and restart tracking (System::Reset)."""
        self.tracker.reset()
        self._timestamps = {}

    def shutdown(self):
        """Finish background mapping/loop/GBA work and stop the workers
        (System::Shutdown, System.cc:316). Trajectory export remains valid
        afterwards."""
        self.tracker.shutdown()
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    def activate_localization_mode(self):
        """Track against the frozen map, no new keyframes
        (System::ActivateLocalizationMode, System.cc:240)."""
        self.tracker.localization_mode = True

    def deactivate_localization_mode(self):
        self.tracker.localization_mode = False

    def save_map(self, path: str):
        """Checkpoint the map (absent in the reference — System.h:115 TODO)."""
        from tpuslam.io.checkpoint import save_map

        save_map(self.tracker.map, path)

    def load_map(self, path: str, localization: bool = True):
        """Resume from a checkpoint; defaults to localization-only mode and
        LOST state so the next frame relocalizes against the loaded map."""
        from tpuslam.io.checkpoint import load_map
        from tpuslam.pipeline.tracker import TrackingState

        self.tracker.map = load_map(path)
        self.tracker._n_kf_host = int(self.tracker.map.n_kf)
        self.tracker.localization_mode = localization
        self.tracker.state = TrackingState.LOST

    def render_map(self, path: str):
        """Write a top-down PNG of the current map + trajectory."""
        from tpuslam.viz import render_map_topdown

        traj = [
            (fid, R, t)
            for fid, R, t, lost in self.tracker.export_trajectory()
            if not lost
        ]
        render_map_topdown(self.tracker.map, traj).save(path)

    def save_trajectory_tum(self, path: str):
        """TUM format: timestamp tx ty tz qx qy qz qw of T_wc
        (System::SaveTrajectoryTUM, System.cc:337)."""
        with open(path, "w") as f:
            for frame_id, R, t, lost in self.tracker.export_trajectory():
                if lost:
                    continue
                Rwc = R.T
                twc = -Rwc @ t
                q = np.asarray(rotmat_to_quat(jnp.asarray(Rwc)))
                ts = self._timestamps.get(frame_id, float(frame_id))
                f.write(
                    f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_keyframe_trajectory_tum(self, path: str):
        """KF-only TUM trajectory — the format the reference's monocular
        drivers actually write (System::SaveKeyFrameTrajectoryTUM,
        /root/reference/src/System.cc:398): one line per surviving
        keyframe, sorted by creation order, optimized pose."""
        tr = self.tracker
        tr._join_mapping()
        if tr._gba_future is not None:
            tr._gba_future.result()
            tr.map = tr._poll_gba(tr.map)
        m = tr.map
        valid = np.asarray(m.kf_valid)
        fid = np.asarray(m.kf_frame_id)
        kf_R = np.asarray(m.kf_R)
        kf_t = np.asarray(m.kf_t)
        order = np.nonzero(valid)[0]
        order = order[np.argsort(fid[order])]
        with open(path, "w") as f:
            for k in order:
                Rwc = kf_R[k].T
                twc = -Rwc @ kf_t[k]
                q = np.asarray(rotmat_to_quat(jnp.asarray(Rwc)))
                ts = self._timestamps.get(int(fid[k]), float(fid[k]))
                f.write(
                    f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 entries of the 3x4 T_wc matrix per line
        (System::SaveTrajectoryKITTI, System.cc:434)."""
        with open(path, "w") as f:
            for frame_id, R, t, lost in self.tracker.export_trajectory():
                Rwc = R.T
                twc = -Rwc @ t
                M = np.concatenate([Rwc, twc[:, None]], axis=1)
                f.write(" ".join(f"{v:.9e}" for v in M.reshape(-1)) + "\n")
