"""PNG renderers for frames and maps (PIL-based, no GL).

- draw_frame: current image + keypoints + tracked-match markers + status
  text (FrameDrawer::DrawFrame semantics, /root/reference/src/FrameDrawer.cc:38).
- render_map_topdown: map points, keyframe positions, covisibility edges
  and the camera trajectory projected to a ground plane
  (MapDrawer::DrawMapPoints/DrawKeyFrames, /root/reference/src/MapDrawer.cc).
"""

from __future__ import annotations

import numpy as np

from tpuslam.mapstate.core import MapState


def draw_frame(
    img: np.ndarray,
    kp_xy: np.ndarray,
    kp_valid: np.ndarray,
    tracked_mask: np.ndarray,
    state_text: str = "",
):
    """Returns a PIL Image: green squares = tracked keypoints, blue = rest."""
    from PIL import Image, ImageDraw

    arr = np.asarray(img)
    base = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).convert("RGB")
    d = ImageDraw.Draw(base)
    xy = np.asarray(kp_xy)
    valid = np.asarray(kp_valid)
    tracked = np.asarray(tracked_mask)
    for i in np.nonzero(valid)[0]:
        x, y = float(xy[i, 0]), float(xy[i, 1])
        color = (0, 255, 0) if tracked[i] else (80, 80, 255)
        d.rectangle([x - 2, y - 2, x + 2, y + 2], outline=color)
    if state_text:
        d.text((8, base.height - 14), state_text, fill=(255, 255, 0))
    return base


def render_map_topdown(
    m: MapState,
    trajectory: list | None = None,
    size: int = 800,
    axes=(0, 2),
    covis_threshold: int = 15,
):
    """Top-down (x-z by default) map render. Returns a PIL Image.

    Black dots: map points; blue squares: keyframes; light-blue lines:
    covisibility-graph edges (>= covis_threshold shared points, like
    MapDrawer::DrawKeyFrames' graph pass, /root/reference/src/MapDrawer.cc:
    131-152); green line: frame trajectory (camera centers).
    """
    from PIL import Image, ImageDraw

    pts = np.asarray(m.pt_xyz)[np.asarray(m.pt_valid)]
    kf_valid = np.asarray(m.kf_valid)
    kf_R = np.asarray(m.kf_R)[kf_valid]
    kf_t = np.asarray(m.kf_t)[kf_valid]
    centers = -np.einsum("kij,ki->kj", kf_R.transpose(0, 2, 1), kf_t) if len(kf_R) else np.zeros((0, 3))

    covis_edges = []
    if len(kf_R) > 1 and covis_threshold > 0:
        from tpuslam.mapstate.core import covisibility_weights

        w = np.asarray(covisibility_weights(m))[kf_valid][:, kf_valid]
        ii, jj = np.nonzero(np.triu(w, 1) >= covis_threshold)
        covis_edges = list(zip(ii.tolist(), jj.tolist()))

    traj_pts = []
    if trajectory:
        for entry in trajectory:
            R, t = entry[1], entry[2]
            traj_pts.append(-R.T @ t)
    traj_pts = np.asarray(traj_pts) if traj_pts else np.zeros((0, 3))

    all_xy = np.concatenate(
        [p[:, list(axes)] for p in (pts, centers, traj_pts) if len(p)], axis=0
    )
    if len(all_xy) == 0:
        return Image.new("RGB", (size, size), (255, 255, 255))
    lo = np.percentile(all_xy, 2, axis=0)
    hi = np.percentile(all_xy, 98, axis=0)
    span = np.maximum(hi - lo, 1e-6)
    margin = 0.08 * span
    lo -= margin
    span += 2 * margin

    def to_px(p):
        q = (p[:, list(axes)] - lo) / span
        return np.stack([q[:, 0] * (size - 1), (1 - q[:, 1]) * (size - 1)], axis=-1)

    img = Image.new("RGB", (size, size), (255, 255, 255))
    d = ImageDraw.Draw(img)
    if len(pts):
        for x, y in to_px(pts):
            d.point((x, y), fill=(60, 60, 60))
    if covis_edges:
        cpx = to_px(centers)
        for i, j in covis_edges:
            d.line([tuple(cpx[i]), tuple(cpx[j])], fill=(150, 200, 255), width=1)
    if len(traj_pts) > 1:
        px = to_px(traj_pts)
        d.line([tuple(p) for p in px], fill=(0, 160, 0), width=2)
    if len(centers):
        for x, y in to_px(centers):
            d.rectangle([x - 3, y - 3, x + 3, y + 3], outline=(0, 0, 255))
    return img
