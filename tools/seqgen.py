"""Long synthetic sequence generator for the head-to-head harness.

Renders a textured BOX ROOM by ray casting and writes dataset-style
sequences (PGM frames + frames.txt + TUM-format groundtruth.txt + an
OpenCV-YAML settings file) that BOTH systems consume on identical bytes:
the reference binary (tools/refbench/build/refslam, the real
/root/reference pipeline) and this repo's drivers.

Sequences (VERDICT r2 item 1: >=3 long sequences, >=500 frames, one with
a closed loop, mono TUM operating point + stereo KITTI operating point):

  mono_room_loop    640x480, 1000 feats — full circle inside the room,
                    radial view: revisits the start -> loop closure.
  mono_room_sweep   640x480 — lateral sweep + return (no loop closure
                    geometry; pure ATE).
  stereo_room_loop  1241x376 stereo (KITTI00-02 op point) — circle loop.

The room: 6 axis-aligned textured walls; every ray hits exactly one wall,
depth 1-6 m. Texture = blurred noise + hard-edged random squares (corner
features at every scale — the same recipe as tests/synthetic.make_texture).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_texture(rng, h=768, w=768, n_squares=900):
    import jax.numpy as jnp

    from tpuslam.ops.image import gaussian_blur

    tex = rng.uniform(0, 255, (h, w)).astype(np.float32)
    tex = np.array(gaussian_blur(jnp.asarray(tex), 7, 2.0))
    for _ in range(n_squares):
        y, x = rng.integers(5, h - 20), rng.integers(5, w - 20)
        s = int(rng.integers(4, 14))
        tex[y : y + s, x : x + s] = rng.uniform(0, 255)
    return tex


def write_pgm(path, img):
    img8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    h, w = img8.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img8.tobytes())


def write_pgm16(path, img):
    """16-bit PGM (big-endian per spec) — depth maps for RGB-D."""
    im = np.clip(np.asarray(img), 0, 65535).astype(">u2")
    h, w = im.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n65535\n" % (w, h))
        f.write(im.tobytes())


class RoomScene:
    """Axis-aligned box room interior: x in [-hx,hx], y in [-hy,hy] (down),
    z in [-hz,hz]; one distinct texture per wall."""

    def __init__(self, rng, hx=4.0, hy=2.0, hz=3.0, tex_scale=110.0):
        self.h = np.array([hx, hy, hz], np.float32)
        self.tex = [make_texture(rng) for _ in range(6)]
        self.tex_scale = tex_scale

    def _sample(self, tex, u, v):
        th, tw = tex.shape
        tx = np.mod(u * self.tex_scale, tw - 1.001)
        ty = np.mod(v * self.tex_scale, th - 1.001)
        x0 = tx.astype(np.int64)
        y0 = ty.astype(np.int64)
        wx = tx - x0
        wy = ty - y0
        return (
            tex[y0, x0] * (1 - wx) * (1 - wy)
            + tex[y0, x0 + 1] * wx * (1 - wy)
            + tex[y0 + 1, x0] * (1 - wx) * wy
            + tex[y0 + 1, x0 + 1] * wx * wy
        )

    def render(self, fx, fy, cx, cy, W, H, R, t, ssaa=2, with_depth=False):
        """Render from world->camera (R, t); returns (W,H) image (and the
        camera-frame z-depth when with_depth)."""
        s = ssaa
        Ws, Hs = W * s, H * s
        fxs, fys = fx * s, fy * s
        cxs, cys = cx * s + (s - 1) / 2.0, cy * s + (s - 1) / 2.0
        R = np.asarray(R, np.float32)
        t = np.asarray(t, np.float32)
        C = -R.T @ t
        uu, vv = np.meshgrid(
            np.arange(Ws, dtype=np.float32), np.arange(Hs, dtype=np.float32)
        )
        d = R.T @ np.stack(
            [(uu - cxs) / fxs, (vv - cys) / fys, np.ones_like(uu)], 0
        ).reshape(3, -1)
        n = d.shape[1]
        out = np.zeros(n, np.float32)
        best = np.full(n, np.inf, np.float32)
        # 6 walls: (axis, sign); in-plane coords are the other two axes.
        for w_idx, (ax, sgn) in enumerate(
            [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
        ):
            plane = sgn * self.h[ax]
            da = d[ax]
            lam = (plane - C[ax]) / np.where(np.abs(da) < 1e-9, 1e-9, da)
            o1, o2 = [i for i in range(3) if i != ax]
            p1 = C[o1] + lam * d[o1]
            p2 = C[o2] + lam * d[o2]
            hit = (
                (lam > 1e-3)
                & (lam < best)
                & (np.abs(p1) <= self.h[o1] + 1e-6)
                & (np.abs(p2) <= self.h[o2] + 1e-6)
            )
            if not hit.any():
                continue
            val = self._sample(self.tex[w_idx], p1[hit] + self.h[o1], p2[hit] + self.h[o2])
            out[hit] = val
            best[hit] = lam[hit]
        img = out.reshape(Hs, Ws)
        if s > 1:
            img = img.reshape(H, s, W, s).mean(axis=(1, 3))
        if with_depth:
            # Depth point-sampled at native res (no cross-seam averaging).
            if s > 1:
                return img, self.render(fx, fy, cx, cy, W, H, R, t, ssaa=1,
                                        with_depth=True)[1]
            z = (R[2] @ (C[:, None] + best * d)) + t[2]
            return img, z.reshape(H, W)
        return img


def look_rotation(forward, up=np.array([0.0, -1.0, 0.0])):
    """World->camera rotation with camera z = forward (y down)."""
    f = forward / np.linalg.norm(forward)
    r = np.cross(-up, f)  # camera x (right), y down
    r = r / np.linalg.norm(r)
    dwn = np.cross(f, r)
    Rwc = np.stack([r, dwn, f], axis=1)  # columns = camera axes in world
    return Rwc.T


def circle_loop_trajectory(n_frames, radius=1.6, loops=1.0, wobble=0.03,
                           ease=0.0):
    """Camera circles the room center looking radially OUTWARD: tangential
    motion = strong lateral parallax (good mono init), and pose i and pose
    i + n/loops coincide -> loop closure.

    ease > 0 ramps the angular velocity smoothly from rest over roughly the
    first `ease` fraction of the trajectory (a robot starting at
    standstill), which gives monocular bootstrap a quiet window."""
    def warp(u):
        if ease <= 0:
            return u
        w = u - ease * (1.0 - np.exp(-u / ease))
        w1 = 1.0 - ease * (1.0 - np.exp(-1.0 / ease))
        return w / w1

    poses = []
    for i in range(n_frames):
        a = 2 * np.pi * loops * warp(i / n_frames)
        Cpos = np.array(
            [radius * np.cos(a), wobble * np.sin(5 * a), radius * np.sin(a)],
            np.float32,
        )
        fwd = np.array([np.cos(a), 0.0, np.sin(a)], np.float32)  # outward
        R = look_rotation(fwd)
        t = -R @ Cpos
        poses.append((R.astype(np.float32), t.astype(np.float32)))
    return poses


def _circle_pose(a, radius, wobble=0.03):
    Cpos = np.array(
        [radius * np.cos(a), wobble * np.sin(5 * a), radius * np.sin(a)],
        np.float32,
    )
    fwd = np.array([np.cos(a), 0.0, np.sin(a)], np.float32)  # outward
    R = look_rotation(fwd)
    return R.astype(np.float32), (-R @ Cpos).astype(np.float32)


def kidnap_trajectory(n_frames, radius=1.6, wobble=0.03):
    """Kidnapped-robot sequence: map 3/4 of the circle, then TELEPORT back
    into already-mapped territory and keep going — the tracker must go
    LOST at the cut and relocalize (Tracking::Relocalization,
    /root/reference/src/Tracking.cc:1393). Ground truth contains the
    discontinuity; ATE is evaluated on the per-frame matches."""
    n1 = int(n_frames * 0.72)
    n2 = n_frames - n1
    poses = []
    for i in range(n1):
        poses.append(_circle_pose(2 * np.pi * 0.75 * i / n1, radius, wobble))
    for i in range(n2):
        a = 2 * np.pi * (0.18 + 0.30 * i / n2)
        poses.append(_circle_pose(a, radius, wobble))
    return poses


def sweep_trajectory(n_frames, span=2.2, z0=-0.8):
    """Lateral sweep along x and back (no revisit-with-same-heading loop)."""
    poses = []
    for i in range(n_frames):
        u = i / (n_frames - 1)
        x = span * np.sin(2 * np.pi * u)  # there and back
        Cpos = np.array([x, 0.05 * np.sin(8 * np.pi * u), z0], np.float32)
        yaw = 0.15 * np.sin(2 * np.pi * u)
        fwd = np.array([np.sin(yaw), 0.0, np.cos(yaw)], np.float32)
        R = look_rotation(fwd)
        t = -R @ Cpos
        poses.append((R.astype(np.float32), t.astype(np.float32)))
    return poses


def _quat_from_R(Rm):
    """(qx, qy, qz, qw) from a rotation matrix (TUM convention)."""
    m = np.asarray(Rm, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    if tr > 0:
        S = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * S
        qx = (m[2, 1] - m[1, 2]) / S
        qy = (m[0, 2] - m[2, 0]) / S
        qz = (m[1, 0] - m[0, 1]) / S
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        S = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        qw = (m[2, 1] - m[1, 2]) / S
        qx = 0.25 * S
        qy = (m[0, 1] + m[1, 0]) / S
        qz = (m[0, 2] + m[2, 0]) / S
    elif m[1, 1] > m[2, 2]:
        S = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        qw = (m[0, 2] - m[2, 0]) / S
        qx = (m[0, 1] + m[1, 0]) / S
        qy = 0.25 * S
        qz = (m[1, 2] + m[2, 1]) / S
    else:
        S = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        qw = (m[1, 0] - m[0, 1]) / S
        qx = (m[0, 2] + m[2, 0]) / S
        qy = (m[1, 2] + m[2, 1]) / S
        qz = 0.25 * S
    return qx, qy, qz, qw


def write_settings_yaml(path, fx, fy, cx, cy, fps, bf, n_features,
                        th_depth=40.0, depth_factor=5000.0):
    """OpenCV-YAML settings in the reference's schema
    (/root/reference/Examples/Monocular/TUM1.yaml)."""
    with open(path, "w") as f:
        f.write("%YAML:1.0\n\n")
        for k, v in [
            ("Camera.fx", fx), ("Camera.fy", fy), ("Camera.cx", cx),
            ("Camera.cy", cy), ("Camera.k1", 0.0), ("Camera.k2", 0.0),
            ("Camera.p1", 0.0), ("Camera.p2", 0.0), ("Camera.k3", 0.0),
            ("Camera.fps", float(fps)), ("Camera.bf", bf),
            ("Camera.RGB", 1), ("ThDepth", th_depth),
            ("DepthMapFactor", depth_factor),
            ("ORBextractor.nFeatures", n_features),
            ("ORBextractor.scaleFactor", 1.2),
            ("ORBextractor.nLevels", 8),
            ("ORBextractor.iniThFAST", 20),
            ("ORBextractor.minThFAST", 7),
            ("Viewer.KeyFrameSize", 0.05),
            ("Viewer.KeyFrameLineWidth", 1.0),
            ("Viewer.GraphLineWidth", 0.9),
            ("Viewer.PointSize", 2.0),
            ("Viewer.CameraSize", 0.08),
            ("Viewer.CameraLineWidth", 3.0),
            ("Viewer.ViewpointX", 0.0),
            ("Viewer.ViewpointY", -0.7),
            ("Viewer.ViewpointZ", -1.8),
            ("Viewer.ViewpointF", 500.0),
        ]:
            f.write(f"{k}: {v}\n")


def generate_sequence(out_dir, name, kind, n_frames, seed, ssaa=2,
                      with_depth=False):
    """kind: 'mono' | 'stereo'. Returns the sequence directory."""
    rng = np.random.default_rng(seed)
    seq = os.path.join(out_dir, name)
    os.makedirs(seq, exist_ok=True)
    scene = RoomScene(rng)

    if kind == "stereo":
        W, H = 1241, 376
        fx = fy = 718.856
        cx, cy = 620.5, 187.0
        baseline = 0.12
        bf = fx * baseline
        fps = 10.0
        n_features = 2000
        if "big" in name:
            # Large closable loop: two full passes of a wider circle
            # (VERDICT r4 battery).
            poses = circle_loop_trajectory(n_frames, radius=2.2, loops=2.12)
        else:
            poses = circle_loop_trajectory(n_frames, radius=1.5, loops=1.08)
    else:
        W, H = 640, 480
        fx = fy = 517.3
        cx, cy = 318.6, 239.5
        baseline = 0.0
        bf = 0.0
        fps = 30.0
        n_features = 1000
        if "kidnap" in name:
            poses = kidnap_trajectory(n_frames)
        elif "loop" in name:
            poses = circle_loop_trajectory(n_frames, radius=1.6, loops=1.08)
        else:
            poses = sweep_trajectory(n_frames)

    write_settings_yaml(
        os.path.join(seq, "settings.yaml"), fx, fy, cx, cy, fps, bf, n_features
    )
    lines = []
    gt = []
    for i, (R, t) in enumerate(poses):
        ts = i / fps
        img = scene.render(fx, fy, cx, cy, W, H, R, t, ssaa=ssaa,
                           with_depth=with_depth)
        depth = None
        if with_depth:
            img, depth = img
        fn = f"frame_{i:05d}.pgm"
        write_pgm(os.path.join(seq, fn), img)
        entry = f"{ts:.6f} {fn}"
        if kind == "stereo":
            # Right camera: C_R = C_L + R^T [b,0,0]  =>  t_R = t_L - [b,0,0].
            tR = np.asarray(t) + np.array([-baseline, 0.0, 0.0], np.float32)
            imgR = scene.render(fx, fy, cx, cy, W, H, R, tR, ssaa=ssaa)
            fnR = f"frame_{i:05d}_r.pgm"
            write_pgm(os.path.join(seq, fnR), imgR)
            entry += f" {fnR}"
        elif with_depth and depth is not None:
            fnD = f"depth_{i:05d}.pgm"
            write_pgm16(os.path.join(seq, fnD), depth * 5000.0)
            entry += f" {fnD}"
        lines.append(entry)
        # Ground truth camera-in-world.
        Rwc = np.asarray(R).T
        Cpos = -Rwc @ np.asarray(t)
        qx, qy, qz, qw = _quat_from_R(Rwc)
        gt.append(
            f"{ts:.6f} {Cpos[0]:.6f} {Cpos[1]:.6f} {Cpos[2]:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
        if i % 50 == 0:
            print(f"  {name}: frame {i}/{n_frames}", flush=True)
    with open(os.path.join(seq, "frames.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(seq, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt) + "\n")
    return seq


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/data/sequences")
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--stereo-frames", type=int, default=500)
    ap.add_argument("--ssaa", type=int, default=2)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    specs = [
        ("mono_room_loop", "mono", args.frames, 11),
        ("mono_room_sweep", "mono", args.frames, 12),
        ("stereo_room_loop", "stereo", args.stereo_frames, 13),
        ("mono_room_kidnap", "mono", args.frames, 14),
        ("stereo_room_big", "stereo", max(args.stereo_frames, 700), 15),
    ]
    for name, kind, n, seed in specs:
        if args.only and args.only != name:
            continue
        print(f"generating {name} ({n} frames)...", flush=True)
        generate_sequence(args.out, name, kind, n, seed, ssaa=args.ssaa)
    print("done")


if __name__ == "__main__":
    main()
