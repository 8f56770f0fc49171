"""Sequence loaders for TUM RGB-D, KITTI odometry, and EuRoC MAV datasets.

Mirror the reference drivers' file handling: TUM rgb.txt/depth.txt +
association files (/root/reference/Examples/RGB-D/rgbd_tum.cc and
Examples/Monocular/mono_tum.cc:36), KITTI image_0/image_1 + times.txt
(Examples/Stereo/stereo_kitti.cc:37), EuRoC mav0/cam0/data + external
timestamp lists (Examples/Monocular/mono_euroc.cc:36).

Images decode with PIL to float32 grayscale [0, 255] (the drivers'
cvtColor step, Tracking.cc:256-269).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def load_grayscale(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("L", "I;16", "I"):
        img = img.convert("L")
    arr = np.asarray(img)
    if arr.dtype == np.uint16:
        return arr.astype(np.float32)
    return arr.astype(np.float32)


class TUMSequence:
    """TUM RGB-D sequence. With an association file (rgb<->depth pairing,
    Examples/RGB-D/associations/), yields (t, gray, depth); with only
    rgb.txt, yields (t, gray, None)."""

    def __init__(self, root: str, association: Optional[str] = None, depth_factor=1.0 / 5000.0):
        self.root = root
        self.depth_factor = depth_factor
        self.items = []
        if association is not None:
            for line in open(association):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                # t_rgb rgb_path t_depth depth_path
                self.items.append((float(p[0]), p[1], p[3]))
        else:
            for line in open(os.path.join(root, "rgb.txt")):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, rel = line.split()[:2]
                self.items.append((float(t), rel, None))

    def __len__(self):
        return len(self.items)

    def __iter__(self) -> Iterator:
        for t, rgb_rel, depth_rel in self.items:
            gray = load_grayscale(os.path.join(self.root, rgb_rel))
            depth = None
            if depth_rel is not None:
                # TUM depth PNGs are uint16 with 5000 units/meter.
                depth = load_grayscale(os.path.join(self.root, depth_rel)) * self.depth_factor
            yield t, gray, depth


class KITTISequence:
    """KITTI odometry sequence dir (image_0/, image_1/, times.txt).
    Yields (t, left, right) — right is None if image_1 is absent."""

    def __init__(self, root: str):
        self.root = root
        self.times = [float(x) for x in open(os.path.join(root, "times.txt"))]
        self.left_dir = os.path.join(root, "image_0")
        self.right_dir = os.path.join(root, "image_1")
        self.has_right = os.path.isdir(self.right_dir)

    def __len__(self):
        return len(self.times)

    def __iter__(self) -> Iterator:
        for i, t in enumerate(self.times):
            name = f"{i:06d}.png"
            left = load_grayscale(os.path.join(self.left_dir, name))
            right = (
                load_grayscale(os.path.join(self.right_dir, name)) if self.has_right else None
            )
            yield t, left, right


class EuRoCSequence:
    """EuRoC ASL layout (mav0/cam0/data, mav0/cam1/data) with an optional
    external timestamp list (the reference's EuRoC_TimeStamps files)."""

    def __init__(self, root: str, timestamps: Optional[str] = None, stereo: bool = True):
        self.root = root
        self.stereo = stereo
        cam0 = os.path.join(root, "mav0", "cam0", "data")
        if timestamps is not None:
            self.stamps = [line.strip() for line in open(timestamps) if line.strip()]
        else:
            self.stamps = sorted(os.path.splitext(f)[0] for f in os.listdir(cam0))

    def __len__(self):
        return len(self.stamps)

    def __iter__(self) -> Iterator:
        for s in self.stamps:
            t = float(s) * 1e-9
            left = load_grayscale(os.path.join(self.root, "mav0", "cam0", "data", s + ".png"))
            right = None
            if self.stereo:
                right = load_grayscale(
                    os.path.join(self.root, "mav0", "cam1", "data", s + ".png")
                )
            yield t, left, right
