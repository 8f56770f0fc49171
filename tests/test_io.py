"""Tests for settings parsing and stereo rectification."""

import numpy as np
import pytest

from tpuslam.io import load_settings
from tpuslam.io.rectify import StereoRectifier, init_rectify_map, remap_bilinear

REF_YAMLS = "/root/reference/Examples"


class TestSettings:
    def test_tum1(self):
        s = load_settings(f"{REF_YAMLS}/Monocular/TUM1.yaml")
        assert abs(s.cam.fx - 517.306408) < 1e-4
        assert s.orb.n_features == 1000
        assert s.fps == 30.0

    def test_kitti(self):
        s = load_settings(f"{REF_YAMLS}/Stereo/KITTI00-02.yaml")
        assert s.orb.n_features == 2000
        assert abs(s.cam.bf - 386.1448) < 1e-3
        assert s.th_depth_factor == 35.0

    def test_euroc_rect_blocks(self):
        s = load_settings(f"{REF_YAMLS}/Stereo/EuRoC.yaml")
        assert s.left_rect is not None
        assert s.left_rect["K"].shape == (3, 3)
        assert s.left_rect["D"].size >= 4
        assert s.right_rect["P"].shape == (3, 4)

    def test_rgbd_depth_factor(self):
        s = load_settings(f"{REF_YAMLS}/RGB-D/TUM1.yaml")
        assert abs(s.depth_map_factor - 1.0 / 5000.0) < 1e-9


class TestRectify:
    def test_identity_maps(self):
        """With no distortion/rotation and P == [K|0], maps are identity."""
        K = np.array([[400.0, 0, 160], [0, 400, 120], [0, 0, 1]])
        D = np.zeros(5)
        R = np.eye(3)
        P = np.concatenate([K, np.zeros((3, 1))], axis=1)
        mx, my = init_rectify_map(K, D, R, P, 320, 240)
        u, v = np.meshgrid(np.arange(320, dtype=np.float32), np.arange(240, dtype=np.float32))
        np.testing.assert_allclose(mx, u, atol=1e-3)
        np.testing.assert_allclose(my, v, atol=1e-3)

    def test_remap_identity(self, rng):
        img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
        u, v = np.meshgrid(np.arange(80, dtype=np.float32), np.arange(60, dtype=np.float32))
        out = remap_bilinear(img, u, v)
        # Last row/col interpolate across the clip guard; interior is exact.
        np.testing.assert_allclose(out[:-1, :-1], img[:-1, :-1], atol=1e-3)
        np.testing.assert_allclose(out, img, atol=0.5)

    def test_euroc_rectifier_runs(self, rng):
        s = load_settings(f"{REF_YAMLS}/Stereo/EuRoC.yaml")
        rect = StereoRectifier(s.left_rect, s.right_rect, 752, 480)
        L = rng.uniform(0, 255, (480, 752)).astype(np.float32)
        R = rng.uniform(0, 255, (480, 752)).astype(np.float32)
        lo, ro = rect(L, R)
        assert lo.shape == (480, 752) and ro.shape == (480, 752)
        assert np.isfinite(lo).all() and np.isfinite(ro).all()
        # Rectification of EuRoC must actually move pixels (non-identity).
        assert np.abs(rect.lmx - np.arange(752)[None, :]).max() > 1.0
