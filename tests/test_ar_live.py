"""AR plane detection + cube overlay, and the live-feed adapter."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.io.live import LiveRunner
from tpuslam.viz.ar import cube_vertices, detect_plane, draw_ar_cube, plane_frame


def _plane_cloud(rng, n_in=200, n_out=50):
    """Points on z = 0.3x + 0.1y + 2 (+noise) plus uniform outliers."""
    x = rng.uniform(-2, 2, n_in)
    y = rng.uniform(-2, 2, n_in)
    z = 0.3 * x + 0.1 * y + 2.0 + rng.normal(0, 0.005, n_in)
    inl = np.stack([x, y, z], -1)
    out = rng.uniform(-3, 3, (n_out, 3)) + np.array([0, 0, 4.0])
    pts = np.concatenate([inl, out]).astype(np.float32)
    true_normal = np.array([0.3, 0.1, -1.0])
    true_normal /= np.linalg.norm(true_normal)
    return jnp.asarray(pts), true_normal, n_in


class TestPlaneDetection:
    def test_recovers_plane(self, rng):
        pts, n_true, n_in = _plane_cloud(rng)
        valid = jnp.ones(pts.shape[0], bool)
        cam_center = jnp.array([0.0, 0.0, -5.0])
        fit = detect_plane(jax.random.PRNGKey(1), pts, valid, cam_center)
        assert bool(fit.success)
        n_est = np.asarray(fit.normal)
        cosang = abs(float(n_est @ n_true))
        assert cosang > 0.999, f"normal off by {np.degrees(np.arccos(cosang)):.2f} deg"
        # The reference's 1.4 x 20th-percentile threshold is deliberately
        # tight (ViewerAR.cc:395-400): expect high precision, not recall.
        inl = np.asarray(fit.inliers)
        assert inl[:n_in].sum() > 30         # enough plane points for a fit
        assert inl[n_in:].mean() < 0.1       # rejects the outliers
        # Oriented toward the camera.
        assert float(fit.normal @ (cam_center - fit.origin)) > 0

    def test_too_few_points_fails(self, rng):
        pts = jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
        valid = jnp.zeros(60, bool).at[:20].set(True)
        fit = detect_plane(jax.random.PRNGKey(0), pts, valid,
                           jnp.zeros(3), min_points=50)
        assert not bool(fit.success)

    def test_plane_frame_orthonormal(self):
        n = jnp.asarray(np.array([0.3, 0.1, -1.0], np.float32))
        n = n / jnp.linalg.norm(n)
        Rp = np.asarray(plane_frame(n))
        np.testing.assert_allclose(Rp.T @ Rp, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(Rp[:, 2], np.asarray(n), atol=1e-6)

    def test_cube_overlay_draws(self, rng):
        from tpuslam.geometry.camera import PinholeCamera
        from tpuslam.viz.ar import PlaneFit

        cam = PinholeCamera(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                            width=320, height=240)
        plane = PlaneFit(
            success=jnp.asarray(True),
            normal=jnp.asarray(np.array([0, 0, -1.0], np.float32)),
            origin=jnp.asarray(np.array([0, 0, 3.0], np.float32)),
            inliers=jnp.ones(1, bool),
        )
        img = np.full((240, 320), 100.0, np.float32)
        out = draw_ar_cube(img, cam, np.eye(3), np.zeros(3), plane, size=0.5)
        a = np.asarray(out)
        # Red wireframe pixels present.
        assert ((a[..., 0] > 200) & (a[..., 1] < 100)).sum() > 50
        v = cube_vertices(plane, 0.5)
        assert v.shape == (8, 3)
        # The base face lies on the plane (z = 3); the cube extends toward
        # the camera along the camera-oriented normal.
        np.testing.assert_allclose(np.sort(v[:, 2])[-4:], 3.0, atol=1e-5)
        np.testing.assert_allclose(np.sort(v[:, 2])[:4], 2.5, atol=1e-5)


class _StubSystem:
    """Minimal System stand-in: slow tracker, records timestamps."""

    def __init__(self, delay=0.03):
        self.delay = delay
        self.seen = []

    def track_monocular(self, img, ts):
        time.sleep(self.delay)
        self.seen.append(ts)
        return np.eye(3), np.zeros(3)


class TestLiveRunner:
    def test_drops_stale_frames_and_tracks_latest(self):
        stub = _StubSystem(delay=0.03)
        got = []
        r = LiveRunner(stub, on_result=lambda i, ts, pose: got.append(ts))
        r.start()
        for i in range(20):
            r.push(None, float(i))
            time.sleep(0.005)  # producer ~6x faster than the tracker
        while stub.seen and stub.seen[-1] != 19.0 and r.n_tracked + r.n_dropped < r.n_pushed:
            time.sleep(0.02)
        r.stop()
        assert r.n_pushed == 20
        assert r.n_dropped > 0                      # queue-1 drop policy
        assert r.n_tracked == len(stub.seen) == len(got)
        assert stub.seen == sorted(stub.seen)       # in-order consumption
        assert stub.seen[-1] == 19.0                # newest frame wins
        assert r.n_tracked + r.n_dropped == r.n_pushed

    def test_stop_drains_cleanly(self):
        stub = _StubSystem(delay=0.0)
        r = LiveRunner(stub)
        r.start()
        r.push(None, 0.0)
        time.sleep(0.1)
        r.stop()
        assert r.n_tracked == 1
