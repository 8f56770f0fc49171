"""Tests for the ORB front end (pyramid / FAST / orientation / BRIEF / stereo)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.ops import ORBConfig, extract_orb, build_pyramid, gaussian_blur, stereo_match
from tpuslam.ops.orb import fast_response, _nms3, BRIEF_PATTERN
from tpuslam.matching import hamming_distance


def checkerboard(h=240, w=320, sq=24, lo=40.0, hi=220.0):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // sq) + (xx // sq)) % 2).astype(np.float32)
    return lo + (hi - lo) * board


def random_texture(rng, h=240, w=320):
    """Smooth random texture with good corners: blurred noise + blobs."""
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = np.array(gaussian_blur(jnp.asarray(img), 7, 2.0))
    for _ in range(60):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        s = rng.integers(4, 12)
        img[y : y + s, x : x + s] = rng.uniform(0, 255)
    return img


class TestFAST:
    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        r = fast_response(img, 7.0)
        assert float(jnp.max(r)) == 0.0

    def test_single_bright_dot(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[32, 32] = 250.0
        r = np.asarray(_nms3(fast_response(jnp.asarray(img), 7.0)))
        # The dot itself is a (degenerate) corner: its whole circle is darker.
        assert r[32, 32] > 0
        assert (r > 0).sum() <= 5

    def test_square_grid_corners(self):
        # Isolated bright squares: their corners are L-junctions, which FAST-9
        # fires on (ideal X-junctions have only 8-pixel arcs and do not).
        img = np.full((240, 320), 50.0, np.float32)
        for y in range(24, 216, 48):
            for x in range(24, 296, 48):
                img[y : y + 16, x : x + 16] = 220.0
        r = np.asarray(_nms3(fast_response(jnp.asarray(img), 7.0)))
        ys, xs = np.nonzero(r)
        assert len(ys) > 20
        # Detections should sit near square corners (within 3 px of an edge
        # of the 16px square pattern at period 48).
        near_y = (np.abs(((ys - 24) % 48)) <= 3) | (np.abs(((ys - 24) % 48) - 16) <= 3)
        near_x = (np.abs(((xs - 24) % 48)) <= 3) | (np.abs(((xs - 24) % 48) - 16) <= 3)
        assert (near_y & near_x).mean() > 0.8

    def test_score_is_max_threshold(self):
        # A dot of contrast 30 must score ~30 and vanish above.
        img = np.full((32, 32), 100.0, np.float32)
        img[16, 16] = 130.0
        r = np.asarray(fast_response(jnp.asarray(img), 7.0))
        assert abs(r[16, 16] - 30.0) < 1.0
        r2 = np.asarray(fast_response(jnp.asarray(img), 31.0))
        assert r2[16, 16] == 0.0


class TestExtract:
    def test_extract_shapes_and_budget(self, rng):
        img = jnp.asarray(random_texture(rng))
        cfg = ORBConfig(n_features=500)
        feats = jax.jit(lambda x: extract_orb(x, cfg))(img)
        assert feats.xy.shape == (500, 2)
        assert feats.desc.shape == (500, 8)
        assert feats.desc.dtype == jnp.uint32
        n = int(feats.n_valid)
        assert n > 200, f"only {n} features on textured image"
        # Valid keypoints inside the image.
        v = np.asarray(feats.valid)
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240

    def test_multi_level_coverage(self, rng):
        img = jnp.asarray(random_texture(rng, 480, 640))
        cfg = ORBConfig(n_features=1000)
        feats = extract_orb(img, cfg)
        v = np.asarray(feats.valid)
        levels = np.asarray(feats.level)[v]
        assert len(np.unique(levels)) >= 4, "features should span pyramid levels"

    def test_descriptor_determinism(self, rng):
        img = jnp.asarray(random_texture(rng))
        cfg = ORBConfig(n_features=300)
        f1 = extract_orb(img, cfg)
        f2 = extract_orb(img, cfg)
        assert np.array_equal(np.asarray(f1.desc), np.asarray(f2.desc))

    def test_spatial_uniformity(self, rng):
        """Selection should spread features across cells, not clump."""
        img = jnp.asarray(random_texture(rng, 480, 640))
        cfg = ORBConfig(n_features=800)
        feats = extract_orb(img, cfg)
        v = np.asarray(feats.valid)
        xy = np.asarray(feats.xy)[v]
        # Quadrant occupancy: every quadrant should hold >= 10% of features.
        qx = (xy[:, 0] > 320).astype(int)
        qy = (xy[:, 1] > 240).astype(int)
        counts = np.bincount(qy * 2 + qx, minlength=4)
        assert counts.min() > 0.10 * counts.sum()


class TestDescriptors:
    def test_rotation_invariance(self, rng):
        """Descriptors of the same (rotated) patch should be close in Hamming.

        Rotate a textured image by 30 degrees about its center and compare
        descriptors of corresponding keypoints."""
        from scipy.ndimage import rotate as nd_rotate  # noqa: F401

        img = random_texture(rng, 256, 256)
        ang = 30.0
        import scipy.ndimage as ndi

        rot = ndi.rotate(img, ang, reshape=False, order=1, mode="reflect")
        cfg = ORBConfig(n_features=300)
        f1 = extract_orb(jnp.asarray(img), cfg)
        f2 = extract_orb(jnp.asarray(rot), cfg)
        # Map f1 keypoints into the rotated image.
        c = 127.5
        th = np.deg2rad(ang)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        v1 = np.asarray(f1.valid)
        xy1 = np.asarray(f1.xy)
        xy1r = (xy1 - c) @ R + c  # empirically verified mapping for ndi.rotate
        v2 = np.asarray(f2.valid)
        xy2 = np.asarray(f2.xy)
        # Correspondences: nearest rotated kp within 2px.
        d1 = np.asarray(f1.desc)
        d2 = np.asarray(f2.desc)
        dists = []
        for i in np.nonzero(v1)[0]:
            if not (30 < xy1r[i, 0] < 226 and 30 < xy1r[i, 1] < 226):
                continue
            dd = np.linalg.norm(xy2[v2] - xy1r[i], axis=1)
            j = np.argmin(dd)
            if dd[j] < 2.0:
                jj = np.nonzero(v2)[0][j]
                h = int(
                    hamming_distance(jnp.asarray(d1[i]), jnp.asarray(d2[jj]))
                )
                dists.append(h)
        assert len(dists) > 20, "not enough repeated keypoints under rotation"
        med = np.median(dists)
        # Correspondences here carry up to 2px detection jitter and some
        # mis-pairings, so gate against the random-descriptor baseline
        # (~128 bits): true matches must sit far below it. (Controlled
        # +-1px jitter gives median ~32; see commit history.)
        rnd = np.asarray(
            hamming_distance(jnp.asarray(d1[v1][:64, None]), jnp.asarray(d2[v2][None, :64]))
        )
        assert med < 70, f"median Hamming {med} too high — steering broken?"
        assert med < 0.6 * np.median(rnd), f"no separation: matched {med} vs random {np.median(rnd)}"

    def test_pattern_properties(self):
        pat = BRIEF_PATTERN
        assert pat.shape == (256, 2, 2)
        assert pat.min() >= -13 and pat.max() <= 13
        # No degenerate pairs.
        assert not np.any(np.all(pat[:, 0] == pat[:, 1], axis=-1))


class TestStereo:
    def test_constant_disparity(self, rng):
        """Right image = left shifted by d pixels => depth = bf/d everywhere."""
        d = 8.0
        imgL = random_texture(rng, 240, 320)
        imgR = np.roll(imgL, -int(d), axis=1)
        cfg = ORBConfig(n_features=400)
        fL = extract_orb(jnp.asarray(imgL), cfg)
        fR = extract_orb(jnp.asarray(imgR), cfg)
        pyrL = build_pyramid(jnp.asarray(imgL), cfg.n_levels, cfg.scale_factor)
        pyrR = build_pyramid(jnp.asarray(imgR), cfg.n_levels, cfg.scale_factor)
        fx, bf = 300.0, 30.0
        u_right, depth, valid = stereo_match(fL, fR, pyrL, pyrR, cfg, fx, bf)
        v = np.asarray(valid)
        assert v.sum() > 50, f"only {v.sum()} stereo matches"
        disp = np.asarray(fL.xy[:, 0] - u_right)[v]
        med_disp = np.median(disp)
        assert abs(med_disp - d) < 0.5, f"median disparity {med_disp} != {d}"
        med_depth = np.median(np.asarray(depth)[v])
        assert abs(med_depth - bf / d) < 0.5


class TestBatchedExtraction:
    def test_batched_matches_single(self, rng):
        """extract_orb_batched(B streams) == per-stream extract_orb."""
        from tpuslam.ops.orb import extract_orb_batched

        cfg = ORBConfig(n_features=120, n_levels=4)
        imgs = np.stack([random_texture(rng, 144, 192) for _ in range(3)])
        fb = extract_orb_batched(jnp.asarray(imgs), cfg)
        for b in range(3):
            f1 = extract_orb(jnp.asarray(imgs[b]), cfg)
            np.testing.assert_array_equal(np.asarray(fb.valid[b]), np.asarray(f1.valid))
            m = np.asarray(f1.valid)
            np.testing.assert_allclose(
                np.asarray(fb.xy[b])[m], np.asarray(f1.xy)[m], atol=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(fb.desc[b])[m], np.asarray(f1.desc)[m]
            )
            np.testing.assert_allclose(
                np.asarray(fb.angle[b])[m], np.asarray(f1.angle)[m], atol=1e-5
            )
