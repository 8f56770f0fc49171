"""Tests for the native C++ runtime (PNG decode, prefetcher, quadtree).

Skipped when native/libtpuslam_native.so has not been built
(`make -C native`).
"""

import numpy as np
import pytest

from tpuslam.io.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (make -C native)"
)


@pytest.fixture
def png_dir(tmp_path, rng):
    from PIL import Image

    paths = []
    imgs = []
    for i in range(12):
        img = rng.integers(0, 255, (48, 64)).astype(np.uint8)
        p = tmp_path / f"img_{i:03d}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
        imgs.append(img)
    return paths, imgs


class TestDecode:
    def test_gray8_exact(self, tmp_path, rng):
        from PIL import Image

        from tpuslam.io.native import decode_png_gray

        img = rng.integers(0, 255, (40, 56)).astype(np.uint8)
        p = tmp_path / "g.png"
        Image.fromarray(img).save(p)
        out = decode_png_gray(p.read_bytes())
        np.testing.assert_array_equal(out, img.astype(np.float32))

    def test_gray16_scaled(self, tmp_path, rng):
        from PIL import Image

        from tpuslam.io.native import decode_png_gray

        img = rng.integers(0, 60000, (24, 32)).astype(np.uint16)
        p = tmp_path / "d.png"
        Image.fromarray(img).save(p)
        out = decode_png_gray(p.read_bytes(), scale16=1.0 / 5000.0)
        np.testing.assert_allclose(out, img.astype(np.float32) / 5000.0, atol=1e-4)

    def test_rgb_luma(self, tmp_path, rng):
        from PIL import Image

        from tpuslam.io.native import decode_png_gray

        img = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
        p = tmp_path / "c.png"
        Image.fromarray(img).save(p)
        out = decode_png_gray(p.read_bytes())
        exp = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        assert np.abs(out - exp).max() < 0.01

    def test_truncated_raises(self, tmp_path, rng):
        from PIL import Image

        from tpuslam.io.native import decode_png_gray

        img = rng.integers(0, 255, (20, 20)).astype(np.uint8)
        p = tmp_path / "t.png"
        Image.fromarray(img).save(p)
        with pytest.raises(ValueError):
            decode_png_gray(p.read_bytes()[:40])


class TestPrefetcher:
    def test_in_order_and_exact(self, png_dir):
        from tpuslam.io.native import NativePrefetcher

        paths, imgs = png_dir
        pf = NativePrefetcher(paths, n_threads=3, capacity=4)
        seen = []
        for idx, arr in pf:
            np.testing.assert_array_equal(arr, imgs[idx].astype(np.float32))
            seen.append(idx)
        pf.close()
        assert seen == list(range(len(paths)))

    def test_missing_file_skipped(self, png_dir):
        from tpuslam.io.native import NativePrefetcher

        paths, _ = png_dir
        paths = paths[:3] + ["/nonexistent/x.png"] + paths[3:5]
        pf = NativePrefetcher(paths, n_threads=2, capacity=3)
        seen = [i for i, _ in pf]
        pf.close()
        assert seen == [0, 1, 2, 4, 5]


class TestQuadtree:
    def test_budget_and_spread(self, rng):
        from tpuslam.io.native import distribute_quadtree

        n = 600
        xs = rng.uniform(0, 640, n).astype(np.float32)
        ys = rng.uniform(0, 480, n).astype(np.float32)
        rs = rng.uniform(0, 100, n).astype(np.float32)
        keep = distribute_quadtree(xs, ys, rs, (0, 640, 0, 480), 120)
        assert 100 <= keep.sum() <= 120
        counts = np.bincount(
            (ys[keep] > 240).astype(int) * 2 + (xs[keep] > 320).astype(int),
            minlength=4,
        )
        assert counts.min() > 0.1 * counts.sum()

    def test_tpu_selection_agrees_with_oracle(self, rng):
        """The parallel per-cell selection should overlap substantially with
        the exact quadtree on clustered inputs (same spatial-uniformity
        intent; exact membership may differ)."""
        import jax.numpy as jnp

        from tpuslam.io.native import distribute_quadtree
        from tpuslam.ops.orb import _select_level_keypoints

        H, W = 240, 320
        score = np.zeros((H, W), np.float32)
        pts = []
        # Clustered corners: a few dense blobs + sparse background.
        for _ in range(6):
            cx, cy = rng.integers(40, W - 40), rng.integers(40, H - 40)
            for _ in range(40):
                x = int(np.clip(cx + rng.normal() * 10, 17, W - 18))
                y = int(np.clip(cy + rng.normal() * 10, 17, H - 18))
                score[y, x] = rng.uniform(10, 100)
                pts.append((x, y))
        for _ in range(60):
            x, y = rng.integers(17, W - 18), rng.integers(17, H - 18)
            score[y, x] = rng.uniform(10, 100)
            pts.append((x, y))

        target = 80
        xy, resp, valid = _select_level_keypoints(
            jnp.asarray(score), target, 30, 20.0
        )
        sel_tpu = {
            (int(x), int(y))
            for (x, y), v in zip(np.asarray(xy), np.asarray(valid))
            if v
        }
        ys_, xs_ = np.nonzero(score)
        keep = distribute_quadtree(
            xs_.astype(np.float32), ys_.astype(np.float32),
            score[ys_, xs_].astype(np.float32),
            (16, W - 16, 16, H - 16), target,
        )
        sel_oracle = {(int(x), int(y)) for x, y in zip(xs_[keep], ys_[keep])}
        inter = len(sel_tpu & sel_oracle)
        assert inter > 0.4 * min(len(sel_tpu), len(sel_oracle)), (
            len(sel_tpu), len(sel_oracle), inter
        )


class TestNativeEvaluate:
    def test_ate_matches_horn(self, rng):
        """Native Umeyama ATE == jax horn_sim3 alignment (Sim3 and SE3)."""
        import jax.numpy as jnp
        from tpuslam.io.native import evaluate_ate, native_available
        from tpuslam.sfm import horn_sim3

        if not native_available():
            import pytest

            pytest.skip("native library not built")
        gt = rng.normal(size=(50, 3)) * 2.0
        from tpuslam.geometry.se3 import so3_exp

        R_true = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.4])))
        for fix_scale, s_true in ((False, 0.7), (True, 1.0)):
            est = (gt - np.array([0.3, 1.0, -0.5])) @ R_true / s_true
            est += rng.normal(size=est.shape) * 0.01
            rmse, s, R, t = evaluate_ate(est, gt, fix_scale=fix_scale)
            assert abs(s - s_true) < 0.02
            aligned = s * est @ R.T + t
            np.testing.assert_allclose(
                rmse, np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1))), rtol=1e-9
            )
            assert rmse < 0.03
            # Cross-check against the jax Horn solver.
            sj, Rj, tj = horn_sim3(
                jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32),
                jnp.ones(len(est)), fix_scale=fix_scale,
            )
            alj = float(sj) * est @ np.asarray(Rj).T + np.asarray(tj)
            rmse_j = np.sqrt(np.mean(np.sum((alj - gt) ** 2, -1)))
            np.testing.assert_allclose(rmse, rmse_j, rtol=1e-3, atol=1e-5)

    def test_rpe(self, rng):
        from tpuslam.io.native import evaluate_rpe, native_available

        if not native_available():
            import pytest

            pytest.skip("native library not built")
        gt = np.cumsum(rng.normal(size=(30, 3)), axis=0)
        est = gt + rng.normal(size=gt.shape) * 0.05
        r = evaluate_rpe(est, gt, delta=1)
        de = est[1:] - est[:-1]
        dg = gt[1:] - gt[:-1]
        np.testing.assert_allclose(
            r, np.sqrt(np.mean(np.sum((de - dg) ** 2, -1))), rtol=1e-9
        )

    def test_evaluate_cli(self, tmp_path, rng):
        """End-to-end CLI drive over TUM-format files."""
        import subprocess, sys, os

        gt = np.cumsum(rng.normal(size=(20, 3)), axis=0)
        est = gt + rng.normal(size=gt.shape) * 0.01

        def write(path, pos):
            with open(path, "w") as f:
                for i, p in enumerate(pos):
                    f.write(f"{i/10.0:.6f} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")

        write(tmp_path / "est.txt", est)
        write(tmp_path / "gt.txt", gt)
        out = subprocess.run(
            [sys.executable, "tools/evaluate_trajectory.py",
             str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"), "--se3"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr
        assert "ATE RMSE" in out.stdout
