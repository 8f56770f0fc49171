"""Learn the 256-pair BRIEF sampling pattern by greedy decorrelation
(VERDICT r2 item 7) — the ORB paper's §4.3 procedure re-run on our own
synthetic corpus, NOT the reference's learned bit_pattern_31_
(/root/reference/src/ORBextractor.cc:196-464, deliberately not copied).

Procedure:
  1. Render varied scenes, detect ORB keypoints (tpuslam.ops.orb).
  2. For each keypoint, build its steered blurred patch table V[y, x] =
     blurred(round(R_theta [x, y])) for all integer (x, y) in [-13, 13]^2
     — the exact value the runtime one-hot sampler would read for a
     pattern point (x, y) (ops/orb._orient_and_describe_at math).
  3. Candidate tests = random point pairs; order by |mean(bit) - 0.5|;
     greedily keep tests whose |correlation| with every kept test stays
     under a threshold, raising the threshold until 256 are kept.
  4. Save tpuslam/data/brief_pattern.npz (loaded by ops/orb.py at import)
     and report the matcher inlier-rate comparison vs the seeded-Gaussian
     pattern on held-out view pairs.

Usage: python tools/train_brief_pattern.py [--patches 24000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

R_MAX = 13  # pattern point radius (pattern clipped to [-13, 13], orb.py)
GRID = 2 * R_MAX + 1
ROT_DELTA = np.deg2rad(5.0)   # orientation-noise probe for stability filter
MAX_FLIP_RATE = 0.08          # reject tests that flip more often than this


def steered_patch_tables(img, cfg):
    """(N, 27, 27) float32 steered blurred-patch lookup tables + valid."""
    import jax
    import jax.numpy as jnp

    from tpuslam.ops.image import build_pyramid
    from tpuslam.ops import orb as O

    feats = jax.jit(lambda x: O.extract_orb(x, cfg))(jnp.asarray(img))
    valid = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[valid]
    lvl = np.asarray(feats.level)[valid]
    ang = np.asarray(feats.angle)[valid]
    levels = build_pyramid(jnp.asarray(img), cfg.n_levels, cfg.scale_factor)
    levels = [np.asarray(l) for l in levels]
    scales = cfg.level_scales()

    tables = []
    P = O._PATCH
    half = P // 2
    padded = [np.pad(L, half, mode="edge") for L in levels]
    for i in range(len(xy)):
        x, y = xy[i] / scales[lvl[i]]
        cx, cy = int(round(x)), int(round(y))
        tables.append(padded[lvl[i]][cy : cy + P, cx : cx + P])
    if not tables:
        z = np.zeros((0, GRID, GRID), np.float32)
        return z, z
    import jax.numpy as jnp

    praw = jnp.asarray(np.stack(tables))
    pblur = np.asarray(jnp.round(O._blur_patches(praw)))  # (N, 41, 41)

    # Steered lookup: V[n, y+13, x+13] = pblur[n, round(x sa + y ca)+20,
    #                                          round(x ca - y sa)+20].
    # A second table at ang + ROT_DELTA measures each candidate test's
    # stability under orientation-estimate noise (IC_Angle jitters a few
    # degrees frame to frame; tests that flip under it wreck matching and
    # rotation invariance).
    ys, xs = np.meshgrid(np.arange(-R_MAX, R_MAX + 1),
                         np.arange(-R_MAX, R_MAX + 1), indexing="ij")
    out = []
    for a in (ang, ang + ROT_DELTA):
        ca = np.cos(a)[:, None, None]
        sa = np.sin(a)[:, None, None]
        cols = np.round(xs[None] * ca - ys[None] * sa).astype(int) + O._CENTER_BLUR
        rows = np.round(xs[None] * sa + ys[None] * ca).astype(int) + O._CENTER_BLUR
        cols = np.clip(cols, 0, O._BLUR_PATCH - 1)
        rows = np.clip(rows, 0, O._BLUR_PATCH - 1)
        n_idx = np.arange(len(pblur))[:, None, None]
        out.append(pblur[n_idx, rows, cols].astype(np.float32))
    return out[0], out[1]


def collect_patches(n_target, cfg, seed=0):
    from synthetic import StepWallScene, orbit_trajectory
    from tools.seqgen import RoomScene, look_rotation
    from tpuslam.geometry.camera import PinholeCamera

    rng = np.random.default_rng(seed)
    cam = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    out = []
    total = 0
    scene_seed = 0
    while total < n_target:
        scene_seed += 1
        if scene_seed % 2:
            scene = StepWallScene(np.random.default_rng(scene_seed))
            poses = orbit_trajectory(3, step=0.5)
            imgs = [scene.render(cam, np.asarray(R), np.asarray(t))
                    for R, t in poses]
        else:
            scene = RoomScene(np.random.default_rng(scene_seed))
            imgs = []
            for _ in range(3):
                a = rng.uniform(0, 2 * np.pi)
                r = rng.uniform(0.6, 2.0)
                C = np.array([r * np.cos(a), rng.uniform(-0.5, 0.5),
                              r * np.sin(a)], np.float32)
                fwd = np.array([np.cos(a), 0.0, np.sin(a)], np.float32)
                R = look_rotation(fwd)
                imgs.append(scene.render(350.0, 350.0, 160.0, 120.0, 320, 240,
                                         R, (-R @ C).astype(np.float32), ssaa=1))
        for img in imgs:
            V0, V1 = steered_patch_tables(img.astype(np.float32), cfg)
            out.append((V0, V1))
            total += len(V0)
        print(f"  patches: {total}/{n_target}", flush=True)
    V0 = np.concatenate([a for a, _ in out], axis=0)[:n_target]
    V1 = np.concatenate([b for _, b in out], axis=0)[:n_target]
    return V0, V1


def greedy_select(V, V_rot, n_pairs=256, n_candidates=60000, seed=3):
    """ORB §4.3 greedy decorrelation over candidate point pairs, with a
    rotation-stability pre-filter: a test whose bit flips under a
    ROT_DELTA orientation perturbation on more than MAX_FLIP_RATE of the
    patches is rejected outright (large-radius pairs decorrelate well but
    destroy rotation invariance — round-3 finding)."""
    rng = np.random.default_rng(seed)
    N = len(V)
    flat = V.reshape(N, -1)  # (N, 729)
    flat_r = V_rot.reshape(N, -1)

    # Candidate pairs: points on the disc of radius 13.
    ys, xs = np.meshgrid(np.arange(-R_MAX, R_MAX + 1),
                         np.arange(-R_MAX, R_MAX + 1), indexing="ij")
    disc = (xs**2 + ys**2) <= R_MAX**2
    pts = np.stack([xs[disc], ys[disc]], -1)  # (n_pts, 2) (x, y)
    n_pts = len(pts)
    ii = rng.integers(0, n_pts, n_candidates)
    jj = rng.integers(0, n_pts, n_candidates)
    keep = ii != jj
    ii, jj = ii[keep], jj[keep]
    # Dedup (unordered pairs keep order: test is signed, (a,b) != (b,a)).
    seen = set()
    cand = []
    for a, b in zip(ii, jj):
        if (a, b) not in seen:
            seen.add((a, b))
            cand.append((a, b))
    cand = np.asarray(cand)
    print(f"  {len(cand)} candidate tests over {n_pts} points", flush=True)

    def flat_idx(p):
        return (p[:, 1] + R_MAX) * GRID + (p[:, 0] + R_MAX)

    ia = flat_idx(pts[cand[:, 0]])
    ib = flat_idx(pts[cand[:, 1]])
    # Candidate bit means + rotation flip rates, in chunks (the full bit
    # matrix would be N x 60k).
    means = np.zeros(len(cand))
    flip = np.zeros(len(cand))
    CH = 4096
    for s in range(0, len(cand), CH):
        e = min(s + CH, len(cand))
        b0 = flat[:, ia[s:e]] < flat[:, ib[s:e]]
        b1 = flat_r[:, ia[s:e]] < flat_r[:, ib[s:e]]
        means[s:e] = b0.mean(axis=0)
        flip[s:e] = (b0 != b1).mean(axis=0)
    stable = flip <= MAX_FLIP_RATE
    print(f"  stability filter keeps {int(stable.sum())}/{len(cand)} "
          f"(median flip {np.median(flip):.3f})", flush=True)
    order = np.argsort(np.abs(means - 0.5))
    order = order[stable[order]]

    sel = []
    sel_bits = np.zeros((N, n_pairs), np.float32)
    sel_mean = np.zeros(n_pairs)
    thr = 0.2
    pos = 0
    scanned = 0
    while len(sel) < n_pairs:
        if pos >= len(order):
            thr += 0.1
            pos = 0
            print(f"  raising correlation threshold to {thr:.1f} "
                  f"({len(sel)} kept)", flush=True)
            continue
        c = order[pos]
        pos += 1
        scanned += 1
        if abs(means[c] - 0.5) > 0.35:
            continue
        b = (flat[:, ia[c]] < flat[:, ib[c]]).astype(np.float32)
        m = b.mean()
        if len(sel):
            k = len(sel)
            cov = (b @ sel_bits[:, :k]) / N - m * sel_mean[:k]
            var_b = max(m * (1 - m), 1e-6)
            var_s = np.maximum(sel_mean[:k] * (1 - sel_mean[:k]), 1e-6)
            corr = np.abs(cov) / np.sqrt(var_b * var_s)
            if corr.max() > thr:
                continue
        sel_bits[:, len(sel)] = b
        sel_mean[len(sel)] = m
        sel.append(c)
    print(f"  selected 256 tests (scanned {scanned}, final thr {thr:.1f})",
          flush=True)
    pattern = np.stack(
        [pts[cand[np.asarray(sel), 0]], pts[cand[np.asarray(sel), 1]]], axis=1
    )  # (256, 2, 2) as (pair, point, (x, y))
    return pattern.astype(np.int32)


def eval_pattern(pattern, seed=77):
    """Two-view mutual-match inlier rate with ground-truth reprojection:
    render a StepWallScene from two nearby poses, match descriptors, and
    score matches against the known geometry."""
    import jax
    import jax.numpy as jnp

    from synthetic import StepWallScene
    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.matching.hamming import hamming_matrix
    from tpuslam.ops import orb as O

    old = O.BRIEF_PATTERN
    O.BRIEF_PATTERN = pattern
    try:
        cam = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                            width=320, height=240)
        cfg = O.ORBConfig(n_features=600)
        rates = []
        for s in range(3):
            scene = StepWallScene(np.random.default_rng(seed + s))
            img0, z0 = scene.render(cam, np.eye(3), np.zeros(3), with_depth=True)
            R1 = np.eye(3)
            t1 = np.array([-0.12, 0.02, 0.0], np.float32)
            img1 = scene.render(cam, R1, t1)
            ex = jax.jit(lambda x: O.extract_orb(x, cfg))
            f0 = ex(jnp.asarray(img0.astype(np.float32)))
            f1 = ex(jnp.asarray(img1.astype(np.float32)))
            d = np.asarray(hamming_matrix(f0.desc, f1.desc)).astype(np.float32)
            v0 = np.asarray(f0.valid)
            v1 = np.asarray(f1.valid)
            d[~v0] = 1e9
            d[:, ~v1] = 1e9
            j = d.argmin(1)
            i_back = d.argmin(0)
            mutual = i_back[j] == np.arange(len(j))
            dmin = d[np.arange(len(j)), j]
            ok = mutual & (dmin <= 64) & v0
            # GT projection of kp0 into view 1 via rendered depth.
            xy0 = np.asarray(f0.xy)
            xs = np.clip(np.round(xy0[:, 0]).astype(int), 0, 319)
            ys = np.clip(np.round(xy0[:, 1]).astype(int), 0, 239)
            z = z0[ys, xs]
            X = np.stack([(xy0[:, 0] - 160.0) / 350.0 * z,
                          (xy0[:, 1] - 120.0) / 350.0 * z, z], -1)
            Xc = X @ R1.T + t1
            uv = 350.0 * Xc[:, :2] / Xc[:, 2:] + np.array([160.0, 120.0])
            xy1 = np.asarray(f1.xy)[j]
            err = np.linalg.norm(uv - xy1, axis=1)
            n_ok = int(ok.sum())
            if n_ok:
                rates.append(float((err[ok] < 2.0).mean()))
        return float(np.mean(rates)), n_ok
    finally:
        O.BRIEF_PATTERN = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patches", type=int, default=24000)
    ap.add_argument("--out", default="tpuslam/data/brief_pattern.npz")
    args = ap.parse_args()

    from tpuslam.ops.orb import ORBConfig, _make_brief_pattern

    cfg = ORBConfig(n_features=600)
    print("collecting steered patches...", flush=True)
    V, V_rot = collect_patches(args.patches, cfg)
    print(f"{len(V)} patches; greedy selection...", flush=True)
    pattern = greedy_select(V, V_rot)

    print("evaluating learned vs seeded-Gaussian pattern...", flush=True)
    rate_new, n1 = eval_pattern(pattern)
    rate_old, n0 = eval_pattern(_make_brief_pattern())
    print(f"matcher inlier rate: learned={rate_new:.4f} random={rate_old:.4f}")
    np.savez(args.out, pattern=pattern,
             inlier_rate_learned=rate_new, inlier_rate_random=rate_old)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
