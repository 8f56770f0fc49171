"""Trajectory evaluation CLI (the TUM benchmark evaluate_ate/evaluate_rpe
workflow the reference points users to, /root/reference/README.md:95-167).

Usage: python tools/evaluate_trajectory.py est.txt gt.txt [--se3] [--delta N]

Both files are TUM format (timestamp tx ty tz qx qy qz qw); poses are
associated by nearest timestamp (max 20 ms offset). Alignment + RMSE run in
the native C++ evaluator (native/src/evaluate.cc) with a pure-jax fallback.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_tum(path):
    ts, pos = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split()
            ts.append(float(v[0]))
            pos.append([float(v[1]), float(v[2]), float(v[3])])
    return np.asarray(ts), np.asarray(pos)


def associate(ts_a, ts_b, max_dt=0.02):
    """Nearest-timestamp association; returns index pairs."""
    ib = np.searchsorted(ts_b, ts_a)
    pairs = []
    for i, j in enumerate(ib):
        best, bdt = -1, max_dt
        for jj in (j - 1, j):
            if 0 <= jj < len(ts_b) and abs(ts_b[jj] - ts_a[i]) <= bdt:
                best, bdt = jj, abs(ts_b[jj] - ts_a[i])
        if best >= 0:
            pairs.append((i, best))
    return pairs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fix_scale = "--se3" in sys.argv
    delta = 1
    for a in sys.argv[1:]:
        if a.startswith("--delta"):
            delta = int(a.split("=")[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    ts_e, pos_e = load_tum(args[0])
    ts_g, pos_g = load_tum(args[1])
    pairs = associate(ts_e, ts_g)
    if len(pairs) < 3:
        print("too few associated poses", file=sys.stderr)
        sys.exit(1)
    est = pos_e[[i for i, _ in pairs]]
    gt = pos_g[[j for _, j in pairs]]

    from tpuslam.io.native import evaluate_ate, evaluate_rpe, native_available

    rmse, s, R, t = evaluate_ate(est, gt, fix_scale=fix_scale)
    rpe = evaluate_rpe(est, gt, delta=delta)
    backend = "native" if native_available() else "jax-fallback"
    print(f"pairs:      {len(pairs)}")
    print(f"alignment:  {'SE3' if fix_scale else 'Sim3'} scale={s:.6f} ({backend})")
    print(f"ATE RMSE:   {rmse:.6f} m")
    print(f"RPE(d={delta}): {rpe:.6f} m")


if __name__ == "__main__":
    main()
