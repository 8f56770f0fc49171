"""Head-to-head harness: the ACTUAL reference pipeline vs this framework on
identical rendered sequences (VERDICT r2 item 1).

Pipeline:
  1. `python tools/seqgen.py` renders the sequences (PGM frames + TUM
     groundtruth) under data/sequences/.
  2. `tools/refbench/build/refslam` (the real /root/reference System with
     its Tracking/LocalMapping/LoopClosing threads, headless) runs each
     sequence; its DBoW2 vocabulary is trained by `refvoc` from the same
     frames using the reference's own ORBextractor + DBoW2::create.
  3. This repo's System runs the same frames.
  4. ATE RMSE vs ground truth for both (Sim3 alignment for mono, SE3 for
     stereo — the TUM benchmark convention the reference documents,
     /root/reference/README.md:95-167).

Writes HEADTOHEAD.md + tools/headtohead.json.

Usage: python tools/headtohead.py [--seq-dir data/sequences] [--skip-ref]
                                  [--skip-ours] [--only NAME]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REFBENCH = os.path.join(ROOT, "tools", "refbench")
REFSLAM = os.path.join(REFBENCH, "build", "refslam")
REFVOC = os.path.join(REFBENCH, "build", "refvoc")

SEQUENCES = [
    ("mono_room_loop", "mono"),
    ("mono_room_sweep", "mono"),
    ("stereo_room_loop", "stereo"),
    ("mono_room_kidnap", "mono"),
    ("stereo_room_big", "stereo"),
]


def ate_rmse(est_file, gt_file, fix_scale):
    """ATE RMSE after Horn alignment (Sim3 unless fix_scale)."""
    from tools.evaluate_trajectory import associate, load_tum

    ts_e, p_e = load_tum(est_file)
    ts_g, p_g = load_tum(gt_file)
    pairs = associate(ts_e, ts_g, max_dt=0.02)
    if len(pairs) < 3:
        return float("nan"), 0
    A = np.stack([p_e[i] for i, _ in pairs])  # est
    B = np.stack([p_g[j] for _, j in pairs])  # gt
    # Horn alignment A -> B (closed form, Sim3Solver.cc:226 family).
    mu_a, mu_b = A.mean(0), B.mean(0)
    Ac, Bc = A - mu_a, B - mu_b
    H = Ac.T @ Bc
    U, S, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    s = 1.0 if fix_scale else np.trace(np.diag(S) @ D) / (Ac**2).sum()
    t = mu_b - s * R @ mu_a
    err = (s * (R @ A.T).T + t) - B
    return float(np.sqrt((err**2).sum(axis=1).mean())), len(pairs)


def train_ref_vocab(seq_dirs, out_voc, every=8):
    lst = os.path.join(REFBENCH, "build", "voc_images.txt")
    with open(lst, "w") as f:
        for d in seq_dirs:
            for i, line in enumerate(open(os.path.join(d, "frames.txt"))):
                if i % every:
                    continue
                img = line.split()[1]
                f.write(os.path.join(d, img) + "\n")
    print("training reference vocabulary (refvoc)...", flush=True)
    subprocess.run([REFVOC, lst, out_voc, "10", "4"], check=True)


def run_reference(seq_dir, mode, voc, out_prefix):
    t0 = time.time()
    r = subprocess.run(
        [REFSLAM, mode, voc, os.path.join(seq_dir, "settings.yaml"), seq_dir,
         out_prefix],
        capture_output=True, text=True, timeout=7200,
    )
    wall = time.time() - t0
    sys.stdout.write(r.stdout[-2000:])
    if r.returncode != 0:
        print("refslam FAILED:", r.stderr[-2000:])
        return None
    med = re.search(r"median tracking time: ([0-9.]+)", r.stdout)
    loops = r.stdout.count("Loop detected!")
    return {
        "median_track_ms": float(med.group(1)) if med else None,
        "wall_s": round(wall, 1),
        "loops_detected": loops,
    }


def run_ours(seq_dir, mode, out_file, max_frames=None):
    # Honor JAX_PLATFORMS (the axon sitecustomize re-pins jax_platforms via
    # jax.config at interpreter start): JAX_PLATFORMS=cpu gives the
    # same-host comparison against the reference binary and sidesteps
    # tunneled-chip flakiness.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from tpuslam.io import load_settings
    from tpuslam.io.datasets import load_grayscale
    from tpuslam.pipeline import SensorType, System

    settings = load_settings(os.path.join(seq_dir, "settings.yaml"))
    sensor = SensorType.STEREO if mode == "stereo" else SensorType.MONOCULAR
    sys_ = System(
        settings.cam,
        sensor,
        orb=settings.orb,
        kf_max_frames=int(settings.fps),
        # Deterministic keyframe cadence: the reference's c1b inserts only
        # when LocalMapping is idle (Tracking.cc:1047), which at its
        # real-time mapping latency spaces keyframes ~0.1-0.2 s apart; the
        # synchronous pipeline here is always "idle", so the equivalent
        # spacing is enforced as a minimum frame gap (without it every
        # c2-frame becomes a keyframe and redundancy culling does all the
        # work at 10x the mapping cost).
        kf_min_frames=int(
            os.environ.get("H2H_KF_MIN", 4 if mode == "mono" else 2)
        ),
        # Full edge budget for the accuracy comparison: stereo KFs carry
        # 2000 keypoints, so the throughput-oriented 16k default drops
        # boundary edges that anchor the local window's points.
        local_ba_max_edges=int(os.environ.get("H2H_BA_EDGES", 65536)),
        th_depth_factor=settings.th_depth_factor,
        max_keyframes=int(os.environ.get("H2H_MAX_KF", 256)),
        max_points=int(os.environ.get("H2H_MAX_PT", 24_576)),
        # Sync mapping for the accuracy comparison: every keyframe gets its
        # FULL triangulation/fusion/local-BA before the next frame (the
        # reference's threads keep up at its frame rate; over the tunneled
        # chip our async mode skews toward starvation instead — the
        # latency is in the wire, not the chip).
        async_mapping=False,
    )
    frames = [l.split() for l in open(os.path.join(seq_dir, "frames.txt"))
              if l.strip()]
    if max_frames:
        frames = frames[:max_frames]
    times = []
    t_start = time.time()
    for row in frames:
        ts = float(row[0])
        img = load_grayscale(os.path.join(seq_dir, row[1]))
        t0 = time.perf_counter()
        if mode == "stereo":
            imgR = load_grayscale(os.path.join(seq_dir, row[2]))
            sys_.track_stereo(jnp.asarray(img), jnp.asarray(imgR), ts)
        else:
            sys_.track_monocular(jnp.asarray(img), ts)
        times.append(time.perf_counter() - t0)
    sys_.shutdown()
    sys_.save_trajectory_tum(out_file)
    # KF-only export too: the reference's mono drivers can only save
    # keyframe trajectories (SaveTrajectoryTUM aborts for monocular,
    # System.cc:344-348), so the like-for-like mono ATE row is KF-vs-KF;
    # the full trajectory still measures pose coverage.
    sys_.save_keyframe_trajectory_tum(out_file[:-4] + "_kf.txt")
    stats = sys_.map_stats()
    loops = (sys_.tracker.loop_closer.n_loops_closed
             if sys_.tracker.loop_closer else 0)
    return {
        "median_track_ms": round(float(np.median(times)) * 1e3, 1),
        "wall_s": round(time.time() - t_start, 1),
        "loops_closed": int(loops),
        **stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-dir", default=os.path.join(ROOT, "data", "sequences"))
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    out_dir = os.path.join(args.seq_dir, "results")
    os.makedirs(out_dir, exist_ok=True)
    voc = os.path.join(REFBENCH, "build", "synthetic_voc.txt")

    seqs = [(n, m) for n, m in SEQUENCES
            if (not args.only or args.only == n)
            and os.path.isdir(os.path.join(args.seq_dir, n))]

    if not args.skip_ref and not os.path.exists(voc):
        train_ref_vocab([os.path.join(args.seq_dir, n) for n, _ in seqs], voc)

    # Merge with prior runs (the harness is run piecemeal: --skip-ref /
    # --skip-ours / --only build the table incrementally).
    json_path = os.path.join(ROOT, "tools", "headtohead.json")
    results = {}
    if os.path.exists(json_path):
        try:
            with open(json_path) as f:
                results = json.load(f)
        except ValueError:
            results = {}
    for name, mode in seqs:
        seq = os.path.join(args.seq_dir, name)
        gt = os.path.join(seq, "groundtruth.txt")
        fix_scale = mode == "stereo"
        entry = results.get(name, {})
        if not args.skip_ref:
            print(f"=== reference on {name} ===", flush=True)
            prefix = os.path.join(out_dir, f"ref_{name}")
            info = run_reference(seq, mode, voc, prefix)
            if info:
                traj = (prefix + "_full.txt" if mode == "stereo"
                        else prefix + "_kf.txt")
                ate, n = ate_rmse(traj, gt, fix_scale)
                info.update(ate_rmse_m=round(ate, 4), n_poses=n)
            entry["reference"] = info
        if not args.skip_ours:
            print(f"=== tpuslam on {name} ===", flush=True)
            ours_traj = os.path.join(out_dir, f"tpu_{name}.txt")
            info = run_ours(seq, mode, ours_traj,
                            max_frames=args.max_frames or None)
            ate, n = ate_rmse(ours_traj, gt, fix_scale)
            info.update(ate_rmse_m=round(ate, 4), n_poses=n)
            kf_traj = ours_traj[:-4] + "_kf.txt"
            if os.path.exists(kf_traj):
                ate_kf, n_kf = ate_rmse(kf_traj, gt, fix_scale)
                info.update(ate_kf_rmse_m=round(ate_kf, 4), n_kf_poses=n_kf)
            entry["tpuslam"] = info
        results[name] = entry
        print(json.dumps({name: entry}, indent=2), flush=True)

    with open(json_path, "w") as f:
        json.dump(results, f, indent=2)

    # Markdown table.
    lines = [
        "# HEAD-TO-HEAD — actual reference binary vs tpuslam\n",
        "Identical rendered frames (tools/seqgen.py), reference = the full",
        "/root/reference pipeline compiled headless (tools/refbench refslam),",
        "vocabulary trained with the reference's own ORBextractor+DBoW2.",
        "ATE after Horn alignment vs ground truth (Sim3 mono / SE3 stereo).",
        "The reference's mono export is KEYFRAME-only (SaveTrajectoryTUM",
        "aborts for monocular, System.cc:344-348), so the like-for-like ATE",
        "column for tpuslam is its KF-only export; 'full' is every tracked",
        "frame (pose coverage the reference cannot emit for mono).\n",
        "| sequence | ref ATE (m; mono=KF-only) | tpuslam ATE (m, KF) | "
        "tpuslam ATE (m, full) | full poses | ref median ms | "
        "tpuslam median ms | ref loops | tpu loops |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, e in results.items():
        r = e.get("reference") or {}
        o = e.get("tpuslam") or {}
        lines.append(
            f"| {name} | {r.get('ate_rmse_m', '—')} | "
            f"{o.get('ate_kf_rmse_m', '—')} | {o.get('ate_rmse_m', '—')} | "
            f"{o.get('n_poses', '—')} | "
            f"{r.get('median_track_ms', '—')} | {o.get('median_track_ms', '—')} | "
            f"{r.get('loops_detected', '—')} | {o.get('loops_closed', '—')} |"
        )
    with open(os.path.join(ROOT, "HEADTOHEAD.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote HEADTOHEAD.md")


if __name__ == "__main__":
    main()
