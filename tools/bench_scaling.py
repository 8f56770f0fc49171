"""Scaling-efficiency harness for distributed BA (VERDICT r2 item 8).

Runs point-sharded model-parallel bundle adjustment (parallel/dist_ba.py)
at N = 1, 2, 4, 8 shards and reports, per N:

  - wall-clock per LM iteration (strong scaling: fixed problem);
  - collective traffic per LM iteration, counted from the COMPILED HLO
    (every all-reduce's operand bytes x its execution count under the
    scan) — the number that has to ride ICI on real hardware;
  - efficiency vs N=1.

On this host the mesh is XLA's virtual CPU device mesh
(--xla_force_host_platform_device_count), so wall-clock efficiency is
indicative only (2 physical cores); the collective-bytes accounting and
the ready-to-run shape of this script are the point — rerun unchanged on
a real multi-chip slice to fill BASELINE.md's >=70% 1->N north star.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/bench_scaling.py [--points 32768] [--kfs 96] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s64": 8, "u64": 8, "u8": 1, "s8": 1}


def hlo_collective_bytes(hlo_text: str) -> dict:
    """Sum operand bytes of every collective op in an HLO module text.
    Counts each textual occurrence once (ops inside a while-loop body are
    per-iteration; the caller multiplies by trip count if needed)."""
    out = {}
    for m in re.finditer(
        r"(\w*)\s*=\s*(?:\([^)]*\)|[^\s=]+)\s+"
        r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
        r"(?:-start)?\(", hlo_text,
    ):
        # Operand/result shapes live on the lhs: name = TYPE[shape]{...} op(...)
        line_start = hlo_text.rfind("\n", 0, m.start()) + 1
        line = hlo_text[line_start: hlo_text.find("\n", m.start())]
        bytes_here = 0
        for dt, shape in re.findall(r"(\w+)\[([0-9,]*)\]", line.split("=")[1].split("(")[0]):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            bytes_here += n * _DTYPE_BYTES[dt]
        kind = m.group(2)
        out[kind] = out.get(kind, 0) + bytes_here
        out["total"] = out.get("total", 0) + bytes_here
    return out


def build_problem(rng, P, K, obs_per_kf):
    from tpuslam.testing import synthetic_ba_problem

    return synthetic_ba_problem(rng, K=K, P=P, n_obs_per_kf=obs_per_kf)


def run_once(cam, prob, n_shards, iters, cg_iters=20):
    import jax
    from jax.sharding import Mesh

    from tpuslam.parallel.dist_ba import point_sharded_bundle_adjustment

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("points",))
    # Warm-up (compile).
    R, t, X, _ = point_sharded_bundle_adjustment(
        cam, prob, mesh, iters=iters, cg_iters=cg_iters
    )
    np.asarray(R)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        R, t, X, _ = point_sharded_bundle_adjustment(
            cam, prob, mesh, iters=iters, cg_iters=cg_iters
        )
    np.asarray(R)
    dt = (time.perf_counter() - t0) / reps
    return dt / iters, mesh


def collective_report(cam, prob, n_shards, iters, cg_iters=20):
    """Compile the sharded solver and account collective bytes from HLO."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh

    from tpuslam.parallel import dist_ba as D

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("points",))
    n = n_shards
    P0 = prob.X.shape[0]
    pad_p = (-P0) % n
    import jax.numpy as jnp
    pr = prob
    if pad_p:
        pr = pr._replace(
            X=jnp.pad(pr.X, ((0, pad_p), (0, 0))),
            fixed_pt=jnp.pad(pr.fixed_pt, (0, pad_p), constant_values=True),
        )
    routed, perm = D.route_edges_to_point_shards(pr, n)
    blk = pr.X.shape[0] // n
    shard_of_edge = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), routed.kf.shape[0] // n
    )
    pt_local = routed.pt - shard_of_edge * blk
    from tpuslam.optim.ba import BAProblem, bundle_adjustment
    from jax.sharding import PartitionSpec as P

    def body(R, t, X_blk, kf, ptl, uvr, is2, valid, fkf, fpt):
        local = BAProblem(R=R, t=t, X=X_blk, kf=kf, pt=ptl, uvr=uvr,
                          inv_sigma2=is2, valid=valid, fixed_kf=fkf,
                          fixed_pt=fpt)
        return bundle_adjustment(cam, local, iters=iters, use_huber=True,
                                 cg_iters=cg_iters, axis_name=D.PT_AXIS)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(D.PT_AXIS), P(D.PT_AXIS), P(D.PT_AXIS),
                  P(D.PT_AXIS), P(D.PT_AXIS), P(D.PT_AXIS), P(), P(D.PT_AXIS)),
        out_specs=(P(), P(), P(D.PT_AXIS), P(D.PT_AXIS)),
    )
    args = (pr.R, pr.t, pr.X, routed.kf, pt_local, routed.uvr,
            routed.inv_sigma2, routed.valid, pr.fixed_kf, pr.fixed_pt)
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    per_module = hlo_collective_bytes(hlo)
    return per_module


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--kfs", type=int, default=96)
    ap.add_argument("--obs-per-kf", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument(
        "--weak", action="store_true",
        help="weak scaling: --points PER SHARD (problem grows with N; "
        "efficiency = t1 / tN at constant per-shard work)",
    )
    args = ap.parse_args()

    import jax

    # The axon sitecustomize pins jax_platforms via jax.config at
    # interpreter start; override it too (the env var is not enough).
    if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    rng = np.random.default_rng(0)
    mode = "weak" if args.weak else "strong"
    cam = prob = None
    if not args.weak:
        cam, prob = build_problem(rng, args.points, args.kfs, args.obs_per_kf)
        E = prob.kf.shape[0]
        print(f"problem: {args.points} pts, {args.kfs} kfs, {E} edges")

    results = {"mode": mode}
    base = None
    for n in [int(x) for x in args.shards.split(",")]:
        if args.weak:
            rng = np.random.default_rng(0)
            cam, prob = build_problem(
                rng, args.points * n, args.kfs, args.obs_per_kf
            )
            print(f"N={n}: weak problem {args.points * n} pts, "
                  f"{prob.kf.shape[0]} edges")
        ms_per_iter, _ = run_once(cam, prob, n, args.iters)
        coll = collective_report(cam, prob, n, args.iters)
        if base is None:
            base = ms_per_iter
        if args.weak:
            eff = round(base / ms_per_iter, 3) if n > 1 else 1.0
        else:
            eff = round(base / ms_per_iter / n, 3) if n > 1 else 1.0
        results[str(n)] = {
            "ms_per_lm_iter": round(ms_per_iter * 1e3, 2),
            f"{mode}_scaling_efficiency": eff,
            "collective_bytes_per_module": coll,
            "collective_MB_total": round(coll.get("total", 0) / 1e6, 3),
        }
        print(f"N={n}: {json.dumps(results[str(n)])}", flush=True)

    out = os.path.join(ROOT, "tools", "scaling_results.json")
    prior = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                prior = json.load(f)
        except ValueError:
            prior = {}
    prior[mode] = results
    with open(out, "w") as f:
        json.dump(prior, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
