"""Multi-process distributed BA check (SURVEY.md §4(4)).

Validates the jax.distributed runtime path without a TPU pod: spawns
N_PROC CPU processes, each `jax.distributed.initialize`d against a local
coordinator, builds a global 1-D mesh over all processes' devices, and
runs the point-sharded BA with its cross-process psums over the gloo CPU
collectives. Each process checks the replicated pose result against the
single-process solver.

Usage: python tools/multiprocess_dist_ba.py [n_proc]
Exit code 0 = all processes agreed.
"""

import os
import subprocess
import sys

N_PROC = int(sys.argv[1]) if len(sys.argv) > 1 else 2
PORT = 9731


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_ba_problem
    from tpuslam.optim.ba import bundle_adjustment
    from tpuslam.parallel.dist_ba import point_sharded_bundle_adjustment

    rng = np.random.default_rng(0)
    cam, prob = _synthetic_ba_problem(rng, P=128)

    # Global mesh over every process's devices.
    mesh = Mesh(np.array(jax.devices()), ("points",))
    R2, t2, X2, _ = point_sharded_bundle_adjustment(
        cam, prob, mesh, iters=2, cg_iters=10
    )
    R1, t1, X1, _ = jax.jit(
        lambda p: bundle_adjustment(cam, p, iters=2, cg_iters=10)
    )(prob)
    # Pose state is replicated: every process holds the full result.
    err = float(jnp.max(jnp.abs(R2 - R1)))
    print(f"[proc {pid}] devices={len(jax.devices())} max |dR| = {err:.2e}",
          flush=True)
    assert err < 1e-3, err
    jax.distributed.shutdown()


def main():
    if os.environ.get("_DIST_BA_WORKER"):
        worker(int(os.environ["_DIST_BA_WORKER"]) - 1)
        return
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ, _DIST_BA_WORKER=str(pid + 1))
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print(f"OK: {N_PROC} processes agreed")


if __name__ == "__main__":
    main()
