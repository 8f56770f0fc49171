"""Mapping/loop-closing worker in a SEPARATE PROCESS (multi-host P1).

The reference runs LocalMapping and LoopClosing as pthreads sharing the
tracker's address space (/root/reference/src/System.cc:100,104). The
TPU-native equivalent at pod scale runs them on ANOTHER HOST of the slice:
tracking owns its chip and latency budget; mapping/loop jobs are pure
MapState-snapshot -> snapshot functions (pipeline/tracker.py
_mapping_compute), so they can execute anywhere the snapshot can be sent.

This module is both the client (RemoteMappingWorker) and the worker
entrypoint (python -m tpuslam.parallel.mapping_worker). Transport is
length-prefixed pickles over the child's stdin/stdout pipes — on a real
multi-host slice the same job/snapshot protocol rides jax.distributed /
device-to-device transfers instead; the snapshot layout (fixed-capacity SoA
arrays) is transport-agnostic by design.

The worker owns the stateful loop-closing context (keyframe database,
consistency chains — the reference's LoopClosing thread owns these too) and
runs global BA inline after a loop closure. Consequence, documented: in
process mode the TRACKER's own BoW relocalization index is not populated
(it lives in the worker), so relocalization uses the brute-force descriptor
fallback.

Default worker platform is CPU so it never contends for the tracker's TPU
chip; on a pod, point `platform` at the mapping host's own devices.
"""

from __future__ import annotations

import os
import pickle
import struct
import subprocess
import sys

import numpy as np


def _write_msg(stream, obj) -> None:
    blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    stream.write(struct.pack("<Q", len(blob)))
    stream.write(blob)
    stream.flush()


def _read_msg(stream):
    header = stream.read(8)
    if len(header) < 8:
        raise EOFError("mapping worker pipe closed")
    (ln,) = struct.unpack("<Q", header)
    blob = stream.read(ln)
    if len(blob) < ln:
        raise EOFError("mapping worker pipe truncated")
    return pickle.loads(blob)


def _map_to_numpy(m) -> tuple:
    return tuple(np.asarray(leaf) for leaf in m)


class RemoteMappingWorker:
    """Client handle: spawns the worker process and ships it mapping jobs.

    process(m, ki, depth_mode) is synchronous (call it from the tracker's
    mapping thread — the single-slot future protocol is unchanged); it
    returns (MapState, pt_remap-or-None)."""

    def __init__(self, tracker_config, platform: str = "cpu"):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
        self._proc = subprocess.Popen(
            [sys.executable, "-m", "tpuslam.parallel.mapping_worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        )
        _write_msg(self._proc.stdin, ("init", tracker_config))
        status = _read_msg(self._proc.stdout)
        assert status == "ready", status

    def process(self, m, ki_int: int, depth_mode: bool):
        """Run one keyframe's mapping + loop-closing job remotely; returns
        the new MapState (same pytree type as the input)."""
        _write_msg(self._proc.stdin, ("map", _map_to_numpy(m), int(ki_int), bool(depth_mode)))
        kind, payload, pt_remap = _read_msg(self._proc.stdout)
        if kind == "err":
            raise RuntimeError(f"mapping worker failed:\n{payload}")
        import jax.numpy as jnp

        return type(m)(*(jnp.asarray(a) for a in payload)), pt_remap

    def reset(self):
        """Clear the worker's loop-closing state (Tracking::Reset also
        resets the reference's LoopClosing thread, Tracking.cc:1565)."""
        _write_msg(self._proc.stdin, ("reset", None))
        status = _read_msg(self._proc.stdout)
        assert status == "reset-ok", status

    def close(self):
        if self._proc.poll() is None:
            try:
                _write_msg(self._proc.stdin, ("close", None))
                self._proc.wait(timeout=10)
            except Exception:
                self._proc.kill()


def _worker_main():
    # Force the requested platform before jax initializes (the axon
    # sitecustomize pins jax_platforms via jax.config as well).
    import jax

    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    # Anything the mapping code prints must not corrupt the framed protocol.
    sys.stdout = sys.stderr

    kind, cfg = _read_msg(stdin)
    assert kind == "init"
    import dataclasses

    from tpuslam.pipeline.tracker import Tracker

    # A non-tracking Tracker is the mapping context: cfg-derived constants,
    # the loop closer (stateful across jobs), and synchronous inline GBA.
    cfg = dataclasses.replace(cfg, async_mapping=False, mapping_process=False)
    engine = Tracker(cfg)
    _write_msg(stdout, "ready")

    while True:
        try:
            kind, *payload = _read_msg(stdin)
        except EOFError:
            break
        if kind == "close":
            break
        if kind == "reset":
            engine.reset()
            _write_msg(stdout, "reset-ok")
            continue
        arrays, ki_int, depth_mode = payload
        try:
            import jax.numpy as jnp

            m = type(engine.map)(*(jnp.asarray(a) for a in arrays))
            engine._depth_mode = depth_mode
            m = engine._mapping_compute(m, ki_int)
            # Point-slot compaction remap (if any) rides back with the
            # snapshot so the tracker can rewrite its slot references.
            remap = engine._pending_pt_remap
            engine._pending_pt_remap = None
            _write_msg(stdout, ("ok", _map_to_numpy(m), remap))
        except Exception:
            import traceback

            _write_msg(stdout, ("err", traceback.format_exc(), None))


if __name__ == "__main__":
    _worker_main()
