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
runs global BA inline after a loop closure. Each job result carries the
newly computed keyframe BoW rows (and, once, the vocabulary) back to the
tracker, which mirrors them into its own loop closer so relocalization
keeps BoW candidates — the reference's Tracking queries the shared
KeyFrameDatabase (Tracking.cc:1400). InterruptBA rides the same pipe as a
sideband job-id-tagged "interrupt" frame handled by a reader thread.

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
        import threading

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = platform
        self._proc = subprocess.Popen(
            [sys.executable, "-m", "tpuslam.parallel.mapping_worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        )
        # stdin is shared by the job writer (mapping thread) and interrupt
        # sender (tracking thread) — serialize frame writes.
        self._stdin_lock = threading.Lock()
        self._job_id = 0
        with self._stdin_lock:
            _write_msg(self._proc.stdin, ("init", tracker_config))
        status = _read_msg(self._proc.stdout)
        assert status == "ready", status

    def process(self, m, ki_int: int, depth_mode: bool):
        """Run one keyframe's mapping + loop-closing job remotely; returns
        (MapState, pt_remap, bow_rows, voc_blob). bow_rows are the worker's
        newly-computed keyframe BoW vectors (slot, frame_id, words, weights)
        and voc_blob its vocabulary (shipped once) — fed back so the
        TRACKER's relocalization keeps BoW candidates even though the
        keyframe database lives in the worker (the reference's Tracking
        queries the shared database, Tracking.cc:1400)."""
        with self._stdin_lock:
            self._job_id += 1
            _write_msg(
                self._proc.stdin,
                ("map", self._job_id, _map_to_numpy(m), int(ki_int),
                 bool(depth_mode)),
            )
        kind, payload, pt_remap, bow_rows, voc_blob = _read_msg(
            self._proc.stdout
        )
        if kind == "err":
            raise RuntimeError(f"mapping worker failed:\n{payload}")
        import jax.numpy as jnp

        return (
            type(m)(*(jnp.asarray(a) for a in payload)),
            pt_remap,
            bow_rows,
            voc_blob,
        )

    def interrupt(self):
        """InterruptBA over IPC (Tracking.cc:1097-1105 -> mbAbortBA): ask
        the worker to truncate the CURRENT job's optional stages (remaining
        fusion pairs, the second local-BA chunk). Tagged with the job id so
        a late interrupt cannot spuriously truncate the next job."""
        if self._proc.poll() is not None:
            return
        with self._stdin_lock:
            _write_msg(self._proc.stdin, ("interrupt", self._job_id))

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
    # If anything initialized backends during module import (e.g. an
    # import-time jnp constant somewhere under `python -m tpuslam...`), the
    # platform choice above is a no-op against the cached backend set and
    # this worker would silently grab the tracker's TPU chip. Drop the
    # stale set so the next backends() re-reads jax_platforms.
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()

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
    shipped_bow: dict = {}   # slot -> frame id already fed back
    voc_shipped = [False]
    _write_msg(stdout, "ready")

    # Reader thread: jobs queue up; "interrupt" frames bypass the queue and
    # set the engine's InterruptBA event mid-job (the IPC form of the
    # reference's mbAbortBA, polled by _mapping_compute between stages).
    # Interrupts are job-id-tagged; a stale one (job already finished when
    # it arrives) is dropped.
    import queue
    import threading

    jobs: "queue.Queue" = queue.Queue()
    current_job = [0]

    def _reader():
        while True:
            try:
                msg = _read_msg(stdin)
            except EOFError:
                jobs.put(("close",))
                return
            if msg[0] == "interrupt":
                if msg[1] == current_job[0]:
                    engine._mapping_interrupt.set()
                continue
            jobs.put(msg)
            if msg[0] == "close":
                return

    threading.Thread(target=_reader, daemon=True).start()

    while True:
        kind, *payload = jobs.get()
        if kind == "close":
            break
        if kind == "reset":
            engine.reset()
            shipped_bow.clear()
            _write_msg(stdout, "reset-ok")
            continue
        job_id, arrays, ki_int, depth_mode = payload
        try:
            import jax.numpy as jnp

            m = type(engine.map)(*(jnp.asarray(a) for a in arrays))
            engine._depth_mode = depth_mode
            engine._mapping_interrupt.clear()
            current_job[0] = job_id
            m = engine._mapping_compute(m, ki_int)
            current_job[0] = 0
            # Point-slot compaction remap (if any) rides back with the
            # snapshot so the tracker can rewrite its slot references.
            remap = engine._pending_pt_remap
            engine._pending_pt_remap = None
            # BoW feedback: ship newly computed keyframe BoW rows (and the
            # vocabulary, once) so the tracker's relocalization keeps BoW
            # candidates (VERDICT r3 item 8; Tracking.cc:1400 queries the
            # shared KeyFrameDatabase).
            bow_rows = []
            voc_blob = None
            lc = engine.loop_closer
            if lc is not None and lc.voc is not None:
                fid_np = np.asarray(m.kf_frame_id).astype(np.int64)
                valid_np = np.asarray(m.kf_valid)
                for s, bow in lc._bow.items():
                    f = int(fid_np[s]) if valid_np[s] else -1
                    if f >= 0 and shipped_bow.get(s) != f:
                        shipped_bow[s] = f
                        bow_rows.append(
                            (int(s), f, np.asarray(bow.words),
                             np.asarray(bow.weight))
                        )
                if not voc_shipped[0] and (bow_rows or lc.db is not None):
                    voc_shipped[0] = True
                    voc_blob = {
                        "k": lc.voc.k,
                        "levels": lc.voc.levels,
                        "word_weight": np.asarray(lc.voc.word_weight),
                        "centers": [np.asarray(c) for c in lc.voc.centers],
                        "centers_valid": (
                            None if lc.voc.centers_valid is None else
                            [np.asarray(v) for v in lc.voc.centers_valid]
                        ),
                    }
            _write_msg(stdout, ("ok", _map_to_numpy(m), remap, bow_rows,
                                voc_blob))
        except Exception:
            current_job[0] = 0
            import traceback

            _write_msg(stdout, ("err", traceback.format_exc(), None, None,
                                None))


if __name__ == "__main__":
    _worker_main()
