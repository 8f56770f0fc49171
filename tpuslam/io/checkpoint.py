"""Map checkpoint / resume.

The reference never implemented SaveMap/LoadMap (an explicit TODO,
/root/reference/include/System.h:115-117). The SoA MapState makes it
trivial: every field is an array, so a checkpoint is one compressed npz.
Combined with the tracker's localization mode this enables the
map-once / localize-later workflow the reference only gestures at.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuslam.mapstate.core import MapState

_SCALARS = ("n_kf", "n_pt")


def save_map(m: MapState, path: str) -> None:
    data = {}
    for name, val in m._asdict().items():
        data[name] = np.asarray(val)
    np.savez_compressed(path, **data)


def load_map(path: str) -> MapState:
    z = np.load(path)
    K = z["kf_R"].shape[0]
    # Defaults for fields added after a checkpoint was written (forward
    # compatibility; culled-KF spanning tree fields default to "no parent").
    defaults = {
        "kf_parent": np.full((K,), -1, np.int32),
        "kf_rel_R": np.broadcast_to(np.eye(3, dtype=np.float32), (K, 3, 3)),
        "kf_rel_t": np.zeros((K, 3), np.float32),
    }
    fields = {}
    for name in MapState._fields:
        arr = z[name] if name in z.files else defaults[name]
        if name in _SCALARS:
            fields[name] = jnp.asarray(arr.item(), jnp.int32)
        else:
            fields[name] = jnp.asarray(arr)
    return MapState(**fields)
