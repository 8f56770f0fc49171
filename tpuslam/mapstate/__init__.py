"""The functional map: fixed-capacity SoA arrays updated by pure functions.

Replaces the reference's pointer-linked, mutex-protected Map / KeyFrame /
MapPoint graph (/root/reference/src/Map.cc, KeyFrame.cc, MapPoint.cc) with
immutable array snapshots: writers produce new MapState values; readers
(tracking) use whatever snapshot they hold — the lock-free equivalent of the
reference's Map::mMutexMapUpdate invariant (tracking never sees a
half-applied update).
"""

from tpuslam.mapstate.core import (
    MapState,
    FrameFeatures,
    make_empty_map,
    insert_keyframe,
    insert_points,
    covisibility_weights,
    compute_point_descriptors,
    update_point_normals,
)
