"""Device-mesh parallelism: sharded bundle adjustment and map distribution.

The reference has no distributed execution (SURVEY.md P1-P6: pthreads over
shared memory). Here the scale story is observation-parallel BA: edge arrays
shard across a jax.sharding.Mesh, per-shard Jacobian products reduce into
the (replicated) pose/point systems through XLA-inserted psums over ICI —
the distributed Schur-complement reduction of BASELINE.json's north star.
"""

from tpuslam.parallel.dist_ba import (
    make_mesh,
    shard_ba_problem,
    distributed_bundle_adjustment,
)
