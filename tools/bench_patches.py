"""Microbenchmark: patch gather — XLA vmap dynamic_slice vs Pallas DMA.

Run on the real TPU (default backend). Prints ms per call for each path and
checks they agree bitwise.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.ops.patches import PSIZE, gather_patches_pallas, gather_patches_xla


def timeit(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    Ha, Wa = 2496, 672  # ~TUM atlas size
    N = 1000
    atlas = jnp.asarray(rng.uniform(0, 255, (Ha, Wa)).astype(np.float32))
    corner = jnp.asarray(
        np.stack(
            [rng.integers(0, Ha - PSIZE, N), rng.integers(0, Wa - PSIZE, N)], -1
        ).astype(np.int32)
    )

    f_xla = jax.jit(gather_patches_xla)
    f_pl = jax.jit(gather_patches_pallas)

    a = np.asarray(f_xla(atlas, corner))
    b = np.asarray(f_pl(atlas, corner))
    print("match:", np.array_equal(a, b))

    print(f"xla   : {timeit(f_xla, atlas, corner):8.3f} ms")
    print(f"pallas: {timeit(f_pl, atlas, corner):8.3f} ms")


if __name__ == "__main__":
    main()
