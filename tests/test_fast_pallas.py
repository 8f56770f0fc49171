"""Fused FAST+NMS Pallas kernel vs the XLA path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from tpuslam.ops.fast_pallas import fast_nms_pallas
from tpuslam.ops.orb import _nms3, fast_response


def _texture(rng, h, w):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    for _ in range(80):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        s = rng.integers(4, 12)
        img[y : y + s, x : x + s] = rng.uniform(0, 255)
    return img


def test_fast_nms_pallas_matches_xla(rng):
    for h, w in [(120, 160), (97, 200)]:  # incl. non-multiple-of-strip height
        img = jnp.asarray(_texture(rng, h, w))
        ref = np.asarray(_nms3(fast_response(img, 7.0)))
        got = np.asarray(fast_nms_pallas(img, 7.0, interpret=True))
        assert got.shape == ref.shape
        # Interior only: the kernel zero-pads the halo where the XLA path
        # edge-replicates; both regions are inside the detection border.
        b = 4
        np.testing.assert_allclose(got[b:-b, b:-b], ref[b:-b, b:-b], atol=1e-4)
        assert (got[b:-b, b:-b] > 0).sum() > 50
