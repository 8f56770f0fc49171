"""256-bit binary descriptor Hamming distance, batched.

The reference computes this with SSE-style popcount over 8 uint32 words
(ORBmatcher::DescriptorDistance, /root/reference/src/ORBmatcher.cc:1728-1744).
Here descriptors are (N, 8) uint32 arrays and distances are XOR +
jax.lax.population_count reduced on the VPU; the all-pairs form is the inner
loop of every matcher and of vocabulary lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between (..., 8) uint32 descriptors."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix(q: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """All-pairs distances: q (Nq, 8) x c (Nc, 8) -> (Nq, Nc) int32.

    Memory is Nq*Nc*8 words at the XOR; for the frame-sized problems here
    (<= 2048 x 2048) that is ~134 MB transient in fp32-equivalents — XLA
    fuses the popcount+sum so the materialized intermediate stays small.
    For larger problems use matmul form over bit-planes (see place/).
    """
    x = jnp.bitwise_xor(q[:, None, :], c[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
