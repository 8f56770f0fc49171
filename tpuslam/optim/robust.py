"""Robust-kernel weights and chi-square thresholds.

Matches the reference's Huber deltas: sqrt(5.991) for mono (2-dof) and
sqrt(7.815) for stereo (3-dof) edges (/root/reference/src/Optimizer.cc:85-86,
:300, :335), which are the 95% chi-square quantiles used both as kernel
scale and as inlier classification thresholds (:392-404).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jnp.ndarray, delta_sq: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2 = r^T O r.

    rho(s) = s                     for s <= delta^2
           = 2 delta sqrt(s) - delta^2  otherwise
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta_sq / s))
