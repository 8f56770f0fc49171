"""Fused FAST-9/16 + 3x3 NMS as a single Pallas TPU kernel.

The XLA formulation (ops/orb.py fast_response + _nms3) materializes a
(16, H, W) circle-difference tensor plus ~10 full-image intermediates in HBM
— ~0.4 ms/frame of pure bandwidth at the TUM operating point. This kernel
streams row strips HBM -> VMEM once and computes the dense corner score
(OpenCV's FAST score = max threshold at which the pixel stays a corner,
matching /root/reference/src/ORBextractor.cc:976 cv::FAST semantics) and the
3x3 non-max suppression entirely on-chip; only the final score map leaves
VMEM.

Borders: the strip halo is zero-padded, so scores within 3 px of the image
edge differ from the XLA path's edge-replication — both are garbage that the
16 px detection border in _select_level_keypoints masks out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.ops.orb_common import FAST_OFFSETS

_TH = 64     # interior rows per grid step
_HALO = 8    # rows of context above/below a strip (needs 4; 8 keeps DMA aligned)


def _shift_cols(v: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Shift columns so out[:, c] = v[:, c + dx] (wraparound pollutes only
    the <16 px border, masked downstream)."""
    if dx == 0:
        return v
    return pltpu.roll(v, -dx % v.shape[1], axis=1)


def _make_kernel(H: int, W: int, Wp: int, min_th: float, n_strips: int, rows_p: int):
    def kernel(p_ref, out_ref, s_ref, sem):
        g = pl.program_id(0)
        b = g // n_strips   # batch stream (strips never cross streams)
        i = g % n_strips
        # Strip rows [i*TH, i*TH + TH + 2*HALO) of stream b's padded image;
        # interior image rows are at strip rows [HALO, HALO+TH).
        dma = pltpu.make_async_copy(
            p_ref.at[pl.ds(b * rows_p + i * _TH, _TH + 2 * _HALO), :], s_ref, sem
        )
        dma.start()
        dma.wait()

        # Score rows: interior +- 1 for the NMS halo -> strip rows
        # [HALO-1, HALO+TH+1), i.e. center block C of shape (TH+2, Wp).
        r0 = _HALO - 1
        nr = _TH + 2
        center = s_ref[r0 : r0 + nr, :]

        # 16 circle differences (VMEM values, never leave the chip).
        d = []
        for dx, dy in FAST_OFFSETS:
            v = _shift_cols(s_ref[r0 + dy : r0 + dy + nr, :], int(dx))
            d.append(v - center)

        # OpenCV FAST score: max over the 16 arc starts of the min over 9
        # consecutive circle entries, for bright (d) and dark (-d) arcs.
        score = jnp.full_like(center, -jnp.inf)
        for s in range(16):
            amin = d[s]
            amax = d[s]
            for k in range(1, 9):
                amin = jnp.minimum(amin, d[(s + k) % 16])
                amax = jnp.maximum(amax, d[(s + k) % 16])
            score = jnp.maximum(score, amin)       # bright arc
            score = jnp.maximum(score, -amax)      # dark arc
        score = jnp.where(score > min_th, score, 0.0)

        # 3x3 NMS with the deterministic smaller-linear-index tie-break of
        # ops/orb.py::_nms3 (global bias reconstructed from the strip row).
        row0 = i * _TH - 1  # global image row of center block row 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (nr, Wp), 0) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, (nr, Wp), 1)
        lin = (rows * W + cols).astype(jnp.float32)
        biased = score + jnp.where(score > 0, lin * (-1e-6 / (H * W)), 0.0)

        pooled = jnp.full((_TH, Wp), -jnp.inf)
        for dr in (0, 1, 2):
            for dc in (-1, 0, 1):
                pooled = jnp.maximum(
                    pooled, _shift_cols(biased[dr : dr + _TH, :], dc)
                )
        mid_b = biased[1 : 1 + _TH, :]
        mid_s = score[1 : 1 + _TH, :]
        out_ref[...] = jnp.where((mid_b >= pooled) & (mid_s > 0), mid_s, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("min_th", "interpret"))
def fast_nms_pallas(
    img: jnp.ndarray, min_th: float, interpret: bool = False
) -> jnp.ndarray:
    """(..., H, W) float32 NMS'd FAST score map, fused on TPU.

    Matches _nms3(fast_response(img, min_th)) away from the 3 px image
    border (see module docstring). Leading batch dims (multi-stream
    tracking) become extra grid steps of the same kernel.
    """
    *batch, H, W = img.shape
    B = 1
    for d in batch:
        B *= d
    img3 = img.reshape(B, H, W).astype(jnp.float32)
    n_strips = -(-H // _TH)
    Wp = -(-W // 128) * 128
    rows_p = n_strips * _TH + 2 * _HALO
    p = jnp.zeros((B, rows_p, Wp), jnp.float32)
    p = jax.lax.dynamic_update_slice(p, img3, (0, _HALO, 0)).reshape(
        B * rows_p, Wp
    )

    out = pl.pallas_call(
        _make_kernel(H, W, Wp, float(min_th), n_strips, rows_p),
        grid=(B * n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (_TH, Wp), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TH + 2 * _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((B * n_strips * _TH, Wp), jnp.float32),
        interpret=interpret,
    )(p)
    return out.reshape(B, n_strips * _TH, Wp)[:, :H, :W].reshape(*batch, H, W)
