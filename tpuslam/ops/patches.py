"""Per-keypoint patch gather — the ORB front end's memory-bound hot op.

The reference computes orientation + descriptors by walking a 31px circular
patch and 256 sample pairs per keypoint with scalar loads
(/root/reference/src/ORBextractor.cc:84-128, 141-192). The TPU formulation
gathers ONE contiguous 47x47 patch per keypoint from a padded pyramid atlas
and runs moments/blur/BRIEF as dense batched math on the (N, 47, 47) tensor
(see ops/orb.py).

XLA lowers the vmapped `dynamic_slice` gather to a generic gather that runs
at ~1 GB/s on TPU — 6.5 ms of a 10 ms frame. This module instead streams the
patches with double-buffered async DMA (HBM atlas -> VMEM), K keypoints per
grid step. Mosaic requires DMA slice origins/extents aligned to the dtype's
native tile (fp32 (8, 128), bf16 (16, 128), int8 (32, 128)), so the kernel
copies an aligned block around each patch and the residual offset is undone
afterwards with one-hot shift matmuls — MXU work instead of scattered loads.

The atlas dtype is the traffic knob: ops/orb.py stores the pyramid atlas as
uint8 (the reference's images are 8-bit too, ORBextractor.cc operates on 8U
Mats), which cuts DMA bytes 2.3x vs float32 (96x256x1 B vs 56x256x4 B per
patch). uint8 pixel values are exactly representable in bfloat16, so the
one-hot un-shift matmuls run in single-pass bf16 and remain bit-exact.

The vmap path remains as the CPU/test fallback and the golden reference for
the kernel's unit test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PSIZE = 47       # patch side consumed by ops/orb.py
_K = 8           # keypoints per grid step (DMAs in flight per buffer slot)
_BLK_C = 256     # aligned DMA block cols: 47 + (128-1) rounded up to 128

# Per-dtype sublane alignment and the resulting aligned block rows:
# rows must cover 47 + (align-1) rounded up to the alignment.
_ROW_ALIGN = {jnp.float32: 8, jnp.bfloat16: 16, jnp.uint8: 32}


def _row_align(dtype) -> int:
    return _ROW_ALIGN[jnp.dtype(dtype).type]


def _blk_r(dtype) -> int:
    a = _row_align(dtype)
    return -((PSIZE + a - 1) // -a) * a  # ceil(47 + a-1, a): 56 / 64 / 96


def gather_patches_xla(atlas: jnp.ndarray, corner: jnp.ndarray):
    """Reference path: vmapped dynamic_slice. corner is (N, 2) int32 (row, col),
    guaranteed in-bounds for a PSIZE slice by the caller. Returns float32."""
    return jax.vmap(
        lambda c: jax.lax.dynamic_slice(atlas, (c[0], c[1]), (PSIZE, PSIZE))
    )(corner).astype(jnp.float32)


def _make_gather_kernel(row_align: int):
    def _gather_kernel(cy_ref, cx_ref, atlas_ref, out_ref, scratch, sems):
        """Grid step i produces blocks [i*K, (i+1)*K). Double-buffered: step i
        issues the DMAs for step i+1 before waiting on its own.

        Corner rows/cols arrive as two 1-D scalar-prefetch arrays: a 2-D
        (N, 2) array would be lane-padded to (N, 256) int32 in SMEM and blow
        the 1 MB SMEM budget at multi-stream batch sizes."""
        i = pl.program_id(0)
        n = pl.num_programs(0)
        blk_r = scratch.shape[2]

        def dma(slot, step, k):
            kp = step * _K + k
            cy = pl.multiple_of(cy_ref[kp], row_align)
            cx = pl.multiple_of(cx_ref[kp], 128)
            return pltpu.make_async_copy(
                atlas_ref.at[pl.ds(cy, blk_r), pl.ds(cx, _BLK_C)],
                scratch.at[slot, k],
                sems.at[slot, k],
            )

        @pl.when(i == 0)
        def _():
            for k in range(_K):
                dma(0, 0, k).start()

        @pl.when(i + 1 < n)
        def _():
            for k in range(_K):
                dma((i + 1) % 2, i + 1, k).start()

        for k in range(_K):
            dma(i % 2, i, k).wait()
        out_ref[...] = scratch[i % 2]

    return _gather_kernel


def _gather_blocks(atlas: jnp.ndarray, corner0: jnp.ndarray, interpret: bool = False):
    """(N, BLK_R, 256) aligned blocks; corner0 is (N, 2) int32 with rows aligned
    to the dtype tile, cols % 128 == 0, and corner0 + block in-bounds."""
    n = corner0.shape[0]
    blk_r = _blk_r(atlas.dtype)
    n_pad = -n % _K
    if n_pad:
        corner0 = jnp.concatenate(
            [corner0, jnp.zeros((n_pad, 2), corner0.dtype)], axis=0
        )
    steps = corner0.shape[0] // _K

    out = pl.pallas_call(
        _make_gather_kernel(_row_align(atlas.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(
                (_K, blk_r, _BLK_C), lambda i, cy, cx: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _K, blk_r, _BLK_C), atlas.dtype),
                pltpu.SemaphoreType.DMA((2, _K)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((steps * _K, blk_r, _BLK_C), atlas.dtype),
        interpret=interpret,
    )(corner0[:, 0], corner0[:, 1], atlas)
    return out[:n]


def _unshift(blocks: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Extract the (PSIZE, PSIZE) window at residual offset (dy, dx) from each
    aligned block via one-hot selection matmuls (batched, MXU-friendly).

    For integer-valued uint8 blocks the one-hot products are exact in a
    single bf16 MXU pass (0..255 are representable and each output sums one
    nonzero term); float32 blocks use HIGHEST precision instead (default
    bf16 passes would round the gathered pixels by up to 0.5/255).
    """
    n, blk_r, _ = blocks.shape
    exact_bf16 = blocks.dtype == jnp.uint8
    mdtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if exact_bf16 else jax.lax.Precision.HIGHEST
    b = blocks.astype(mdtype)
    ri = jax.lax.broadcasted_iota(jnp.int32, (PSIZE, blk_r), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (PSIZE, blk_r), 1)
    R = (rj[None] == ri[None] + dy[:, None, None]).astype(mdtype)  # (N,47,BLK_R)
    ck = jax.lax.broadcasted_iota(jnp.int32, (_BLK_C, PSIZE), 0)
    cl = jax.lax.broadcasted_iota(jnp.int32, (_BLK_C, PSIZE), 1)
    C = (ck[None] == cl[None] + dx[:, None, None]).astype(mdtype)  # (N,256,47)
    rows = jax.lax.dot_general(
        R, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(mdtype)  # (N, 47, 256)
    return jax.lax.dot_general(
        rows, C, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (N, 47, 47) float32


def gather_patches_pallas(
    atlas: jnp.ndarray, corner: jnp.ndarray, interpret: bool = False
):
    """(N, PSIZE, PSIZE) float32 patches via aligned double-buffered DMA.

    atlas: (Ha, Wa) float32/bfloat16/uint8; corner: (N, 2) int32 patch
    origins with corner + PSIZE in-bounds. The atlas is zero-padded
    internally so every aligned block is in-bounds.
    """
    Ha, Wa = atlas.shape
    ra = _row_align(atlas.dtype)
    blk_r = _blk_r(atlas.dtype)
    cy0 = corner[:, 0] & ~(ra - 1)
    cx0 = corner[:, 1] & ~127
    dy = corner[:, 0] - cy0
    dx = corner[:, 1] - cx0
    # Aligned block bounds: max cy0 = (Ha - 47) rounded down to ra -> need
    # Ha_pad >= max cy0 + blk_r; max cx0 = Wa - 47 -> Wa_pad >= max cx0 + 256.
    pad_r = max(((Ha - PSIZE) & ~(ra - 1)) + blk_r - Ha, 0)
    pad_c = max(((Wa - PSIZE) & ~127) + _BLK_C - Wa, 0)
    if pad_r or pad_c:
        atlas = jnp.pad(atlas, ((0, pad_r), (0, pad_c)))
    blocks = _gather_blocks(
        atlas, jnp.stack([cy0, cx0], axis=-1).astype(jnp.int32), interpret=interpret
    )
    return _unshift(blocks, dy, dx)


@functools.cache
def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def gather_patches(atlas: jnp.ndarray, corner: jnp.ndarray) -> jnp.ndarray:
    """(N, PSIZE, PSIZE) float32 patches; Pallas DMA on TPU, XLA gather
    elsewhere."""
    if _use_pallas():
        return gather_patches_pallas(atlas, corner)
    return gather_patches_xla(atlas, corner)
