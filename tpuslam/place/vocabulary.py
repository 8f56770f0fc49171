"""Hierarchical binary vocabulary: k-majority tree, batched transform.

Array re-design of DBoW2's TemplatedVocabulary
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h): the k-branch
L-level tree over 256-bit descriptors is stored as one center table per
level (level l holds k^(l+1) centers, children of node n at contiguous ids
n*k..n*k+k-1), so transform() — the greedy nearest-child descent of
TemplatedVocabulary.h:1218-1259 — becomes L batched Hamming argmins over
all query descriptors at once. Cluster centers are bitwise majority votes
(FORB::meanValue, /root/reference/Thirdparty/DBoW2/DBoW2/FORB.cpp:40-77)
and training is k-majority (binary k-means) per node, vectorized over all
nodes of a level simultaneously.

Words are weighted by IDF over the training corpus (TemplatedVocabulary's
TF_IDF default, :1082-1103); BoW vectors are L1-normalized dense arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """centers[l]: (k^(l+1), 8) uint32 for level l; word_weight: (k^L,).

    centers_valid marks which child slots exist: trees trained here are
    complete (all None), but DBoW2 trees converted from the reference's
    ORBvoc.txt format (tools/convert_orbvoc.py) have nodes with fewer than
    k children and early leaves — invalid slots never win the descent."""

    centers: tuple           # tuple of jnp arrays, one per level
    word_weight: jnp.ndarray # (W,) float32 IDF weights
    k: int
    levels: int
    centers_valid: tuple | None = None  # per level (k^(l+1),) bool, or None

    @property
    def n_words(self) -> int:
        return self.k**self.levels

    def save(self, path: str):
        data = {f"centers_{i}": np.asarray(c) for i, c in enumerate(self.centers)}
        data["word_weight"] = np.asarray(self.word_weight)
        data["k"] = self.k
        data["levels"] = self.levels
        if self.centers_valid is not None:
            for i, v in enumerate(self.centers_valid):
                data[f"centers_valid_{i}"] = np.asarray(v)
        np.savez_compressed(path, **data)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        levels = int(z["levels"])
        valid = None
        if "centers_valid_0" in z.files:
            valid = tuple(jnp.asarray(z[f"centers_valid_{i}"]) for i in range(levels))
        return Vocabulary(
            centers=tuple(jnp.asarray(z[f"centers_{i}"]) for i in range(levels)),
            word_weight=jnp.asarray(z["word_weight"]),
            k=int(z["k"]),
            levels=levels,
            centers_valid=valid,
        )


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint16)


def _popcount_matrix(a: np.ndarray, b: np.ndarray, chunk: int = 1 << 15) -> np.ndarray:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int Hamming, numpy (training).

    Chunked byte-LUT popcount: O(Na*Nb*32) byte lookups with bounded
    temporaries, so it stays usable at the multi-million-descriptor
    corpus sizes a DBoW2-scale (k=10, L=6) vocabulary needs."""
    a = np.ascontiguousarray(a, np.uint32)
    b = np.ascontiguousarray(b, np.uint32)
    bb = b.view(np.uint8).reshape(len(b), 32)
    out = np.empty((len(a), len(b)), np.uint16)
    for s in range(0, len(a), chunk):
        x = a[s : s + chunk].view(np.uint8).reshape(-1, 1, 32) ^ bb[None]
        out[s : s + chunk] = _POP8[x].sum(axis=-1, dtype=np.uint16)
    return out


def _majority_center(desc: np.ndarray) -> np.ndarray:
    """Bitwise majority of (N, 8) uint32 descriptors (FORB::meanValue)."""
    if len(desc) == 0:
        return np.zeros(8, np.uint32)
    bits = np.unpackbits(desc.view(np.uint8), axis=-1)  # (N, 256)
    maj = (bits.sum(axis=0) * 2 >= len(desc)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def train_vocabulary(
    descriptors: np.ndarray,
    k: int = 10,
    levels: int = 4,
    iters: int = 8,
    seed: int = 0,
    sample_cap: int = 50_000,
    verbose: bool = False,
) -> Vocabulary:
    """Train a k^levels-word vocabulary with per-node k-majority clustering.

    descriptors: (N, 8) uint32. Node order follows the contiguous-children
    layout; empty nodes inherit their parent's center so descent stays
    well-defined.

    Scales to DBoW2-size trees (k=10, L=6 = 1M words over multi-million
    descriptor corpora, TemplatedVocabulary.h:1338): per-node groups come
    from one stable argsort per level (not an O(N) scan per node), and
    nodes holding more than `sample_cap` descriptors run k-means on a
    random subsample before assigning the full set (standard hierarchical
    k-means practice; exact behavior is unchanged for nodes under the cap).
    """
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, np.uint32)
    assignments = np.zeros(len(desc), np.int64)  # node id at current level
    centers_per_level = []

    for lvl in range(levels):
        n_parents = k**lvl
        n_nodes = k ** (lvl + 1)
        centers = np.zeros((n_nodes, 8), np.uint32)
        new_assign = np.zeros_like(assignments)
        # One stable sort gives every node's member list (ascending
        # indices, same contents np.nonzero(assignments == p) would give).
        order = np.argsort(assignments, kind="stable")
        bounds = np.searchsorted(assignments[order], np.arange(n_parents + 1))
        t_lvl = None
        if verbose:
            import time as _time

            t_lvl = _time.perf_counter()
        for p in range(n_parents):
            sel = order[bounds[p] : bounds[p + 1]]
            if len(sel) == 0:
                # Empty subtree: copy parent's center into all children.
                parent_center = (
                    centers_per_level[lvl - 1][p] if lvl > 0 else np.zeros(8, np.uint32)
                )
                centers[p * k : (p + 1) * k] = parent_center
                continue
            d = desc[sel]
            dk = d
            if len(d) > sample_cap:
                dk = d[rng.choice(len(d), sample_cap, replace=False)]
            # Init: k distinct random picks (k-majority / binary k-means).
            n_init = min(k, len(dk))
            picks = rng.choice(len(dk), n_init, replace=False)
            c = dk[picks].copy()
            for _ in range(iters):
                dist = _popcount_matrix(dk, c)
                a = dist.argmin(axis=1)
                newc = np.stack([_majority_center(dk[a == j]) if np.any(a == j) else c[j] for j in range(n_init)])
                if np.array_equal(newc, c):
                    break
                c = newc
            full = np.zeros((k, 8), np.uint32)
            full[:n_init] = c
            if n_init < k:
                full[n_init:] = c[0]
            centers[p * k : (p + 1) * k] = full
            dist = _popcount_matrix(d, full)
            new_assign[sel] = p * k + dist.argmin(axis=1)
        centers_per_level.append(centers)
        assignments = new_assign
        if verbose:
            import time as _time

            print(
                f"  vocab level {lvl + 1}/{levels}: {n_nodes} nodes, "
                f"{_time.perf_counter() - t_lvl:.1f}s",
                flush=True,
            )

    # IDF weights over the training corpus treated as one document set: the
    # reference computes IDF from per-image occurrence; with a flat corpus we
    # use the standard smoothed IDF over descriptor counts.
    W = k**levels
    counts = np.bincount(assignments, minlength=W).astype(np.float64)
    idf = np.log(len(desc) / np.maximum(counts, 1.0))
    idf[counts == 0] = 0.0
    return Vocabulary(
        centers=tuple(jnp.asarray(c) for c in centers_per_level),
        word_weight=jnp.asarray(idf.astype(np.float32)),
        k=k,
        levels=levels,
    )


def transform_words(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Descriptors (N, 8) -> word ids (N,) int32 (-1 for invalid rows).

    Greedy nearest-child descent, batched over all descriptors: at level l,
    each descriptor compares against its current node's k children with one
    gathered Hamming reduction.
    """
    n = desc.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for lvl in range(voc.levels):
        child_ids = node[:, None] * voc.k + jnp.arange(voc.k, dtype=jnp.int32)[None, :]
        cent = voc.centers[lvl][child_ids]  # (N, k, 8)
        d = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(cent, desc[:, None, :])), axis=-1
        )
        if voc.centers_valid is not None:
            # Converted DBoW2 trees: missing child slots never win.
            d = jnp.where(voc.centers_valid[lvl][child_ids], d, 1 << 14)
        node = child_ids[jnp.arange(n), jnp.argmin(d, axis=1)]
    return jnp.where(valid, node, -1)


def bow_vector(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Dense L1-normalized TF-IDF BoW vector (W,) for one descriptor set."""
    words = transform_words(voc, desc, valid)
    W = voc.n_words
    safe = jnp.where(words >= 0, words, W)
    v = jnp.zeros((W + 1,)).at[safe].add(jnp.where(valid, 1.0, 0.0))[:W]
    v = v * voc.word_weight
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def sparse_bow_vector(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Sparse L1-normalized TF-IDF BoW: (words (N,), weight (N,)) with -1/0
    padding, N = keypoint capacity.

    A frame touches at most N distinct words, so the sparse form is exact —
    this is what lets a DBoW2-scale vocabulary (k=10, L=6 ≈ 1M words,
    TemplatedVocabulary.h:1338) fit: per-KF cost is O(N), independent of W.
    Distinct words are compacted by sort + boundary detection (no dynamic
    shapes), TF accumulated by segment scatter-add.
    """
    from tpuslam.place.database import SparseBow

    N = desc.shape[0]
    words = transform_words(voc, desc, valid)
    BIG = jnp.int32(1 << 30)
    w = jnp.where(valid & (words >= 0), words, BIG)
    ws = jnp.sort(w)
    live = ws < BIG
    first = jnp.concatenate([live[:1], live[1:] & (ws[1:] != ws[:-1])])
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1      # compact slot per elem
    gid = jnp.where(live, gid, N)                       # padding -> overflow
    tf = jnp.zeros((N + 1,)).at[gid].add(1.0)[:N]
    uw = jnp.full((N + 1,), -1, jnp.int32).at[gid].set(ws.astype(jnp.int32))[:N]
    weight = tf * voc.word_weight[jnp.maximum(uw, 0)] * (uw >= 0)
    weight = weight / jnp.maximum(jnp.sum(weight), 1e-9)
    return SparseBow(words=uw, weight=weight)
