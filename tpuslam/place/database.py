"""Keyframe BoW database: vectorized loop / relocalization candidates.

Array re-design of the reference's KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc): instead of a word->keyframe
inverted file walked per query word, the database is a dense (K, W) BoW
matrix. A query is one similarity reduction over all keyframes, and the
reference's candidate logic maps onto vectorized form:

- shared-word counts (the inverted-file accumulation, :96-128) =
  one (bool) inner product;
- the 0.8 x maxCommonWords word filter (:135-145);
- the minScore gate from the query's covisible neighbors (:124-138 of
  LoopClosing::DetectLoop feeding :149 here);
- covisibility-group score accumulation + 0.75 x bestAccScore retention
  (:150-197) using the covisibility weights matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_score(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity for L1-normalized vectors: s = sum min(v, w)
    (equivalent to 1 - 0.5 |v - w|_1; ScoringObject.cpp:23-60).

    v: (..., W), w: (..., W) -> (...,)."""
    return jnp.sum(jnp.minimum(v, w), axis=-1)


class KeyFrameDatabase:
    """Dense BoW store aligned with MapState keyframe slots."""

    def __init__(self, n_words: int, max_keyframes: int):
        self.bow = jnp.zeros((max_keyframes, n_words))
        self.has = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_idx: int, bow_vec: jnp.ndarray):
        self.bow = self.bow.at[kf_idx].set(bow_vec)
        self.has = self.has.at[kf_idx].set(True)

    def erase(self, kf_idx: int):
        self.has = self.has.at[kf_idx].set(False)

    def query(
        self,
        bow_vec: jnp.ndarray,
        exclude: jnp.ndarray,
        covis_weights: jnp.ndarray,
        min_score: float,
        max_candidates: int = 8,
    ):
        """Loop/reloc candidates for a query BoW vector.

        exclude: (K,) bool — the query KF and its covisible set
        (DetectLoopCandidates excludes connected KFs, :104-110).
        covis_weights: (K, K) covisibility weights for group accumulation.
        Returns (cand_idx (max_candidates,), cand_ok (max_candidates,)).
        """
        K = self.bow.shape[0]
        eligible = self.has & ~exclude

        # Shared-word gate: count common words, keep > 0.8 x max.
        q_has = bow_vec > 0
        common = jnp.sum((self.bow > 0) & q_has[None, :], axis=-1)
        common = jnp.where(eligible, common, 0)
        max_common = jnp.max(common)
        word_ok = common > 0.8 * max_common

        scores = l1_score(self.bow, bow_vec[None, :])
        scores = jnp.where(eligible & word_ok & (scores >= min_score), scores, 0.0)

        # Covisibility-group accumulation: each candidate's score becomes the
        # sum over its top covisible neighbors that are also candidates; the
        # group's best member represents it (:150-190).
        covis = (covis_weights > 0).astype(jnp.float32)
        group = covis * (scores > 0)[None, :]
        acc = scores + jnp.sum(group * scores[None, :], axis=-1)
        acc = jnp.where(scores > 0, acc, 0.0)
        best_acc = jnp.max(acc)
        keep = acc > 0.75 * best_acc  # :190-196
        final = jnp.where(keep, scores, 0.0)

        idx = jnp.argsort(-final)[:max_candidates]
        ok = final[idx] > 0.0
        return idx, ok
