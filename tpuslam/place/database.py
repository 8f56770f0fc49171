"""Keyframe BoW database: vectorized loop / relocalization candidates.

Array re-design of the reference's KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc): instead of a word->keyframe
inverted file walked per query word, the database holds per-keyframe BoW
vectors and a query is one similarity reduction over all keyframes. The
reference's candidate logic maps onto vectorized form:

- shared-word counts (the inverted-file accumulation, :96-128) =
  one (bool) inner product;
- the 0.8 x maxCommonWords word filter (:135-145);
- the minScore gate from the query's covisible neighbors (:124-138 of
  LoopClosing::DetectLoop feeding :149 here);
- covisibility-group score accumulation + 0.75 x bestAccScore retention
  (:150-197) using the covisibility weights matrix.

Two layouts with identical query semantics:

- `KeyFrameDatabase`: dense (K, W) matrix — simplest, fine for small
  vocabularies (W <= ~64k).
- `SparseKeyFrameDatabase`: per-KF word-id/weight lists (K, L) with
  L = keypoint capacity. A keyframe touches at most L distinct words, so
  this is EXACT, and memory is O(K·L) independent of W — the reason the
  reference keeps an inverted file (KeyFrameDatabase.h:66): a 1M-word
  ORBvoc (k=10, L=6) would need 600 MB dense but ~2 MB here. The query
  scatters the query BoW into one dense (W,) vector (4 MB at 1M words)
  and gathers it at every keyframe's words — a (K, L) gather instead of
  a (K, W) product.
"""

from __future__ import annotations

from typing import NamedTuple

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
        eligible = self.has & ~exclude

        # Shared-word gate: count common words, keep > 0.8 x max.
        q_has = bow_vec > 0
        common = jnp.sum((self.bow > 0) & q_has[None, :], axis=-1)
        scores = l1_score(self.bow, bow_vec[None, :])
        return _candidates_from_scores(
            eligible, common, scores, covis_weights, min_score, max_candidates
        )


def _candidates_from_scores(
    eligible, common, scores, covis_weights, min_score, max_candidates
):
    """Shared candidate logic (word filter -> min-score gate -> covisibility
    group accumulation -> 0.75 retention) over per-keyframe raw scores."""
    common = jnp.where(eligible, common, 0)
    max_common = jnp.max(common)
    word_ok = common > 0.8 * max_common

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


class SparseBow(NamedTuple):
    """L1-normalized TF-IDF BoW in sparse form: word ids (-1 padding) and
    their weights (0 padding). Built by vocabulary.sparse_bow_vector."""

    words: jnp.ndarray   # (L,) int32
    weight: jnp.ndarray  # (L,) float32

    def densify(self, n_words: int) -> jnp.ndarray:
        """Scatter into a dense (W,) vector (word ids are unique)."""
        tgt = jnp.where(self.words >= 0, self.words, n_words)
        return jnp.zeros((n_words + 1,)).at[tgt].set(self.weight)[:n_words]


def l1_score_sparse(a: SparseBow, b_dense: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of a sparse vector against a densified one:
    min(v, w) is nonzero only on a's support, so one gather suffices."""
    bw = b_dense[jnp.maximum(a.words, 0)] * (a.words >= 0)
    return jnp.sum(jnp.minimum(a.weight, bw))


class SparseKeyFrameDatabase:
    """Word-list BoW store aligned with MapState keyframe slots; exact
    equivalent of KeyFrameDatabase at O(K·L) memory (see module docstring)."""

    def __init__(self, n_words: int, max_keyframes: int, words_per_kf: int):
        self.n_words = n_words
        self.words = jnp.full((max_keyframes, words_per_kf), -1, jnp.int32)
        self.weight = jnp.zeros((max_keyframes, words_per_kf))
        self.has = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_idx: int, bow: SparseBow):
        L = self.words.shape[1]
        assert bow.words.shape[0] == L, "SparseBow capacity mismatch"
        self.words = self.words.at[kf_idx].set(bow.words)
        self.weight = self.weight.at[kf_idx].set(bow.weight)
        self.has = self.has.at[kf_idx].set(True)

    def erase(self, kf_idx: int):
        self.has = self.has.at[kf_idx].set(False)

    def query(
        self,
        bow: SparseBow,
        exclude: jnp.ndarray,
        covis_weights: jnp.ndarray,
        min_score: float,
        max_candidates: int = 8,
    ):
        """Same candidate semantics as KeyFrameDatabase.query, computed via
        one dense query scatter + a (K, L) gather."""
        q = bow.densify(self.n_words)                        # (W,)
        kw = q[jnp.maximum(self.words, 0)] * (self.words >= 0)  # (K, L)
        eligible = self.has & ~exclude
        common = jnp.sum((self.weight > 0) & (kw > 0), axis=-1)
        scores = jnp.sum(jnp.minimum(self.weight, kw), axis=-1)
        return _candidates_from_scores(
            eligible, common, scores, covis_weights, min_score, max_candidates
        )
