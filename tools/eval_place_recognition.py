"""Measure place-recognition quality of a vocabulary at 500+ keyframes.

Protocol (tests/test_place_scale.py runs the same via library calls):
enroll view A of each held-out place (tpuslam/data/place_eval.npz) into the
sparse keyframe database; query view B of every place through the full
DetectLoop-style candidate machinery (word-count filter 0.8x max, score
accumulation — place/database.py); report recall@1 / recall@5 and the
mean true/false score margin.

Usage: python tools/eval_place_recognition.py [voc.npz] [eval.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def evaluate(voc_path, eval_path, max_places=None, verbose=True):
    import jax.numpy as jnp

    from tpuslam.place.database import SparseKeyFrameDatabase, l1_score_sparse
    from tpuslam.place.vocabulary import Vocabulary, sparse_bow_vector

    voc = Vocabulary.load(voc_path)
    z = np.load(eval_path)
    va, vb = z["view_a"], z["view_b"]
    ca, cb = z["count_a"], z["count_b"]
    n = len(va) if max_places is None else min(max_places, len(va))
    F = va.shape[1]

    def bow(desc, count):
        valid = jnp.arange(F) < int(count)
        return sparse_bow_vector(voc, jnp.asarray(desc), valid)

    db = SparseKeyFrameDatabase(voc.n_words, n, F)
    bows_a = []
    for i in range(n):
        v = bow(va[i], ca[i])
        bows_a.append(v)
        db.add(i, v)

    covis = jnp.zeros((n, n))
    exclude = jnp.zeros((n,), bool)
    hits1 = hits5 = 0
    margins = []
    for i in range(n):
        q = bow(vb[i], cb[i])
        idx, ok = db.query(q, exclude, covis, min_score=0.0, max_candidates=5)
        idx = np.asarray(idx)[np.asarray(ok)]
        if len(idx) and idx[0] == i:
            hits1 += 1
        if i in set(idx.tolist()):
            hits5 += 1
        # Score margin: true place vs best impostor (direct L1 scores).
        s_true = float(l1_score_sparse(q, bows_a[i].densify(voc.n_words)))
        s_best_wrong = 0.0
        for j in idx[:3]:
            if j != i:
                s_best_wrong = max(
                    s_best_wrong,
                    float(l1_score_sparse(q, bows_a[int(j)].densify(voc.n_words))),
                )
        margins.append(s_true - s_best_wrong)
        if verbose and i % 50 == 0:
            print(f"  {i}/{n} r@1={hits1 / (i + 1):.3f}", flush=True)
    out = {
        "n_places": n,
        "recall_at_1": hits1 / n,
        "recall_at_5": hits5 / n,
        "mean_margin": float(np.mean(margins)),
        "n_words": voc.n_words,
    }
    return out


def main():
    voc = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "tpuslam", "data", "default_vocab.npz")
    ev = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "tpuslam", "data", "place_eval.npz")
    print(evaluate(voc, ev))


if __name__ == "__main__":
    main()
