"""Place recognition at scale (VERDICT r2 item 3): the shipped 100k-word
vocabulary must discriminate hundreds of distinct places through the full
DetectLoop-style candidate machinery (word-count filter, score
accumulation — /root/reference/src/KeyFrameDatabase.cc:76-197 semantics on
the sparse database layout).

Artifacts: tpuslam/data/default_vocab.npz (tools/build_default_vocab.py,
k=10 L=5) and tpuslam/data/place_eval.npz (held-out scenes: 2 views per
place; view A enrolled, view B queried)."""

import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOC = os.path.join(ROOT, "tpuslam", "data", "default_vocab.npz")
EVAL = os.path.join(ROOT, "tpuslam", "data", "place_eval.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(VOC) and os.path.exists(EVAL)),
    reason="vocabulary artifacts not built",
)


def test_default_vocab_is_large():
    from tpuslam.place.vocabulary import Vocabulary

    voc = Vocabulary.load(VOC)
    assert voc.n_words >= 100_000


def test_recall_at_scale():
    """Recall@1 over 200+ enrolled places (the 500-KF regime where a small
    vocabulary's L1 scores saturate); margins must stay positive."""
    from tools.eval_place_recognition import evaluate

    res = evaluate(VOC, EVAL, max_places=220, verbose=False)
    assert res["n_places"] >= 200
    assert res["recall_at_1"] >= 0.85, res
    assert res["recall_at_5"] >= 0.92, res
    assert res["mean_margin"] > 0.0, res
