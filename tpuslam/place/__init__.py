"""Place recognition: binary-descriptor vocabulary tree + BoW database.

The TPU-native counterpart of the vendored DBoW2
(/root/reference/Thirdparty/DBoW2): the hierarchical k-means tree over
256-bit descriptors becomes per-level center tables descended with batched
Hamming argmins; BoW vectors are TF-IDF arrays over the leaf words (dense
(W,) for small vocabularies, sparse word-id/weight lists for DBoW2-scale
ones); the inverted-file keyframe database becomes one matrix whose query
is a single masked reduction — dense (K, W) or sparse (K, L) word lists
(the layout that fits a converted 1M-word ORBvoc; KeyFrameDatabase.h:66).

The reference ships a pre-trained 1M-word vocabulary
(Vocabulary/ORBvoc.txt, stripped from the mirror — SURVEY.md preamble); it
would not match our descriptor pattern anyway, so vocabularies are trained
with train_vocabulary() on descriptors from the target domain.
"""

from tpuslam.place.vocabulary import (
    Vocabulary,
    sparse_bow_vector,
    train_vocabulary,
)
from tpuslam.place.database import (
    KeyFrameDatabase,
    SparseBow,
    SparseKeyFrameDatabase,
    l1_score,
    l1_score_sparse,
)
