"""Place recognition: binary-descriptor vocabulary tree + BoW database.

The TPU-native counterpart of the vendored DBoW2
(/root/reference/Thirdparty/DBoW2): the hierarchical k-means tree over
256-bit descriptors becomes per-level center tables descended with batched
Hamming argmins; BoW vectors are dense TF-IDF arrays over the leaf words
(sparse maps in the reference — dense is the vectorizable form at our word
counts); the inverted-file keyframe database becomes one (K, W) matrix whose
query is a single masked reduction.

The reference ships a pre-trained 1M-word vocabulary
(Vocabulary/ORBvoc.txt, stripped from the mirror — SURVEY.md preamble); it
would not match our descriptor pattern anyway, so vocabularies are trained
with train_vocabulary() on descriptors from the target domain.
"""

from tpuslam.place.vocabulary import Vocabulary, train_vocabulary
from tpuslam.place.database import KeyFrameDatabase, l1_score
