"""Convert the reference's DBoW2 text vocabulary (ORBvoc.txt) to tpuslam's
complete-tree npz format.

SURVEY.md flags the pre-trained k=10, L=6 vocabulary as a required artifact:
the reference loads it with TemplatedVocabulary::loadFromTextFile
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338), whose
format is:
    line 0:  k L scoring_type weighting_type
    line i:  parent_id is_leaf b0 b1 ... b31 weight
with node ids implicit (line order, root = 0) and children attached to the
parent in file order.

DBoW2 trees are INCOMPLETE: k-means nodes with < k elements have fewer
children, and leaves can occur above the bottom level. The complete-tree
layout used by tpuslam.place.vocabulary (child c of slot s at level l is
slot s*k+c) handles both via:
 - missing children -> centers_valid mask (never win the descent);
 - early leaves -> a single self-copied child chain down to the bottom
   level, so the leaf's word lands at a bottom slot like every other word.

The descriptor byte order follows cv::Mat row bytes; tpuslam packs 32 bytes
into 8 little-endian uint32 (bit i of byte b = pattern bit 8b+i).

NOTE: ORBvoc.txt was trained for OpenCV ORB's learned bit pattern
(ORBextractor.cc:196-464). tpuslam's own BRIEF pattern differs, so quantizing
tpuslam descriptors through a converted ORBvoc works mechanically (any
binary tree quantizes any 256-bit descriptors) but retraining with
tools/train_vocab.py on the target imagery scores better.

Usage: python tools/convert_orbvoc.py ORBvoc.txt out.npz
       (accepts .tar.gz transparently)
"""

import sys
import tarfile

import numpy as np


def parse_dbow2_text(lines):
    """Returns (k, L, nodes) with nodes[nid] = (parent, is_leaf, desc(8,u32),
    weight); root (id 0) is implicit and not in the dict."""
    header = lines[0].split()
    k, L = int(header[0]), int(header[1])
    nodes = {}
    nid = 0
    for line in lines[1:]:
        parts = line.split()
        if len(parts) < 35:
            continue
        nid += 1
        parent = int(parts[0])
        is_leaf = int(parts[1]) > 0
        byts = np.array([int(float(v)) for v in parts[2:34]], np.uint8)
        desc = np.frombuffer(byts.tobytes(), dtype="<u4").copy()
        weight = float(parts[34])
        nodes[nid] = (parent, is_leaf, desc, weight)
    return k, L, nodes


def build_complete_tree(k, L, nodes):
    """Map the parsed (possibly incomplete) tree into complete-tree arrays:
    (centers, centers_valid, word_weight)."""
    children = {}
    for nid, (parent, _, _, _) in nodes.items():
        children.setdefault(parent, []).append(nid)

    centers = [np.zeros((k ** (l + 1), 8), np.uint32) for l in range(L)]
    valid = [np.zeros((k ** (l + 1),), bool) for l in range(L)]
    word_weight = np.zeros((k**L,), np.float32)

    # BFS: (node_id or ("copy", desc, weight), level, slot)
    stack = [(0, -1, 0)]
    while stack:
        nid, lvl, slot = stack.pop()
        if isinstance(nid, tuple):  # early-leaf self-copy chain
            _, desc, weight = nid
            child_lvl = lvl + 1
            child_slot = slot * k
            centers[child_lvl][child_slot] = desc
            valid[child_lvl][child_slot] = True
            if child_lvl == L - 1:
                word_weight[child_slot] = weight
            else:
                stack.append((("copy", desc, weight), child_lvl, child_slot))
            continue
        for rank, cid in enumerate(children.get(nid, [])):
            assert rank < k, "node has more than k children"
            _, is_leaf, desc, weight = nodes[cid]
            child_lvl = lvl + 1
            child_slot = slot * k + rank
            centers[child_lvl][child_slot] = desc
            valid[child_lvl][child_slot] = True
            if child_lvl == L - 1:
                # Bottom level: every node here is a word.
                word_weight[child_slot] = weight
            elif is_leaf:
                stack.append((("copy", desc, weight), child_lvl, child_slot))
            else:
                stack.append((cid, child_lvl, child_slot))
    return centers, valid, word_weight


def convert(in_path: str, out_path: str):
    if in_path.endswith((".tar.gz", ".tgz")):
        with tarfile.open(in_path) as tf:
            member = next(m for m in tf.getmembers() if m.name.endswith(".txt"))
            lines = tf.extractfile(member).read().decode().splitlines()
    else:
        with open(in_path) as f:
            lines = f.read().splitlines()
    k, L, nodes = parse_dbow2_text(lines)
    print(f"parsed k={k} L={L}, {len(nodes)} nodes")
    centers, valid, word_weight = build_complete_tree(k, L, nodes)

    from tpuslam.place.vocabulary import Vocabulary
    import jax.numpy as jnp

    voc = Vocabulary(
        centers=tuple(jnp.asarray(c) for c in centers),
        word_weight=jnp.asarray(word_weight),
        k=k,
        levels=L,
        centers_valid=tuple(jnp.asarray(v) for v in valid),
    )
    voc.save(out_path)
    n_words = int(sum(valid[L - 1]))
    print(f"wrote {out_path}: {n_words} words in a k={k}^{L} complete tree")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
