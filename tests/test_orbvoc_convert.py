"""ORBvoc.txt (DBoW2 text format) conversion: incomplete trees and early
leaves must quantize identically to DBoW2's greedy descent."""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")

from convert_orbvoc import build_complete_tree, parse_dbow2_text  # noqa: E402

from tpuslam.place.vocabulary import Vocabulary, transform_words  # noqa: E402


def _desc_line(rng):
    byts = rng.integers(0, 256, 32)
    return byts, " ".join(str(int(b)) for b in byts)


def _make_dbow2_text(rng):
    """k=3, L=2 tree: root has 3 children; child A has 3 sub-words, child B
    has only 2 (incomplete), child C is an EARLY LEAF (word above bottom)."""
    lines = ["3 2 0 0"]
    descs = {}
    nid = 0

    def add(parent, is_leaf, weight):
        nonlocal nid
        nid += 1
        byts, s = _desc_line(rng)
        descs[nid] = np.frombuffer(byts.astype(np.uint8).tobytes(), "<u4").copy()
        lines.append(f"{parent} {int(is_leaf)} {s} {weight}")
        return nid

    a = add(0, False, 0.0)
    b = add(0, False, 0.0)
    c = add(0, True, 0.7)  # early leaf
    for _ in range(3):
        add(a, True, 0.5)
    for _ in range(2):  # incomplete: only 2 of 3 children
        add(b, True, 0.3)
    return lines, descs


def _dbow2_descent(lines, query):
    """Reference semantics: greedy nearest-child descent on the parsed tree."""
    k, L, nodes = parse_dbow2_text(lines)
    children = {}
    for nid, (parent, _, _, _) in nodes.items():
        children.setdefault(parent, []).append(nid)

    def ham(a, b):
        return bin(int.from_bytes(np.asarray(a).tobytes(), "little")
                   ^ int.from_bytes(np.asarray(b).tobytes(), "little")).count("1")

    node = 0
    while children.get(node):
        node = min(children[node], key=lambda c: ham(nodes[c][2], query))
    return node


def test_converted_tree_matches_dbow2_descent(rng):
    lines, descs = _make_dbow2_text(rng)
    k, L, nodes = parse_dbow2_text(lines)
    assert k == 3 and L == 2 and len(nodes) == 8
    centers, valid, ww = build_complete_tree(k, L, nodes)
    voc = Vocabulary(
        centers=tuple(jnp.asarray(c) for c in centers),
        word_weight=jnp.asarray(ww),
        k=k,
        levels=L,
        centers_valid=tuple(jnp.asarray(v) for v in valid),
    )
    # Query with each node's own descriptor plus random ones.
    queries = [d for d in descs.values()] + [
        np.frombuffer(rng.integers(0, 256, 32).astype(np.uint8).tobytes(), "<u4").copy()
        for _ in range(20)
    ]
    q = jnp.asarray(np.stack(queries).astype(np.uint32))
    words = np.asarray(transform_words(voc, q, jnp.ones(len(queries), bool)))
    for i, query in enumerate(queries):
        ref_node = _dbow2_descent(lines, query)
        ref_desc = parse_dbow2_text(lines)[2][ref_node][2]
        # The converted word slot must hold the same leaf descriptor (slot
        # numbering differs by construction; identity is by content).
        w = words[i]
        lvl = voc.levels - 1
        got = np.asarray(voc.centers[lvl][w])
        np.testing.assert_array_equal(got, ref_desc)
        assert bool(voc.centers_valid[lvl][w])
    # Early leaf c must own a bottom-level word with its weight.
    c_desc = descs[3]
    qc = jnp.asarray(c_desc[None].astype(np.uint32))
    wc = int(transform_words(voc, qc, jnp.ones(1, bool))[0])
    assert abs(float(voc.word_weight[wc]) - 0.7) < 1e-6


def test_real_refvoc_file(rng):
    """Round-trip against an ACTUAL DBoW2 text file emitted by the
    reference's own code (tools/refbench refvoc = DBoW2::create +
    saveToTextFile, k=10 L=4): converted tree must quantize identically to
    DBoW2's greedy descent (VERDICT r3 item 5)."""
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "refbench", "build", "synthetic_voc.txt",
    )
    if not os.path.exists(path):
        pytest.skip("refvoc artifact not built")
    lines = open(path).read().splitlines()
    k, L, nodes = parse_dbow2_text(lines)
    # The refbench artifact is regenerated at different scales
    # (tools/build_default_vocab.py --scale); accept any sane tree.
    assert k == 10 and 3 <= L <= 6
    centers, valid, ww = build_complete_tree(k, L, nodes)
    voc = Vocabulary(
        centers=tuple(jnp.asarray(c) for c in centers),
        word_weight=jnp.asarray(ww),
        k=k,
        levels=L,
        centers_valid=tuple(jnp.asarray(v) for v in valid),
    )
    # Random queries + real leaf descriptors from the file.
    leaf_descs = [d for _, (p, is_leaf, d, w) in list(nodes.items())[:2000]
                  if is_leaf][:15]
    queries = leaf_descs + [
        np.frombuffer(
            rng.integers(0, 256, 32).astype(np.uint8).tobytes(), "<u4"
        ).copy()
        for _ in range(15)
    ]
    q = jnp.asarray(np.stack(queries).astype(np.uint32))
    words = np.asarray(transform_words(voc, q, jnp.ones(len(queries), bool)))
    lvl = voc.levels - 1
    for i, query in enumerate(queries):
        ref_node = _dbow2_descent(lines, query)
        ref_desc = nodes[ref_node][2]
        got = np.asarray(voc.centers[lvl][words[i]])
        np.testing.assert_array_equal(got, ref_desc)
