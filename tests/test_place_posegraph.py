"""Tests for place recognition (vocabulary / BoW database) and the Sim3
pose-graph optimizer."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.geometry import so3_exp
from tpuslam.geometry.sim3 import sim3_compose, sim3_inverse
from tpuslam.place import Vocabulary, train_vocabulary, KeyFrameDatabase, l1_score
from tpuslam.place.vocabulary import transform_words, bow_vector
from tpuslam.optim.pose_graph import Sim3Edges, make_relative, optimize_pose_graph


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def corrupt(rng, desc, nbits):
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.integers(0, 256, nbits):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestVocabulary:
    def test_train_and_transform(self, rng):
        desc = rand_desc(rng, 2000)
        voc = train_vocabulary(desc, k=6, levels=3, seed=1)
        assert voc.n_words == 216
        words = np.asarray(
            transform_words(voc, jnp.asarray(desc[:100]), jnp.ones(100, bool))
        )
        assert words.min() >= 0 and words.max() < 216

    def test_similar_descriptors_same_word(self, rng):
        desc = rand_desc(rng, 2000)
        voc = train_vocabulary(desc, k=6, levels=3, seed=1)
        a = desc[:200]
        b = corrupt(rng, a, 8)  # ~8 bits of noise on 256
        wa = np.asarray(transform_words(voc, jnp.asarray(a), jnp.ones(200, bool)))
        wb = np.asarray(transform_words(voc, jnp.asarray(b), jnp.ones(200, bool)))
        # Most slightly-corrupted descriptors should land on the same word.
        assert (wa == wb).mean() > 0.6

    def test_bow_similarity_discriminates(self, rng):
        corpus = rand_desc(rng, 3000)
        voc = train_vocabulary(corpus, k=6, levels=3, seed=2)
        img_a = rand_desc(rng, 300)
        img_a2 = corrupt(rng, img_a, 6)  # same place, slight noise
        img_b = rand_desc(rng, 300)     # different place
        va = bow_vector(voc, jnp.asarray(img_a), jnp.ones(300, bool))
        va2 = bow_vector(voc, jnp.asarray(img_a2), jnp.ones(300, bool))
        vb = bow_vector(voc, jnp.asarray(img_b), jnp.ones(300, bool))
        s_same = float(l1_score(va, va2))
        s_diff = float(l1_score(va, vb))
        # Uniform-random descriptors give a high similarity floor (real ORB
        # descriptors cluster far more); require a clear margin, and repeat
        # against several impostors.
        assert s_same > s_diff + 0.1, (s_same, s_diff)
        for _ in range(3):
            vb = bow_vector(voc, jnp.asarray(rand_desc(rng, 300)), jnp.ones(300, bool))
            assert s_same > float(l1_score(va, vb)) + 0.08

    def test_save_load_roundtrip(self, rng, tmp_path):
        desc = rand_desc(rng, 500)
        voc = train_vocabulary(desc, k=4, levels=2, seed=0)
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = Vocabulary.load(p)
        w1 = np.asarray(transform_words(voc, jnp.asarray(desc[:50]), jnp.ones(50, bool)))
        w2 = np.asarray(transform_words(voc2, jnp.asarray(desc[:50]), jnp.ones(50, bool)))
        np.testing.assert_array_equal(w1, w2)


class TestDatabase:
    def test_query_finds_revisit(self, rng):
        corpus = rand_desc(rng, 3000)
        voc = train_vocabulary(corpus, k=6, levels=3, seed=3)
        K = 12
        db = KeyFrameDatabase(voc.n_words, K)
        descs = [rand_desc(rng, 250) for _ in range(10)]
        for k in range(10):
            db.add(k, bow_vector(voc, jnp.asarray(descs[k]), jnp.ones(250, bool)))
        # Query: a noisy revisit of keyframe 2.
        q = bow_vector(voc, jnp.asarray(corrupt(rng, descs[2], 6)), jnp.ones(250, bool))
        exclude = np.zeros(K, bool)
        exclude[9] = True  # pretend 9 is the current KF's neighborhood
        covis = jnp.zeros((K, K))
        idx, ok = db.query(q, jnp.asarray(exclude), covis, min_score=0.0)
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok[0]
        assert idx[0] == 2

    def test_exclusion(self, rng):
        corpus = rand_desc(rng, 2000)
        voc = train_vocabulary(corpus, k=6, levels=3, seed=4)
        K = 6
        db = KeyFrameDatabase(voc.n_words, K)
        d = rand_desc(rng, 200)
        v = bow_vector(voc, jnp.asarray(d), jnp.ones(200, bool))
        db.add(0, v)
        exclude = np.ones(K, bool)  # exclude everything
        idx, ok = db.query(v, jnp.asarray(exclude), jnp.zeros((K, K)), 0.0)
        assert not np.any(np.asarray(ok))


def _compose_chain(rels):
    """Absolute poses from relative steps: S_kw = rel_{k-1} * S_{k-1,w}."""
    s = [jnp.asarray(1.0)]
    R = [jnp.eye(3)]
    t = [jnp.zeros(3)]
    for sr, Rr, tr in rels:
        sn, Rn, tn = sim3_compose(sr, Rr, tr, s[-1], R[-1], t[-1])
        s.append(sn)
        R.append(Rn)
        t.append(tn)
    return jnp.stack(s), jnp.stack(R), jnp.stack(t)


class TestPoseGraph:
    def test_loop_drift_correction(self, rng):
        """Classic drifted loop: odometry accumulates error around a square;
        a loop-closure edge ties the last node back to the first. The pose
        graph must distribute the error (endpoint near the loop constraint)."""
        K = 12
        # Ground-truth relative motions around a loop.
        rels_gt = []
        for k in range(K - 1):
            w = np.array([0.0, 2 * np.pi / (K - 1), 0.0], np.float32)
            Rr = so3_exp(jnp.asarray(w))
            tr = jnp.asarray(np.array([0.5, 0, 0], np.float32))
            rels_gt.append((jnp.asarray(1.0), Rr, tr))
        s_gt, R_gt, t_gt = _compose_chain(rels_gt)

        # Drifted odometry: small per-step bias.
        rels_n = []
        for k in range(K - 1):
            w = np.array([0.004, 2 * np.pi / (K - 1) + 0.01, -0.003], np.float32)
            Rr = so3_exp(jnp.asarray(w))
            tr = jnp.asarray(np.array([0.52, 0.01, -0.01], np.float32))
            rels_n.append((jnp.asarray(1.0), Rr, tr))
        s0, R0, t0 = _compose_chain(rels_n)

        # Edges: odometry chain with the DRIFTED measurements (consistent
        # with initial estimates -> zero residual there), plus one loop edge
        # with the TRUE relative pose (last -> first).
        ei, ej, ms, mR, mt, val, wgt = [], [], [], [], [], [], []
        for k in range(K - 1):
            sr, Rr, tr = make_relative(
                s0[k], R0[k], t0[k], s0[k + 1], R0[k + 1], t0[k + 1]
            )
            ei.append(k)
            ej.append(k + 1)
            ms.append(sr)
            mR.append(Rr)
            mt.append(tr)
            val.append(True)
            wgt.append(1.0)
        # Loop edge: true relative between node K-1 and node 0 (they should
        # coincide with node 0 modulo the gt loop: S_{0,K-1} from gt).
        sr, Rr, tr = make_relative(
            s_gt[K - 1], R_gt[K - 1], t_gt[K - 1], s_gt[0], R_gt[0], t_gt[0]
        )
        ei.append(K - 1)
        ej.append(0)
        ms.append(sr)
        mR.append(Rr)
        mt.append(tr)
        val.append(True)
        wgt.append(1.0)

        edges = Sim3Edges(
            i=jnp.asarray(np.array(ei, np.int32)),
            j=jnp.asarray(np.array(ej, np.int32)),
            meas_s=jnp.stack(ms),
            meas_R=jnp.stack(mR),
            meas_t=jnp.stack(mt),
            valid=jnp.asarray(np.array(val)),
            weight=jnp.asarray(np.array(wgt, np.float32)),
        )
        fixed = np.zeros(K, bool)
        fixed[0] = True
        s, R, t, errs = optimize_pose_graph(
            s0, R0, t0, jnp.ones(K, bool), jnp.asarray(fixed), edges, iters=30
        )
        # The edge set is inconsistent (drifted odometry vs true loop), so
        # the optimum is nonzero; the optimizer must reach a much lower
        # total error and distribute the drift.
        assert float(errs[-1]) < 0.1 * float(errs[0]), (float(errs[0]), float(errs[-1]))
        # Loop endpoint consistency: composing the loop edge from node K-1
        # must land near node 0 (initially the drift gap is large).
        sl, Rl, tl = sim3_compose(sr, Rr, tr, s[K - 1], R[K - 1], t[K - 1])
        gap_before = np.linalg.norm(
            np.asarray(sim3_compose(sr, Rr, tr, s0[K - 1], R0[K - 1], t0[K - 1])[2])
            - np.asarray(t0[0])
        )
        gap_after = np.linalg.norm(np.asarray(tl) - np.asarray(t[0]))
        assert gap_after < 0.25 * gap_before, (gap_before, gap_after)

    def test_fixed_nodes_unmoved(self, rng):
        K = 5
        s0 = jnp.ones(K)
        R0 = jnp.eye(3)[None].repeat(K, 0)
        t0 = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))
        edges = Sim3Edges(
            i=jnp.asarray(np.arange(K - 1, dtype=np.int32)),
            j=jnp.asarray(np.arange(1, K, dtype=np.int32)),
            meas_s=jnp.ones(K - 1),
            meas_R=jnp.eye(3)[None].repeat(K - 1, 0),
            meas_t=jnp.asarray(rng.normal(size=(K - 1, 3)).astype(np.float32)),
            valid=jnp.ones(K - 1, bool),
            weight=jnp.ones(K - 1),
        )
        fixed = np.zeros(K, bool)
        fixed[0] = True
        s, R, t, _ = optimize_pose_graph(
            s0, R0, t0, jnp.ones(K, bool), jnp.asarray(fixed), edges, iters=10
        )
        np.testing.assert_allclose(np.asarray(t)[0], np.asarray(t0)[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s)[0], 1.0, atol=1e-6)

    def test_fix_scale(self, rng):
        K = 4
        s0 = jnp.asarray(np.array([1.0, 1.1, 0.9, 1.05], np.float32))
        R0 = jnp.eye(3)[None].repeat(K, 0)
        t0 = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))
        edges = Sim3Edges(
            i=jnp.asarray(np.arange(K - 1, dtype=np.int32)),
            j=jnp.asarray(np.arange(1, K, dtype=np.int32)),
            meas_s=jnp.ones(K - 1),
            meas_R=jnp.eye(3)[None].repeat(K - 1, 0),
            meas_t=jnp.zeros((K - 1, 3)),
            valid=jnp.ones(K - 1, bool),
            weight=jnp.ones(K - 1),
        )
        fixed = np.zeros(K, bool)
        fixed[0] = True
        s, R, t, _ = optimize_pose_graph(
            s0, R0, t0, jnp.ones(K, bool), jnp.asarray(fixed), edges,
            iters=10, fix_scale=True,
        )
        # Scales must not change when fixed.
        np.testing.assert_allclose(np.asarray(s), np.asarray(s0), atol=1e-5)


class TestSparseDatabase:
    """Sparse word-list layout (SparseKeyFrameDatabase) is exactly
    equivalent to the dense (K, W) layout, and holds a DBoW2-scale
    vocabulary (k=10, L=6 = 1M words) in megabytes — the property the
    reference's inverted file exists for (KeyFrameDatabase.h:66)."""

    def test_sparse_bow_matches_dense(self, rng):
        from tpuslam.place import sparse_bow_vector

        corpus = rand_desc(rng, 3000)
        voc = train_vocabulary(corpus, k=6, levels=3, seed=2)
        desc = rand_desc(rng, 300)
        valid = np.ones(300, bool)
        valid[250:] = False
        dense = np.asarray(bow_vector(voc, jnp.asarray(desc), jnp.asarray(valid)))
        sp = sparse_bow_vector(voc, jnp.asarray(desc), jnp.asarray(valid))
        np.testing.assert_allclose(
            np.asarray(sp.densify(voc.n_words)), dense, atol=1e-6
        )

    def test_sparse_query_matches_dense(self, rng):
        from tpuslam.place import SparseKeyFrameDatabase, sparse_bow_vector

        corpus = rand_desc(rng, 3000)
        voc = train_vocabulary(corpus, k=6, levels=3, seed=3)
        K = 12
        db_d = KeyFrameDatabase(voc.n_words, K)
        db_s = SparseKeyFrameDatabase(voc.n_words, K, 250)
        descs = [rand_desc(rng, 250) for _ in range(10)]
        ones = jnp.ones(250, bool)
        for k in range(10):
            db_d.add(k, bow_vector(voc, jnp.asarray(descs[k]), ones))
            db_s.add(k, sparse_bow_vector(voc, jnp.asarray(descs[k]), ones))
        db_d.erase(7)
        db_s.erase(7)
        covis = jnp.asarray(rng.uniform(0, 1, (K, K)) > 0.7, jnp.float32) * 20.0
        exclude = np.zeros(K, bool)
        exclude[9] = True
        for probe in (2, 5):
            qd = bow_vector(voc, jnp.asarray(corrupt(rng, descs[probe], 6)), ones)
            qs = sparse_bow_vector(
                voc, jnp.asarray(corrupt(rng, descs[probe], 6)), ones
            )
            # Same descriptors through both paths (re-corrupt differs): use
            # the SAME corrupted input for a strict equivalence check.
            c = corrupt(rng, descs[probe], 6)
            qd = bow_vector(voc, jnp.asarray(c), ones)
            qs = sparse_bow_vector(voc, jnp.asarray(c), ones)
            id_d, ok_d = db_d.query(qd, jnp.asarray(exclude), covis, 0.01)
            id_s, ok_s = db_s.query(qs, jnp.asarray(exclude), covis, 0.01)
            np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_s))
            np.testing.assert_array_equal(
                np.asarray(id_d)[np.asarray(ok_d)], np.asarray(id_s)[np.asarray(ok_s)]
            )

    def test_million_word_vocabulary_fits(self, rng):
        """A synthetic k=10, L=6 tree (the ORBvoc shape): sparse DB + query
        work, resident DB size is ~2 MB (vs 600 MB dense)."""
        from tpuslam.place import SparseKeyFrameDatabase, sparse_bow_vector

        k, levels = 10, 6
        centers = tuple(
            jnp.asarray(rand_desc(rng, k ** (l + 1))) for l in range(levels)
        )
        voc = Vocabulary(
            centers=centers,
            word_weight=jnp.ones((k**levels,)),
            k=k,
            levels=levels,
        )
        K, L = 150, 400
        db = SparseKeyFrameDatabase(voc.n_words, K, L)
        db_bytes = db.words.nbytes + db.weight.nbytes + db.has.nbytes
        assert db_bytes < 50 * 2**20, db_bytes
        descs = [rand_desc(rng, L) for _ in range(4)]
        ones = jnp.ones(L, bool)
        for i, d in enumerate(descs):
            db.add(i, sparse_bow_vector(voc, jnp.asarray(d), ones))
        q = sparse_bow_vector(voc, jnp.asarray(corrupt(rng, descs[1], 4)), ones)
        idx, ok = db.query(
            q, jnp.zeros(K, bool), jnp.zeros((K, K)), min_score=0.0
        )
        assert np.asarray(ok)[0]
        assert int(np.asarray(idx)[0]) == 1


class TestPoseGraphCG:
    """The matrix-free block-Jacobi PCG path (used above dense_max_nodes)
    matches the dense solve, and handles a KITTI-00-scale keyframe count
    without materializing (7K)^2."""

    def _drifted_loop(self, K, loop_pairs=((None, 0),)):
        rels_gt, rels_n = [], []
        for k in range(K - 1):
            w = np.array([0.0, 2 * np.pi / (K - 1), 0.0], np.float32)
            rels_gt.append(
                (jnp.asarray(1.0), so3_exp(jnp.asarray(w)),
                 jnp.asarray(np.array([0.5, 0, 0], np.float32)))
            )
            wn = w + np.array([0.002, 0.005, -0.002], np.float32)
            rels_n.append(
                (jnp.asarray(1.0), so3_exp(jnp.asarray(wn)),
                 jnp.asarray(np.array([0.51, 0.005, -0.005], np.float32)))
            )
        s_gt, R_gt, t_gt = _compose_chain(rels_gt)
        s0, R0, t0 = _compose_chain(rels_n)
        ei, ej, ms, mR, mt = [], [], [], [], []
        for k in range(K - 1):
            sr, Rr, tr = make_relative(
                s0[k], R0[k], t0[k], s0[k + 1], R0[k + 1], t0[k + 1]
            )
            ei.append(k); ej.append(k + 1); ms.append(sr); mR.append(Rr); mt.append(tr)
        for a, b in loop_pairs:
            a = K - 1 if a is None else a
            sr, Rr, tr = make_relative(
                s_gt[a], R_gt[a], t_gt[a], s_gt[b], R_gt[b], t_gt[b]
            )
            ei.append(a); ej.append(b); ms.append(sr); mR.append(Rr); mt.append(tr)
        edges = Sim3Edges(
            i=jnp.asarray(np.array(ei, np.int32)),
            j=jnp.asarray(np.array(ej, np.int32)),
            meas_s=jnp.stack(ms),
            meas_R=jnp.stack(mR),
            meas_t=jnp.stack(mt),
            valid=jnp.ones(len(ei), bool),
            weight=jnp.ones(len(ei)),
        )
        return s0, R0, t0, edges

    def test_cg_matches_dense(self):
        K = 24
        s0, R0, t0, edges = self._drifted_loop(K)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        valid = jnp.ones(K, bool)
        sd, Rd, td, ed = optimize_pose_graph(
            s0, R0, t0, valid, fixed, edges, iters=10, dense_max_nodes=1024
        )
        sc, Rc, tc, ec = optimize_pose_graph(
            s0, R0, t0, valid, fixed, edges, iters=10, dense_max_nodes=4
        )
        np.testing.assert_allclose(np.asarray(td), np.asarray(tc), atol=2e-3)
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sc), atol=1e-4)
        assert abs(float(ed[-1]) - float(ec[-1])) < 1e-3 * max(float(ed[0]), 1.0)

    def test_cg_matches_dense_fix_scale(self):
        K = 24
        s0, R0, t0, edges = self._drifted_loop(K)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        valid = jnp.ones(K, bool)
        sd, Rd, td, _ = optimize_pose_graph(
            s0, R0, t0, valid, fixed, edges, iters=10, fix_scale=True,
            dense_max_nodes=1024,
        )
        sc, Rc, tc, _ = optimize_pose_graph(
            s0, R0, t0, valid, fixed, edges, iters=10, fix_scale=True,
            dense_max_nodes=4,
        )
        np.testing.assert_allclose(np.asarray(sd), np.ones(K), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sc), np.ones(K), atol=1e-6)
        np.testing.assert_allclose(np.asarray(td), np.asarray(tc), atol=2e-3)

    def test_large_graph_converges(self):
        """KITTI-00-scale node count through the CG path only."""
        K = 700
        s0, R0, t0, edges = self._drifted_loop(K, loop_pairs=((None, 0), (350, 0)))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        s, R, t, errs = optimize_pose_graph(
            s0, R0, t0, jnp.ones(K, bool), fixed, edges, iters=8
        )
        assert np.all(np.isfinite(np.asarray(t)))
        assert float(errs[-1]) < 0.1 * float(errs[0]), (
            float(errs[0]), float(errs[-1])
        )
