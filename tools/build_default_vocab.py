"""Build the shipped default vocabulary from a diverse synthetic corpus.

The reference ships a ~1M-word vocabulary (k=10, L=6) trained on a large
image corpus (Vocabulary/ORBvoc.txt — stripped from the mirror, and
incompatible with our BRIEF pattern anyway). No datasets exist in this
environment (zero egress), so the default artifact is trained on a broad
synthetic corpus: many box-room layouts (tools/seqgen.RoomScene) and
StepWallScene layouts rendered from varied viewpoints, plus random-texture
planes. k=10, L=5 -> 100,000 words (vs round 2's 4096), held in the sparse
(K, L) database layout, replaceable via tools/train_vocab.py when real
imagery is available.

Also writes a held-out place-recognition eval set
(tpuslam/data/place_eval.npz): N_PLACES distinct viewpoints x 2 views each
(A enrolled, B queried) from scenes NOT in the training corpus, used by
tests/test_place_scale.py to measure DetectLoop-style precision/recall at
500+ keyframes.

Usage: python tools/build_default_vocab.py [out_voc.npz] [--k 10] [--levels 5]
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

N_PLACES = 260          # eval places (2 views each -> 520 KFs in the test)
EVAL_FEATURES = 300     # descriptors stored per eval view


def _room_views(scene_seed, n_views, W, H, fx, n_feats, ex, rng):
    """Render n_views random interior viewpoints of a fresh RoomScene."""
    import jax.numpy as jnp

    from tools.seqgen import RoomScene, look_rotation

    scene = RoomScene(np.random.default_rng(scene_seed))
    out = []
    for _ in range(n_views):
        a = rng.uniform(0, 2 * np.pi)
        r = rng.uniform(0.5, 2.2)
        C = np.array([r * np.cos(a), rng.uniform(-0.6, 0.6), r * np.sin(a)],
                     np.float32)
        fwd = np.array([np.cos(a + rng.uniform(-0.4, 0.4)), 0.0,
                        np.sin(a + rng.uniform(-0.4, 0.4))], np.float32)
        R = look_rotation(fwd)
        t = (-R @ C).astype(np.float32)
        img = scene.render(fx, fx, W / 2, H / 2, W, H, R, t, ssaa=1)
        f = ex(jnp.asarray(img))
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        out.append((d, (a, r)))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from synthetic import StepWallScene, orbit_trajectory
    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.ops.orb import ORBConfig, extract_orb
    from tpuslam.place import train_vocabulary
    from tpuslam.place.vocabulary import Vocabulary

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="tpuslam/data/default_vocab.npz")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--eval-out", default="tpuslam/data/place_eval.npz")
    ap.add_argument(
        "--scale", type=int, default=1,
        help="corpus-size multiplier: N x the scenes/viewpoints. The "
        "reference-scale tree (k=10, L=6 = 1M words, "
        "TemplatedVocabulary.h:1338) needs a multi-million-descriptor "
        "corpus; --scale 16 renders ~10k images (~4M descriptors).",
    )
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    cfg = ORBConfig(n_features=500)
    ex = jax.jit(lambda x: extract_orb(x, cfg))
    rng = np.random.default_rng(0)
    descs = []

    # Training corpus, part 1: 24*scale StepWallScene layouts x 6 viewpoints.
    cam = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    for scene_seed in range(24 * args.scale):
        scene = StepWallScene(np.random.default_rng(scene_seed))
        poses = orbit_trajectory(6, step=0.35)
        for R, t in poses:
            img = scene.render(cam, np.asarray(R), np.asarray(t))
            f = ex(jnp.asarray(img))
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        if scene_seed % 10 == 0:
            print(f"stepwall {scene_seed}: {sum(len(d) for d in descs)} descs",
                  flush=True)

    # Part 2: 60*scale box-room layouts x 8 random interior viewpoints (the
    # same scene family the sequences use, fresh textures per seed).
    for scene_seed in range(100, 100 + 60 * args.scale):
        for d, _ in _room_views(scene_seed, 8, 320, 240, 350.0, 500, ex, rng):
            descs.append(d)
        if scene_seed % 10 == 0:
            print(f"room {scene_seed}: {sum(len(d) for d in descs)} descs",
                  flush=True)

    # Part 3: pure random textures (blurred noise at several scales).
    for i in range(24 * args.scale):
        base = rng.uniform(0, 255, (60, 80)).astype(np.float32)
        img = np.kron(base, np.ones((4, 4), np.float32))
        f = ex(jnp.asarray(img))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])

    corpus = np.concatenate(descs, axis=0)
    rng.shuffle(corpus)
    print(f"training k={args.k} L={args.levels} on {len(corpus)} descriptors...",
          flush=True)
    voc = train_vocabulary(corpus, k=args.k, levels=args.levels, seed=7,
                           verbose=True)
    voc.save(args.out)
    check = Vocabulary.load(args.out)
    print(f"wrote {args.out} ({check.n_words} words, "
          f"{os.path.getsize(args.out) / 1e6:.1f} MB)")

    if args.skip_eval:
        return
    # Held-out eval set: N_PLACES places from UNSEEN room seeds, two views
    # per place (small viewpoint delta), descriptors truncated per view.
    print("rendering held-out place-recognition eval set...", flush=True)
    pa, pb, labels = [], [], []
    ca, cb = [], []
    place = 0
    scene_seed = 1000
    while place < N_PLACES:
        scene_seed += 1
        views = []
        srng = np.random.default_rng(scene_seed * 7 + 1)
        from tools.seqgen import RoomScene, look_rotation
        scene = RoomScene(np.random.default_rng(scene_seed))
        n_here = min(4, N_PLACES - place)
        for j in range(n_here):
            a = srng.uniform(0, 2 * np.pi)
            r = srng.uniform(0.6, 2.0)
            C = np.array([r * np.cos(a), srng.uniform(-0.5, 0.5),
                          r * np.sin(a)], np.float32)
            for delta, bucket, cnts in ((0.0, pa, ca), (0.06, pb, cb)):
                fwd = np.array([np.cos(a + delta), 0.0, np.sin(a + delta)],
                               np.float32)
                R = look_rotation(fwd)
                t = (-R @ (C + delta)).astype(np.float32)
                img = scene.render(350.0, 350.0, 160.0, 120.0, 320, 240, R, t,
                                   ssaa=1)
                f = ex(jnp.asarray(img))
                d = np.asarray(f.desc)[np.asarray(f.valid)][:EVAL_FEATURES]
                cnts.append(len(d))
                d = np.pad(d, ((0, EVAL_FEATURES - len(d)), (0, 0)))
                bucket.append(d)
            labels.append(place)
            place += 1
        if place % 40 < n_here:
            print(f"  eval places: {place}/{N_PLACES}", flush=True)
    np.savez_compressed(
        args.eval_out,
        view_a=np.stack(pa).astype(np.uint32),
        view_b=np.stack(pb).astype(np.uint32),
        count_a=np.asarray(ca, np.int32),
        count_b=np.asarray(cb, np.int32),
        labels=np.asarray(labels, np.int32),
        n_features=EVAL_FEATURES,
    )
    print(f"wrote {args.eval_out} "
          f"({os.path.getsize(args.eval_out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
