"""Build the shipped default vocabulary from a diverse synthetic corpus.

The reference ships a 1M-word vocabulary trained on a large image corpus
(Vocabulary/ORBvoc.txt, stripped from the mirror and incompatible with our
BRIEF pattern). No datasets exist in this environment (zero egress), so the
default artifact is trained on a broad synthetic corpus: many StepWallScene
layouts rendered from varied viewpoints, plus pure random-texture planes —
enough descriptor diversity for place recognition on synthetic runs, and
replaceable via tools/train_vocab.py when real imagery is available.

Writes tpuslam/data/default_vocab.npz (k=8, L=4 -> 4096 words).
"""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    import jax.numpy as jnp

    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.ops.orb import ORBConfig, extract_orb
    from tpuslam.place import train_vocabulary
    from tpuslam.place.vocabulary import Vocabulary

    from synthetic import StepWallScene, orbit_trajectory

    out = sys.argv[1] if len(sys.argv) > 1 else "tpuslam/data/default_vocab.npz"
    cam = PinholeCamera(fx=350.0, fy=350.0, cx=160.0, cy=120.0,
                        width=320, height=240)
    cfg = ORBConfig(n_features=500)
    ex = jax.jit(lambda x: extract_orb(x, cfg))

    descs = []
    rng = np.random.default_rng(0)
    # 12 scene layouts x 6 viewpoints.
    for scene_seed in range(12):
        scene = StepWallScene(np.random.default_rng(scene_seed))
        poses = orbit_trajectory(6, step=0.35)
        for R, t in poses:
            img = scene.render(cam, np.asarray(R), np.asarray(t))
            f = ex(jnp.asarray(img))
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            descs.append(d)
    # Plus pure random textures (blurred noise at several scales).
    for i in range(12):
        base = rng.uniform(0, 255, (60, 80)).astype(np.float32)
        img = np.kron(base, np.ones((4, 4), np.float32))
        f = ex(jnp.asarray(img))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])

    corpus = np.concatenate(descs, axis=0)
    rng.shuffle(corpus)
    corpus = corpus[:40000]
    print(f"training on {len(corpus)} descriptors...")
    voc = train_vocabulary(corpus, k=8, levels=4, seed=7)
    voc.save(out)
    check = Vocabulary.load(out)
    assert check.n_words == 8**4
    print(f"wrote {out} ({check.n_words} words)")


if __name__ == "__main__":
    main()
