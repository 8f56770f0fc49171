"""Vocabulary training CLI — the replacement for the reference's shipped
ORBvoc.txt (absent from the mirror and incompatible with our BRIEF pattern;
SURVEY.md preamble calls this tooling out as required).

Collects ORB descriptors from a directory of images (or a dataset sequence)
and trains a k^L-word vocabulary, saved as an npz loadable with
tpuslam.place.Vocabulary.load.

Usage:
  python tools/train_vocab.py <image_dir_or_sequence> out_voc.npz [k] [levels] [max_images]
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tpuslam.io.datasets import load_grayscale
    from tpuslam.ops.orb import ORBConfig, extract_orb
    from tpuslam.place import train_vocabulary

    src = sys.argv[1]
    out = sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    levels = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    max_images = int(sys.argv[5]) if len(sys.argv) > 5 else 200

    exts = (".png", ".jpg", ".jpeg", ".pgm", ".ppm")
    paths = []
    for root, _, files in os.walk(src):
        for f in sorted(files):
            if f.lower().endswith(exts):
                paths.append(os.path.join(root, f))
    if not paths:
        raise SystemExit(f"no images under {src}")
    step = max(1, len(paths) // max_images)
    paths = paths[::step][:max_images]
    print(f"extracting descriptors from {len(paths)} images...")

    cfg = ORBConfig(n_features=1000)
    ex = jax.jit(lambda x: extract_orb(x, cfg))
    descs = []
    for i, p in enumerate(paths):
        img = load_grayscale(p)
        f = ex(jnp.asarray(img, jnp.float32))
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc)[v])
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{len(paths)}")
    corpus = np.concatenate(descs, axis=0)
    print(f"training k={k} L={levels} vocabulary on {len(corpus)} descriptors...")
    voc = train_vocabulary(corpus, k=k, levels=levels)
    voc.save(out)
    print(f"saved {voc.n_words}-word vocabulary to {out}")


if __name__ == "__main__":
    main()
