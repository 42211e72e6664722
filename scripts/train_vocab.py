#!/usr/bin/env python
"""Train a BoW vocabulary offline from a dataset (or synthetic imagery).

The reference requires a pre-trained DBoW3 vocabulary as a mandatory CLI
argument (reference: Main.h:81); this produces our equivalent — a k^L
binary-centroid tree with DBoW3-style tf-idf weights — as an .npz consumed
by `SLAMSystem(vocab_path=...)` / `run_sequence.py --vocab`.

Usage:
  python scripts/train_vocab.py --dataset /path/to/seq --out vocab.npz \
      [--k 10 --levels 3 --stride 5 --max-images 500]
  python scripts/train_vocab.py --synthetic 200 --out vocab.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def extract_descs(img: np.ndarray, n_levels: int, capacity: int,
                  fast_th: float):
    import jax.numpy as jnp
    from hslam_tpu.ops import features as ft

    u, v, lvl, sc, desc, valid = ft.extract_multiscale(
        jnp.asarray(img, jnp.float32), n_levels, capacity, fast_th)
    val = np.asarray(valid)
    return np.asarray(desc)[val]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train from N frames of the synthetic sequence")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stride", type=int, default=5,
                    help="use every stride-th image")
    ap.add_argument("--max-images", type=int, default=500)
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--fast-th", type=float, default=10.0)
    args = ap.parse_args()

    from hslam_tpu.ops import bow as bow_ops

    descs, doc_ids = [], []
    if args.synthetic:
        from run_sequence import synthetic_sequence

        frames, _, _ = synthetic_sequence(args.synthetic)
        imgs = frames[:: args.stride][: args.max_images]
        for i, img in enumerate(imgs):
            d = extract_descs(img, 4, args.features, args.fast_th)
            descs.append(d)
            doc_ids.append(np.full(len(d), i, np.int32))
            if (i + 1) % 20 == 0:
                print(f"  {i + 1}/{len(imgs)} images...")
    else:
        from hslam_tpu.io.dataset import DatasetReader

        rd = DatasetReader(args.dataset)
        ids = list(range(0, len(rd), args.stride))[: args.max_images]
        for i, fid in enumerate(ids):
            fd = rd.get_raw(fid)
            d = extract_descs(fd.image, 4, args.features, args.fast_th)
            descs.append(d)
            doc_ids.append(np.full(len(d), i, np.int32))
            if (i + 1) % 20 == 0:
                print(f"  {i + 1}/{len(ids)} images...")

    pool = np.concatenate(descs)
    docs = np.concatenate(doc_ids)
    print(f"training k={args.k} L={args.levels} "
          f"({args.k ** args.levels} words) on {len(pool)} descriptors "
          f"from {len(descs)} images...")
    voc = bow_ops.train_vocabulary(pool, k=args.k, levels=args.levels,
                                   iters=args.iters, doc_ids=docs)
    bow_ops.save_vocabulary(args.out, voc)
    idf = np.asarray(voc.idf)
    print(f"saved {args.out}: {voc.n_words} words, "
          f"{int((idf > 0).sum())} observed in training "
          f"(idf range [{idf.min():.2f}, {idf.max():.2f}])")


if __name__ == "__main__":
    main()
