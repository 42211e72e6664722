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
  python scripts/train_vocab.py --diverse 48 --views 6 \
      --k 10 --levels 4 --out hslam_tpu/assets/vocab_10k.npz

`--diverse` trains on many GENERATED scenes spanning distinct texture
families (sinusoid mixtures, multi-octave smoothed noise, gaussian blob
fields, warped checkers/stripes), each seen from several warped/relit
views — the point is a vocabulary that is NOT specialized to any one
scene, approximating DBoW3's train-on-diverse-imagery recipe without
dataset egress.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def diverse_scene_images(n_scenes: int, views: int, seed: int = 0,
                         H: int = 480, W: int = 640):
    """Yield (scene_idx, view_img uint8) over n_scenes x views images."""
    import jax
    import jax.numpy as jnp
    from hslam_tpu.utils.interp import bilinear

    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)

    def scene_texture(s):
        kind = s % 4
        if kind == 0:          # sinusoid mixture (random spectrum)
            img = np.full((H, W), 120.0, np.float32)
            for _ in range(rng.randint(5, 10)):
                img += rng.uniform(6, 35) * np.sin(
                    2 * np.pi * (rng.uniform(0.5, 14) * xs / W
                                 + rng.uniform(0.5, 14) * ys / H)
                    + rng.uniform(0, 6.28))
            return img
        if kind == 1:          # multi-octave smoothed noise
            img = np.zeros((H, W), np.float32)
            for cell, amp in [(8, 60), (16, 45), (32, 35), (64, 25)]:
                small = rng.rand(H // cell + 1, W // cell + 1).astype(
                    np.float32)
                up = jax.image.resize(jnp.asarray(small), (H, W), "bilinear")
                img += amp * (np.asarray(up) - 0.5)
            return 128.0 + img
        if kind == 2:          # gaussian blob field
            img = np.full((H, W), 110.0, np.float32)
            for _ in range(rng.randint(25, 60)):
                cx_, cy_ = rng.uniform(0, W), rng.uniform(0, H)
                sg = rng.uniform(4, 40)
                img += rng.uniform(-70, 70) * np.exp(
                    -((xs - cx_) ** 2 + (ys - cy_) ** 2) / (2 * sg * sg))
            return img
        # kind == 3: rotated checkers / stripes with intensity steps
        th = rng.uniform(0, np.pi)
        xr = np.cos(th) * xs + np.sin(th) * ys
        yr = -np.sin(th) * xs + np.cos(th) * ys
        p1, p2 = rng.uniform(12, 60), rng.uniform(12, 60)
        img = 110.0 + 45.0 * (((xr // p1).astype(int)
                               + (yr // p2).astype(int)) % 2)
        img += 20.0 * np.sin(2 * np.pi * rng.uniform(1, 6) * xs / W
                             + rng.uniform(0, 6.28))
        return img.astype(np.float32)

    for s in range(n_scenes):
        tex = jnp.asarray(np.clip(scene_texture(s), 0, 255))
        for v in range(views):
            if v == 0:
                img = np.asarray(tex)
            else:
                # random similarity warp + brightness/gamma jitter: the
                # views a revisit would produce
                ang = rng.uniform(-0.35, 0.35)
                sc = rng.uniform(0.8, 1.25)
                tx_, ty_ = rng.uniform(-40, 40, 2)
                ca, sa = np.cos(ang) / sc, np.sin(ang) / sc
                cx_, cy_ = W / 2, H / 2
                u = ca * (xs - cx_) - sa * (ys - cy_) + cx_ + tx_
                vv = sa * (xs - cx_) + ca * (ys - cy_) + cy_ + ty_
                img = np.asarray(bilinear(tex, jnp.asarray(u),
                                          jnp.asarray(vv)))
                gain = rng.uniform(0.8, 1.2)
                gamma = rng.uniform(0.8, 1.25)
                img = 255.0 * (np.clip(img * gain / 255.0, 0, 1) ** gamma)
            yield s, np.clip(np.round(img), 0, 255).astype(np.uint8)


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
    ap.add_argument("--diverse", type=int, default=0,
                    help="train from N generated scenes (4 texture families)")
    ap.add_argument("--views", type=int, default=6,
                    help="warped/relit views per diverse scene")
    ap.add_argument("--seed", type=int, default=0)
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
    if args.diverse:
        n_img = 0
        for s, img in diverse_scene_images(args.diverse, args.views,
                                           seed=args.seed):
            d = extract_descs(img, 4, args.features, args.fast_th)
            descs.append(d)
            # document = scene (not view): idf counts a word once per scene
            doc_ids.append(np.full(len(d), s, np.int32))
            n_img += 1
            if n_img % 20 == 0:
                print(f"  {n_img}/{args.diverse * args.views} images...")
    elif args.synthetic:
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
