"""Generate an on-disk synthetic dataset in TUM-mono layout (images/ +
times.txt + camera.txt + pcalib.txt + vignette.png + groundtruth.txt) so
the full dataset path — reader, native prefetch loader, photometric +
geometric undistortion, SLAM — can be driven without real data.

The camera has mild radial distortion and a gamma response + vignette, so
every correction stage does real work.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output dataset directory")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from hslam_tpu.utils import lie
    from hslam_tpu.utils.interp import bilinear

    H, W = args.height, args.width
    fx = fy = 0.55 * W
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    k1, k2 = -0.12, 0.03          # mild radial distortion
    depth = 2.0
    gamma = 0.75                   # response exponent
    vig_a = -0.25

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)

    key = jax.random.PRNGKey(11)
    ky, kx_ = jax.random.uniform(key, (2, 8), minval=0.5, maxval=6.5)
    ph = jax.random.uniform(jax.random.fold_in(key, 1), (8,)) * 6.28
    amps = jnp.array([35.0, 30.0, 22.0, 18.0, 14.0, 10.0, 8.0, 6.0])
    ys, xs = jnp.mgrid[0:H, 0:W]
    I0 = 120.0 + sum(
        amps[i] * jnp.sin(2 * jnp.pi * (kx_[i] * xs / W + ky[i] * ys / H) + ph[i])
        for i in range(8)
    )
    I0 = jnp.asarray(I0, jnp.float32)

    # distorted-pixel -> ideal-ray lookup for rendering the raw images
    xd = (xs - cx) / fx
    yd = (ys - cy) / fy
    # invert distortion numerically (fixed point): find ideal (xi, yi) with
    # distort(xi, yi) == (xd, yd)
    xi, yi = xd, yd
    for _ in range(15):
        r2 = xi * xi + yi * yi
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xi = xd / radial
        yi = yd / radial

    # radius for vignette (normalized to corner)
    r2n = ((xs - cx) ** 2 + (ys - cy) ** 2) / (cx * cx + cy * cy)
    vig = 1.0 + vig_a * r2n

    gt_lines = []
    times = []
    for i in range(args.frames):
        t = i / 30.0
        xi6 = jnp.array(
            [0.30 * np.sin(0.5 * t), 0.15 * (1 - np.cos(0.5 * t)), 0.04 * t,
             0.012 * np.sin(0.4 * t), 0.02 * t, 0.008 * np.sin(0.3 * t)]
        )
        R, tt = lie.se3_exp(xi6)        # worldToCam
        Rinv, tinv = lie.se3_inverse(R, tt)
        dz = Rinv[2, 0] * xi + Rinv[2, 1] * yi + Rinv[2, 2]
        s = (depth - tinv[2]) / dz
        X = s * (Rinv[0, 0] * xi + Rinv[0, 1] * yi + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * xi + Rinv[1, 1] * yi + Rinv[1, 2]) + tinv[1]
        u0 = fx * X / depth + cx
        v0 = fy * Y / depth + cy
        scene = bilinear(I0, u0, v0)

        exposure = 1.0 + 0.3 * np.sin(0.8 * t)
        irr = np.clip(np.asarray(scene) * np.asarray(vig) * exposure, 0, 255)
        observed = 255.0 * (irr / 255.0) ** gamma
        img8 = np.clip(observed, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(args.out, "images", f"{i:05d}.png"), img8)

        times.append((i, t, exposure))
        Tcw = np.eye(4)
        Tcw[:3, :3], Tcw[:3, 3] = np.asarray(R), np.asarray(tt)
        Twc = np.linalg.inv(Tcw)
        from hslam_tpu.utils.lie import rot_to_quat
        q = np.asarray(rot_to_quat(jnp.asarray(Twc[:3, :3])))
        gt_lines.append(
            f"{t:.6f} {Twc[0,3]:.6f} {Twc[1,3]:.6f} {Twc[2,3]:.6f} "
            f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}"
        )

    with open(os.path.join(args.out, "times.txt"), "w") as f:
        for i, t, e in times:
            f.write(f"{i:05d} {t:.6f} {e:.6f}\n")
    with open(os.path.join(args.out, "camera.txt"), "w") as f:
        f.write(f"RadTan {fx} {fy} {cx} {cy} {k1} {k2} 0.0 0.0\n")
        f.write(f"{W} {H}\ncrop\n{W} {H}\n")
    # response: G(i) over 0..255 (text, one value per line)
    resp = 255.0 * (np.arange(256) / 255.0) ** gamma
    with open(os.path.join(args.out, "pcalib.txt"), "w") as f:
        f.write(" ".join(f"{v:.4f}" for v in resp))
    vig16 = np.clip(np.asarray(vig) / np.asarray(vig).max() * 65535, 0, 65535
                    ).astype(np.uint16)
    cv2.imwrite(os.path.join(args.out, "vignette.png"), vig16)
    with open(os.path.join(args.out, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
