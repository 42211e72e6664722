"""Per-frame image correction kernels (device side).

  * Geometric undistortion: apply a precomputed remap table (built host-side
    in io/calib_io.py) as one bilinear gather — the device equivalent of the
    reference's cv::remap call (Src/GeometricUndistorter.cpp:458-475).
  * Photometric undistortion: inverse-response LUT + inverse vignette,
    I' = Binv[I] * Vinv, with exposure division handled by the affine
    brightness model downstream (Src/PhotometricDistorter/
    photometricUndistorter.cpp:121-146).

Both are bandwidth-bound elementwise/gather passes that XLA fuses; they run
once per input frame.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.interp import bilinear


def remap_image(img: jnp.ndarray, remap: jnp.ndarray) -> jnp.ndarray:
    """img (H_in, W_in); remap (H_out, W_out, 2) of (x, y) source coords,
    -1 marks invalid (output set to 0)."""
    x = remap[..., 0]
    y = remap[..., 1]
    out = bilinear(img, x, y)
    return jnp.where(x < 0, 0.0, out)


def photometric_correct(
    raw: jnp.ndarray,                 # (H, W) raw 8-bit intensities (float)
    inv_response: jnp.ndarray | None,  # (256,) Binv LUT (maps 0..255 -> energy)
    inv_vignette: jnp.ndarray | None,  # (H, W) 1/V map
) -> jnp.ndarray:
    """I' = Binv[I] * Vinv (photometricUndistorter.cpp:121-146). The
    reference folds exposure into the affine model, not here."""
    out = raw
    if inv_response is not None:
        idx = jnp.clip(raw.astype(jnp.int32), 0, 255)
        frac = jnp.clip(raw - idx, 0.0, 1.0)
        lo = inv_response[idx]
        hi = inv_response[jnp.minimum(idx + 1, 255)]
        out = lo * (1.0 - frac) + hi * frac
    if inv_vignette is not None:
        out = out * inv_vignette
    return out


def invert_response(gamma: jnp.ndarray) -> jnp.ndarray:
    """Numerically invert a response curve G: [0..255] -> [0..255]
    (UpdateGamma, photometricUndistorter.cpp:175-200): Binv[i] = the x with
    G(x) = i, found by linear scan + interpolation. Host-side numpy is fine
    too; kept in jnp for the online-calibration path."""
    import numpy as np

    G = jnp.asarray(gamma)
    xs = jnp.arange(256.0)
    # for each target level i, find fractional index where G crosses i
    # G must be monotonic; searchsorted does the scan
    idx = jnp.clip(jnp.searchsorted(G, xs) - 1, 0, 254)
    g0 = G[idx]
    g1 = G[idx + 1]
    frac = jnp.where(g1 > g0, (xs - g0) / jnp.maximum(g1 - g0, 1e-12), 0.0)
    return jnp.clip(idx + frac, 0.0, 255.0)


def response_grad_weight(gamma: jnp.ndarray) -> jnp.ndarray:
    """(256,) weight B'(I) used to re-weight gradients in the pyramid build
    (getBGradOnly, photometricUndistorter.h:24-31; used Frame.cpp:158-164)."""
    g = jnp.asarray(gamma)
    w = jnp.zeros(256)
    w = w.at[:255].set(g[1:] - g[:-1])
    w = w.at[255].set(w[254])
    return w
