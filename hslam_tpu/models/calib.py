"""Camera calibration state.

Equivalent of the reference's CalibData (Include/CalibData.h): the four
optimizable intrinsics (fx, fy, cx, cy) with a first-estimate (zero) copy
for FEJ, plus static per-level pyramid intrinsics for the direct pyramid
(halving per level, with the 0.5-pixel-center convention of
CalibData.h:142-168) and the indirect (feature) pyramid scale factors.

The optimizable vector is a pytree leaf; per-level K matrices are derived
on the fly (cheap) so intrinsics stay consistent during optimization.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Calib(NamedTuple):
    """Intrinsics state. value = [fx, fy, cx, cy] at pyramid level 0."""

    value: jnp.ndarray        # (4,) current estimate
    value_zero: jnp.ndarray   # (4,) FEJ linearization point
    width: int                # level-0 image width  (static)
    height: int               # level-0 image height (static)

    @property
    def fx(self):
        return self.value[0]

    @property
    def fy(self):
        return self.value[1]

    @property
    def cx(self):
        return self.value[2]

    @property
    def cy(self):
        return self.value[3]

    def delta(self):
        """value - value_zero (the FEJ delta used in mode-1/2 accumulation)."""
        return self.value - self.value_zero


def make_calib(fx, fy, cx, cy, width, height) -> Calib:
    v = jnp.asarray([fx, fy, cx, cy], dtype=jnp.float32)
    return Calib(value=v, value_zero=v, width=int(width), height=int(height))


def level_intrinsics(calib: Calib, level: int) -> jnp.ndarray:
    """Intrinsics at a direct-pyramid level, reference CalibData.h:142-168:
      fx_l = fx * 2^-l ; cx_l = (cx + 0.5) / 2^l - 0.5
    Returns (4,) [fx, fy, cx, cy] at that level."""
    s = 0.5 ** level
    fx = calib.value[0] * s
    fy = calib.value[1] * s
    cx = (calib.value[2] + 0.5) * s - 0.5
    cy = (calib.value[3] + 0.5) * s - 0.5
    return jnp.stack([fx, fy, cx, cy])


def k_pyr_from_value(value: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """(L, 4) per-level [fx, fy, cx, cy] from a (4,) level-0 intrinsics
    vector — the device-side form of level_intrinsics, so jitted kernels
    can derive the pyramid intrinsics from the optimized calib without any
    host round-trip."""
    s = 0.5 ** jnp.arange(n_levels, dtype=jnp.float32)      # (L,)
    fx = value[0] * s
    fy = value[1] * s
    cx = (value[2] + 0.5) * s - 0.5
    cy = (value[3] + 0.5) * s - 0.5
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def level_size(calib: Calib, level: int) -> Tuple[int, int]:
    return calib.width >> level, calib.height >> level


def K_matrix(intr: jnp.ndarray) -> jnp.ndarray:
    """(4,) -> (3, 3) K."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, cx]),
            jnp.stack([z, fy, cy]),
            jnp.stack([z, z, o]),
        ]
    )


def K_inv_matrix(intr: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([o / fx, z, -cx / fx]),
            jnp.stack([z, o / fy, -cy / fy]),
            jnp.stack([z, z, o]),
        ]
    )


def usable_pyramid_levels(width: int, height: int, max_levels: int) -> int:
    """Auto-compute usable pyramid depth (reference CalibData.h:107-130):
    stop when a dimension stops being divisible by 2 or gets tiny."""
    levels = 1
    w, h = width, height
    while levels < max_levels and w % 2 == 0 and h % 2 == 0 and min(w, h) > 100:
        w //= 2
        h //= 2
        levels += 1
    return levels


def indirect_level_scales(n_levels: int, scale_factor: float) -> np.ndarray:
    """Per-level scale factors of the indirect (feature) pyramid
    (reference CalibData.h:170-188: powers of IndPyrScaleFactor)."""
    return scale_factor ** np.arange(n_levels, dtype=np.float32)
