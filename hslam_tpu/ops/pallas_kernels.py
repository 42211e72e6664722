"""Pallas TPU kernels for the image frontend.

The per-frame pyramid build (Frame::CreateDirPyrs equivalent) is the one
dense pass executed for every input frame; XLA emits it as several
elementwise kernels with HBM round-trips between them. The fused Pallas
kernel keeps the level image in VMEM and produces all four outputs —
next-level downsample, dx, dy, squared gradient magnitude — in a single
launch (one HBM read of the level, four writes).

Falls back to the jnp implementation (ops/pyramid.py) off-TPU; tests run
the kernel in interpreter mode for parity.

STATUS: interpret-mode verified; NOT yet on the default path. This
environment's Mosaic toolchain (remote-compile helper, jax 0.9/libtpu
Nov-2025 terminal) rejects both the 4D-reshape reduction and stride-2
slicing forms of the 2x2 downsample inside a TPU kernel (scatter is also
unimplemented). The XLA path costs ~3 ms/frame at 640x480 and is not a
bottleneck; revisit when the toolchain accepts one of the downsample
formulations or with a row-tiled grid design.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _level_kernel(img_ref, down_ref, dx_ref, dy_ref, g2_ref):
    img = img_ref[:]
    H, W = img.shape

    # concatenated zero borders instead of .at[].set — Pallas TPU lowering
    # has no scatter primitive
    zc = jnp.zeros((H, 1), img.dtype)
    dx = jnp.concatenate([zc, 0.5 * (img[:, 2:] - img[:, :-2]), zc], axis=1)
    zr = jnp.zeros((1, W), img.dtype)
    dy = jnp.concatenate([zr, 0.5 * (img[2:, :] - img[:-2, :]), zr], axis=0)

    dx_ref[:] = dx
    dy_ref[:] = dy
    g2_ref[:] = dx * dx + dy * dy

    H2, W2 = H // 2, W // 2
    # strided 2x2 mean (the 4D-reshape reduction form does not lower)
    c = img[: H2 * 2, : W2 * 2]
    down_ref[:] = 0.25 * (
        c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
    )


def pyramid_level(img: jnp.ndarray, interpret: bool = False):
    """One fused pyramid step: (H, W) -> (down (H//2, W//2), dx, dy, g2)."""
    H, W = img.shape
    out_shape = (
        jax.ShapeDtypeStruct((H // 2, W // 2), img.dtype),
        jax.ShapeDtypeStruct((H, W), img.dtype),
        jax.ShapeDtypeStruct((H, W), img.dtype),
        jax.ShapeDtypeStruct((H, W), img.dtype),
    )
    kwargs = {}
    if not interpret and _VMEM is not None:
        kwargs = dict(
            in_specs=[pl.BlockSpec(memory_space=_VMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=_VMEM) for _ in range(4)),
        )
    return pl.pallas_call(
        _level_kernel,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(img)


def build_direct_pyramid_pallas(
    image: jnp.ndarray,
    n_levels: int,
    gamma_grad_weight: jnp.ndarray | None = None,
    interpret: bool = False,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Drop-in replacement for ops.pyramid.build_direct_pyramid using the
    fused kernel per level."""
    levels, grads = [], []
    img = image
    for lvl in range(n_levels):
        down, dx, dy, g2 = pyramid_level(img, interpret=interpret)
        if gamma_grad_weight is not None:
            idx = jnp.clip(img.astype(jnp.int32), 0, 255)
            gw = gamma_grad_weight[idx]
            g2 = g2 * gw * gw
        levels.append(jnp.stack([img, dx, dy], axis=-1))
        grads.append(g2)
        img = down
    return levels, grads
