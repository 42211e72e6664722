"""Pallas TPU kernels for the image frontend.

The per-frame pyramid build (Frame::CreateDirPyrs equivalent) is the one
dense pass executed for every input frame; XLA emits it as several
elementwise kernels with HBM round-trips between them. The fused Pallas
kernel keeps the level image in VMEM and produces all four outputs —
next-level downsample, dx, dy, squared gradient magnitude — in a single
launch (one HBM read of the level, four writes).

Falls back to the jnp implementation (ops/pyramid.py) off-TPU; tests run
the kernel in interpreter mode for parity.

The 2x2 downsample is formulated as two banded 0/1 pooling MATMULS
(down = 0.25 * A @ img @ B, A/B built from iota comparisons in-kernel):
this environment's Mosaic toolchain (remote-compile helper, jax
0.9/libtpu terminal) rejects both the 4D-reshape reduction and the
stride-2 slicing forms inside a TPU kernel (scatter is unimplemented
too), but matmuls are Mosaic's native ground — and they run on the MXU,
which is idle during this memory-bound pass anyway.
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
    # 2x2 mean as two banded 0/1 pooling matmuls on the MXU: Mosaic
    # rejects strided slicing and 4D-reshape reductions in-kernel, but
    # lowers matmuls natively (and the MXU is idle in this pass)
    ar = jax.lax.broadcasted_iota(jnp.int32, (H2, H), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (H2, H), 1)
    A = ((ac == 2 * ar) | (ac == 2 * ar + 1)).astype(jnp.float32)
    br = jax.lax.broadcasted_iota(jnp.int32, (W, W2), 0)
    bc = jax.lax.broadcasted_iota(jnp.int32, (W, W2), 1)
    B = ((br == 2 * bc) | (br == 2 * bc + 1)).astype(jnp.float32)
    colsum = jnp.dot(img[: H2 * 2, : W2 * 2].astype(jnp.float32), B[: W2 * 2],
                     preferred_element_type=jnp.float32)
    down_ref[:] = 0.25 * jnp.dot(A[:, : H2 * 2], colsum,
                                 preferred_element_type=jnp.float32)


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
