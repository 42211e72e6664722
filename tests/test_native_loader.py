"""Native (C++) prefetching loader: decode parity with cv2 + photometric
LUT application."""
import os
import tempfile

import numpy as np
import pytest

from hslam_tpu.io import native_loader


@pytest.fixture(scope="module")
def png_dir():
    import cv2

    d = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = rng.randint(0, 256, (48, 64), np.uint8)
        p = os.path.join(d, f"{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_decode_parity(png_dir):
    import cv2

    ld = native_loader.NativeLoader(png_dir, n_prefetch=4, n_threads=2)
    assert len(ld) == 6
    for i in (0, 3, 5, 1):   # out-of-order access exercises the prefetcher
        got = ld.get(i)
        ref = cv2.imread(png_dir[i], cv2.IMREAD_GRAYSCALE).astype(np.float32)
        np.testing.assert_array_equal(got, ref)
    ld.close()


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_photometric_lut(png_dir):
    import cv2

    lut = (np.arange(256, dtype=np.float32) * 0.5)
    vig = np.full((48, 64), 2.0, np.float32)
    ld = native_loader.NativeLoader(
        png_dir, inv_response=lut, inv_vignette=vig
    )
    got = ld.get(2)
    ref = cv2.imread(png_dir[2], cv2.IMREAD_GRAYSCALE).astype(np.float32)
    np.testing.assert_allclose(got, ref * 0.5 * 2.0, atol=1e-5)
    ld.close()


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_mem_loader_zip(png_dir):
    """Blob-fed decode pool (NativeMemLoader) — the zip-archive path: the
    consumer hands over compressed bytes, the C++ pool decodes + applies
    the photometric LUT, results match cv2 decode."""
    import cv2
    import zipfile

    zpath = os.path.join(os.path.dirname(png_dir[0]), "images.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for p in png_dir:
            z.write(p, os.path.basename(p))
    zf = zipfile.ZipFile(zpath)
    names = sorted(zf.namelist())

    lut = np.arange(256, dtype=np.float32) * 2.0
    ld = native_loader.NativeMemLoader(
        len(names), lambda i: zf.read(names[i]),
        n_prefetch=3, n_threads=2, inv_response=lut)
    assert len(ld) == 6
    for i in range(6):   # sequential consumption, decode runs ahead
        got = ld.get(i)
        ref = cv2.imread(png_dir[i], cv2.IMREAD_GRAYSCALE).astype(np.float32)
        np.testing.assert_allclose(got, ref * 2.0, atol=1e-5)
    # a frame that was consumed and evicted must fail fast, not deadlock
    with pytest.raises(IOError):
        ld.get(0)
    ld.close()


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_geometric_remap_parity(png_dir):
    """loader_set_remap: the worker-pool remap must match the device path
    (ops/undistort.remap_image over utils/interp.bilinear) bit-for-bit in
    semantics — clamped bilinear, -1 table entries -> 0."""
    import cv2
    import jax.numpy as jnp

    from hslam_tpu.ops.undistort import remap_image

    ref = cv2.imread(png_dir[1], cv2.IMREAD_GRAYSCALE).astype(np.float32)
    H, W = ref.shape
    OH, OW = H - 4, W + 6
    rng = np.random.RandomState(5)
    mx = rng.uniform(-3.0, W + 2.0, (OH, OW)).astype(np.float32)
    my = rng.uniform(-3.0, H + 2.0, (OH, OW)).astype(np.float32)
    # a block of invalid entries (crop-mode dead zones)
    mx[:5, :7] = -1.0
    remap = np.stack([mx, my], -1)

    nl = native_loader.NativeLoader(png_dir, n_prefetch=2, n_threads=2,
                                    remap=remap)
    try:
        got = nl.get(1)
    finally:
        nl.close()
    assert got.shape == (OH, OW)
    want = np.asarray(remap_image(jnp.asarray(ref), jnp.asarray(remap)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(not native_loader.available(),
                    reason="native library not built")
def test_remap_composes_with_photometric(png_dir):
    """Photometric-then-geometric order (HaveCalib,
    DatasetLoader.h:436-506): LUT + vignette apply at input resolution,
    then the remap resamples."""
    import cv2
    import jax.numpy as jnp

    from hslam_tpu.ops.undistort import photometric_correct, remap_image

    ref = cv2.imread(png_dir[0], cv2.IMREAD_GRAYSCALE).astype(np.float32)
    H, W = ref.shape
    lut = (np.linspace(0, 255, 256) ** 1.1 / 255.0 ** 0.1).astype(np.float32)
    vig = (1.0 + 0.3 * np.linspace(0, 1, H)[:, None]
           * np.ones((1, W))).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    remap = np.stack([np.clip(xs * 1.01 + 0.3, 0, W - 1),
                      np.clip(ys * 0.99 + 0.7, 0, H - 1)], -1)

    nl = native_loader.NativeLoader(png_dir, n_prefetch=2, n_threads=1,
                                    inv_response=lut, inv_vignette=vig,
                                    remap=remap)
    try:
        got = nl.get(0)
    finally:
        nl.close()
    corrected = photometric_correct(jnp.asarray(ref), jnp.asarray(lut),
                                    jnp.asarray(vig))
    want = np.asarray(remap_image(corrected, jnp.asarray(remap)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
