"""Dataset reader: layout detection, timestamps/exposures, and zipped
archives for all three layouts (reference DatasetLoader.h:61-139,410-434)."""
import os
import tempfile
import zipfile

import numpy as np
import pytest

from hslam_tpu.io.dataset import DatasetReader

cv2 = pytest.importorskip("cv2")


def _png_bytes(seed, h=24, w=32):
    img = np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return img, buf.tobytes()


def test_tum_zip(tmp_path):
    d = str(tmp_path)
    imgs = []
    with zipfile.ZipFile(os.path.join(d, "images.zip"), "w") as z:
        for i in range(4):
            img, buf = _png_bytes(i)
            imgs.append(img)
            z.writestr(f"images/{i:05d}.png", buf)
    with open(os.path.join(d, "times.txt"), "w") as f:
        for i in range(4):
            f.write(f"{i:05d} {i * 0.05:.6f} {1.0 + 0.1 * i:.3f}\n")
    r = DatasetReader(d, kind="tum")
    assert len(r) == 4
    fd = r.get_raw(2)
    np.testing.assert_array_equal(fd.image, imgs[2].astype(np.float32))
    assert abs(fd.timestamp - 0.10) < 1e-9
    assert abs(fd.exposure - 1.2) < 1e-9


def test_euroc_zip(tmp_path):
    d = str(tmp_path)
    imgs = []
    with zipfile.ZipFile(os.path.join(d, "images.zip"), "w") as z:
        for i in range(3):
            img, buf = _png_bytes(10 + i)
            imgs.append(img)
            z.writestr(f"mav0/cam0/data/{1403636579763555584 + i}.png", buf)
    r = DatasetReader(d, kind="euroc")
    assert len(r) == 3
    fd = r.get_raw(1)
    np.testing.assert_array_equal(fd.image, imgs[1].astype(np.float32))
    assert fd.timestamp == pytest.approx(1403636579.763555584 + 1e-9, abs=1e-3)


def test_kitti_zip(tmp_path):
    d = str(tmp_path)
    imgs = []
    with zipfile.ZipFile(os.path.join(d, "images.zip"), "w") as z:
        for i in range(3):
            img, buf = _png_bytes(20 + i)
            imgs.append(img)
            z.writestr(f"image_0/{i:06d}.png", buf)
    with open(os.path.join(d, "times.txt"), "w") as f:
        for i in range(3):
            f.write(f"{i * 0.1:.6f}\n")
    r = DatasetReader(d, kind="kitti")
    assert len(r) == 3
    fd = r.get_raw(0)
    np.testing.assert_array_equal(fd.image, imgs[0].astype(np.float32))
    assert fd.timestamp == pytest.approx(0.0)


def test_directory_layouts(tmp_path):
    # unzipped KITTI directory
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "image_0"))
    for i in range(2):
        img, buf = _png_bytes(30 + i)
        with open(os.path.join(d, "image_0", f"{i:06d}.png"), "wb") as f:
            f.write(buf)
    r = DatasetReader(d)     # auto-detect
    assert r.kind == "kitti"
    assert len(r) == 2


def test_stereo_rectify_rows_align():
    """Stereo rectification (GeometricUndistorter.cpp:125-156 capability):
    after rectification, corresponding observations of any 3D point land on
    the same output row in both cameras, disparity follows f*B/Z, and the
    remap tables send each rectified pixel back to the point's distorted
    source pixel."""
    import numpy as np
    from scipy.spatial.transform import Rotation as Rot
    from hslam_tpu.io.calib_io import stereo_rectify, _distort

    rng = np.random.RandomState(0)
    p1 = np.array([300.0, 300.0, 320.0, 240.0, -0.28, 0.07, 1e-4, -2e-4])
    p2 = np.array([305.0, 304.0, 318.0, 242.0, -0.27, 0.06, -1e-4, 5e-5])
    # right camera 11 cm to the right, slightly rotated (EuRoC-like)
    R = Rot.from_rotvec([0.004, -0.01, 0.002]).as_matrix()
    C2 = np.array([0.11, 0.002, -0.001])
    T = -R @ C2                       # x2 = R x1 + T
    cam1, cam2, R1, R2, P1, P2 = stereo_rectify(
        "radtan", p1, "radtan", p2, (640, 480), R, T)

    X = np.stack([rng.uniform(-0.5, 0.5, 40), rng.uniform(-0.4, 0.4, 40),
                  rng.uniform(1.0, 4.0, 40)], -1)        # points in cam1
    # rectified projections
    xr1 = X @ R1.T
    xr2 = (X @ R.T + T) @ R2.T
    u1 = P1[0, 0] * xr1[:, 0] / xr1[:, 2] + P1[0, 2]
    v1 = P1[1, 1] * xr1[:, 1] / xr1[:, 2] + P1[1, 2]
    # (P2's Tx column encodes the baseline for projecting rect-cam1-frame
    # points; xr2 is already in cam2's rectified frame, so plain pinhole)
    u2 = P2[0, 0] * xr2[:, 0] / xr2[:, 2] + P2[0, 2]
    v2 = P2[1, 1] * xr2[:, 1] / xr2[:, 2] + P2[1, 2]
    np.testing.assert_allclose(v1, v2, atol=1e-8)        # epipolar rows
    # disparity = f * B / Z (rectified depth)
    np.testing.assert_allclose(u1 - u2, -P2[0, 3] / xr1[:, 2], rtol=1e-6)

    # remap consistency: rectified pixel -> distorted source pixel of the
    # SAME ray (bilinear sample of the table vs analytic projection)
    xd, yd = _distort("radtan", p1[4:], X[:, 0] / X[:, 2], X[:, 1] / X[:, 2])
    ud = p1[0] * xd + p1[2]
    vd = p1[1] * yd + p1[3]
    inside = (u1 > 1) & (u1 < 638) & (v1 > 1) & (v1 < 478)
    assert inside.sum() > 20
    for ui, vi, udi, vdi in zip(u1[inside], v1[inside],
                                ud[inside], vd[inside]):
        x0, y0 = int(ui), int(vi)
        fx_, fy_ = ui - x0, vi - y0
        patch = cam1.remap[y0:y0 + 2, x0:x0 + 2]
        if (patch < 0).any():
            continue
        interp = (patch[0, 0] * (1 - fx_) * (1 - fy_)
                  + patch[0, 1] * fx_ * (1 - fy_)
                  + patch[1, 0] * (1 - fx_) * fy_
                  + patch[1, 1] * fx_ * fy_)
        assert abs(interp[0] - udi) < 0.05 and abs(interp[1] - vdi) < 0.05


def test_zip_through_native_mem_loader(tmp_path):
    """Archive dataset routed through the C++ decode pool: the reader
    supplies compressed bytes, the pool decodes — output must match the
    reader's own decode (the run_sequence.py zip fast path)."""
    from hslam_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native library not built")
    d = str(tmp_path)
    imgs = []
    with zipfile.ZipFile(os.path.join(d, "images.zip"), "w") as z:
        for i in range(5):
            img, buf = _png_bytes(30 + i)
            imgs.append(img)
            z.writestr(f"images/{i:05d}.png", buf)
    with open(os.path.join(d, "times.txt"), "w") as f:
        for i in range(5):
            f.write(f"{i:05d} {i * 0.05:.6f} 1.0\n")
    r = DatasetReader(d, kind="tum")
    ld = native_loader.NativeMemLoader(
        len(r), lambda i: r._zip.read(r.files[i]), n_prefetch=2)
    for i in range(5):
        np.testing.assert_array_equal(ld.get(i), r.get_raw(i).image)
    ld.close()
