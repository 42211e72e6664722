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
