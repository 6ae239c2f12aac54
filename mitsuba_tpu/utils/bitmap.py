"""Image I/O + pixel-format conversion.

Reference: src/core/bitmap.cpp (2550 LoC — EXR/PNG/JPG I/O, format
conversion, sRGB gamma).  Here: numpy + the baked-in imaging stacks
(Pillow for LDR, OpenCV for EXR float images); conversions are numpy maps.
"""
from __future__ import annotations

import os

import numpy as np


def srgb_to_linear(x):
    x = np.asarray(x, np.float32)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = np.asarray(x, np.float32)
    x = np.clip(x, 0.0, None)
    return np.where(
        x <= 0.0031308, 12.92 * x, 1.055 * np.power(x, 1.0 / 2.4) - 0.055
    )


def read_image(path, to_linear: bool = True):
    """Read an image file -> (H, W, C) float32. LDR files are converted to
    linear radiance (bitmap.cpp convert() with sRGB transfer)."""
    p = str(path)
    ext = os.path.splitext(p)[1].lower()
    if ext in (".exr", ".hdr", ".pfm"):
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        img = cv2.imread(p, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise IOError(f"failed to read {p}")
        if img.ndim == 3:
            img = img[..., ::-1]  # BGR -> RGB
        return np.asarray(img, np.float32)
    from PIL import Image

    img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    return srgb_to_linear(img) if to_linear else img


def write_image(path, img, from_linear: bool = True):
    """Write (H, W, C) float32. EXR keeps linear float; LDR formats are
    tonemapped with the sRGB transfer (bitmap.cpp write())."""
    p = str(path)
    img = np.asarray(img, np.float32)
    ext = os.path.splitext(p)[1].lower()
    if ext == ".exr":
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        out = img[..., ::-1] if img.ndim == 3 else img
        try:
            ok = cv2.imwrite(p, out.astype(np.float32))
        except cv2.error as e:
            raise IOError(f"failed to write {p}: {e}") from e
        if not ok:
            raise IOError(f"failed to write {p}")
        return
    from PIL import Image

    ldr = linear_to_srgb(img) if from_linear else np.clip(img, 0, 1)
    arr = (np.clip(ldr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(p)
