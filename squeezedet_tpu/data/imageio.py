"""Image decoding with an optional native fast path.

`read_image` returns float32 RGB HWC. When the C++ loader library
(native/dataloader) is built and enabled it decodes PNGs off the GIL;
otherwise cv2 (then PIL) is used.
"""

from __future__ import annotations

import numpy as np


def _cv2_read(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1].astype(np.float32)  # BGR -> RGB


def _pil_read(path: str) -> np.ndarray:  # pragma: no cover
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        # flag set LAST: a racing thread either recomputes the same result
        # (native_loader._get_lib is serialized) or reads the final value —
        # never caches None while the first loader is still mid-build
        try:
            from squeezedet_tpu.data import native_loader

            _native = native_loader if native_loader.available() else None
            _native_checked = True
        except Exception:
            _native = None
            _native_checked = True
    return _native


def read_image(path: str, prefer_native: bool = True) -> np.ndarray:
    if prefer_native:
        native = _get_native()
        if native is not None and path.endswith(".png"):
            try:
                return native.read_png(path)
            except Exception:
                pass
    try:
        return _cv2_read(path)
    except ImportError:  # pragma: no cover
        return _pil_read(path)
