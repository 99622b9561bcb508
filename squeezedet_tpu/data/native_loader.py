"""ctypes bindings for the native C++ image loader (native/dataloader).

The shared library decodes PNGs in C++ off the GIL, so DataLoader threads
overlap for real on the host (decode is the host bottleneck; the
production pipeline keeps resize/whiten in numpy for bit-parity with the
reference order). A fused decode+resize+whiten entry point is also bound
for serving-style pipelines that don't need that parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "dataloader",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsqdt_loader.so")

_lib = None
_load_attempted = False
_load_lock = threading.Lock()


def _get_lib():
    """Build (as needed) + dlopen the loader, once per process.

    Serialized: DataLoader worker threads race here on the first decode,
    and an unlocked check-then-set would let a second racer observe
    "attempted, no lib" and cache the cv2 fallback for the whole process.
    make always runs (no-op when fresh) so a stale .so from before a
    loader.cc change is rebuilt rather than silently reused."""
    global _lib, _load_attempted
    with _load_lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None  # no toolchain and no prebuilt library
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.sqdt_png_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sqdt_png_size.restype = ctypes.c_int
        lib.sqdt_read_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sqdt_read_png.restype = ctypes.c_int
        lib.sqdt_load_resize_whiten.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sqdt_load_resize_whiten.restype = ctypes.c_int
        lib.sqdt_png_size_mem.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sqdt_png_size_mem.restype = ctypes.c_int
        lib.sqdt_decode_resize_u8_mem.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sqdt_decode_resize_u8_mem.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def read_png(path: str) -> np.ndarray:
    """Decode a PNG to float32 RGB HWC."""
    lib = _get_lib()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.sqdt_png_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise FileNotFoundError(path)
    out = np.empty((h.value, w.value, 3), dtype=np.float32)
    rc = lib.sqdt_read_png(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h.value,
        w.value,
    )
    if rc != 0:
        raise IOError(f"native PNG decode failed ({rc}): {path}")
    return out


def load_resize_whiten(
    path: str,
    out_hw: tuple[int, int],
    mean: np.ndarray,
    std: np.ndarray,
) -> tuple[np.ndarray, tuple[int, int]]:
    """Fused decode+resize+whiten. Returns (image (H,W,3) f32, orig (h, w))."""
    lib = _get_lib()
    out = np.empty((out_hw[0], out_hw[1], 3), dtype=np.float32)
    mean = np.ascontiguousarray(np.ravel(mean), dtype=np.float32)
    std = np.ascontiguousarray(np.ravel(std), dtype=np.float32)
    orig = (ctypes.c_int * 2)()
    rc = lib.sqdt_load_resize_whiten(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_hw[0],
        out_hw[1],
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig,
    )
    if rc != 0:
        raise IOError(f"native load failed ({rc}): {path}")
    return out, (orig[0], orig[1])


def png_size_mem(data: bytes) -> tuple[int, int]:
    """(height, width) of an in-memory PNG without full decode."""
    lib = _get_lib()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.sqdt_png_size_mem(
        data, len(data), ctypes.byref(h), ctypes.byref(w)
    ) != 0:
        raise ValueError("not a decodable PNG")
    return h.value, w.value


def decode_resize_u8(
    data: bytes, out_hw: tuple[int, int]
) -> tuple[np.ndarray, tuple[int, int]]:
    """Serving compressed ingest: in-memory PNG -> decode -> bilinear
    resize -> uint8 RGB HWC, one C call off the GIL. Returns
    (image (H,W,3) u8, orig (h, w)). Feeds the uint8 device dispatch
    (folded whitening) directly."""
    lib = _get_lib()
    out = np.empty((out_hw[0], out_hw[1], 3), dtype=np.uint8)
    orig = (ctypes.c_int * 2)()
    rc = lib.sqdt_decode_resize_u8_mem(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_hw[0],
        out_hw[1],
        orig,
    )
    if rc != 0:
        raise ValueError(f"native PNG byte decode failed (rc={rc})")
    return out, (orig[0], orig[1])
