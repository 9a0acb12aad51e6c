"""ctypes binding to the in-repo C++ runtime library (native/).

Components (each replacing a native external dependency of the reference):
  * rasterizer — weak-perspective mesh renderer (replaces pyrender/EGL)
  * imageops   — fused crop/resize/normalize host preprocessing
                 (replaces cv2/skimage)
  * capture    — tick-published frame ring buffer (replaces the reference's
                 unsynchronized capture thread)

The library is built by ``make -C native`` (plain g++, no pybind11); this
module auto-builds it on first import when a toolchain is available and
degrades to ``available() == False`` otherwise — every consumer has a python
fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_HERE, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdynaboa_native.so")

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.render_mesh.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                                f32p, ctypes.c_int, ctypes.c_int, f32p, u8p,
                                ctypes.c_int]
    lib.render_mesh.restype = ctypes.c_int
    lib.composite_over.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int]
    lib.composite_over.restype = ctypes.c_int
    lib.crop_resize_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p]
    lib.crop_resize_normalize.restype = ctypes.c_int
    lib.ring_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_push.restype = ctypes.c_uint64
    lib.ring_read_latest.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_read_latest.restype = ctypes.c_uint64
    lib.ring_latest_tick.argtypes = [ctypes.c_void_p]
    lib.ring_latest_tick.restype = ctypes.c_uint64

    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def render_mesh(verts: np.ndarray, faces: np.ndarray, cam, width: int,
                height: int, color=(1.0, 1.0, 0.9),
                cull: bool = False) -> np.ndarray:
    """Rasterize (verts, faces) under the weak-perspective cam
    (sx, sy, tx, ty) -> (H, W, 4) uint8 RGBA.  ``cull`` skips camera-averted
    faces — sound for closed outward-CCW meshes (SMPL), halves raster work,
    and matches pyrender's default; leave False for arbitrary open meshes."""
    lib = load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    cam = np.ascontiguousarray(cam, np.float32)
    color = np.ascontiguousarray(color, np.float32)
    out = np.zeros((height, width, 4), np.uint8)
    rc = lib.render_mesh(_fp(verts), verts.shape[0], _i32(faces),
                         faces.shape[0], _fp(cam), width, height,
                         _fp(color), _u8(out), int(cull))
    assert rc == 0
    return out


def composite_over(rgba: np.ndarray, img: np.ndarray) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img, np.uint8)
    rgba = np.ascontiguousarray(rgba, np.uint8)
    lib.composite_over(_u8(rgba), _u8(img), img.shape[1], img.shape[0])
    return img


def crop_resize_normalize(img: np.ndarray, center, scale: float,
                          out_res: int = 224, supersample: int = 1,
                          mean=None, std=None) -> np.ndarray:
    from dynaboa_tpu import constants
    from dynaboa_tpu.ops.image import crop_bounds

    lib = load()
    img = np.ascontiguousarray(img, np.float32)
    mean = np.ascontiguousarray(
        constants.IMG_NORM_MEAN if mean is None else mean, np.float32)
    std = np.ascontiguousarray(
        constants.IMG_NORM_STD if std is None else std, np.float32)
    out = np.empty((out_res, out_res, 3), np.float32)
    # the exact integer box comes from the authoritative host implementation
    ul, br = crop_bounds(center, scale, [out_res, out_res])
    rc = lib.crop_resize_normalize(
        _fp(img), img.shape[0], img.shape[1],
        int(ul[0]), int(ul[1]), int(br[0]), int(br[1]),
        out_res, supersample, _fp(mean), _fp(std), _fp(out))
    assert rc == 0
    return out


class FrameRing:
    """Tick-published SPSC frame ring (native); see native/capture.cpp."""

    def __init__(self, slots: int, frame_shape: tuple[int, ...]):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.frame_shape = tuple(frame_shape)
        self._bytes = int(np.prod(frame_shape))
        self._h = self._lib.ring_create(slots, self._bytes)

    def push(self, frame: np.ndarray) -> int:
        frame = np.ascontiguousarray(frame, np.uint8)
        assert frame.nbytes == self._bytes
        return int(self._lib.ring_push(self._h, _u8(frame)))

    def read_latest(self) -> tuple[int, np.ndarray | None]:
        out = np.empty(self.frame_shape, np.uint8)
        t = int(self._lib.ring_read_latest(self._h, _u8(out)))
        return (t, out) if t else (0, None)

    def latest_tick(self) -> int:
        return int(self._lib.ring_latest_tick(self._h))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ring_destroy(self._h)
        except Exception:
            pass
