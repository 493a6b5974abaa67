"""ctypes wrapper for the native streaming runtime (native/runtime.cpp):
sensor ring buffers, accel→gyro interpolation, and per-image IMU chunk
packing done in C++ — the orchestration role of the reference's
ViewController sensor callbacks + getMeasurements
(ViewController.mm:604-638, 1020-1173) without Python in the hot path.

`StreamSync` exposes the same behavior in pure numpy (built on
io/imu_sync) and is the fallback when no C++ toolchain is available;
`NativeStreamSync` is the production path. Both yield
(image_id, t_image, ImuChunk) in the estimator's native chunk layout.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..core.preintegration import ImuChunk

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvinsruntime.so")
_lib = None


def _build_and_load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "runtime.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libvinsruntime.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vr_create.restype = ctypes.c_void_p
    lib.vr_create.argtypes = [ctypes.c_int, ctypes.c_long, ctypes.c_long]
    for name in ("vr_push_accel", "vr_push_gyro"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 4
    lib.vr_push_image.restype = ctypes.c_int
    lib.vr_push_image.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                  ctypes.c_long]
    lib.vr_pending.restype = ctypes.c_long
    lib.vr_pending.argtypes = [ctypes.c_void_p]
    lib.vr_poll_chunk.restype = ctypes.c_long
    lib.vr_poll_chunk.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.vr_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeStreamSync:
    """Streaming IMU↔image alignment backed by native/runtime.cpp."""

    def __init__(self, max_per_edge: int, imu_capacity: int = 4096,
                 img_capacity: int = 64):
        self.lib = _build_and_load()
        self.N = max_per_edge
        self.handle = self.lib.vr_create(max_per_edge, imu_capacity,
                                         img_capacity)
        if not self.handle:
            raise RuntimeError("vr_create failed")

    def push_accel(self, t: float, xyz) -> bool:
        return self.lib.vr_push_accel(
            self.handle, float(t), float(xyz[0]), float(xyz[1]),
            float(xyz[2])) == 0

    def push_gyro(self, t: float, xyz) -> bool:
        return self.lib.vr_push_gyro(
            self.handle, float(t), float(xyz[0]), float(xyz[1]),
            float(xyz[2])) == 0

    def push_image(self, t: float, image_id: int) -> bool:
        return self.lib.vr_push_image(self.handle, float(t),
                                      int(image_id)) == 0

    def pending(self) -> int:
        return int(self.lib.vr_pending(self.handle))

    def poll(self) -> Optional[Tuple[int, float, ImuChunk]]:
        """Next (image_id, t_image, chunk), or None if not ready."""
        N = self.N
        dt = np.zeros(N, np.float32)
        acc = np.zeros(3 * N, np.float32)
        gyr = np.zeros(3 * N, np.float32)
        t_img = np.zeros(1, np.float64)
        idx = self.lib.vr_poll_chunk(self.handle, dt, acc, gyr, t_img)
        if idx < 0:
            return None
        chunk = ImuChunk(dt=dt, acc=acc.reshape(N, 3), gyr=gyr.reshape(N, 3))
        return int(idx), float(t_img[0]), chunk

    def close(self):
        if getattr(self, "handle", None):
            self.lib.vr_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class StreamSync:
    """Pure-Python fallback with identical semantics (io/imu_sync math)."""

    def __init__(self, max_per_edge: int, imu_capacity: int = 4096,
                 img_capacity: int = 64):
        self.N = max_per_edge
        self.accel: list = []
        self.gyro: list = []
        self.fused: list = []   # (t, acc[3], gyr[3])
        self.images: list = []
        self.last_img_t: Optional[float] = None
        self.imu_capacity = imu_capacity
        self.img_capacity = img_capacity

    def push_accel(self, t, xyz) -> bool:
        if self.accel and t <= self.accel[-1][0]:
            return False
        self.accel.append((float(t), np.asarray(xyz, np.float64)))
        self._fuse()
        return True

    def push_gyro(self, t, xyz) -> bool:
        if self.gyro and t <= self.gyro[-1][0]:
            return False
        self.gyro.append((float(t), np.asarray(xyz, np.float64)))
        self._fuse()
        return True

    def push_image(self, t, image_id) -> bool:
        if len(self.images) >= self.img_capacity:
            return False
        if self.images and t <= self.images[-1][0]:
            return False
        self.images.append((float(t), int(image_id)))
        return True

    def _fuse(self):
        while self.gyro and len(self.accel) >= 2:
            tg, g = self.gyro[0]
            if tg < self.accel[0][0]:
                self.gyro.pop(0)
                continue
            while len(self.accel) >= 2 and self.accel[1][0] < tg:
                self.accel.pop(0)
            if len(self.accel) < 2:
                break
            (t0, a0), (t1, a1) = self.accel[0], self.accel[1]
            if tg < t0:
                self.gyro.pop(0)
                continue
            w = (tg - t0) / (t1 - t0) if t1 > t0 else 0.0
            fa = a0 + w * (a1 - a0)
            if not self.fused or tg > self.fused[-1][0]:
                self.fused.append((tg, fa, g))
                if len(self.fused) > self.imu_capacity:
                    self.fused.pop(0)
            self.gyro.pop(0)

    def pending(self) -> int:
        if not self.fused:
            return 0
        t_max = self.fused[-1][0]
        return sum(1 for (t, _) in self.images if t <= t_max)

    def poll(self) -> Optional[Tuple[int, float, ImuChunk]]:
        if not self.images:
            return None
        t_img, img_id = self.images[0]
        if not self.fused or self.fused[-1][0] < t_img:
            return None
        self.images.pop(0)
        N = self.N
        dt = np.zeros(N, np.float32)
        acc = np.zeros((N, 3), np.float32)
        gyr = np.zeros((N, 3), np.float32)

        t_prev = self.last_img_t
        seed = None
        win = []
        while self.fused and self.fused[0][0] <= t_img:
            s = self.fused.pop(0)
            if t_prev is not None and s[0] <= t_prev:
                seed = s
                continue
            win.append(s)
        if t_prev is None:
            t_prev = win[0][0] if win else t_img
        if seed is None and win:
            seed = win[0]
        if seed is not None:
            acc[0] = seed[1]
            gyr[0] = seed[2]

        j = 1
        t_cursor = t_prev
        for (t, a, g) in win:
            d = t - t_cursor
            t_cursor = t
            if d < 0:
                continue
            if j >= N:
                dt[N - 1] += d
                acc[N - 1] = a
                gyr[N - 1] = g
                continue
            dt[j] = d
            acc[j] = a
            gyr[j] = g
            j += 1
        tail = t_img - t_cursor
        if tail > 1e-9 and j > 1:
            if j < N:
                dt[j] = tail
                acc[j] = acc[j - 1]
                gyr[j] = gyr[j - 1]
            else:
                dt[N - 1] += tail

        self.last_img_t = t_img
        return img_id, t_img, ImuChunk(dt=dt, acc=acc, gyr=gyr)

    def close(self):
        pass


def make_stream_sync(max_per_edge: int, **kw):
    """Native if buildable, else the pure-Python fallback."""
    try:
        return NativeStreamSync(max_per_edge, **kw)
    except Exception:
        return StreamSync(max_per_edge, **kw)
