"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA; this package holds the host-side native code
the reference keeps in C++ (file IO today): ``src/pcdio.cpp`` is compiled
on first use with the system toolchain into ``_build/libfastdem_io.so``
and bound through a plain-C ABI. Everything degrades gracefully to the
pure-Python implementations when no toolchain is available
(``native.available()`` reports the outcome).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger("fastdem_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "src", "pcdio.cpp"),
    os.path.join(_HERE, "src", "scanstream.cpp"),
]
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB = os.path.join(_BUILD_DIR, "libfastdem_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _CloudBuffers(ctypes.Structure):
    _fields_ = [
        ("xyz", ctypes.POINTER(ctypes.c_float)),
        ("intensity", ctypes.POINTER(ctypes.c_float)),
        ("rgb", ctypes.POINTER(ctypes.c_uint8)),
        ("time", ctypes.POINTER(ctypes.c_float)),
        ("ring", ctypes.POINTER(ctypes.c_int32)),
        ("normal", ctypes.POINTER(ctypes.c_float)),
        ("n", ctypes.c_int64),
        ("error", ctypes.c_int32),
        ("viewpoint", ctypes.c_float * 7),
    ]


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        src_mtime = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", *_SRCS,
            "-o", _LIB, "-pthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError) as e:
        log.info("native IO build unavailable (%s); using pure-Python IO", e)
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.fastdem_load_pcd.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_CloudBuffers)
        ]
        lib.fastdem_load_kitti.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(_CloudBuffers)
        ]
        lib.fastdem_save_pcd.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fastdem_save_pcd.restype = ctypes.c_int32
        lib.fastdem_free_cloud.argtypes = [ctypes.POINTER(_CloudBuffers)]
        lib.fastdem_stream_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.fastdem_stream_open.restype = ctypes.c_void_p
        lib.fastdem_stream_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fastdem_stream_next.restype = ctypes.c_int64
        lib.fastdem_stream_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _get() is not None


def _copy_out(buf: _CloudBuffers):
    n = buf.n
    out = {}
    xyz = np.ctypeslib.as_array(buf.xyz, shape=(n, 3)).copy()
    if buf.intensity:
        out["intensity"] = np.ctypeslib.as_array(
            buf.intensity, shape=(n,)
        ).copy()
    if buf.rgb:
        out["color"] = np.ctypeslib.as_array(buf.rgb, shape=(n, 3)).copy()
    if buf.time:
        out["time"] = np.ctypeslib.as_array(buf.time, shape=(n,)).copy()
    if buf.ring:
        out["ring"] = np.ctypeslib.as_array(buf.ring, shape=(n,)).copy()
    if buf.normal:
        out["normal"] = np.ctypeslib.as_array(
            buf.normal, shape=(n, 3)
        ).copy()
    return xyz, out


def load_pcd(path: str):
    """Returns (xyz f32[N,3], channels dict, viewpoint f64[7]) or None if
    unavailable/failed."""
    lib = _get()
    if lib is None:
        return None
    buf = _CloudBuffers()
    lib.fastdem_load_pcd(path.encode(), ctypes.byref(buf))
    if buf.error != 0 or buf.n < 0:
        lib.fastdem_free_cloud(ctypes.byref(buf))
        return None
    try:
        vp = np.asarray(list(buf.viewpoint), dtype=np.float64)
        if buf.n == 0:
            return np.zeros((0, 3), np.float32), {}, vp
        xyz, out = _copy_out(buf)
        return xyz, out, vp
    finally:
        lib.fastdem_free_cloud(ctypes.byref(buf))


def load_kitti(path: str):
    lib = _get()
    if lib is None:
        return None
    buf = _CloudBuffers()
    lib.fastdem_load_kitti(path.encode(), ctypes.byref(buf))
    if buf.error != 0:
        lib.fastdem_free_cloud(ctypes.byref(buf))
        return None
    try:
        return _copy_out(buf)
    finally:
        lib.fastdem_free_cloud(ctypes.byref(buf))


def save_pcd(
    path: str, xyz: np.ndarray, intensity=None, rgb=None, normal=None,
    viewpoint=None,
) -> bool:
    lib = _get()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    # Keep temporaries alive through the call.
    _inten = (
        np.ascontiguousarray(intensity, dtype=np.float32)
        if intensity is not None
        else None
    )
    _rgb = (
        np.ascontiguousarray(rgb, dtype=np.uint8) if rgb is not None else None
    )
    _nrm = (
        np.ascontiguousarray(normal, dtype=np.float32)
        if normal is not None
        else None
    )
    _vp = (
        np.ascontiguousarray(viewpoint, dtype=np.float32)
        if viewpoint is not None
        else None
    )
    fptr = ctypes.POINTER(ctypes.c_float)
    pi = _inten.ctypes.data_as(fptr) if _inten is not None else fptr()
    pr = (
        _rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if _rgb is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    pn = _nrm.ctypes.data_as(fptr) if _nrm is not None else fptr()
    pv = _vp.ctypes.data_as(fptr) if _vp is not None else fptr()
    rc = lib.fastdem_save_pcd(
        path.encode(), n,
        xyz.ctypes.data_as(fptr), pi, pr, pn, pv,
    )
    return rc == 0


class ScanStream:
    """Prefetching scan loader: a native worker pool parses .pcd/.bin
    files ahead of the consumer and yields (xyz f32[cap, 3], mask
    bool[cap], intensity f32[cap] | None) IN FILE ORDER, pre-padded to a
    fixed capacity (the PointCloud padding convention, so results feed
    jitted pipelines without re-bucketing).

    This is the data-loader half of offline replay
    (tools/fastdem_replay.py --prefetch): file parsing overlaps device
    compute. Falls back to a sequential pure-Python loader when no
    toolchain is available — identical interface and padding.

    Files that fail to parse yield an all-masked (empty) frame and are
    counted in ``errors`` — consumers drop them, matching the
    reference's warn-and-skip (fastdem.cpp:85-117).
    """

    def __init__(self, paths, capacity: int, threads: int = 4,
                 ring: int = 8, with_intensity: bool = False):
        self.paths = [str(p) for p in paths]
        self.capacity = int(capacity)
        self.with_intensity = with_intensity
        self.errors = 0
        self._i = 0
        self._handle = None
        self._lib = _get()
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_keepalive = arr
            self._handle = self._lib.fastdem_stream_open(
                arr, len(self.paths), self.capacity, threads, ring
            )

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self.paths):
            raise StopIteration
        self._i += 1
        cap = self.capacity
        if self._handle:
            xyz = np.empty((cap, 3), np.float32)
            mask = np.empty(cap, np.uint8)
            inten = np.empty(cap, np.float32) if self.with_intensity else None
            n = self._lib.fastdem_stream_next(
                self._handle,
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if inten is not None
                else ctypes.POINTER(ctypes.c_float)(),
            )
            if n == -1:
                raise StopIteration
            if n == -2:
                self.errors += 1
                log.warning(
                    "[ScanStream] failed to parse '%s'; empty frame",
                    self.paths[self._i - 1],
                )
            return xyz, mask.astype(bool), inten
        # Pure-Python fallback: same semantics as the native path — take
        # the first `cap` points IN FILE ORDER (truncation window), with
        # non-finite points masked+sentineled in place (pointcloud
        # from_numpy already did that when the file was parsed).
        path = self.paths[self._i - 1]
        xyz = np.full((cap, 3), 1e9, np.float32)
        mask = np.zeros(cap, bool)
        inten = np.zeros(cap, np.float32) if self.with_intensity else None
        try:
            from fastdem_tpu.io import pcd as pcd_io

            cloud = (
                pcd_io.load_kitti_bin(path)
                if path.endswith(".bin")
                else pcd_io.load_pcd(path)
            )
            n = min(cloud.capacity, cap)
            xyz[:n] = np.asarray(cloud.xyz)[:n]
            mask[:n] = np.asarray(cloud.mask)[:n]
            if inten is not None and cloud.has("intensity"):
                inten[:n] = np.asarray(cloud.channels["intensity"])[:n]
        except (OSError, ValueError) as e:
            self.errors += 1
            log.warning("[ScanStream] failed to parse '%s': %s", path, e)
        return xyz, mask, inten

    def close(self):
        if self._handle and self._lib is not None:
            self._lib.fastdem_stream_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
