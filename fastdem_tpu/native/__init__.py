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
_SRC = os.path.join(_HERE, "src", "pcdio.cpp")
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
        ("n", ctypes.c_int64),
        ("error", ctypes.c_int32),
    ]


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB,
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
        ]
        lib.fastdem_save_pcd.restype = ctypes.c_int32
        lib.fastdem_free_cloud.argtypes = [ctypes.POINTER(_CloudBuffers)]
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
    return xyz, out


def load_pcd(path: str):
    """Returns (xyz f32[N,3], channels dict) or None if unavailable/failed."""
    lib = _get()
    if lib is None:
        return None
    buf = _CloudBuffers()
    lib.fastdem_load_pcd(path.encode(), ctypes.byref(buf))
    if buf.error != 0 or buf.n < 0:
        lib.fastdem_free_cloud(ctypes.byref(buf))
        return None
    try:
        if buf.n == 0:
            return np.zeros((0, 3), np.float32), {}
        return _copy_out(buf)
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


def save_pcd(path: str, xyz: np.ndarray, intensity=None, rgb=None) -> bool:
    lib = _get()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    pi = (
        np.ascontiguousarray(intensity, dtype=np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        )
        if intensity is not None
        else ctypes.POINTER(ctypes.c_float)()
    )
    # Keep temporaries alive through the call.
    _inten = (
        np.ascontiguousarray(intensity, dtype=np.float32)
        if intensity is not None
        else None
    )
    _rgb = (
        np.ascontiguousarray(rgb, dtype=np.uint8) if rgb is not None else None
    )
    pi = (
        _inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if _inten is not None
        else ctypes.POINTER(ctypes.c_float)()
    )
    pr = (
        _rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if _rgb is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    rc = lib.fastdem_save_pcd(
        path.encode(), n,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pi, pr,
    )
    return rc == 0
