"""Native runtime bindings: builds and loads flan_native.so via ctypes.

The codec hot loops (PCM interleave/deinterleave, 24-bit .flan packing, BMP
row encoding) run in C++ when the toolchain is available; every caller has a
pure-numpy fallback, so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "flan_native.cpp")
_SO = os.path.join(_HERE, "flan_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()

_FMT_CODES = {8: 1, 16: 2, 24: 3, 32: 4, "f32": 5, "f64": 6}


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.flan_decode_pcm.argtypes = [u8, ctypes.c_int64, ctypes.c_int32,
                                        ctypes.c_int32, f32]
        lib.flan_decode_pcm.restype = ctypes.c_int
        lib.flan_encode_pcm.argtypes = [f32, ctypes.c_int64, ctypes.c_int32,
                                        ctypes.c_int32, u8]
        lib.flan_encode_pcm.restype = ctypes.c_int
        lib.flan_pack_mf24.argtypes = [f32, f32, ctypes.c_int64,
                                       ctypes.c_float, ctypes.c_float, u8]
        lib.flan_pack_mf24.restype = ctypes.c_int
        lib.flan_unpack_mf24.argtypes = [u8, ctypes.c_int64,
                                         ctypes.c_float, ctypes.c_float,
                                         f32, f32]
        lib.flan_unpack_mf24.restype = ctypes.c_int
        lib.flan_encode_bmp_rows.argtypes = [u8, ctypes.c_int32,
                                             ctypes.c_int32, u8]
        lib.flan_encode_bmp_rows.restype = ctypes.c_int64
        _lib = lib
        return _lib


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_pcm(raw: bytes, num_channels: int, bits,
               ) -> Optional[np.ndarray]:
    """Interleaved PCM/float bytes -> planar float32 [C, N], or None."""
    lib = get_lib()
    if lib is None:
        return None
    code = _FMT_CODES.get(bits)
    if code is None:
        return None
    bps = {1: 1, 2: 2, 3: 3, 4: 4, 5: 4, 6: 8}[code]
    num_frames = len(raw) // (bps * num_channels)
    if num_frames == 0:
        return np.zeros((num_channels, 0), np.float32)
    src = np.frombuffer(raw, np.uint8,
                        count=num_frames * num_channels * bps)
    out = np.empty((num_channels, num_frames), np.float32)
    rc = lib.flan_decode_pcm(_u8ptr(src), num_frames, num_channels, code,
                             _f32ptr(out))
    return out if rc == 0 else None


def encode_pcm(data: np.ndarray, bits) -> Optional[bytes]:
    """Planar float32 [C, N] -> interleaved bytes, or None."""
    lib = get_lib()
    if lib is None:
        return None
    code = _FMT_CODES.get(bits)
    if code is None or code in (1, 6):
        return None
    bps = {2: 2, 3: 3, 4: 4, 5: 4}[code]
    c, n = data.shape
    data = np.ascontiguousarray(data, np.float32)
    out = np.empty(n * c * bps, np.uint8)
    rc = lib.flan_encode_pcm(_f32ptr(data), n, c, code, _u8ptr(out))
    return out.tobytes() if rc == 0 else None


def pack_mf24(mag: np.ndarray, freq: np.ndarray, mag_scale: float,
              freq_scale: float) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    mag = np.ascontiguousarray(mag, np.float32).reshape(-1)
    freq = np.ascontiguousarray(freq, np.float32).reshape(-1)
    out = np.empty(mag.size * 6, np.uint8)
    rc = lib.flan_pack_mf24(_f32ptr(mag), _f32ptr(freq), mag.size,
                            mag_scale, freq_scale, _u8ptr(out))
    return out.tobytes() if rc == 0 else None


def unpack_mf24(raw: np.ndarray, count: int, mag_scale: float,
                freq_scale: float):
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    mag = np.empty(count, np.float32)
    freq = np.empty(count, np.float32)
    rc = lib.flan_unpack_mf24(_u8ptr(raw), count, mag_scale, freq_scale,
                              _f32ptr(mag), _f32ptr(freq))
    return (mag, freq) if rc == 0 else None


def encode_bmp_rows(rgb: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    h, w, _ = rgb.shape
    rgb = np.ascontiguousarray(rgb, np.uint8)
    row_size = (3 * w + 3) & ~3
    out = np.empty(row_size * h, np.uint8)
    n = lib.flan_encode_bmp_rows(_u8ptr(rgb), w, h, _u8ptr(out))
    return out.tobytes() if n == row_size * h else None
