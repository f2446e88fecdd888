"""Native (C++) input-pipeline workers.

The reference's input-path performance comes from Paddle's C++
DataLoader workers and an optional DALI flag
(`passl/data/__init__.py:72-80`); this package is the equivalent here:
a libjpeg-based decode+crop+resize kernel (`decode.cc`) compiled on
first use and bound via ctypes (GIL released during calls, so decode
overlaps the host feeding the TPU even with num_workers=0).

Public surface:
  available() -> bool                          (toolchain/lib present?)
  jpeg_size(bytes) -> (w, h)
  decode_crop_resize(bytes, box, out_size, flip) -> uint8 [s, s, 3]
  NativeJpegRRC(size, scale, ratio)            transform: JPEG bytes →
      uint8 RRC crop, sampling the crop box with the SAME torchvision
      semantics as data/transforms.RandomResizedCrop (parity-tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpassl_native.so")
_SRC = os.path.join(_HERE, "decode.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.passl_jpeg_size.restype = ctypes.c_int
        lib.passl_jpeg_size.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
        lib.passl_decode_crop_resize.restype = ctypes.c_int
        lib.passl_decode_crop_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_size(buf: bytes) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.passl_jpeg_size(buf, len(buf), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("not a decodable JPEG")
    return w.value, h.value


def decode_crop_resize(buf: bytes, box, out_size: int, flip: bool = False) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    out = np.empty((out_size, out_size, 3), np.uint8)
    x, y, cw, ch = map(int, box)
    rc = lib.passl_decode_crop_resize(buf, len(buf), x, y, cw, ch,
                                      int(out_size), int(bool(flip)),
                                      out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError("JPEG decode failed")
    return out


class _Dims:
    """Duck-typed stand-in with .size so RandomResizedCrop.get_params
    (the parity-tested torchvision sampler) can run on header dims."""

    def __init__(self, w: int, h: int):
        self.size = (w, h)


class NativeJpegRRC:
    """JPEG bytes → uint8 RRC crop, fully in C++ (header-only dims read,
    DCT-scaled decode of just the crop rows, bilinear resize, flip)."""

    def __init__(self, size: int = 224, scale=(0.08, 1.0),
                 ratio=(3.0 / 4, 4.0 / 3), flip_prob: float = 0.5):
        from ..data.transforms import RandomResizedCrop

        self.size = int(size)
        self.flip_prob = float(flip_prob)
        self._sampler = RandomResizedCrop(size, scale=scale, ratio=ratio)

    def __call__(self, buf):
        import random

        if not isinstance(buf, (bytes, bytearray)):
            raise TypeError("NativeJpegRRC consumes raw JPEG bytes; set "
                            "dataset raw_bytes: True")
        w, h = jpeg_size(bytes(buf))
        box = self._sampler.get_params(_Dims(w, h))
        flip = random.random() < self.flip_prob
        return decode_crop_resize(bytes(buf), box, self.size, flip)
