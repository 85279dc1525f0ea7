"""ctypes bindings for the C++ IO library (libubpl_io.so).

Build with ubpl_tpu/native/build.sh; if the .so is absent, callers fall back
to cv2/PIL (see data/native_io.py).
"""
import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libubpl_io.so")
_lib = None


class _NativeIO:
    def __init__(self, lib):
        self.lib = lib
        lib.ubpl_png_size.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.ubpl_png_size.restype = ctypes.c_int
        lib.ubpl_decode_png_rgb.argtypes = [ctypes.c_char_p,
                                            ctypes.POINTER(ctypes.c_ubyte),
                                            ctypes.c_int, ctypes.c_int]
        lib.ubpl_decode_png_rgb.restype = ctypes.c_int

    def png_size(self, path):
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self.lib.ubpl_png_size(path.encode(), ctypes.byref(w),
                                  ctypes.byref(h)) != 0:
            return None
        return (w.value, h.value)

    def decode_png(self, path):
        wh = self.png_size(path)
        if wh is None:
            return None
        w, h = wh
        out = np.empty((h, w, 3), np.uint8)
        rc = self.lib.ubpl_decode_png_rgb(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            w, h)
        return out if rc == 0 else None


def load():
    global _lib
    if _lib is None:
        if os.path.exists(_SO):
            try:
                _lib = _NativeIO(ctypes.CDLL(_SO))
            except OSError:
                _lib = False
        else:
            _lib = False
    return _lib or None
