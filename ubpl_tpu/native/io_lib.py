"""ctypes bindings for libubpl_io.so (threaded C++ PNG/JPEG decode+resize).

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
        ip = ctypes.POINTER(ctypes.c_int)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.ubpl_png_size.argtypes = [ctypes.c_char_p, ip, ip]
        lib.ubpl_png_size.restype = ctypes.c_int
        lib.ubpl_image_size.argtypes = [ctypes.c_char_p, ip, ip]
        lib.ubpl_image_size.restype = ctypes.c_int
        lib.ubpl_decode_png_rgb.argtypes = [ctypes.c_char_p, u8p,
                                            ctypes.c_int, ctypes.c_int]
        lib.ubpl_decode_png_rgb.restype = ctypes.c_int
        lib.ubpl_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
            ctypes.c_int, ctypes.c_int]
        lib.ubpl_decode_resize_batch.restype = ctypes.c_int

    def image_size(self, path):
        w, h = ctypes.c_int(), ctypes.c_int()
        if self.lib.ubpl_image_size(path.encode(), ctypes.byref(w),
                                    ctypes.byref(h)) != 0:
            return None
        return (w.value, h.value)

    def png_size(self, path):
        w, h = ctypes.c_int(), ctypes.c_int()
        if self.lib.ubpl_png_size(path.encode(), ctypes.byref(w),
                                  ctypes.byref(h)) != 0:
            return None
        return (w.value, h.value)

    def decode_png(self, path):
        """Decode one PNG at native size -> [H, W, 3] RGB uint8 or None."""
        wh = self.png_size(path)
        if wh is None:
            return None
        w, h = wh
        out = np.empty((h, w, 3), np.uint8)
        rc = self.lib.ubpl_decode_png_rgb(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            w, h)
        return out if rc == 0 else None

    def decode_resize_batch(self, paths, res, n_threads=0):
        """Decode+resize a batch -> [N, res, res, 3] RGB uint8.

        Returns (array, n_failures); failed frames are zeroed.
        """
        n = len(paths)
        out = np.empty((n, res, res, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if n_threads <= 0:
            n_threads = min(16, os.cpu_count() or 1)
        failures = self.lib.ubpl_decode_resize_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), res,
            n_threads)
        return out, int(failures)


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
