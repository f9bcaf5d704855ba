"""Test-only ctypes bridge to the system libgd (which wraps the
REFERENCE codec libraries: libjpeg.so.62, libpng16, plus gd's own GIF
codec) — cross-validation oracles for the repo's pure-Python JPEG,
PNG and GIF codecs, extending the r6 libwebp-oracle pattern.

Why gd instead of raw libjpeg/libpng: both expose struct-and-callback
C APIs whose ABI layouts are version-dependent and whose error paths
longjmp/exit (libjpeg's default error_exit terminates the process) —
hazardous through ctypes. gd wraps them behind a flat memory API
(gdImageCreateFrom{Jpeg,Png,Gif}Ptr / gdImage{Jpeg,Png,Gif}Ptr) that
ctypes binds safely, while the actual byte-stream parsing still runs
inside the reference libraries.

TEST SUPPORT ONLY — production operators never import this; decode
stays pure Python on the executors. Import is gated: tests skip when
libgd is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class LibGD:
    def __init__(self) -> None:
        name = ctypes.util.find_library("gd") or "libgd.so.3"
        self._lib = lib = ctypes.CDLL(name)
        ip = ctypes.POINTER(ctypes.c_int)
        for fn in ("gdImageCreateFromJpegPtr", "gdImageCreateFromPngPtr",
                   "gdImageCreateFromGifPtr"):
            f = getattr(lib, fn)
            f.restype = ctypes.c_void_p
            f.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.gdImageCreateTrueColor.restype = ctypes.c_void_p
        lib.gdImageCreateTrueColor.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.gdImageSetPixel.restype = None
        lib.gdImageSetPixel.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
        lib.gdImageGetTrueColorPixel.restype = ctypes.c_int
        lib.gdImageGetTrueColorPixel.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_int, ctypes.c_int]
        lib.gdImagePaletteToTrueColor.restype = ctypes.c_int
        lib.gdImagePaletteToTrueColor.argtypes = [ctypes.c_void_p]
        lib.gdImageJpegPtr.restype = ctypes.c_void_p
        lib.gdImageJpegPtr.argtypes = [ctypes.c_void_p, ip, ctypes.c_int]
        lib.gdImagePngPtr.restype = ctypes.c_void_p
        lib.gdImagePngPtr.argtypes = [ctypes.c_void_p, ip]
        lib.gdImageGifPtr.restype = ctypes.c_void_p
        lib.gdImageGifPtr.argtypes = [ctypes.c_void_p, ip]
        lib.gdImageDestroy.restype = None
        lib.gdImageDestroy.argtypes = [ctypes.c_void_p]
        lib.gdFree.restype = None
        lib.gdFree.argtypes = [ctypes.c_void_p]

    # ----------------------------------------------------------- decode
    def decode_rgb(self, kind: str, data: bytes, w: int, h: int) -> list[tuple[int, int, int]]:
        """Reference-decode `data` and return row-major (r, g, b)
        tuples. Caller supplies dims (gdImageSX/SY are macros, not
        exported symbols; every parity test knows its dims a priori)."""
        fn = {
            "jpeg": self._lib.gdImageCreateFromJpegPtr,
            "png": self._lib.gdImageCreateFromPngPtr,
            "gif": self._lib.gdImageCreateFromGifPtr,
        }[kind]
        im = fn(len(data), data)
        if not im:
            raise ValueError(f"libgd: reference {kind} decode rejected payload")
        try:
            self._lib.gdImagePaletteToTrueColor(im)  # no-op when truecolor
            out = []
            for y in range(h):
                for x in range(w):
                    v = self._lib.gdImageGetTrueColorPixel(im, x, y)
                    out.append(((v >> 16) & 255, (v >> 8) & 255, v & 255))
            return out
        finally:
            self._lib.gdImageDestroy(im)

    # ----------------------------------------------------------- encode
    def _image_of(self, w: int, h: int, rgb_rows):
        im = self._lib.gdImageCreateTrueColor(w, h)
        if not im:
            raise ValueError("libgd: image alloc failed")
        for y in range(h):
            for x in range(w):
                r, g, b = rgb_rows(x, y)
                self._lib.gdImageSetPixel(im, x, y, (r << 16) | (g << 8) | b)
        return im

    def encode(self, kind: str, w: int, h: int, rgb_rows, quality: int = 90) -> bytes:
        """Reference-encode pixels (rgb_rows(x, y) → (r, g, b))."""
        im = self._image_of(w, h, rgb_rows)
        size = ctypes.c_int()
        try:
            if kind == "jpeg":
                buf = self._lib.gdImageJpegPtr(im, ctypes.byref(size), quality)
            elif kind == "png":
                buf = self._lib.gdImagePngPtr(im, ctypes.byref(size))
            elif kind == "gif":
                buf = self._lib.gdImageGifPtr(im, ctypes.byref(size))
            else:
                raise ValueError(kind)
            if not buf:
                raise ValueError(f"libgd: reference {kind} encode failed")
            try:
                return ctypes.string_at(buf, size.value)
            finally:
                self._lib.gdFree(buf)
        finally:
            self._lib.gdImageDestroy(im)


def load() -> LibGD | None:
    try:
        return LibGD()
    except OSError:
        return None
