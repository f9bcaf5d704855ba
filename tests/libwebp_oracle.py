"""Test-only ctypes bridge to the system libwebp (the REFERENCE WebP
implementation) used as a cross-validation oracle for the repo's pure-
Python VP8L / VP8 codecs.

Motivation (CLAUDE.md round-3 lesson): a self-consistent codec
round-trip proves nothing about the wire convention — the GIF LZW
width transition was off-by-one both ways and every internal test
passed.  The container ships libwebp.so.7 (1.2.4), so both directions
of the convention can be pinned against the reference implementation:

  * libwebp-ENCODED payloads must decode bit-identically in the repo's
    pure-Python decoders (validates every default probability /
    dequant table and the bool-coder convention), and
  * repo-ENCODED payloads must decode bit-identically in libwebp
    (validates the encoder's emitted wire form).

This module is TEST SUPPORT ONLY — production operators never import
it; decode stays pure Python so it runs on any Spark executor without
native deps.  Import is gated: when libwebp is absent the tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class LibWebP:
    def __init__(self) -> None:
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        self._lib = lib = ctypes.CDLL(name)
        u8p = ctypes.POINTER(ctypes.c_uint8)

        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeYUV.restype = u8p
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(u8p),
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(u8p),
        ]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(u8p),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        self._u8p = u8p

    # ------------------------------------------------------------- info
    def version(self) -> int:
        return int(self._lib.WebPGetDecoderVersion())

    def get_info(self, data: bytes) -> tuple[int, int]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self._lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if not ok:
            raise ValueError("libwebp: WebPGetInfo rejected payload")
        return w.value, h.value

    # ----------------------------------------------------------- decode
    def decode_rgba(self, data: bytes) -> tuple[int, int, bytes]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = self._lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if not ptr:
            raise ValueError("libwebp: decode failed")
        try:
            raw = ctypes.string_at(ptr, w.value * h.value * 4)
        finally:
            self._lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
        return w.value, h.value, raw

    def decode_yuv(self, data: bytes) -> tuple[int, int, bytes, bytes, bytes]:
        """(w, h, y_plane, u_plane, v_plane) with stride removed — the
        planes are exactly w*h and ceil(w/2)*ceil(h/2) bytes."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        up = self._u8p()
        vp = self._u8p()
        stride = ctypes.c_int()
        uv_stride = ctypes.c_int()
        ptr = self._lib.WebPDecodeYUV(
            data,
            len(data),
            ctypes.byref(w),
            ctypes.byref(h),
            ctypes.byref(up),
            ctypes.byref(vp),
            ctypes.byref(stride),
            ctypes.byref(uv_stride),
        )
        if not ptr:
            raise ValueError("libwebp: YUV decode failed")
        try:
            uw, uh = (w.value + 1) // 2, (h.value + 1) // 2
            ybuf = ctypes.string_at(ptr, stride.value * h.value)
            # u/v live inside the same allocation as y
            ubuf = ctypes.string_at(up, uv_stride.value * uh)
            vbuf = ctypes.string_at(vp, uv_stride.value * uh)
        finally:
            self._lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
        y = b"".join(
            ybuf[r * stride.value : r * stride.value + w.value] for r in range(h.value)
        )
        u = b"".join(
            ubuf[r * uv_stride.value : r * uv_stride.value + uw] for r in range(uh)
        )
        v = b"".join(
            vbuf[r * uv_stride.value : r * uv_stride.value + uw] for r in range(uh)
        )
        return w.value, h.value, y, u, v

    # ----------------------------------------------------------- encode
    def encode_lossless_rgba(self, width: int, height: int, rgba: bytes) -> bytes:
        if len(rgba) != width * height * 4:
            raise ValueError("rgba length mismatch")
        out = self._u8p()
        n = self._lib.WebPEncodeLosslessRGBA(
            rgba, width, height, width * 4, ctypes.byref(out)
        )
        if not n:
            raise ValueError("libwebp: lossless encode failed")
        try:
            return ctypes.string_at(out, n)
        finally:
            self._lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))

    def encode_lossy_rgb(self, width: int, height: int, rgb: bytes, quality: float) -> bytes:
        if len(rgb) != width * height * 3:
            raise ValueError("rgb length mismatch")
        out = self._u8p()
        n = self._lib.WebPEncodeRGB(
            rgb, width, height, width * 3, ctypes.c_float(quality), ctypes.byref(out)
        )
        if not n:
            raise ValueError("libwebp: lossy encode failed")
        try:
            return ctypes.string_at(out, n)
        finally:
            self._lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def load() -> LibWebP | None:
    try:
        return LibWebP()
    except OSError:
        return None
