"""Test-only ctypes bridge to the system libtiff (the TIFF reference
implementation) used as the cross-validation oracle for the repo's
pure-Python TIFF walker/codecs (`llm/multimodal.py`: baseline strips,
LZW, PackBits).

Same discipline as tests/libwebp_oracle.py / libde265_oracle.py: a
self-consistent codec round-trip proves nothing about the wire
convention (the r3 GIF LZW width transition was off-by-one BOTH ways
and every internal test passed), so every stream is arbitrated by the
reference in both directions — libtiff-encoded strips through our
decoder, our encoder's strips through libtiff.

Only flat, version-stable entry points are used (TIFFOpen,
TIFFGetField, TIFFSetField, TIFFReadScanline, TIFFWriteScanline,
TIFFClose — public API unchanged for decades); no struct fields are
dereferenced (the r7 libjpeg lesson). TIFFSetField/GetField are
varargs: every argument is passed with an explicit ctypes type and
sub-int values rely on the standard varargs int promotion, which is
what libtiff's own va_arg reads expect.

libtiff's default error handler prints to stderr but does NOT
terminate (unlike libjpeg's error_exit), so plain calls are safe; we
still install a NULL error handler to keep fuzz-test output quiet.

TEST SUPPORT ONLY — production operators never import this; decode
stays pure Python so it runs on any Spark executor without native
deps. Import is gated: when libtiff is absent the tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

_TAG_IMAGEWIDTH = 256
_TAG_IMAGELENGTH = 257
_TAG_BITSPERSAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_SAMPLESPERPIXEL = 277
_TAG_ROWSPERSTRIP = 278
_TAG_PLANARCONFIG = 284
_TAG_PREDICTOR = 317

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_PACKBITS = 32773


class LibTiff:
    def __init__(self) -> None:
        name = ctypes.util.find_library("tiff") or "libtiff.so.6"
        self._lib = lib = ctypes.CDLL(name)
        p = ctypes.c_void_p
        lib.TIFFOpen.restype = p
        lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.TIFFClose.restype = None
        lib.TIFFClose.argtypes = [p]
        lib.TIFFReadScanline.restype = ctypes.c_int
        lib.TIFFReadScanline.argtypes = [p, ctypes.c_void_p,
                                         ctypes.c_uint32, ctypes.c_uint16]
        lib.TIFFWriteScanline.restype = ctypes.c_int
        lib.TIFFWriteScanline.argtypes = [p, ctypes.c_void_p,
                                          ctypes.c_uint32, ctypes.c_uint16]
        lib.TIFFScanlineSize.restype = ctypes.c_ssize_t
        lib.TIFFScanlineSize.argtypes = [p]
        # varargs: leave argtypes unset, type each call site explicitly
        # (the TIFF* handle MUST be re-wrapped in c_void_p at every
        # variadic call site — without argtypes ctypes truncates a bare
        # int to 32 bits and the pointer is garbage)
        lib.TIFFSetField.restype = ctypes.c_int
        lib.TIFFGetField.restype = ctypes.c_int
        lib.TIFFGetVersion.restype = ctypes.c_char_p
        lib.TIFFGetVersion.argtypes = []
        # silence the default stderr handlers for fuzz inputs
        handler = ctypes.CFUNCTYPE(None, ctypes.c_char_p, ctypes.c_char_p, p)
        lib.TIFFSetErrorHandler.restype = p
        lib.TIFFSetWarningHandler.restype = p
        self._null_handler = handler(lambda *_a: None)
        lib.TIFFSetErrorHandler(self._null_handler)
        lib.TIFFSetWarningHandler(self._null_handler)

    def version(self) -> str:
        return self._lib.TIFFGetVersion().decode().splitlines()[0]

    def decode(self, data: bytes):
        """Decode the first IFD of a TIFF byte payload via temp file.

        Returns (width, height, samples_per_pixel, pixel_bytes) with
        rows concatenated (8-bit chunky). Raises ValueError when the
        reference rejects the stream.
        """
        lib = self._lib
        fd, path = tempfile.mkstemp(suffix=".tif")
        try:
            os.write(fd, data)
            os.close(fd)
            tif = lib.TIFFOpen(path.encode(), b"r")
            if not tif:
                raise ValueError("libtiff: open failed")
            try:
                w = ctypes.c_uint32()
                h = ctypes.c_uint32()
                spp = ctypes.c_uint16(1)
                lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(_TAG_IMAGEWIDTH),
                                 ctypes.byref(w))
                lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(_TAG_IMAGELENGTH),
                                 ctypes.byref(h))
                lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(_TAG_SAMPLESPERPIXEL),
                                 ctypes.byref(spp))
                if not (0 < w.value <= 1 << 16 and 0 < h.value <= 1 << 16):
                    raise ValueError("libtiff: bad dimensions")
                size = lib.TIFFScanlineSize(tif)
                if size <= 0 or size > (1 << 24):
                    raise ValueError("libtiff: bad scanline size")
                buf = ctypes.create_string_buffer(size)
                rows = []
                for y in range(h.value):
                    if lib.TIFFReadScanline(tif, buf, y, 0) != 1:
                        raise ValueError("libtiff: scanline decode failed")
                    rows.append(buf.raw[: w.value * spp.value])
                return w.value, h.value, spp.value, b"".join(rows)
            finally:
                lib.TIFFClose(tif)
        finally:
            if os.path.exists(path):
                os.unlink(path)

    def encode(self, width: int, height: int, channels: int, pixels: bytes,
               *, compression: int = COMPRESSION_LZW, predictor: int = 1,
               rows_per_strip: int = 4) -> bytes:
        """Encode 8-bit gray/RGB chunky pixels through the reference
        encoder; returns the TIFF file bytes."""
        if channels not in (1, 3):
            raise ValueError("libtiff: gray or RGB only")
        if len(pixels) != width * height * channels:
            raise ValueError("libtiff: pixel buffer size mismatch")
        lib = self._lib
        fd, path = tempfile.mkstemp(suffix=".tif")
        os.close(fd)
        try:
            tif = lib.TIFFOpen(path.encode(), b"w")
            if not tif:
                raise ValueError("libtiff: open-for-write failed")
            try:
                def seti(tag, val):
                    # sub-int field values ride the standard varargs
                    # int promotion libtiff's va_arg reads expect
                    if not lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                            ctypes.c_int(val)):
                        raise ValueError(f"libtiff: SetField {tag} failed")

                seti(_TAG_IMAGEWIDTH, width)
                seti(_TAG_IMAGELENGTH, height)
                seti(_TAG_BITSPERSAMPLE, 8)
                seti(_TAG_SAMPLESPERPIXEL, channels)
                seti(_TAG_PHOTOMETRIC, 1 if channels == 1 else 2)
                seti(_TAG_PLANARCONFIG, 1)
                seti(_TAG_COMPRESSION, compression)
                if compression == COMPRESSION_LZW and predictor != 1:
                    seti(_TAG_PREDICTOR, predictor)
                seti(_TAG_ROWSPERSTRIP, rows_per_strip)
                row = width * channels
                for y in range(height):
                    buf = ctypes.create_string_buffer(
                        pixels[y * row : (y + 1) * row], row)
                    if lib.TIFFWriteScanline(tif, buf, y, 0) != 1:
                        raise ValueError("libtiff: scanline encode failed")
            finally:
                lib.TIFFClose(tif)
            with open(path, "rb") as f:
                return f.read()
        finally:
            if os.path.exists(path):
                os.unlink(path)


def load() -> LibTiff | None:
    try:
        return LibTiff()
    except OSError:
        return None
