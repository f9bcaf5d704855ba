"""Test-only ctypes bridge to the system libheif (reference HEIF/HEIC
implementation; its HEVC legs are the same libde265/libx265 this
container ships) used to cross-validate the repo's pure-Python HEIC
container walk + HEVC intra decoder:

  * libheif-ENCODED .heic files must decode identically here, and
  * repo-fixture-encoded .heic files must decode identically in
    libheif (container + wire arbitration in both directions).

The libheif C API is flat and stable; `struct heif_error` is returned
BY VALUE ({int code; int subcode; const char *message}).  TEST SUPPORT
ONLY — production code never imports this; import is gated so tests
skip when the library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


class LibHeif:
    def __init__(self) -> None:
        name = ctypes.util.find_library("heif") or "libheif.so.1"
        self._lib = lib = ctypes.CDLL(name)
        p = ctypes.c_void_p
        err = _HeifError
        lib.heif_get_version.restype = ctypes.c_char_p
        lib.heif_context_alloc.restype = p
        lib.heif_context_free.argtypes = [p]
        lib.heif_context_read_from_memory_without_copy.restype = err
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            p, ctypes.c_char_p, ctypes.c_size_t, p]
        lib.heif_context_get_primary_image_handle.restype = err
        lib.heif_context_get_primary_image_handle.argtypes = [p, ctypes.POINTER(p)]
        lib.heif_image_handle_release.argtypes = [p]
        lib.heif_image_handle_get_width.restype = ctypes.c_int
        lib.heif_image_handle_get_width.argtypes = [p]
        lib.heif_image_handle_get_height.restype = ctypes.c_int
        lib.heif_image_handle_get_height.argtypes = [p]
        lib.heif_decode_image.restype = err
        lib.heif_decode_image.argtypes = [p, ctypes.POINTER(p), ctypes.c_int,
                                          ctypes.c_int, p]
        lib.heif_image_release.argtypes = [p]
        lib.heif_image_get_plane_readonly.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane_readonly.argtypes = [p, ctypes.c_int,
                                                      ctypes.POINTER(ctypes.c_int)]
        lib.heif_image_get_width.restype = ctypes.c_int
        lib.heif_image_get_width.argtypes = [p, ctypes.c_int]
        lib.heif_image_get_height.restype = ctypes.c_int
        lib.heif_image_get_height.argtypes = [p, ctypes.c_int]
        lib.heif_context_get_encoder_for_format.restype = err
        lib.heif_context_get_encoder_for_format.argtypes = [p, ctypes.c_int,
                                                            ctypes.POINTER(p)]
        lib.heif_encoder_release.argtypes = [p]
        lib.heif_encoder_set_lossless.restype = err
        lib.heif_encoder_set_lossless.argtypes = [p, ctypes.c_int]
        lib.heif_encoder_set_lossy_quality.restype = err
        lib.heif_encoder_set_lossy_quality.argtypes = [p, ctypes.c_int]
        lib.heif_encoder_set_parameter_string.restype = err
        lib.heif_encoder_set_parameter_string.argtypes = [p, ctypes.c_char_p,
                                                          ctypes.c_char_p]
        lib.heif_image_create.restype = err
        lib.heif_image_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.POINTER(p)]
        lib.heif_image_add_plane.restype = err
        lib.heif_image_add_plane.argtypes = [p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_int]
        lib.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane.argtypes = [p, ctypes.c_int,
                                             ctypes.POINTER(ctypes.c_int)]
        lib.heif_context_encode_image.restype = err
        lib.heif_context_encode_image.argtypes = [p, p, p, p, ctypes.POINTER(p)]
        lib.heif_context_write_to_file.restype = err
        lib.heif_context_write_to_file.argtypes = [p, ctypes.c_char_p]

    @staticmethod
    def _check(e: _HeifError, what: str) -> None:
        if e.code != 0:
            msg = e.message.decode() if e.message else "?"
            raise ValueError(f"libheif: {what}: {msg}")

    def version(self) -> str:
        return self._lib.heif_get_version().decode()

    # heif_channel: Y=0, Cb=1, Cr=2; heif_colorspace_YCbCr=0;
    # heif_chroma_420=1; heif_compression_HEVC=1
    def decode(self, data: bytes):
        """(w, h, y, cb, cr) — primary image as tightly packed 4:2:0."""
        lib = self._lib
        ctx = lib.heif_context_alloc()
        if not ctx:
            raise ValueError("libheif: context alloc failed")
        try:
            self._check(lib.heif_context_read_from_memory_without_copy(
                ctx, data, len(data), None), "read")
            handle = ctypes.c_void_p()
            self._check(lib.heif_context_get_primary_image_handle(
                ctx, ctypes.byref(handle)), "primary handle")
            try:
                img = ctypes.c_void_p()
                self._check(lib.heif_decode_image(
                    handle, ctypes.byref(img), 0, 1, None), "decode")
                try:
                    planes = []
                    w = lib.heif_image_get_width(img, 0)
                    h = lib.heif_image_get_height(img, 0)
                    for ch in (0, 1, 2):
                        cw = lib.heif_image_get_width(img, ch)
                        chh = lib.heif_image_get_height(img, ch)
                        stride = ctypes.c_int()
                        ptr = lib.heif_image_get_plane_readonly(
                            img, ch, ctypes.byref(stride))
                        if not ptr:
                            raise ValueError("libheif: missing plane")
                        raw = ctypes.string_at(ptr, stride.value * chh)
                        planes.append(b"".join(
                            raw[r * stride.value : r * stride.value + cw]
                            for r in range(chh)))
                    return (w, h, planes[0], planes[1], planes[2])
                finally:
                    lib.heif_image_release(img)
            finally:
                lib.heif_image_handle_release(handle)
        finally:
            lib.heif_context_free(ctx)

    def encode(self, width: int, height: int, y: bytes, cb: bytes, cr: bytes,
               lossless: bool = True, quality: int = 90) -> bytes:
        """Encode tightly packed 4:2:0 planes → .heic bytes (via the
        library's x265 plugin)."""
        lib = self._lib
        ctx = lib.heif_context_alloc()
        if not ctx:
            raise ValueError("libheif: context alloc failed")
        try:
            enc = ctypes.c_void_p()
            self._check(lib.heif_context_get_encoder_for_format(
                ctx, 1, ctypes.byref(enc)), "encoder")
            try:
                if lossless:
                    self._check(lib.heif_encoder_set_lossless(enc, 1), "lossless")
                    self._check(lib.heif_encoder_set_parameter_string(
                        enc, b"chroma", b"420"), "chroma")
                else:
                    self._check(lib.heif_encoder_set_lossy_quality(
                        enc, quality), "quality")
                img = ctypes.c_void_p()
                self._check(lib.heif_image_create(
                    width, height, 0, 1, ctypes.byref(img)), "image create")
                try:
                    for ch, (pw, ph, buf) in enumerate((
                        (width, height, y),
                        (width // 2, height // 2, cb),
                        (width // 2, height // 2, cr),
                    )):
                        self._check(lib.heif_image_add_plane(
                            img, ch, pw, ph, 8), "add plane")
                        stride = ctypes.c_int()
                        ptr = lib.heif_image_get_plane(img, ch,
                                                       ctypes.byref(stride))
                        if not ptr:
                            raise ValueError("libheif: plane alloc failed")
                        for r in range(ph):
                            ctypes.memmove(
                                ctypes.addressof(ptr.contents) + r * stride.value,
                                buf[r * pw : (r + 1) * pw], pw)
                    handle = ctypes.c_void_p()
                    self._check(lib.heif_context_encode_image(
                        ctx, img, enc, None, ctypes.byref(handle)),
                        "encode image")
                    lib.heif_image_handle_release(handle)
                finally:
                    lib.heif_image_release(img)
            finally:
                lib.heif_encoder_release(enc)
            fd, path = tempfile.mkstemp(suffix=".heic")
            os.close(fd)
            try:
                self._check(lib.heif_context_write_to_file(
                    ctx, path.encode()), "write")
                with open(path, "rb") as fh:
                    return fh.read()
            finally:
                os.unlink(path)
        finally:
            lib.heif_context_free(ctx)


def load() -> LibHeif | None:
    try:
        return LibHeif()
    except OSError:
        return None
