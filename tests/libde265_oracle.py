"""Test-only ctypes bridge to the system libde265 (a conforming HEVC
REFERENCE decoder) used as the cross-validation oracle for the repo's
pure-Python HEVC intra decoder (`llm/hevc.py`).

Same discipline as tests/libwebp_oracle.py (VP8/VP8L) and
tests/libgd_oracle.py (JPEG/PNG/GIF): a self-consistent codec
round-trip proves nothing about the wire convention, so every stream —
whether produced by the in-container libx265 encoder
(tests/libx265_oracle.py) or by this repo's fixture encoder — is
arbitrated by the reference decoder, bit-exactly, plane by plane.

The libde265 C API is flat and version-stable (de265.h, unchanged
public surface since 1.0); no struct fields are dereferenced from
Python — every access goes through exported accessor functions, so
there is no ABI transcription to get wrong.

TEST SUPPORT ONLY — production operators never import this; decode
stays pure Python so it runs on any Spark executor without native deps.
Import is gated: when libde265 is absent the tests skip.
"""

from __future__ import annotations

import ctypes
import time
import ctypes.util

_DE265_OK = 0


class LibDe265:
    def __init__(self) -> None:
        name = ctypes.util.find_library("de265") or "libde265.so.0"
        self._lib = lib = ctypes.CDLL(name)
        p = ctypes.c_void_p
        lib.de265_new_decoder.restype = p
        lib.de265_new_decoder.argtypes = []
        lib.de265_free_decoder.restype = ctypes.c_int
        lib.de265_free_decoder.argtypes = [p]
        lib.de265_start_worker_threads.restype = ctypes.c_int
        lib.de265_start_worker_threads.argtypes = [p, ctypes.c_int]
        lib.de265_push_data.restype = ctypes.c_int
        lib.de265_push_data.argtypes = [
            p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int64,
            p,
        ]
        lib.de265_flush_data.restype = ctypes.c_int
        lib.de265_flush_data.argtypes = [p]
        lib.de265_decode.restype = ctypes.c_int
        lib.de265_decode.argtypes = [p, ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_next_picture.restype = p
        lib.de265_get_next_picture.argtypes = [p]
        lib.de265_release_next_picture.restype = None
        lib.de265_release_next_picture.argtypes = [p]
        lib.de265_get_image_width.restype = ctypes.c_int
        lib.de265_get_image_width.argtypes = [p, ctypes.c_int]
        lib.de265_get_image_height.restype = ctypes.c_int
        lib.de265_get_image_height.argtypes = [p, ctypes.c_int]
        lib.de265_get_chroma_format.restype = ctypes.c_int
        lib.de265_get_chroma_format.argtypes = [p]
        lib.de265_get_bits_per_pixel.restype = ctypes.c_int
        lib.de265_get_bits_per_pixel.argtypes = [p, ctypes.c_int]
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_plane.argtypes = [p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_error_text.restype = ctypes.c_char_p
        lib.de265_get_error_text.argtypes = [ctypes.c_int]
        lib.de265_get_version.restype = ctypes.c_char_p
        lib.de265_get_version.argtypes = []

    def version(self) -> str:
        return self._lib.de265_get_version().decode()

    def decode(self, stream: bytes, max_pictures: int = 64):
        """Decode an Annex-B HEVC elementary stream.

        Returns a list of decoded pictures, each
        (width, height, y_bytes, cb_bytes, cr_bytes) with strides
        removed (planes exactly w*h and (w/2)*(h/2) for 4:2:0).
        Raises ValueError when the reference decoder reports an error.
        """
        lib = self._lib
        ctx = lib.de265_new_decoder()
        if not ctx:
            raise ValueError("libde265: decoder alloc failed")
        try:
            lib.de265_start_worker_threads(ctx, 1)
            err = lib.de265_push_data(ctx, stream, len(stream), 0, None)
            if err != _DE265_OK:
                raise ValueError(
                    "libde265: push_data: %s" % lib.de265_get_error_text(err).decode()
                )
            lib.de265_flush_data(ctx)
            out = []
            more = ctypes.c_int(1)
            stall = 0
            while more.value and len(out) < max_pictures:
                err = lib.de265_decode(ctx, ctypes.byref(more))
                if err != _DE265_OK:
                    # after flush, "waiting for input" means the stream ended
                    text = lib.de265_get_error_text(err).decode()
                    if "waiting for input" in text.lower():
                        # the single worker thread finishes the last
                        # picture asynchronously — be patient (r8:
                        # bframes tails lost their final picture to an
                        # early break here)
                        stall += 1
                        if stall > 64:
                            break
                        time.sleep(0.002)
                        continue
                    raise ValueError("libde265: decode: %s" % text)
                img = lib.de265_get_next_picture(ctx)
                while img:
                    out.append(self._copy_picture(img))
                    lib.de265_release_next_picture(ctx)
                    img = lib.de265_get_next_picture(ctx)
            # the final decode call can report more=0 with a reordered
            # picture still queued (r8: surfaced by bframes=2 tails) —
            # drain whatever remains
            img = lib.de265_get_next_picture(ctx)
            while img and len(out) < max_pictures:
                out.append(self._copy_picture(img))
                lib.de265_release_next_picture(ctx)
                img = lib.de265_get_next_picture(ctx)
            return out
        finally:
            lib.de265_free_decoder(ctx)

    def _copy_picture(self, img):
        lib = self._lib
        fmt = lib.de265_get_chroma_format(img)
        if fmt not in (0, 1, 2, 3):  # mono / 4:2:0 / 4:2:2 / 4:4:4
            raise ValueError("libde265: unsupported chroma format")
        planes = []
        w = lib.de265_get_image_width(img, 0)
        h = lib.de265_get_image_height(img, 0)
        channels = (0, 1, 2) if fmt else (0,)
        for ch in channels:
            cw = lib.de265_get_image_width(img, ch)
            ch_h = lib.de265_get_image_height(img, ch)
            bits = lib.de265_get_bits_per_pixel(img, ch)
            if bits not in (8, 10, 12):
                raise ValueError("libde265: unsupported plane bit depth")
            bps = 1 if bits == 8 else 2  # stride is in bytes either way
            stride = ctypes.c_int()
            ptr = lib.de265_get_image_plane(img, ch, ctypes.byref(stride))
            if not ptr:
                raise ValueError("libde265: null plane")
            raw = ctypes.string_at(ptr, stride.value * ch_h)
            planes.append(
                b"".join(
                    raw[r * stride.value : r * stride.value + cw * bps]
                    for r in range(ch_h)
                )
            )
        while len(planes) < 3:
            planes.append(b"")
        return (w, h, planes[0], planes[1], planes[2])


def load() -> LibDe265 | None:
    try:
        return LibDe265()
    except OSError:
        return None
