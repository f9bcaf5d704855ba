"""Test-only ctypes bridges to the container's FIVE AV1 reference
implementations — THREE independent decoders (dav1d, libgav1, libaom)
and TWO independent encoders (libaom, rav1e) — the arbitration
environment for the repo's pure-Python AV1/AVIF decoder
(`llm/av1.py`).

Same discipline as tests/libde265_oracle.py / libtiff_oracle.py: every
stream is arbitrated by reference decoders bit-exactly, and reference
encoders provide conforming wires the fixture encoder never would.
Where an API is struct-based (the r7 libjpeg lesson warns against
struct ABIs), the layout is pinned EMPIRICALLY, not transcribed:

* Dav1dPicture: decode a known-content stream and require
  (w, h, layout, bpc) at byte offsets 56/60/64/68 to match; plane
  pointers 16/24/32, strides 40/48 — verified by the aom-lossless
  round trip (wrong offsets cannot reproduce 3,072 exact bytes).
* aom_image_t: fmt/w/h/bit_depth at u32 indexes 0/7/8/9, planes at
  byte 64, strides at 88 — verified the same way in both directions.
* Libgav1DecoderBuffer: bitdepth/widths/heights/strides at int32
  indexes 6/7-9/10-12/13-15, planes at byte 64 — same verification.
* Settings structs are filled by the libraries' own *_default
  functions into generously oversized zeroed buffers and only
  leading ints are touched (dav1d: n_threads/max_frame_delay at
  0/4; gav1/aom: defaults used as-is).
* ABI version numbers for aom_codec_{enc,dec}_init_ver were found by
  probing (25 encode / 22 decode on the installed aom 3.6.0) — the
  call itself validates them (AOM_CODEC_ABI_MISMATCH otherwise).
* AV1E_SET_LOSSLESS == 31 was pinned BY EFFECT: of every int-valued
  control id in [14, 48], only 31 yields bit-exact round trips
  through dav1d, gav1 and aom's own decoder.

aom usage is ALL_INTRA (2) — still-image mode, lag 0, Q rate control;
AV1E_SET_LOSSLESS makes every segment qindex 0, which by AV1 spec
semantics (CodedLossless) forces WHT transforms and disables
deblock/CDEF/loop-restoration — the cleanest fixtures for a
from-scratch decoder.  rav1e has no lossless path (quantizer=0 is
near-lossless, max |err| ~1) and is used for conforming-lossy wire
diversity.

libheif's aom plugin also encodes TRULY lossless AVIF (parameter
"lossless"="true" → min-q/max-q 0 → CodedLossless): dav1d on the
extracted av1C+item OBUs reproduces the input bit-exactly
(tests/test_avif_codec.py).  What is NOT bit-exact is libheif's own
DECODE readback of those files — its still-image pipeline normalizes
through RGB (the r7d lesson) — so lossless comparisons must extract
the OBU stream and decode with dav1d/gav1/aom directly, never
through heif_decode_image.

TEST SUPPORT ONLY — production operators never import this; decode
stays pure Python so it runs on any Spark executor without native
deps.  Import is gated: when a library is absent its loader returns
None and tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_P = ctypes.c_void_p

_AOM_IMG_FMT_I420 = 0x102
_AOM_ENC_ABI = 25
_AOM_DEC_ABI = 22
_AV1E_SET_LOSSLESS = 31
_AOM_USAGE_ALL_INTRA = 2


def _plane_copy(ptr: int, stride: int, w: int, h: int) -> bytes:
    raw = ctypes.string_at(ptr, stride * h)
    return b"".join(raw[r * stride : r * stride + w] for r in range(h))


class Dav1d:
    """dav1d decoder (the AVIF ecosystem's reference decoder)."""

    def __init__(self) -> None:
        name = ctypes.util.find_library("dav1d") or "libdav1d.so.6"
        self._lib = lib = ctypes.CDLL(name)
        lib.dav1d_version.restype = ctypes.c_char_p
        lib.dav1d_default_settings.restype = None
        lib.dav1d_default_settings.argtypes = [_P]
        lib.dav1d_open.restype = ctypes.c_int
        lib.dav1d_open.argtypes = [ctypes.POINTER(_P), _P]
        lib.dav1d_data_create.restype = _P
        lib.dav1d_data_create.argtypes = [_P, ctypes.c_size_t]
        lib.dav1d_send_data.restype = ctypes.c_int
        lib.dav1d_send_data.argtypes = [_P, _P]
        lib.dav1d_get_picture.restype = ctypes.c_int
        lib.dav1d_get_picture.argtypes = [_P, _P]
        lib.dav1d_picture_unref.restype = None
        lib.dav1d_picture_unref.argtypes = [_P]
        lib.dav1d_close.restype = None
        lib.dav1d_close.argtypes = [ctypes.POINTER(_P)]

    def version(self) -> str:
        return self._lib.dav1d_version().decode()

    def decode(self, stream: bytes, max_pictures: int = 64):
        """Decode a raw AV1 temporal-unit byte stream (concatenated
        OBUs, NOT IVF/MP4) → [(w, h, y, cb, cr), ...]; 4:2:0/4:4:4/
        4:2:2 8-bit.  Raises ValueError when nothing decodes."""
        lib = self._lib
        st = ctypes.create_string_buffer(1024)  # oversized Dav1dSettings
        lib.dav1d_default_settings(st)
        ints = ctypes.cast(st, ctypes.POINTER(ctypes.c_int))
        ints[0] = 1  # n_threads
        ints[1] = 1  # max_frame_delay → no output lag
        ctx = _P()
        if lib.dav1d_open(ctypes.byref(ctx), st) != 0:
            raise ValueError("dav1d: open failed")
        try:
            data = ctypes.create_string_buffer(256)  # oversized Dav1dData
            buf = lib.dav1d_data_create(data, len(stream))
            if not buf:
                raise ValueError("dav1d: data alloc failed")
            ctypes.memmove(buf, stream, len(stream))

            def remaining() -> int:
                return ctypes.cast(data, ctypes.POINTER(ctypes.c_size_t))[1]

            out = []
            stall = 0
            while stall < 16 and len(out) < max_pictures:
                if remaining() > 0:
                    lib.dav1d_send_data(ctx, data)
                pic = ctypes.create_string_buffer(512)  # Dav1dPicture
                if lib.dav1d_get_picture(ctx, pic) == 0:
                    ptrs = np.frombuffer(pic.raw[:56], np.uint64)
                    w, h, layout, bpc = np.frombuffer(pic.raw[56:72],
                                                      np.int32)
                    if bpc != 8:
                        raise ValueError("dav1d: only 8-bit supported here")
                    strides = np.frombuffer(pic.raw[40:56], np.int64)
                    dims = {0: (0, 0), 1: (2, 2), 2: (2, 1), 3: (1, 1)}
                    sx, sy = dims[int(layout)]
                    planes = []
                    for c in range(3):
                        cw = int(w) if c == 0 else (int(w) // sx if sx else 0)
                        chh = int(h) if c == 0 else (int(h) // sy if sy else 0)
                        if not cw:
                            planes.append(b"")
                            continue
                        stride = int(strides[0 if c == 0 else 1])
                        planes.append(_plane_copy(int(ptrs[2 + c]), stride,
                                                  cw, chh))
                    out.append((int(w), int(h), planes[0], planes[1],
                                planes[2]))
                    lib.dav1d_picture_unref(pic)
                    stall = 0
                else:
                    stall += 1
            if not out:
                raise ValueError("dav1d: no pictures decoded")
            return out
        finally:
            lib.dav1d_close(ctypes.byref(ctx))


class Gav1:
    """libgav1 decoder (Google's independent AV1 implementation)."""

    def __init__(self) -> None:
        name = ctypes.util.find_library("gav1") or "libgav1.so.1"
        self._lib = lib = ctypes.CDLL(name)
        lib.Libgav1GetVersionString.restype = ctypes.c_char_p
        lib.Libgav1DecoderSettingsInitDefault.restype = None
        lib.Libgav1DecoderSettingsInitDefault.argtypes = [_P]
        lib.Libgav1DecoderCreate.restype = ctypes.c_int
        lib.Libgav1DecoderCreate.argtypes = [_P, ctypes.POINTER(_P)]
        lib.Libgav1DecoderEnqueueFrame.restype = ctypes.c_int
        lib.Libgav1DecoderEnqueueFrame.argtypes = [
            _P, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64, _P]
        lib.Libgav1DecoderDequeueFrame.restype = ctypes.c_int
        lib.Libgav1DecoderDequeueFrame.argtypes = [_P, ctypes.POINTER(_P)]
        lib.Libgav1DecoderSignalEOS.restype = ctypes.c_int
        lib.Libgav1DecoderSignalEOS.argtypes = [_P]
        lib.Libgav1DecoderDestroy.restype = None
        lib.Libgav1DecoderDestroy.argtypes = [_P]

    def version(self) -> str:
        return self._lib.Libgav1GetVersionString().decode()

    def decode(self, stream: bytes):
        """Decode ONE temporal unit → [(w, h, y, cb, cr)] (gav1's
        enqueue takes whole temporal units; still-image use)."""
        lib = self._lib
        st = ctypes.create_string_buffer(256)
        lib.Libgav1DecoderSettingsInitDefault(st)
        dec = _P()
        if lib.Libgav1DecoderCreate(st, ctypes.byref(dec)) != 0:
            raise ValueError("gav1: create failed")
        try:
            if lib.Libgav1DecoderEnqueueFrame(dec, stream, len(stream),
                                              0, None) != 0:
                raise ValueError("gav1: enqueue rejected")
            buf = _P()
            if lib.Libgav1DecoderDequeueFrame(dec, ctypes.byref(buf)) != 0 \
                    or not buf:
                raise ValueError("gav1: dequeue failed")
            raw = ctypes.string_at(buf, 128)
            ii = np.frombuffer(raw[:64], np.int32)
            bitdepth = int(ii[6])
            if bitdepth != 8:
                raise ValueError("gav1: only 8-bit supported here")
            widths = [int(ii[7 + c]) for c in range(3)]
            heights = [int(ii[10 + c]) for c in range(3)]
            strides = [int(ii[13 + c]) for c in range(3)]
            ptrs = np.frombuffer(raw[64:88], np.uint64)
            planes = [
                _plane_copy(int(ptrs[c]), strides[c], widths[c], heights[c])
                if widths[c] else b""
                for c in range(3)
            ]
            return [(widths[0], heights[0], planes[0], planes[1], planes[2])]
        finally:
            lib.Libgav1DecoderDestroy(dec)


class Aom:
    """libaom — the AV1 reference implementation; encode (with true
    lossless) + decode."""

    def __init__(self) -> None:
        name = ctypes.util.find_library("aom") or "libaom.so.3"
        self._lib = lib = ctypes.CDLL(name)
        lib.aom_codec_version_str.restype = ctypes.c_char_p
        lib.aom_codec_av1_cx.restype = _P
        lib.aom_codec_av1_dx.restype = _P
        lib.aom_codec_enc_config_default.restype = ctypes.c_int
        lib.aom_codec_enc_config_default.argtypes = [_P, _P, ctypes.c_uint]
        lib.aom_codec_enc_init_ver.restype = ctypes.c_int
        lib.aom_codec_enc_init_ver.argtypes = [_P, _P, _P, ctypes.c_long,
                                               ctypes.c_int]
        lib.aom_codec_dec_init_ver.restype = ctypes.c_int
        lib.aom_codec_dec_init_ver.argtypes = [_P, _P, _P, ctypes.c_long,
                                               ctypes.c_int]
        lib.aom_img_alloc.restype = _P
        lib.aom_img_alloc.argtypes = [_P, ctypes.c_int, ctypes.c_uint,
                                      ctypes.c_uint, ctypes.c_uint]
        lib.aom_img_free.restype = None
        lib.aom_img_free.argtypes = [_P]
        lib.aom_codec_encode.restype = ctypes.c_int
        lib.aom_codec_encode.argtypes = [_P, _P, ctypes.c_long,
                                         ctypes.c_ulong, ctypes.c_long]
        lib.aom_codec_decode.restype = ctypes.c_int
        lib.aom_codec_decode.argtypes = [_P, ctypes.c_char_p,
                                         ctypes.c_size_t, _P]
        lib.aom_codec_get_cx_data.restype = _P
        lib.aom_codec_get_cx_data.argtypes = [_P, _P]
        lib.aom_codec_get_frame.restype = _P
        lib.aom_codec_get_frame.argtypes = [_P, _P]
        lib.aom_codec_destroy.restype = ctypes.c_int
        lib.aom_codec_destroy.argtypes = [_P]

    def version(self) -> str:
        return self._lib.aom_codec_version_str().decode()

    @staticmethod
    def _img_geometry(img_ptr: int):
        raw = ctypes.string_at(img_ptr, 112)
        ii = np.frombuffer(raw[:64], np.uint32)
        planes = np.frombuffer(raw[64:88], np.uint64)
        strides = np.frombuffer(raw[88:100], np.int32)
        w, h = int(ii[7]), int(ii[8])
        sx, sy = int(ii[14]), int(ii[15])
        return w, h, sx, sy, planes, strides

    def encode(self, width: int, height: int, y: bytes, cb: bytes,
               cr: bytes, *, lossless: bool = True,
               controls: tuple = ()) -> bytes:
        """8-bit 4:2:0 still (ALL_INTRA) → raw AV1 OBU stream."""
        lib = self._lib
        if len(y) != width * height:
            raise ValueError("aom: plane size mismatch")
        cfg = ctypes.create_string_buffer(16384)  # oversized enc cfg
        iface = lib.aom_codec_av1_cx()
        if lib.aom_codec_enc_config_default(iface, cfg,
                                            _AOM_USAGE_ALL_INTRA) != 0:
            raise ValueError("aom: config_default failed")
        u32 = ctypes.cast(cfg, ctypes.POINTER(ctypes.c_uint32))
        u32[3], u32[4] = width, height  # g_w / g_h (empirically pinned)
        ctx = ctypes.create_string_buffer(512)
        if lib.aom_codec_enc_init_ver(ctx, iface, cfg, 0, _AOM_ENC_ABI) != 0:
            raise ValueError("aom: enc init failed")
        img = None
        try:
            ctrls = list(controls)
            if lossless:
                ctrls.append((_AV1E_SET_LOSSLESS, 1))
            for cid, val in ctrls:
                if lib.aom_codec_control(ctx, ctypes.c_int(cid),
                                         ctypes.c_int(val)) != 0:
                    raise ValueError(f"aom: control {cid} rejected")
            img = lib.aom_img_alloc(None, _AOM_IMG_FMT_I420, width,
                                    height, 1)
            if not img:
                raise ValueError("aom: image alloc failed")
            _w, _h, _sx, _sy, planes, strides = self._img_geometry(img)
            for c, (buf, pw, ph) in enumerate((
                    (y, width, height),
                    (cb, width // 2, height // 2),
                    (cr, width // 2, height // 2))):
                for r in range(ph):
                    ctypes.memmove(int(planes[c]) + r * int(strides[c]),
                                   buf[r * pw : (r + 1) * pw], pw)
            out = bytearray()

            def drain() -> None:
                it = _P(None)
                while True:
                    pkt = lib.aom_codec_get_cx_data(ctx, ctypes.byref(it))
                    if not pkt:
                        return
                    if ctypes.cast(pkt, ctypes.POINTER(ctypes.c_int))[0] == 0:
                        qp = ctypes.cast(pkt, ctypes.POINTER(ctypes.c_uint64))
                        out.extend(ctypes.string_at(_P(qp[1]), qp[2]))

            if lib.aom_codec_encode(ctx, img, 0, 1, 0) != 0:
                raise ValueError("aom: encode failed")
            drain()
            lib.aom_codec_encode(ctx, None, -1, 1, 0)
            drain()
            if not out:
                raise ValueError("aom: empty output")
            return bytes(out)
        finally:
            if img:
                lib.aom_img_free(img)
            lib.aom_codec_destroy(ctx)

    def decode(self, stream: bytes, max_pictures: int = 64):
        """Decode a raw AV1 OBU stream → [(w, h, y, cb, cr)]."""
        lib = self._lib
        ctx = ctypes.create_string_buffer(512)
        iface = lib.aom_codec_av1_dx()
        if lib.aom_codec_dec_init_ver(ctx, iface, None, 0,
                                      _AOM_DEC_ABI) != 0:
            raise ValueError("aom: dec init failed")
        try:
            if lib.aom_codec_decode(ctx, stream, len(stream), None) != 0:
                raise ValueError("aom: decode rejected")
            out = []
            it = _P(None)
            while len(out) < max_pictures:
                img = lib.aom_codec_get_frame(ctx, ctypes.byref(it))
                if not img:
                    break
                w, h, sx, sy, planes, strides = self._img_geometry(img)
                bd = int(np.frombuffer(ctypes.string_at(img, 40)[36:40],
                                       np.uint32)[0])
                if bd != 8:
                    raise ValueError("aom: only 8-bit supported here")
                pls = []
                for c in range(3):
                    cw = w if c == 0 else w >> sx
                    chh = h if c == 0 else h >> sy
                    pls.append(_plane_copy(int(planes[c]), int(strides[c]),
                                           cw, chh))
                out.append((w, h, pls[0], pls[1], pls[2]))
            if not out:
                raise ValueError("aom: no frames decoded")
            return out
        finally:
            lib.aom_codec_destroy(ctx)


class Rav1e:
    """rav1e encoder (flat string-config C API).  NO lossless mode —
    quantizer=0 is near-lossless (max |err| ~1); used for conforming
    lossy wire diversity."""

    def __init__(self) -> None:
        name = ctypes.util.find_library("rav1e") or "librav1e.so.0"
        self._lib = lib = ctypes.CDLL(name)
        lib.rav1e_version_full.restype = ctypes.c_char_p
        lib.rav1e_config_default.restype = _P
        lib.rav1e_config_parse.restype = ctypes.c_int
        lib.rav1e_config_parse.argtypes = [_P, ctypes.c_char_p,
                                           ctypes.c_char_p]
        lib.rav1e_config_set_pixel_format.restype = ctypes.c_int
        lib.rav1e_config_set_pixel_format.argtypes = [
            _P, ctypes.c_uint8, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.rav1e_config_unref.restype = None
        lib.rav1e_config_unref.argtypes = [_P]
        lib.rav1e_context_new.restype = _P
        lib.rav1e_context_new.argtypes = [_P]
        lib.rav1e_context_unref.restype = None
        lib.rav1e_context_unref.argtypes = [_P]
        lib.rav1e_frame_new.restype = _P
        lib.rav1e_frame_new.argtypes = [_P]
        lib.rav1e_frame_unref.restype = None
        lib.rav1e_frame_unref.argtypes = [_P]
        lib.rav1e_frame_fill_plane.restype = None
        lib.rav1e_frame_fill_plane.argtypes = [
            _P, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_ssize_t, ctypes.c_int]
        lib.rav1e_send_frame.restype = ctypes.c_int
        lib.rav1e_send_frame.argtypes = [_P, _P]
        lib.rav1e_receive_packet.restype = ctypes.c_int
        lib.rav1e_receive_packet.argtypes = [_P, ctypes.POINTER(_P)]
        lib.rav1e_packet_unref.restype = None
        lib.rav1e_packet_unref.argtypes = [_P]

    def version(self) -> str:
        return self._lib.rav1e_version_full().decode()

    def encode(self, width: int, height: int, y: bytes, cb: bytes,
               cr: bytes, *, quantizer: int = 0, speed: int = 10,
               chroma: int = 0) -> bytes:
        """8-bit still picture → raw AV1 OBU stream.  `chroma` is the
        RaChromaSampling enum probed by effect against our header
        parser: 0=4:2:0 (profile 0), 1=4:2:2 (profile 2), 2=4:4:4
        (profile 1), 3=monochrome (profile 0, mono)."""
        lib = self._lib
        cfg = lib.rav1e_config_default()
        if not cfg:
            raise ValueError("rav1e: config alloc failed")
        ctx = None
        frame = None
        try:
            for k, v in ((b"width", str(width).encode()),
                         (b"height", str(height).encode()),
                         (b"speed", str(speed).encode()),
                         (b"quantizer", str(quantizer).encode()),
                         (b"still_picture", b"true"),
                         (b"threads", b"1")):
                if lib.rav1e_config_parse(cfg, k, v) != 0:
                    raise ValueError(f"rav1e: config {k!r} rejected")
            # 8-bit, chroma enum, position unknown(0), FULL range(1)
            if lib.rav1e_config_set_pixel_format(cfg, 8, chroma, 0, 1) != 0:
                raise ValueError("rav1e: pixel format rejected")
            ctx = lib.rav1e_context_new(cfg)
            if not ctx:
                raise ValueError("rav1e: context failed")
            frame = lib.rav1e_frame_new(ctx)
            lib.rav1e_frame_fill_plane(frame, 0, y, len(y), width, 1)
            if chroma != 3:
                cw = width if chroma == 2 else width // 2
                lib.rav1e_frame_fill_plane(frame, 1, cb, len(cb), cw, 1)
                lib.rav1e_frame_fill_plane(frame, 2, cr, len(cr), cw, 1)
            if lib.rav1e_send_frame(ctx, frame) != 0:
                raise ValueError("rav1e: send_frame failed")
            if lib.rav1e_send_frame(ctx, None) != 0:  # flush / EOS
                raise ValueError("rav1e: flush failed")
            out = bytearray()
            for _ in range(256):
                pkt = _P()
                r = lib.rav1e_receive_packet(ctx, ctypes.byref(pkt))
                if r == 0 and pkt:
                    qp = ctypes.cast(pkt, ctypes.POINTER(ctypes.c_size_t))
                    out.extend(ctypes.string_at(_P(qp[0]), qp[1]))
                    lib.rav1e_packet_unref(pkt)
                elif r == 3:  # limit reached (EOS)
                    break
                elif r in (1, 2):  # need more / enough data
                    continue
                else:
                    raise ValueError(f"rav1e: status {r}")
            if not out:
                raise ValueError("rav1e: empty output")
            return bytes(out)
        finally:
            if frame:
                lib.rav1e_frame_unref(frame)
            if ctx:
                lib.rav1e_context_unref(ctx)
            lib.rav1e_config_unref(cfg)


def _gated(cls):
    try:
        return cls()
    except OSError:
        return None


def load_dav1d() -> Dav1d | None:
    return _gated(Dav1d)


def load_gav1() -> Gav1 | None:
    return _gated(Gav1)


def load_aom() -> Aom | None:
    return _gated(Aom)


def load_rav1e() -> Rav1e | None:
    return _gated(Rav1e)
