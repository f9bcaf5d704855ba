"""Test-only ctypes bridge to the system libx265 (a production HEVC
ENCODER) used to generate REAL externally-encoded HEVC streams for
cross-validating the repo's pure-Python decoder (`llm/hevc.py`).

Together with tests/libde265_oracle.py this closes both directions of
the wire-convention pin (the VP8/libwebp discipline): libx265-encoded
payloads must decode bit-identically in the pure-Python decoder AND in
libde265, and repo-fixture-encoded payloads must decode bit-identically
in libde265.

ABI notes (CLAUDE.md rule: never transcribe a binary interface from
memory — pin it against the binary):

  * Only the x265_picture PREFIX is dereferenced.  Its layout was
    pinned by disassembling the in-container x265_picture_init
    (objdump of libx265.so.199): the function memsets 0x41b0 bytes
    (sizeof(x265_picture)) then stores param->internalBitDepth at
    picture offset 0x3c and param->internalCsp at offset 0x48 — which
    uniquely anchors the published prefix layout
        pts@0 dts@8 userData@16 planes[3]@24 stride[3]@48
        bitDepth@60 sliceType@64 poc@68 colorSpace@72
    The planes/stride offsets are additionally CONFIRMED empirically:
    a lossless intra encode decoded by libde265 reproduces the input
    planes byte-exactly (wrong offsets cannot do that).
  * x265_param is never dereferenced — all configuration goes through
    x265_param_parse(key, value) string calls (stable C API).
  * x265_nal is { uint32_t type; uint32_t sizeBytes; uint8_t* payload; }
    (payload at offset 8 on LP64); confirmed by the decodability of
    the concatenated payloads in libde265.

TEST SUPPORT ONLY — production operators never import this.  Import is
gated: when libx265 is absent the tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_PIC_SIZE = 0x41B0  # memset span in x265_picture_init (disassembly-pinned)
_OFF_PLANES = 24
_OFF_STRIDE = 48
_OFF_BITDEPTH = 60
_OFF_SLICETYPE = 64
_OFF_COLORSPACE = 72


# Itanium-mangled entry points of the embedded high-bit-depth builds
# (the multilib .so namespaces them; the plain C symbols are the 8-bit
# build).  Only flat functions are bound — no struct ABIs beyond the
# disassembly-pinned x265_picture prefix shared by all three builds.
def _namespaced(ns: str) -> dict:
    return {
        "x265_param_alloc": f"_ZN{len(ns)}{ns}16x265_param_allocEv",
        "x265_param_free": f"_ZN{len(ns)}{ns}15x265_param_freeEP10x265_param",
        "x265_param_default": f"_ZN{len(ns)}{ns}18x265_param_defaultEP10x265_param",
        "x265_param_default_preset":
            f"_ZN{len(ns)}{ns}25x265_param_default_presetEP10x265_paramPKcS3_",
        "x265_param_parse": f"_ZN{len(ns)}{ns}16x265_param_parseEP10x265_paramPKcS3_",
        "x265_encoder_open_199": f"_ZN{len(ns)}{ns}21x265_encoder_open_199EP10x265_param",
        "x265_encoder_close": f"_ZN{len(ns)}{ns}18x265_encoder_closeEP12x265_encoder",
        "x265_encoder_encode":
            f"_ZN{len(ns)}{ns}19x265_encoder_encodeEP12x265_encoderPP8x265_nalPjP12x265_pictureS7_",
        "x265_picture_init": f"_ZN{len(ns)}{ns}17x265_picture_initEP10x265_paramP12x265_picture",
    }


_HBD = {10: _namespaced("x265_10bit"), 12: _namespaced("x265_12bit")}


class LibX265:
    def __init__(self, bit_depth: int = 8) -> None:
        if bit_depth not in (8, 10, 12):
            raise ValueError("libx265 oracle: 8/10/12-bit only")
        self.bit_depth = bit_depth
        name = ctypes.util.find_library("x265") or "libx265.so.199"
        cdll = ctypes.CDLL(name)
        if bit_depth == 8:
            lib = cdll
        else:
            class _Ns:  # namespaced symbol view
                pass

            lib = _Ns()
            for plain, mangled in _HBD[bit_depth].items():
                setattr(lib, plain, getattr(cdll, mangled))
        self._cdll = cdll
        self._lib = lib
        p = ctypes.c_void_p
        lib.x265_param_alloc.restype = p
        lib.x265_param_alloc.argtypes = []
        lib.x265_param_free.restype = None
        lib.x265_param_free.argtypes = [p]
        lib.x265_param_default.restype = None
        lib.x265_param_default.argtypes = [p]
        lib.x265_param_default_preset.restype = ctypes.c_int
        lib.x265_param_default_preset.argtypes = [p, ctypes.c_char_p, ctypes.c_char_p]
        lib.x265_param_parse.restype = ctypes.c_int
        lib.x265_param_parse.argtypes = [p, ctypes.c_char_p, ctypes.c_char_p]
        lib.x265_encoder_open_199.restype = p
        lib.x265_encoder_open_199.argtypes = [p]
        lib.x265_encoder_close.restype = None
        lib.x265_encoder_close.argtypes = [p]
        lib.x265_encoder_encode.restype = ctypes.c_int
        lib.x265_encoder_encode.argtypes = [
            p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_uint32),
            p,
            p,
        ]
        lib.x265_picture_init.restype = None
        lib.x265_picture_init.argtypes = [p, p]

    def version(self) -> str:
        return ctypes.c_char_p.in_dll(self._cdll, "x265_version_str").value.decode()

    def encode(
        self,
        width: int,
        height: int,
        frames,
        options: dict | None = None,
    ) -> bytes:
        """Encode I420 frames → one Annex-B HEVC elementary stream.

        frames: list of (y_bytes, cb_bytes, cr_bytes), each plane
        tightly packed (w*h / (w/2)*(h/2)) — one byte per sample for
        the 8-bit build, little-endian uint16 per sample for the
        10-bit build; width/height even.  options: extra
        x265_param_parse key→value pairs layered over the defaults
        below (value None → boolean flag form).
        """
        if width % 2 or height % 2:
            raise ValueError("libx265 oracle: even dimensions only")
        bps = 1 if self.bit_depth == 8 else 2
        csp = (options or {}).get("input-csp", "i420")
        mono = csp == "i400"
        # chroma plane samples per csp (SubWidthC x SubHeightC)
        csamp = {"i400": 0, "i420": (width // 2) * (height // 2),
                 "i422": (width // 2) * height,
                 "i444": width * height}[csp]
        lib = self._lib
        param = lib.x265_param_alloc()
        if not param:
            raise ValueError("libx265: param alloc failed")
        enc = None
        options = dict(options or {})
        preset = options.pop("preset", "ultrafast")
        try:
            if lib.x265_param_default_preset(param, preset.encode(), None) != 0:
                raise ValueError("libx265: preset failed")
            base = {
                "input-res": f"{width}x{height}",
                "fps": "25",
                "input-csp": "i420",
                "frame-threads": "1",
                "pools": "1",
                "wpp": "0",
                "repeat-headers": "1",
                "info": "0",
                "annexb": "1",
                "temporal-layers": "0",
                "log-level": "none",
            }
            base.update(options or {})
            for key, val in base.items():
                rc = lib.x265_param_parse(
                    param,
                    key.encode(),
                    None if val is None else str(val).encode(),
                )
                if rc != 0:
                    raise ValueError(f"libx265: param {key}={val} rejected ({rc})")
            enc = lib.x265_encoder_open_199(param)
            if not enc:
                raise ValueError("libx265: encoder open failed")

            ysz = width * height * bps
            csz = csamp * bps
            out = bytearray()
            nals = ctypes.c_void_p()
            n_nal = ctypes.c_uint32()

            def drain() -> None:
                base_ptr = nals.value
                for i in range(n_nal.value):
                    rec = base_ptr + 16 * i  # sizeof(x265_nal) on LP64
                    size = ctypes.c_uint32.from_address(rec + 4).value
                    payload = ctypes.c_void_p.from_address(rec + 8).value
                    out.extend(ctypes.string_at(payload, size))

            # keep every input picture's buffers alive until the frame
            # is consumed; x265 references the planes asynchronously
            keep = []
            for y, cb, cr in frames:
                if len(y) != ysz or len(cb) != csz or len(cr) != csz:
                    raise ValueError("libx265 oracle: plane size mismatch")
                pic = ctypes.create_string_buffer(_PIC_SIZE)
                lib.x265_picture_init(param, pic)
                addr = ctypes.addressof(pic)
                if mono:
                    bufs = (ctypes.create_string_buffer(y, ysz),)
                    strides = (width * bps,)
                else:
                    bufs = (
                        ctypes.create_string_buffer(y, ysz),
                        ctypes.create_string_buffer(cb, csz),
                        ctypes.create_string_buffer(cr, csz),
                    )
                    cstride = (width if csp == "i444"
                               else width // 2) * bps
                    strides = (width * bps, cstride, cstride)
                keep.append((pic, bufs))
                for k, buf in enumerate(bufs):
                    ctypes.c_void_p.from_address(addr + _OFF_PLANES + 8 * k).value = (
                        ctypes.addressof(buf)
                    )
                for k, st in enumerate(strides):
                    ctypes.c_int32.from_address(addr + _OFF_STRIDE + 4 * k).value = st
                rc = lib.x265_encoder_encode(
                    enc, ctypes.byref(nals), ctypes.byref(n_nal), pic, None
                )
                if rc < 0:
                    raise ValueError("libx265: encode failed")
                if rc > 0:
                    drain()
            while True:
                rc = lib.x265_encoder_encode(
                    enc, ctypes.byref(nals), ctypes.byref(n_nal), None, None
                )
                if rc < 0:
                    raise ValueError("libx265: flush failed")
                if rc == 0:
                    break
                drain()
            return bytes(out)
        finally:
            if enc:
                lib.x265_encoder_close(enc)
            lib.x265_param_free(param)


def load(bit_depth: int = 8) -> LibX265 | None:
    try:
        return LibX265(bit_depth)
    except (OSError, AttributeError):
        return None
