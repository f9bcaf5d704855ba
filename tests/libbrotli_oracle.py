"""Test-only ctypes bridge to the system libbrotli (libbrotlidec /
libbrotlienc / libbrotlicommon 1.0.9) — the cross-validation oracle
for the repo's pure-Python Brotli (RFC 7932) codec, extending the
libwebp / libgd / libzstd oracle pattern.

Beyond encode/decode, libbrotlicommon EXPORTS the wire tables that
are memory-transcription hazards (the r7 lesson: grep the system
libraries before transcribing any table from memory):

- ``_kBrotliContextLookupTable`` (2048 bytes) — the UTF8 / Signed
  literal-context lookups of RFC 7932 section 7.1,
- ``_kBrotliPrefixCodeRanges`` (26 x (base, nbits)) — the block-count
  code of section 6,
- ``BrotliGetTransforms`` / ``BrotliTransformDictionaryWord`` — the
  121 static-dictionary word transforms of section 8 / Appendix B,
- ``BrotliGetDictionary`` — the 122,784-byte static dictionary whose
  SHA-256 RFC 7932 Appendix A publishes.

TEST SUPPORT ONLY — production operators never import this; decode
stays pure Python on the executors. Import is gated: tests skip when
libbrotli is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util


class _BrotliDict(ctypes.Structure):
    # common/dictionary.h (brotli 1.0.x) — flat arrays, stable layout.
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class _BrotliTransforms(ctypes.Structure):
    # common/transform.h (brotli 1.0.x).
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


class LibBrotli:
    def __init__(self) -> None:
        self._dec = dec = ctypes.CDLL(
            ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1")
        self._enc = enc = ctypes.CDLL(
            ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1")
        self._common = ctypes.CDLL(
            ctypes.util.find_library("brotlicommon") or "libbrotlicommon.so.1")
        dec.BrotliDecoderDecompress.restype = ctypes.c_int
        dec.BrotliDecoderDecompress.argtypes = [
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
        enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        enc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
        self._common.BrotliGetDictionary.restype = ctypes.POINTER(_BrotliDict)
        self._common.BrotliGetTransforms.restype = ctypes.POINTER(
            _BrotliTransforms)
        self._common.BrotliTransformDictionaryWord.restype = ctypes.c_int
        self._common.BrotliTransformDictionaryWord.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(_BrotliTransforms), ctypes.c_int]

    # ----------------------------------------------------------- codec
    def compress(self, data: bytes, *, quality: int = 11,
                 lgwin: int = 22, mode: int = 0) -> bytes:
        bound = max(64, int(self._enc.BrotliEncoderMaxCompressedSize(
            len(data))))
        out = ctypes.create_string_buffer(bound)
        out_len = ctypes.c_size_t(bound)
        ok = self._enc.BrotliEncoderCompress(
            quality, lgwin, mode, len(data), data,
            ctypes.byref(out_len), out)
        if not ok:
            raise RuntimeError("libbrotli: BrotliEncoderCompress failed")
        return out.raw[: out_len.value]

    def decompress(self, data: bytes, *, max_out: int = 1 << 26) -> bytes:
        out = ctypes.create_string_buffer(max_out)
        out_len = ctypes.c_size_t(max_out)
        rc = self._dec.BrotliDecoderDecompress(
            len(data), data, ctypes.byref(out_len), out)
        if rc != 1:  # BROTLI_DECODER_RESULT_SUCCESS
            raise ValueError(f"libbrotli: decode failed (rc={rc})")
        return out.raw[: out_len.value]

    # --------------------------------------------------- wire tables
    def dictionary(self) -> tuple[bytes, list[int], list[int]]:
        """(data, size_bits_by_length, offsets_by_length)."""
        d = self._common.BrotliGetDictionary().contents
        data = bytes(ctypes.cast(
            d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
        return data, list(d.size_bits_by_length), list(d.offsets_by_length)

    def context_lookup_table(self) -> bytes:
        """The 2048-byte _kBrotliContextLookupTable: four 512-byte
        blocks (UTF8 p1 | UTF8 p2 | Signed p1 | Signed p2 per the
        library's CONTEXT() composition)."""
        sym = ctypes.cast(
            getattr(self._common, "_kBrotliContextLookupTable"),
            ctypes.POINTER(ctypes.c_uint8 * 2048))
        return bytes(sym.contents)

    def prefix_code_ranges(self) -> list[tuple[int, int]]:
        """The 26-entry block-count code as (base, extra_bits) rows
        (_kBrotliPrefixCodeRanges is uint16 base + uint8? — the struct
        is {uint16_t offset; uint8_t nbits;} padded to 4 bytes)."""
        sym = ctypes.cast(
            getattr(self._common, "_kBrotliPrefixCodeRanges"),
            ctypes.POINTER(ctypes.c_uint8 * (26 * 4)))
        raw = bytes(sym.contents)
        out = []
        for i in range(26):
            base = raw[4 * i] | (raw[4 * i + 1] << 8)
            nbits = raw[4 * i + 2]
            out.append((base, nbits))
        return out

    def transforms(self) -> list[tuple[bytes, int, bytes]]:
        """The 121 RFC 7932 word transforms as (prefix, kind, suffix)."""
        t = self._common.BrotliGetTransforms().contents
        n = int(t.num_transforms)
        ps = bytes(ctypes.cast(
            t.prefix_suffix,
            ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
        pmap = ctypes.cast(
            t.prefix_suffix_map,
            ctypes.POINTER(ctypes.c_uint16 * (t.prefix_suffix_size or 1)))

        def _piece(idx: int) -> bytes:
            off = pmap.contents[idx]
            ln = ps[off]
            return ps[off + 1: off + 1 + ln]

        trip = ctypes.cast(
            t.transforms, ctypes.POINTER(ctypes.c_uint8 * (3 * n))).contents
        out = []
        for i in range(n):
            out.append((_piece(trip[3 * i]), int(trip[3 * i + 1]),
                        _piece(trip[3 * i + 2])))
        return out

    def transform_word(self, word: bytes, transform_idx: int) -> bytes:
        """Reference-apply one transform to a dictionary word."""
        t = self._common.BrotliGetTransforms()
        dst = ctypes.create_string_buffer(len(word) + 64)
        n = self._common.BrotliTransformDictionaryWord(
            dst, word, len(word), t, transform_idx)
        return dst.raw[:n]


def load_brotli() -> LibBrotli | None:
    try:
        return LibBrotli()
    except OSError:
        return None
