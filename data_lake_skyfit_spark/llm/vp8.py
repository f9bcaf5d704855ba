"""VP8 (lossy WebP) keyframe codec per RFC 6386 — pure Python.

Decoder: full keyframe support — boolean arithmetic coder, segmentation
(quant + loop-filter features, coded segment map), all intra modes
including per-subblock B_PRED, multiple token partitions, coefficient
probability updates, dequantization, the normative inverse WHT and
inverse DCT (bit-exact integer per RFC 6386 §14), and the normal +
simple in-loop deblocking filters (§15).  The decoder is the scale
path for lossy-WebP payloads in the multimodal tier: it runs inside
Arrow-batched kernels with no native dependencies, so any Spark
executor can decode without image libraries.

Encoder: keyframe subset used by the deterministic fixture generators
and tests — 16x16 intra modes, single token partition, default
coefficient probabilities, loop filter level 0 (so reconstruction has
a closed form the DuckDB oracles mirror).

Wire-convention validation (the r3 GIF lesson: self-consistent round
trips prove nothing): tests/test_libwebp_parity.py decodes REAL
libwebp-encoded payloads (which exercise B_PRED, segmentation and the
normal loop filter) and requires bit-identical YUV planes vs
WebPDecodeYUV, and feeds this encoder's output to libwebp's decoder.
The normative constant tables below (dequant lookup, default and
update coefficient probabilities, keyframe B-mode probabilities) are
RFC 6386 §13/§14 values, cross-checked byte-for-byte against the
system libwebp's tables and against the spec-published rows.

Reference-repo analog: opaque media blobs only
(/root/reference/src/common/lake.py:59-71) — the codec itself derives
from RFC 6386 alone.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_vp8_keyframe",
    "encode_vp8_flat_frame",
    "encode_vp8_mb_frame",
    "encode_webp_vp8_flat",
]

_MAX_VP8_PIXELS = 1 << 24  # 16M luma samples (4K×4K) — bounds both the
# plane allocation AND the pure-Python MB loop before anything is read

_DISABLE_LOOP_FILTER = False  # test-only switch for isolating filter bugs

# ---------------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7)


class _BoolDecoder:
    """RFC 6386 §7.3 boolean decoder over one partition slice.

    Reading past the end of the partition feeds zero bytes — the
    convention real decoders follow (the arithmetic tail of a
    partition needs up to two phantom bytes)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.read(128) else v

    def flagged_signed(self, n: int) -> int:
        """`delta_update` convention: flag bit, then signed literal."""
        return self.signed_literal(n) if self.read(128) else 0

    def tree(self, tree: tuple[int, ...], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    """Interval-tracking encoder: maintains [low, low+range) at scale
    2^-(8+shift) and emits `low` at the end — carries resolve inside
    the arbitrary-precision add, which keeps the hot loop branch-free.
    Mirrors the §7.2 reference encoder's output interval exactly (the
    decoder accepts any value in the final interval; we emit its base,
    zero-padded, which the zero-fed tail of _BoolDecoder reproduces)."""

    __slots__ = ("low", "range", "shift")

    def __init__(self) -> None:
        self.low = 0
        self.range = 255
        self.shift = 0

    def write(self, prob: int, v: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if v:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.shift += 1

    def literal(self, n: int, v: int) -> None:
        for k in range(n - 1, -1, -1):
            self.write(128, (v >> k) & 1)

    def tree(self, tree: tuple[int, ...], probs, value: int, start: int = 0) -> None:
        # walk the tree to the leaf, recording branch decisions
        path: list[tuple[int, int]] = []

        def descend(i: int) -> bool:
            if i <= 0:
                return -i == value
            for b in (0, 1):
                path.append((i >> 1, b))
                if descend(tree[i + b]):
                    return True
                path.pop()
            return False

        # root: node index 0 has children tree[0], tree[1]
        for b in (0, 1):
            path.append((start >> 1, b))
            if descend(tree[start + b]):
                break
            path.pop()
        else:
            raise ValueError("vp8: value not in tree")
        for prob_idx, b in path:
            self.write(probs[prob_idx], b)

    def done(self) -> bytes:
        nbits = self.shift + 8
        pad = (-nbits) % 8
        v = self.low << pad
        return v.to_bytes((nbits + pad) // 8, "big") + b"\x00\x00"


# ---------------------------------------------------------------------------
# Normative constant tables (RFC 6386 §13 / §14), cross-checked against
# the system libwebp byte-for-byte (tests/test_libwebp_parity.py).

_DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
)

_AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# 16x16 / chroma intra modes
_DC_PRED, _V_PRED, _H_PRED, _TM_PRED, _B_PRED = 0, 1, 2, 3, 4
# 4x4 b-modes
(_B_DC, _B_TM, _B_VE, _B_HE, _B_LD, _B_RD, _B_VR, _B_VL, _B_HD, _B_HU) = range(10)

_KF_YMODE_TREE = (-_B_PRED, 2, 4, 6, -_DC_PRED, -_V_PRED, -_H_PRED, -_TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-_DC_PRED, 2, -_V_PRED, 4, -_H_PRED, -_TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)
_BMODE_TREE = (
    -_B_DC, 2,
    -_B_TM, 4,
    -_B_VE, 6,
    8, 12,
    -_B_HE, 10,
    -_B_RD, -_B_VR,
    -_B_LD, 14,
    -_B_VL, 16,
    -_B_HD, -_B_HU,
)
_MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# context b-mode a 16x16 mode presents to a neighbouring B_PRED block
_MODE_TO_BMODE = {_DC_PRED: _B_DC, _V_PRED: _B_VE, _H_PRED: _B_HE, _TM_PRED: _B_TM}

_COEFF_TREE = (
    -11, 2,        # 11 = EOB sentinel (token ids 0..10 are DCT_0..CAT6)
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,        # cat1, cat2
    18, 20,
    -7, -8,        # cat3, cat4
    -9, -10,       # cat5, cat6
)
_EOB = 11
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# [above][left][9], RFC 6386 mode numbering (the system libwebp stores
# this table in its own enum order with LD/RD/VR permuted; extraction
# cross-check re-applies that permutation)
_KF_BMODE_PROBS_FLAT = (
    231, 120, 48, 89, 115, 113, 120, 152, 112,
    152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103,
    56, 58, 10, 171, 218, 189, 17, 13, 152,
    144, 71, 10, 38, 171, 213, 144, 34, 26,
    114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85,
    170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226,
    81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148,
    72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128,
    41, 53, 9, 178, 241, 141, 26, 8, 107,
    104, 79, 12, 27, 217, 255, 87, 17, 7,
    74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128,
    87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194,
    66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205,
    43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171,
    56, 34, 51, 104, 114, 102, 29, 93, 77,
    107, 54, 32, 26, 51, 1, 81, 43, 31,
    39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73,
    68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124,
    62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111,
    60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114,
    40, 42, 1, 196, 245, 209, 10, 25, 109,
    100, 80, 8, 43, 154, 1, 51, 26, 71,
    88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209,
    142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221,
    51, 50, 17, 168, 209, 192, 23, 25, 82,
    125, 98, 42, 88, 104, 85, 117, 175, 82,
    95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1,
    57, 17, 5, 71, 102, 57, 53, 41, 49,
    115, 21, 2, 10, 102, 255, 166, 23, 6,
    38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114,
    101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43,
    117, 20, 15, 36, 163, 128, 68, 1, 26,
    138, 31, 36, 171, 27, 166, 38, 44, 229,
    67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154,
    40, 40, 21, 116, 143, 209, 34, 39, 175,
    57, 46, 22, 24, 128, 1, 54, 17, 37,
    47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183,
    65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223,
    87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226,
    64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213,
    30, 34, 26, 133, 152, 116, 10, 32, 134,
    75, 32, 12, 51, 192, 255, 160, 43, 51,
    39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73,
    88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192,
    55, 38, 70, 124, 73, 102, 1, 34, 98,
    102, 61, 71, 37, 34, 53, 31, 243, 192,
    69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171,
    62, 17, 19, 70, 146, 85, 55, 62, 70,
    75, 15, 9, 9, 64, 255, 184, 119, 16,
    37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85,
    86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128,
    58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218,
    51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128,
    22, 26, 17, 131, 240, 154, 14, 1, 209,
    83, 12, 13, 54, 192, 255, 68, 47, 28,
    45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213,
    85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246,
    35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45,
    85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85,
    56, 41, 15, 176, 236, 85, 37, 9, 62,
    146, 36, 19, 30, 171, 255, 97, 27, 20,
    71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142,
    138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163,
    112, 19, 12, 61, 195, 128, 48, 4, 24,
)

_COEFF_PROBS_FLAT = (
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128, 189, 129, 242, 255,
    227, 213, 255, 219, 128, 128, 128, 106, 126, 227, 252, 214, 209, 255, 255, 128,
    128, 128, 1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128, 181, 133, 238,
    254, 221, 234, 255, 154, 128, 128, 128, 78, 134, 202, 247, 198, 180, 255, 219,
    128, 128, 128, 1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128, 184, 150,
    247, 255, 236, 224, 128, 128, 128, 128, 128, 77, 110, 216, 255, 236, 230, 128,
    128, 128, 128, 128, 1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128, 170,
    139, 241, 252, 236, 209, 255, 255, 128, 128, 128, 37, 116, 196, 243, 228, 255,
    255, 255, 128, 128, 128, 1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128, 102, 103, 231, 255, 211,
    171, 128, 128, 128, 128, 128, 1, 152, 252, 255, 240, 255, 128, 128, 128, 128,
    128, 177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128, 80, 129, 211, 255,
    194, 224, 128, 128, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128,
    128, 128, 246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 255, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 198, 35, 237, 223, 193, 187, 162, 160,
    145, 155, 62, 131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1, 68, 47,
    146, 208, 149, 167, 221, 162, 255, 223, 128, 1, 149, 241, 255, 221, 224, 255,
    255, 128, 128, 128, 184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128, 81,
    99, 181, 242, 176, 190, 249, 202, 255, 255, 128, 1, 129, 232, 253, 214, 197,
    242, 196, 255, 255, 128, 99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128, 1, 200, 246, 255, 234,
    255, 128, 128, 128, 128, 128, 109, 178, 241, 255, 231, 245, 255, 255, 128, 128,
    128, 44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128, 1, 132, 239, 251,
    219, 209, 255, 165, 128, 128, 128, 94, 136, 225, 251, 218, 190, 255, 255, 128,
    128, 128, 22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128, 1, 182, 249,
    255, 232, 235, 128, 128, 128, 128, 128, 124, 143, 241, 255, 227, 234, 128, 128,
    128, 128, 128, 35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128, 1, 157,
    247, 255, 236, 231, 255, 255, 128, 128, 128, 121, 141, 235, 255, 225, 227, 255,
    255, 128, 128, 128, 45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128, 1,
    1, 251, 255, 213, 255, 128, 128, 128, 128, 128, 203, 1, 248, 255, 255, 128,
    128, 128, 128, 128, 128, 137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128, 175, 13, 224, 243, 193,
    185, 249, 198, 255, 255, 128, 73, 17, 171, 221, 161, 179, 236, 167, 255, 234,
    128, 1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128, 239, 90, 244, 250,
    211, 209, 255, 255, 128, 128, 128, 155, 77, 195, 248, 188, 195, 255, 255, 128,
    128, 128, 1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128, 201, 51, 219,
    255, 196, 186, 128, 128, 128, 128, 128, 69, 46, 190, 239, 201, 218, 255, 228,
    128, 128, 128, 1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128, 223, 165,
    249, 255, 213, 255, 128, 128, 128, 128, 128, 141, 124, 248, 255, 255, 128, 128,
    128, 128, 128, 128, 1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128, 190,
    36, 230, 255, 236, 255, 128, 128, 128, 128, 128, 149, 1, 255, 128, 128, 128,
    128, 128, 128, 128, 128, 1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128, 240, 128, 255, 128, 128,
    128, 128, 128, 128, 128, 128, 1, 134, 252, 255, 255, 128, 128, 128, 128, 128,
    128, 213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128, 55, 93, 255, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 202, 24, 213, 235, 186, 191, 220, 160,
    240, 175, 255, 126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128, 61, 46,
    138, 219, 151, 178, 240, 170, 255, 216, 128, 1, 112, 230, 250, 199, 191, 247,
    159, 255, 255, 128, 166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128, 39,
    77, 162, 232, 172, 180, 245, 178, 255, 255, 128, 1, 52, 220, 246, 198, 199,
    249, 220, 255, 255, 128, 124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128, 1, 182, 225, 249, 219,
    240, 255, 224, 128, 128, 128, 149, 150, 226, 252, 216, 205, 255, 171, 128, 128,
    128, 28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128, 1, 81, 230, 252,
    204, 203, 255, 192, 128, 128, 128, 123, 102, 209, 247, 188, 196, 255, 233, 128,
    128, 128, 20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128, 1, 222, 248,
    255, 216, 213, 128, 128, 128, 128, 128, 168, 175, 246, 252, 235, 205, 255, 255,
    128, 128, 128, 47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128, 1, 121,
    236, 253, 212, 214, 255, 255, 128, 128, 128, 141, 84, 213, 252, 201, 202, 255,
    219, 128, 128, 128, 42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128, 1,
    1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 244, 1, 255, 128, 128, 128,
    128, 128, 128, 128, 128, 238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
)

_COEFF_UPDATE_PROBS_FLAT = (
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255, 223, 241, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 249, 253, 253, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255, 234, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255, 239, 253,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 254, 253, 255, 254, 255, 255, 255, 255, 255,
    255, 250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 217, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255, 234, 250,
    241, 250, 253, 255, 253, 254, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 238,
    253, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 248, 254, 255, 255, 255,
    255, 255, 255, 255, 255, 249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 247, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255, 234, 251, 244, 254, 255,
    255, 255, 255, 255, 255, 255, 251, 251, 243, 253, 254, 255, 254, 255, 255, 255,
    255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 236, 253, 254, 255,
    255, 255, 255, 255, 255, 255, 255, 251, 253, 253, 254, 254, 255, 255, 255, 255,
    255, 255, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 248, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255, 248, 254,
    249, 253, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 255, 255, 255, 255,
    255, 255, 255, 255, 246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252,
    254, 251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 254, 252, 255, 255, 255,
    255, 255, 255, 255, 255, 248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 254, 255, 255,
    255, 255, 255, 255, 255, 255, 245, 251, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 251, 253, 255,
    255, 255, 255, 255, 255, 255, 255, 252, 253, 254, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 249, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
)


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3 / §14.4) — normative integer forms;
# Python's arithmetic right shift on negatives matches the reference C.


def _iwht4x4(ip: list[int]) -> list[int]:
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(ip: list[int]) -> list[int]:
    tmp = [0] * 16
    for i in range(4):
        x0, x1, x2, x3 = ip[i], ip[4 + i], ip[8 + i], ip[12 + i]
        a1 = x0 + x2
        b1 = x0 - x2
        c1 = ((x1 * 35468) >> 16) - (x3 + ((x3 * 20091) >> 16))
        d1 = (x1 + ((x1 * 20091) >> 16)) + ((x3 * 35468) >> 16)
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        x0, x1, x2, x3 = tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        a1 = x0 + x2
        b1 = x0 - x2
        c1 = ((x1 * 35468) >> 16) - (x3 + ((x3 * 20091) >> 16))
        d1 = (x1 + ((x1 * 20091) >> 16)) + ((x3 * 35468) >> 16)
        out[4 * i] = (a1 + d1 + 4) >> 3
        out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + c1 + 4) >> 3
        out[4 * i + 2] = (b1 - c1 + 4) >> 3
    return out


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# ---------------------------------------------------------------------------
# Token (residual) decoding — RFC 6386 §13


def _decode_block(
    bd: _BoolDecoder,
    out: list[int],
    btype: int,
    ctx: int,
    probs: list[int],
    first: int,
    qdc: int,
    qac: int,
) -> tuple[int, int]:
    """Decode one 4x4 coefficient block into `out` (raster order,
    dequantized).  Returns (n_positions_decoded, neighbour_nz_flag).
    The nz flag follows the reference decoders' position convention:
    set iff any token was decoded beyond `first`."""
    c = first
    prev_zero = False
    while c < 16:
        band = _COEFF_BANDS[c]
        pbase = ((btype * 8 + band) * 3 + ctx) * 11
        p = probs[pbase : pbase + 11]
        # a zero token is never followed by EOB: restart below the EOB branch
        tok = bd.tree(_COEFF_TREE, p, start=2 if prev_zero else 0)
        if tok == _EOB:
            break
        if tok == 0:
            ctx = 0
            prev_zero = True
            c += 1
            continue
        prev_zero = False
        if tok <= 4:
            val = tok
        else:
            cat = tok - 5
            extra = 0
            for cp in _CAT_PROBS[cat]:
                extra = (extra << 1) | bd.read(cp)
            val = _CAT_BASE[cat] + extra
        ctx = 1 if val == 1 else 2
        if bd.read(128):
            val = -val
        out[_ZIGZAG[c]] = val * (qdc if c == 0 else qac)
        c += 1
    return c - first, int(c > first)


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12)


def _pred_dc(vals_a, vals_l, have_a: bool, have_l: bool, shift_full: int) -> int:
    if have_a and have_l:
        return (sum(vals_a) + sum(vals_l) + (1 << shift_full)) >> (shift_full + 1)
    if have_a:
        return (sum(vals_a) + (1 << (shift_full - 1))) >> shift_full
    if have_l:
        return (sum(vals_l) + (1 << (shift_full - 1))) >> shift_full
    return 128


def _predict_mb(
    buf: bytearray,
    stride: int,
    x0: int,
    y0: int,
    size: int,
    mode: int,
    have_a: bool,
    have_l: bool,
) -> None:
    """16x16 luma / 8x8 chroma whole-MB intra prediction written in
    place.  Off-frame conventions: above row 127, left column 129,
    above-left 127 on the top row else the left column's 129."""
    above = (
        [buf[(y0 - 1) * stride + x0 + i] for i in range(size)] if have_a else [127] * size
    )
    left = (
        [buf[(y0 + i) * stride + x0 - 1] for i in range(size)] if have_l else [129] * size
    )
    if not have_a:
        al = 127
    elif not have_l:
        al = 129 if x0 == 0 else buf[(y0 - 1) * stride + x0 - 1]
    else:
        al = buf[(y0 - 1) * stride + x0 - 1]
    if mode == _DC_PRED:
        v = _pred_dc(above, left, have_a, have_l, 4 if size == 16 else 3)
        row = bytes([v]) * size
        for r in range(size):
            buf[(y0 + r) * stride + x0 : (y0 + r) * stride + x0 + size] = row
    elif mode == _V_PRED:
        row = bytes(above)
        for r in range(size):
            buf[(y0 + r) * stride + x0 : (y0 + r) * stride + x0 + size] = row
    elif mode == _H_PRED:
        for r in range(size):
            buf[(y0 + r) * stride + x0 : (y0 + r) * stride + x0 + size] = bytes(
                [left[r]]
            ) * size
    else:  # TM_PRED
        for r in range(size):
            base = (y0 + r) * stride + x0
            lr = left[r] - al
            buf[base : base + size] = bytes(_clamp255(lr + a) for a in above)


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _predict_b(mode: int, a: list[int], ar: list[int], left: list[int], tl: int) -> list[int]:
    """4x4 subblock prediction → 16 pixels raster order.  `a` = 4 above,
    `ar` = 4 above-right, `left` = 4 left, `tl` = above-left."""
    p = [0] * 16
    if mode == _B_DC:
        v = (sum(a) + sum(left) + 4) >> 3
        return [v] * 16
    if mode == _B_TM:
        for r in range(4):
            lr = left[r] - tl
            for c in range(4):
                p[4 * r + c] = _clamp255(lr + a[c])
        return p
    if mode == _B_VE:
        e = [tl] + a + [ar[0]]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        for r in range(4):
            p[4 * r : 4 * r + 4] = row
        return p
    if mode == _B_HE:
        col = [
            _avg3(tl, left[0], left[1]),
            _avg3(left[0], left[1], left[2]),
            _avg3(left[1], left[2], left[3]),
            _avg3(left[2], left[3], left[3]),
        ]
        for r in range(4):
            p[4 * r : 4 * r + 4] = [col[r]] * 4
        return p
    if mode == _B_LD:
        e = a + ar
        for r in range(4):
            for c in range(4):
                i = r + c
                p[4 * r + c] = (
                    _avg3(e[6], e[7], e[7]) if i == 6 else _avg3(e[i], e[i + 1], e[i + 2])
                )
        return p
    pp = [left[3], left[2], left[1], left[0], tl, a[0], a[1], a[2], a[3]]
    if mode == _B_RD:
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                p[4 * r + c] = _avg3(pp[i - 1], pp[i], pp[i + 1])
        return p
    if mode == _B_VR:
        p[0] = _avg2(pp[4], pp[5])
        p[1] = _avg2(pp[5], pp[6])
        p[2] = _avg2(pp[6], pp[7])
        p[3] = _avg2(pp[7], pp[8])
        p[4] = _avg3(pp[3], pp[4], pp[5])
        p[5] = _avg3(pp[4], pp[5], pp[6])
        p[6] = _avg3(pp[5], pp[6], pp[7])
        p[7] = _avg3(pp[6], pp[7], pp[8])
        p[8] = _avg3(pp[2], pp[3], pp[4])
        p[9], p[10], p[11] = p[0], p[1], p[2]
        p[12] = _avg3(pp[1], pp[2], pp[3])
        p[13], p[14], p[15] = p[4], p[5], p[6]
        return p
    if mode == _B_VL:
        e = a + ar
        p[0] = _avg2(e[0], e[1])
        p[1] = _avg2(e[1], e[2])
        p[2] = _avg2(e[2], e[3])
        p[3] = _avg2(e[3], e[4])
        p[4] = _avg3(e[0], e[1], e[2])
        p[5] = _avg3(e[1], e[2], e[3])
        p[6] = _avg3(e[2], e[3], e[4])
        p[7] = _avg3(e[3], e[4], e[5])
        p[8], p[9], p[10] = p[1], p[2], p[3]
        p[11] = _avg3(e[4], e[5], e[6])
        p[12], p[13], p[14] = p[5], p[6], p[7]
        p[15] = _avg3(e[5], e[6], e[7])
        return p
    if mode == _B_HD:
        p[12] = _avg2(pp[0], pp[1])
        p[13] = _avg3(pp[0], pp[1], pp[2])
        p[8] = p[14] = _avg2(pp[1], pp[2])
        p[9] = p[15] = _avg3(pp[1], pp[2], pp[3])
        p[10] = p[4] = _avg2(pp[2], pp[3])
        p[11] = p[5] = _avg3(pp[2], pp[3], pp[4])
        p[6] = p[0] = _avg2(pp[3], pp[4])
        p[7] = p[1] = _avg3(pp[3], pp[4], pp[5])
        p[2] = _avg3(pp[4], pp[5], pp[6])
        p[3] = _avg3(pp[5], pp[6], pp[7])
        return p
    if mode == _B_HU:
        l0, l1, l2, l3 = left
        p[0] = _avg2(l0, l1)
        p[1] = _avg3(l0, l1, l2)
        p[2] = p[4] = _avg2(l1, l2)
        p[3] = p[5] = _avg3(l1, l2, l3)
        p[6] = p[8] = _avg2(l2, l3)
        p[7] = p[9] = _avg3(l2, l3, l3)
        p[10] = p[11] = p[12] = p[13] = p[14] = p[15] = l3
        return p
    raise ValueError("vp8: bad b-mode")


# ---------------------------------------------------------------------------
# In-loop deblocking (RFC 6386 §15) — signed-char arithmetic per spec


def _sc(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _filter_mask(elim: int, ilim: int, px: list[int]) -> bool:
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    return (
        abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= elim
        and abs(p3 - p2) <= ilim
        and abs(p2 - p1) <= ilim
        and abs(p1 - p0) <= ilim
        and abs(q1 - q0) <= ilim
        and abs(q2 - q1) <= ilim
        and abs(q3 - q2) <= ilim
    )


def _is_hev(t: int, px: list[int]) -> bool:
    return abs(px[2] - px[3]) > t or abs(px[5] - px[4]) > t


def _common_adjust(use_outer: int, s: list[int]) -> int:
    """s = signed [p1, p0, q0, q1]; adjusts p0/q0 in place, returns F."""
    p1, p0, q0, q1 = s
    a = _sc((_sc(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _sc(a + 4) >> 3
    e = _sc(a + 3) >> 3
    s[2] = _sc(q0 - f)
    s[1] = _sc(p0 + e)
    return f


def _subblock_filter(hev_t: int, ilim: int, elim: int, px: list[int]) -> list[int]:
    if not _filter_mask(elim, ilim, px):
        return px
    hev = _is_hev(hev_t, px)
    s = [px[2] - 128, px[3] - 128, px[4] - 128, px[5] - 128]
    f = _common_adjust(1 if hev else 0, s)
    if not hev:
        a = (f + 1) >> 1
        s[3] = _sc(s[3] - a)
        s[0] = _sc(s[0] + a)
    return px[:2] + [v + 128 for v in s] + px[6:]


def _mb_filter(hev_t: int, ilim: int, elim: int, px: list[int]) -> list[int]:
    if not _filter_mask(elim, ilim, px):
        return px
    s = [v - 128 for v in px]
    if _is_hev(hev_t, px):
        mid = s[2:6]
        _common_adjust(1, mid)
        s[2:6] = mid
    else:
        w = _sc(_sc(s[2] - s[5]) + 3 * (s[4] - s[3]))
        a = _sc((27 * w + 63) >> 7)
        s[4] = _sc(s[4] - a)
        s[3] = _sc(s[3] + a)
        a = _sc((18 * w + 63) >> 7)
        s[5] = _sc(s[5] - a)
        s[2] = _sc(s[2] + a)
        a = _sc((9 * w + 63) >> 7)
        s[6] = _sc(s[6] - a)
        s[1] = _sc(s[1] + a)
    return [v + 128 for v in s]


def _simple_filter(elim: int, px: list[int]) -> list[int]:
    if abs(px[3] - px[4]) * 2 + (abs(px[2] - px[5]) >> 1) > elim:
        return px
    s = [px[2] - 128, px[3] - 128, px[4] - 128, px[5] - 128]
    _common_adjust(1, s)
    return px[:2] + [v + 128 for v in s] + px[6:]


def _filter_edge(buf: bytearray, stride: int, x: int, y: int, step: int,
                 nlines: int, line_step: int, fn) -> None:
    """Apply `fn` (an 8-pixel segment filter) along an edge.  `step` is
    the across-edge stride (1 = vertical edge, `stride` = horizontal
    edge); lines advance by `line_step`."""
    base = y * stride + x
    for _ in range(nlines):
        idx = [base + k * step for k in range(-4, 4)]
        px = [buf[i] for i in idx]
        out = fn(px)
        if out is not px:
            for i, v in zip(idx[1:7], out[1:7]):
                buf[i] = v
        base += line_step


# ---------------------------------------------------------------------------
# Frame decode


def decode_vp8_keyframe(data: bytes) -> tuple[int, int, bytes, bytes, bytes]:
    """Decode a VP8 keyframe chunk payload → (width, height, y, u, v)
    planes, cropped to the visible frame (chroma = ceil(w/2) x
    ceil(h/2)).  Raises ValueError on malformed or non-key frames;
    every declared size is validated before any allocation."""
    if len(data) < 10:
        raise ValueError("vp8: truncated header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("vp8: not a keyframe")
    if (tag >> 1) & 7 > 3:
        raise ValueError("vp8: bad version")
    first_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad start code")
    (wr, hr) = struct.unpack_from("<HH", data, 6)
    w, hgt = wr & 0x3FFF, hr & 0x3FFF
    if w == 0 or hgt == 0:
        raise ValueError("vp8: zero dimension")
    if w * hgt > _MAX_VP8_PIXELS:
        raise ValueError("vp8: frame too large")
    if first_size == 0 or 10 + first_size > len(data):
        raise ValueError("vp8: first partition truncated")
    bd = _BoolDecoder(data[10 : 10 + first_size])

    bd.read(128)  # color_space
    bd.read(128)  # clamping_type
    seg_enabled = bd.read(128)
    update_map = False
    abs_values = False
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bool(bd.read(128))
        if bd.read(128):  # update_segment_feature_data
            abs_values = bool(bd.read(128))
            for i in range(4):
                seg_quant[i] = bd.flagged_signed(7)
            for i in range(4):
                seg_lf[i] = bd.flagged_signed(6)
        if update_map:
            for i in range(3):
                if bd.read(128):
                    seg_tree_probs[i] = bd.literal(8)

    filter_type = bd.read(128)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    lf_delta_enabled = bd.read(128)
    if lf_delta_enabled:
        if bd.read(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.read(128):
                    ref_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.read(128):
                    mode_deltas[i] = bd.signed_literal(6)

    nparts = 1 << bd.literal(2)
    part_area = data[10 + first_size :]
    size_bytes = 3 * (nparts - 1)
    if len(part_area) < size_bytes:
        raise ValueError("vp8: token partition sizes truncated")
    parts = []
    off = size_bytes
    for i in range(nparts - 1):
        sz = part_area[3 * i] | (part_area[3 * i + 1] << 8) | (part_area[3 * i + 2] << 16)
        if off + sz > len(part_area):
            raise ValueError("vp8: token partition truncated")
        parts.append(part_area[off : off + sz])
        off += sz
    parts.append(part_area[off:])
    token_bds = [_BoolDecoder(p) for p in parts]

    y_ac_qi = bd.literal(7)
    y_dc_d = bd.flagged_signed(4)
    y2_dc_d = bd.flagged_signed(4)
    y2_ac_d = bd.flagged_signed(4)
    uv_dc_d = bd.flagged_signed(4)
    uv_ac_d = bd.flagged_signed(4)

    def clip127(x: int) -> int:
        return 0 if x < 0 else (127 if x > 127 else x)

    quants = []
    for s in range(4):
        if seg_enabled:
            base = seg_quant[s] if abs_values else y_ac_qi + seg_quant[s]
        else:
            base = y_ac_qi
        base = clip127(base)
        y2ac = _AC_QLOOKUP[clip127(base + y2_ac_d)] * 155 // 100
        quants.append(
            (
                _DC_QLOOKUP[clip127(base + y_dc_d)],
                _AC_QLOOKUP[base],
                _DC_QLOOKUP[clip127(base + y2_dc_d)] * 2,
                y2ac if y2ac >= 8 else 8,
                _DC_QLOOKUP[min(clip127(base + uv_dc_d), 117)],
                _AC_QLOOKUP[clip127(base + uv_ac_d)],
            )
        )

    bd.read(128)  # refresh_entropy_probs
    coeff_probs = list(_COEFF_PROBS_FLAT)
    for i in range(1056):
        if bd.read(_COEFF_UPDATE_PROBS_FLAT[i]):
            coeff_probs[i] = bd.literal(8)
    mb_no_skip = bd.read(128)
    prob_skip = bd.literal(8) if mb_no_skip else 0

    mb_cols = (w + 15) // 16
    mb_rows = (hgt + 15) // 16
    n_mb = mb_cols * mb_rows

    # ---- mode parsing (all in the first partition, raster order)
    seg_ids = [0] * n_mb
    skips = [False] * n_mb
    ymodes = [0] * n_mb
    uvmodes = [0] * n_mb
    bmodes: list[list[int] | None] = [None] * n_mb
    above_b = [[_B_DC] * 4 for _ in range(mb_cols)]
    for mby in range(mb_rows):
        left_b = [_B_DC] * 4
        for mbx in range(mb_cols):
            i = mby * mb_cols + mbx
            if update_map:
                seg_ids[i] = bd.tree(_MB_SEGMENT_TREE, seg_tree_probs)
            if mb_no_skip:
                skips[i] = bool(bd.read(prob_skip))
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            ymodes[i] = ym
            if ym == _B_PRED:
                bm = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = above_b[mbx][c] if r == 0 else bm[sb - 4]
                    lm = left_b[r] if c == 0 else bm[sb - 1]
                    pbase = (am * 10 + lm) * 9
                    bm[sb] = bd.tree(
                        _BMODE_TREE, _KF_BMODE_PROBS_FLAT[pbase : pbase + 9]
                    )
                bmodes[i] = bm
                above_b[mbx] = bm[12:16]
                left_b = [bm[3], bm[7], bm[11], bm[15]]
            else:
                cb = _MODE_TO_BMODE[ym]
                above_b[mbx] = [cb] * 4
                left_b = [cb] * 4
            uvmodes[i] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)

    # ---- token decode + reconstruction
    W, H = mb_cols * 16, mb_rows * 16
    CW, CH = mb_cols * 8, mb_rows * 8
    ybuf = bytearray(W * H)
    ubuf = bytearray(CW * CH)
    vbuf = bytearray(CW * CH)
    has_coeffs = [False] * n_mb
    above_nz = [[0] * 9 for _ in range(mb_cols)]

    for mby in range(mb_rows):
        left_nz = [0] * 9
        tbd = token_bds[mby % nparts]
        for mbx in range(mb_cols):
            i = mby * mb_cols + mbx
            ym = ymodes[i]
            has_y2 = ym != _B_PRED
            blocks = [[0] * 16 for _ in range(25)]
            if skips[i]:
                for k in range(8):
                    above_nz[mbx][k] = 0
                    left_nz[k] = 0
                if has_y2:
                    above_nz[mbx][8] = left_nz[8] = 0
            else:
                q = quants[seg_ids[i]]
                eobtotal = 0
                if has_y2:
                    ctx = above_nz[mbx][8] + left_nz[8]
                    eob, nz = _decode_block(
                        tbd, blocks[24], 1, ctx, coeff_probs, 0, q[2], q[3]
                    )
                    above_nz[mbx][8] = left_nz[8] = nz
                    eobtotal += eob
                    ytype, first = 0, 1
                else:
                    ytype, first = 3, 0
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = above_nz[mbx][c] + left_nz[r]
                    eob, nz = _decode_block(
                        tbd, blocks[b], ytype, ctx, coeff_probs, first, q[0], q[1]
                    )
                    above_nz[mbx][c] = left_nz[r] = nz
                    eobtotal += eob
                for plane in range(2):
                    for b in range(4):
                        r, c = b >> 1, b & 1
                        ia = 4 + plane * 2 + c
                        il = 4 + plane * 2 + r
                        ctx = above_nz[mbx][ia] + left_nz[il]
                        eob, nz = _decode_block(
                            tbd,
                            blocks[16 + plane * 4 + b],
                            2,
                            ctx,
                            coeff_probs,
                            0,
                            q[4],
                            q[5],
                        )
                        above_nz[mbx][ia] = left_nz[il] = nz
                        eobtotal += eob
                has_coeffs[i] = eobtotal > 0
                if has_y2:
                    wht = _iwht4x4(blocks[24])
                    for b in range(16):
                        blocks[b][0] = wht[b]

            x0, y0 = mbx * 16, mby * 16
            if has_y2:
                _predict_mb(ybuf, W, x0, y0, 16, ym, mby > 0, mbx > 0)
                for b in range(16):
                    res = _idct4x4(blocks[b])
                    bx, by = x0 + (b & 3) * 4, y0 + (b >> 2) * 4
                    for r in range(4):
                        base = (by + r) * W + bx
                        for c in range(4):
                            ybuf[base + c] = _clamp255(ybuf[base + c] + res[4 * r + c])
            else:
                bm = bmodes[i]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + c * 4, y0 + r * 4
                    # above / above-right / left / top-left with edge rules
                    if by == 0:
                        a4 = [127] * 4
                    else:
                        a4 = [ybuf[(by - 1) * W + bx + k] for k in range(4)]
                    if c == 3:
                        # right-column subblocks always take above-right
                        # from the row above the MB (reference-decoder rule)
                        if y0 == 0:
                            ar4 = [127] * 4
                        elif mbx == mb_cols - 1:
                            ar4 = [ybuf[(y0 - 1) * W + W - 1]] * 4
                        else:
                            ar4 = [ybuf[(y0 - 1) * W + x0 + 16 + k] for k in range(4)]
                    elif by == 0:
                        ar4 = [127] * 4
                    else:
                        ar4 = [ybuf[(by - 1) * W + bx + 4 + k] for k in range(4)]
                    if bx == 0:
                        l4 = [129] * 4
                    else:
                        l4 = [ybuf[(by + k) * W + bx - 1] for k in range(4)]
                    if by == 0:
                        tl = 127
                    elif bx == 0:
                        tl = 129
                    else:
                        tl = ybuf[(by - 1) * W + bx - 1]
                    pred = _predict_b(bm[sb], a4, ar4, l4, tl)
                    res = _idct4x4(blocks[sb])
                    for r2 in range(4):
                        base = (by + r2) * W + bx
                        for c2 in range(4):
                            ybuf[base + c2] = _clamp255(
                                pred[4 * r2 + c2] + res[4 * r2 + c2]
                            )
            cx0, cy0 = mbx * 8, mby * 8
            for cbuf, boff in ((ubuf, 16), (vbuf, 20)):
                _predict_mb(cbuf, CW, cx0, cy0, 8, uvmodes[i], mby > 0, mbx > 0)
                for b in range(4):
                    res = _idct4x4(blocks[boff + b])
                    bx, by = cx0 + (b & 1) * 4, cy0 + (b >> 1) * 4
                    for r in range(4):
                        base = (by + r) * CW + bx
                        for c in range(4):
                            cbuf[base + c] = _clamp255(cbuf[base + c] + res[4 * r + c])

    # ---- loop filter
    if filter_level and not _DISABLE_LOOP_FILTER:
        for mby in range(mb_rows):
            for mbx in range(mb_cols):
                i = mby * mb_cols + mbx
                lvl = (
                    (seg_lf[seg_ids[i]] if abs_values else filter_level + seg_lf[seg_ids[i]])
                    if seg_enabled
                    else filter_level
                )
                if lf_delta_enabled:
                    lvl += ref_deltas[0]  # keyframes: always the intra ref
                    if ymodes[i] == _B_PRED:
                        lvl += mode_deltas[0]
                lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
                if lvl == 0:
                    continue
                ilim = lvl
                if sharpness:
                    ilim >>= 2 if sharpness > 4 else 1
                    if ilim > 9 - sharpness:
                        ilim = 9 - sharpness
                if ilim < 1:
                    ilim = 1
                hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
                mb_lim = (lvl + 2) * 2 + ilim
                sb_lim = lvl * 2 + ilim
                inner = has_coeffs[i] or ymodes[i] == _B_PRED
                x0, y0 = mbx * 16, mby * 16
                cx0, cy0 = mbx * 8, mby * 8
                if filter_type == 0:  # normal
                    mbf = lambda px: _mb_filter(hev_t, ilim, mb_lim, px)
                    sbf = lambda px: _subblock_filter(hev_t, ilim, sb_lim, px)
                    if mbx > 0:
                        _filter_edge(ybuf, W, x0, y0, 1, 16, W, mbf)
                        _filter_edge(ubuf, CW, cx0, cy0, 1, 8, CW, mbf)
                        _filter_edge(vbuf, CW, cx0, cy0, 1, 8, CW, mbf)
                    if inner:
                        for dx in (4, 8, 12):
                            _filter_edge(ybuf, W, x0 + dx, y0, 1, 16, W, sbf)
                        _filter_edge(ubuf, CW, cx0 + 4, cy0, 1, 8, CW, sbf)
                        _filter_edge(vbuf, CW, cx0 + 4, cy0, 1, 8, CW, sbf)
                    if mby > 0:
                        _filter_edge(ybuf, W, x0, y0, W, 16, 1, mbf)
                        _filter_edge(ubuf, CW, cx0, cy0, CW, 8, 1, mbf)
                        _filter_edge(vbuf, CW, cx0, cy0, CW, 8, 1, mbf)
                    if inner:
                        for dy in (4, 8, 12):
                            _filter_edge(ybuf, W, x0, y0 + dy, W, 16, 1, sbf)
                        _filter_edge(ubuf, CW, cx0, cy0 + 4, CW, 8, 1, sbf)
                        _filter_edge(vbuf, CW, cx0, cy0 + 4, CW, 8, 1, sbf)
                else:  # simple: luma only
                    mbs = lambda px: _simple_filter(mb_lim, px)
                    sbs = lambda px: _simple_filter(sb_lim, px)
                    if mbx > 0:
                        _filter_edge(ybuf, W, x0, y0, 1, 16, W, mbs)
                    if inner:
                        for dx in (4, 8, 12):
                            _filter_edge(ybuf, W, x0 + dx, y0, 1, 16, W, sbs)
                    if mby > 0:
                        _filter_edge(ybuf, W, x0, y0, W, 16, 1, mbs)
                    if inner:
                        for dy in (4, 8, 12):
                            _filter_edge(ybuf, W, x0, y0 + dy, W, 16, 1, sbs)

    # ---- crop
    cw, ch2 = (w + 1) // 2, (hgt + 1) // 2
    y_out = b"".join(bytes(ybuf[r * W : r * W + w]) for r in range(hgt))
    u_out = b"".join(bytes(ubuf[r * CW : r * CW + cw]) for r in range(ch2))
    v_out = b"".join(bytes(vbuf[r * CW : r * CW + cw]) for r in range(ch2))
    return w, hgt, y_out, u_out, v_out


# ---------------------------------------------------------------------------
# Encoder — keyframe subset for deterministic fixtures.  Uniform-colour
# frames code as: first MB carries one Y2 DC token (luma level rides
# through the inverse WHT into every Y block) plus one DC token per
# chroma block; every later MB is mb_skip with DC_PRED, whose whole-MB
# average reproduces the value exactly.  Reconstruction therefore has
# the closed form below (`vp8_flat_expected`), which the DuckDB
# oracles mirror in integer SQL.


def _token_for_value(v: int) -> tuple[int, int, int]:
    """abs coefficient value → (token id, n_extra_bits, extra)."""
    if v <= 4:
        return v, 0, 0
    for cat in range(6):
        lo = _CAT_BASE[cat]
        hi = lo + (1 << len(_CAT_PROBS[cat])) - 1
        if v <= hi:
            return 5 + cat, len(_CAT_PROBS[cat]), v - lo
    raise ValueError("vp8: coefficient too large")


def _write_coeff_block(
    te: _BoolEncoder, probs: list[int], btype: int, first: int, ctx: int, dc_val: int
) -> int:
    """Write a DC-only (dc_val != 0) or empty block; returns nz flag."""
    c = first
    pbase = ((btype * 8 + _COEFF_BANDS[c]) * 3 + ctx) * 11
    p = probs[pbase : pbase + 11]
    if dc_val == 0:
        te.tree(_COEFF_TREE, p, _EOB)
        return 0
    tok, nbits, extra = _token_for_value(abs(dc_val))
    te.tree(_COEFF_TREE, p, tok)
    if nbits:
        for i, cp in enumerate(_CAT_PROBS[tok - 5]):
            te.write(cp, (extra >> (nbits - 1 - i)) & 1)
    te.write(128, 1 if dc_val < 0 else 0)
    c += 1
    ctx2 = 1 if abs(dc_val) == 1 else 2
    pbase2 = ((btype * 8 + _COEFF_BANDS[c]) * 3 + ctx2) * 11
    te.tree(_COEFF_TREE, probs[pbase2 : pbase2 + 11], _EOB)
    return 1


def encode_vp8_flat_frame(
    width: int,
    height: int,
    *,
    qindex: int,
    y2dc_token: int,
    u_token: int,
    v_token: int,
) -> bytes:
    """VP8 keyframe chunk payload for a uniform frame (see module
    docstring).  Loop filter level 0; single token partition; default
    coefficient probabilities; all tokens positive DC values."""
    if not (0 < width <= 0x3FFF and 0 < height <= 0x3FFF):
        raise ValueError("vp8: dims must fit 14 bits")
    if not 0 <= qindex <= 127:
        raise ValueError("vp8: qindex out of range")
    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    probs = list(_COEFF_PROBS_FLAT)
    prob_skip = 64

    be = _BoolEncoder()
    be.write(128, 0)  # color_space
    be.write(128, 0)  # clamping_type
    be.write(128, 0)  # segmentation_enabled
    be.write(128, 0)  # filter_type: normal (level 0 -> no filtering)
    be.literal(6, 0)  # loop_filter_level
    be.literal(3, 0)  # sharpness
    be.write(128, 0)  # loop_filter_adj_enable
    be.literal(2, 0)  # log2(token partitions) = 0
    be.literal(7, qindex)
    for _ in range(5):
        be.write(128, 0)  # y_dc / y2_dc / y2_ac / uv_dc / uv_ac deltas
    be.write(128, 1)  # refresh_entropy_probs
    for i in range(1056):
        be.write(_COEFF_UPDATE_PROBS_FLAT[i], 0)
    be.write(128, 1)  # mb_no_coeff_skip
    be.literal(8, prob_skip)
    for mb in range(mb_cols * mb_rows):
        be.write(prob_skip, 0 if mb == 0 else 1)
        be.tree(_KF_YMODE_TREE, _KF_YMODE_PROB, _DC_PRED)
        be.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB, _DC_PRED)
    first_part = be.done()

    te = _BoolEncoder()
    # first MB only: Y2 DC, 16 empty Y blocks, 4+4 chroma DC blocks —
    # context bookkeeping mirrors the decoder's (all contexts start 0)
    _write_coeff_block(te, probs, 1, 0, 0, y2dc_token)
    for _b in range(16):
        _write_coeff_block(te, probs, 0, 1, 0, 0)
    for tok in (u_token, v_token):
        nz_a = [0, 0]
        nz_l = [0, 0]
        for b in range(4):
            r, c = b >> 1, b & 1
            _write_coeff_block(te, probs, 2, 0, nz_a[c] + nz_l[r], tok)
            nz_a[c] = nz_l[r] = 1 if tok else 0
    token_part = te.done()

    tag = (len(first_part) << 5) | (1 << 4)  # keyframe, version 0, shown
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
        + first_part
        + token_part
    )


def encode_webp_vp8_flat(
    width: int,
    height: int,
    *,
    qindex: int,
    y2dc_token: int,
    u_token: int,
    v_token: int,
) -> bytes:
    """Full RIFF/WEBP container around `encode_vp8_flat_frame`."""
    chunk = encode_vp8_flat_frame(
        width,
        height,
        qindex=qindex,
        y2dc_token=y2dc_token,
        u_token=u_token,
        v_token=v_token,
    )
    body = chunk + (b"\x00" if len(chunk) & 1 else b"")
    payload = b"WEBP" + b"VP8 " + struct.pack("<I", len(chunk)) + body
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def vp8_flat_expected(
    qindex: int, y2dc_token: int, u_token: int, v_token: int
) -> tuple[int, int, int]:
    """Closed-form (Y, U, V) plane values for encode_vp8_flat_frame
    output: the exact integer arithmetic the decoder performs on a
    DC-only frame.  Mirrored in SQL by the battery oracles."""
    d = y2dc_token * (_DC_QLOOKUP[qindex] * 2)
    yv = 128 + ((((d + 3) >> 3) + 4) >> 3)
    quv = _DC_QLOOKUP[min(qindex, 117)]
    uv = 128 + ((u_token * quv + 4) >> 3)
    vv = 128 + ((v_token * quv + 4) >> 3)
    return min(yv, 255), min(uv, 255), min(vv, 255)


def encode_vp8_mb_frame(
    width: int,
    height: int,
    *,
    qindex: int,
    y2_tokens: list[int],
    u_token: int = 0,
    v_token: int = 0,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
) -> bytes:
    """Test-oriented keyframe encoder: one Y2/U/V DC token set PER
    MACROBLOCK (y2_tokens[mb] in raster order), every MB coded
    (skip=0) with DC_PRED, and an explicit loop-filter configuration.
    Per-MB level steps create real discontinuities at every MB edge,
    so a nonzero filter_level exercises the §15 normal/simple filters
    on content they actually modify — the libwebp parity tests decode
    these streams with the reference decoder and require bit-identical
    planes (the only way to pin the SIMPLE filter, which libwebp's
    encoder itself never emits)."""
    mb_cols = (width + 15) // 16
    mb_rows = (height + 15) // 16
    if len(y2_tokens) != mb_cols * mb_rows:
        raise ValueError("vp8: need one y2 token per macroblock")
    if not (0 <= filter_level <= 63 and filter_type in (0, 1) and 0 <= sharpness <= 7):
        raise ValueError("vp8: bad filter settings")
    probs = list(_COEFF_PROBS_FLAT)
    prob_skip = 64

    be = _BoolEncoder()
    be.write(128, 0)
    be.write(128, 0)
    be.write(128, 0)  # no segmentation
    be.write(128, filter_type)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    be.write(128, 0)  # no lf deltas
    be.literal(2, 0)
    be.literal(7, qindex)
    for _ in range(5):
        be.write(128, 0)
    be.write(128, 1)
    for i in range(1056):
        be.write(_COEFF_UPDATE_PROBS_FLAT[i], 0)
    be.write(128, 1)
    be.literal(8, prob_skip)
    for _mb in range(mb_cols * mb_rows):
        be.write(prob_skip, 0)
        be.tree(_KF_YMODE_TREE, _KF_YMODE_PROB, _DC_PRED)
        be.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB, _DC_PRED)
    first_part = be.done()

    te = _BoolEncoder()
    above_y2 = [0] * mb_cols
    above_uv = [[[0, 0] for _ in range(mb_cols)] for _ in range(2)]
    for mby in range(mb_rows):
        left_y2 = 0
        left_uv = [[0, 0], [0, 0]]
        for mbx in range(mb_cols):
            tok = y2_tokens[mby * mb_cols + mbx]
            nz = _write_coeff_block(
                te, probs, 1, 0, above_y2[mbx] + left_y2, tok
            )
            above_y2[mbx] = left_y2 = nz
            for _b in range(16):
                _write_coeff_block(te, probs, 0, 1, 0, 0)
            for comp, ctok in ((0, u_token), (1, v_token)):
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = above_uv[comp][mbx][c] + left_uv[comp][r]
                    cnz = _write_coeff_block(te, probs, 2, 0, ctx, ctok)
                    above_uv[comp][mbx][c] = left_uv[comp][r] = cnz
    token_part = te.done()

    tag = (len(first_part) << 5) | (1 << 4)
    chunk = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
        + first_part
        + token_part
    )
    body = chunk + (b"\x00" if len(chunk) & 1 else b"")
    payload = b"WEBP" + b"VP8 " + struct.pack("<I", len(chunk)) + body
    return b"RIFF" + struct.pack("<I", len(payload)) + payload
