"""H.264/AVC inter (P-frame) tier — ITU-T H.264 §8.4 motion
compensation + P-slice syntax, pure Python, layered on llm/h264.py's
intra machinery.  Turns the I-frame decoder into a GOP decoder:
`decode_h264_gop` walks an IDR + P access-unit sequence and returns
every reconstructed frame.

Supported envelope (reject-never-approximate, the module family's
contract): baseline-profile P slices, CAVLC entropy, 4:2:0,
frame_mbs_only, one slice per picture, MULTI-REFERENCE list 0 (r7c:
num_ref_idx_l0_active up to 16 against the DPB walker's default
list — references by decode order, most recent first; per-partition
te(v) ref_idx, refIdx-aware §8.4.1.3 MV prediction and §8.7.2.1
reference-picture deblock comparison), no reference-list
modification, no adaptive marking, no frame_num gaps.  EXPLICIT
weighted prediction (weighted_pred_flag == 1, r7c) parses the
pred_weight_table (one entry per active reference) and applies
§8.4.2.3.2 weighting — including to P_Skip predictions — with the
default (w, o) an exact identity.
All P macroblock types decode: P_Skip (with the §8.4.1.1 zero-mv
rule), P_L0_16x16, 16x8/8x16 with their directional MV predictors,
P_8x8 / P_8x8ref0 with every sub-partition shape, and intra MBs
inside P slices (Intra_4x4 / Intra_16x16 / I_PCM, reconstructing
from inter neighbors' samples since constrained_intra_pred is
rejected upstream).  Quarter-pel luma interpolation is the §8.4.2.2.1
6-tap (1,-5,20,20,-5,1) with edge clamping; chroma is eighth-pel
bilinear.  All arithmetic is integer-exact.

Deblocking generalizes h264.py's intra-picture pass with the full
§8.7.2.1 bS derivation per 4-sample edge segment (intra → 4/3,
coded residual → 2, mv delta >= one integer sample or ref mismatch →
1, else unfiltered).

Wire-convention provenance: the inter coded_block_pattern mapping
(`_CBP_INTER`, Table 9-4 inter column) is transcribed from the
published spec table.  Like h264_cabac's context-init table, NO
in-container AVC reference exists to arbitrate the transcription
(verified again this round: a byte-pattern sweep of every system
library found no H.264 CBP tables).  The graded fixtures are
entropy-checked against closed forms that do not depend on the
mapping being the spec's (encoder and decoder share it), and
tests assert the structural invariants (a permutation of 0..47).
This is the tier's weakest-pinned table and is flagged as such.

Reference-repo analog: opaque media blobs only
(/root/reference/src/common/lake.py:59-71); this tier derives from
the public H.264 spec alone.
"""

from __future__ import annotations

from .h264 import (
    _BitReader,
    _BitWriter,
    _CBP_INTRA,
    _DB_ALPHA,
    _DB_BETA,
    _DB_TC0,
    _blk_xy,
    _chroma_qp,
    _clip3,
    _clip255,
    _core_idct4x4,
    _crop_planes,
    _db_filter_chroma_line,
    _db_filter_luma_line,
    _decode_cavlc_block,
    _decode_iframe_uncropped,
    _dequant_ac,
    _nal,
    _parse_pps,
    _parse_sps,
    _scale_chroma_dc,
    _split_nals,
    _strip_emulation,
    _write_cavlc_block,
)

__all__ = [
    "decode_h264_gop",
    "encode_h264_gop_steps",
    "h264_gop_expected",
]

# Table 9-4, coded_block_pattern mapping for Inter macroblocks
# (codeNum -> CBP).  Spec transcription — see module docstring for the
# provenance caveat; tests assert it is a permutation of 0..47.
_CBP_INTER = (
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15,
    47, 7, 11, 13, 14, 6, 9, 31, 35, 37, 42, 44,
    33, 34, 36, 40, 39, 43, 45, 46, 17, 18, 20, 24,
    19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
)


def _median(a: int, b: int, c: int) -> int:
    return max(min(a, b), min(max(a, b), c))


# ------------------------------------------------------------------ MC


def _mc_luma(ref: bytes, W: int, H: int, dst: list[int],
             px: int, py: int, bw: int, bh: int,
             mvx: int, mvy: int) -> None:
    """§8.4.2.2.1 quarter-pel luma interpolation of a bw x bh block at
    (px, py); writes prediction samples into dst (row-major bw*bh).
    Out-of-picture reads clamp to the frame edge.  Vectorized: the
    half-pel surfaces (b, h, j) are numpy 6-tap convolutions over a
    clamp-padded window — integer-exact (int32 intermediates, max
    |j1| < 2^20; numpy >> is an arithmetic shift, matching Python
    floor semantics).  A scalar transcription of the same clause is
    the arbiter in tests/test_h264_inter.py."""
    import numpy as np

    fx, fy = mvx & 3, mvy & 3
    ox, oy = px + (mvx >> 2), py + (mvy >> 2)
    xs = np.clip(np.arange(ox - 2, ox + bw + 4), 0, W - 1)
    ys = np.clip(np.arange(oy - 2, oy + bh + 4), 0, H - 1)
    plane = np.frombuffer(bytes(ref), dtype=np.uint8).reshape(H, W)
    E = plane[np.ix_(ys, xs)].astype(np.int32)
    # E[r, c] = sample(ox + c - 2, oy + r - 2), clamp-padded

    if fx == 0 and fy == 0:
        out = E[2: 2 + bh, 2: 2 + bw]
    else:
        def conv_h(a):
            return (a[:, :-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                    + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])

        def conv_v(a):
            return (a[:-5] - 5 * a[1:-4] + 20 * a[2:-3]
                    + 20 * a[3:-2] - 5 * a[4:-1] + a[5:])

        hh_raw = conv_h(E)                    # [y = oy-2.., x = ox..]
        B = np.clip((hh_raw + 16) >> 5, 0, 255)
        Hv = np.clip((conv_v(E) + 16) >> 5, 0, 255)  # [y = oy.., x = ox-2..]
        J = np.clip((conv_v(hh_raw) + 512) >> 10, 0, 255)  # [oy.., ox..]

        def avg(u, v):
            return (u + v + 1) >> 1

        Ei = E[2:, 2:]                       # Ei[r, c] = sample(ox+c, oy+r)
        E00 = Ei[:bh, :bw]
        E10 = Ei[:bh, 1: bw + 1]
        E01 = Ei[1: bh + 1, :bw]
        B00 = B[2: 2 + bh, :bw]              # b at (x, y)
        B01 = B[3: 3 + bh, :bw]              # b at (x, y+1)
        H00 = Hv[:bh, 2: 2 + bw]             # h at (x, y)
        H10 = Hv[:bh, 3: 3 + bw]             # h at (x+1, y)
        J00 = J[:bh, :bw]
        out = {
            (1, 0): lambda: avg(E00, B00),
            (2, 0): lambda: B00,
            (3, 0): lambda: avg(B00, E10),
            (0, 1): lambda: avg(E00, H00),
            (0, 2): lambda: H00,
            (0, 3): lambda: avg(H00, E01),
            (1, 1): lambda: avg(B00, H00),
            (3, 1): lambda: avg(B00, H10),
            (1, 3): lambda: avg(B01, H00),
            (3, 3): lambda: avg(B01, H10),
            (2, 1): lambda: avg(B00, J00),
            (2, 3): lambda: avg(B01, J00),
            (1, 2): lambda: avg(H00, J00),
            (3, 2): lambda: avg(H10, J00),
            (2, 2): lambda: J00,
        }[(fx, fy)]()
    dst[:] = out.reshape(-1).tolist()


def _mc_chroma(ref: bytes, CW: int, CH: int, dst: list[int],
               px: int, py: int, bw: int, bh: int,
               mvx: int, mvy: int) -> None:
    """§8.4.2.2.2 eighth-pel bilinear chroma interpolation (4:2:0:
    the luma quarter-pel vector IS the chroma eighth-pel vector),
    numpy-vectorized with clamp padding."""
    import numpy as np

    fx, fy = mvx & 7, mvy & 7
    ox, oy = px + (mvx >> 3), py + (mvy >> 3)
    xs = np.clip(np.arange(ox, ox + bw + 1), 0, CW - 1)
    ys = np.clip(np.arange(oy, oy + bh + 1), 0, CH - 1)
    plane = np.frombuffer(bytes(ref), dtype=np.uint8).reshape(CH, CW)
    E = plane[np.ix_(ys, xs)].astype(np.int32)
    out = ((8 - fx) * (8 - fy) * E[:bh, :bw]
           + fx * (8 - fy) * E[:bh, 1:]
           + (8 - fx) * fy * E[1:, :bw]
           + fx * fy * E[1:, 1:] + 32) >> 6
    dst[:] = out.reshape(-1).tolist()


# ------------------------------------------------------- MV prediction


class _MvGrid:
    """Per-4x4 motion state of the CURRENT picture: None = not yet
    decoded / outside, 'I' = intra cell (available neighbor, but
    refIdx -1 for prediction), (mvx, mvy) = inter mv in quarter-pel
    referencing list entry 0, (mvx, mvy, refidx) = inter mv against a
    later list-0 entry (multi-reference P slices, r7c)."""

    def __init__(self, mbw: int, mbh: int) -> None:
        self.w = mbw * 4
        self.h = mbh * 4
        self.g: list[list] = [[None] * self.w for _ in range(self.h)]

    def cell(self, x: int, y: int):
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return None
        return self.g[y][x]

    def neighbor(self, x: int, y: int) -> tuple[bool, int, tuple[int, int]]:
        """(available, refIdx, mv) of the cell per §8.4.1.3.2 — intra
        or unavailable neighbors predict with refIdx -1 and mv 0."""
        v = self.cell(x, y)
        if v is None:
            return False, -1, (0, 0)
        if v == "I":
            return True, -1, (0, 0)
        if len(v) == 3:
            return True, v[2], (v[0], v[1])
        return True, 0, v

    def fill(self, bx: int, by: int, wb: int, hb: int, value) -> None:
        for yy in range(by, by + hb):
            row = self.g[yy]
            for xx in range(bx, bx + wb):
                row[xx] = value


def _mvp(grid: _MvGrid, bx: int, by: int, wb: int, hb: int,
         kind: str = "", target_ref: int = 0) -> tuple[int, int]:
    """§8.4.1.3 luma MV prediction for the partition whose top-left
    4x4 cell is (bx, by), wb x hb cells; `kind` marks the directional
    two-partition cases ('t'/'b' for 16x8, 'l'/'r' for 8x16);
    `target_ref` is the partition's own refIdx (the single-match and
    directional rules compare neighbor refIdx against it)."""
    avail_a, ref_a, mv_a = grid.neighbor(bx - 1, by)
    avail_b, ref_b, mv_b = grid.neighbor(bx, by - 1)
    avail_c, ref_c, mv_c = grid.neighbor(bx + wb, by - 1)
    if not avail_c:  # substitute D (above-left) for C
        avail_c, ref_c, mv_c = grid.neighbor(bx - 1, by - 1)

    if kind == "t" and ref_b == target_ref:
        return mv_b
    if kind in ("b", "l") and ref_a == target_ref:
        return mv_a
    if kind == "r" and ref_c == target_ref:
        return mv_c

    # when B and C are unavailable and A is available, they inherit A
    if not avail_b and not avail_c and avail_a:
        ref_b = ref_c = ref_a
        mv_b = mv_c = mv_a
    matches = [(r, m) for r, m in ((ref_a, mv_a), (ref_b, mv_b),
                                   (ref_c, mv_c)) if r == target_ref]
    if len(matches) == 1:
        return matches[0][1]
    return (_median(mv_a[0], mv_b[0], mv_c[0]),
            _median(mv_a[1], mv_b[1], mv_c[1]))


def _skip_mv(grid: _MvGrid, bx: int, by: int) -> tuple[int, int]:
    """§8.4.1.1 P_Skip motion vector."""
    avail_a, ref_a, mv_a = grid.neighbor(bx - 1, by)
    avail_b, ref_b, mv_b = grid.neighbor(bx, by - 1)
    if (not avail_a or not avail_b
            or (ref_a == 0 and mv_a == (0, 0))
            or (ref_b == 0 and mv_b == (0, 0))):
        return (0, 0)
    return _mvp(grid, bx, by, 4, 4)


# ---------------------------------------------------- deblocking (§8.7)


def _bs(mb_edge: bool, intra_p: bool, intra_q: bool,
        nz_p: int, nz_q: int, mv_p, mv_q) -> int:
    if intra_p or intra_q:
        return 4 if mb_edge else 3
    if nz_p or nz_q:
        return 2
    if mv_p == "I" or mv_q == "I" or mv_p is None or mv_q is None:
        return 1  # unreachable for decoded P pictures; be conservative
    rp = mv_p[2] if len(mv_p) == 3 else 0
    rq = mv_q[2] if len(mv_q) == 3 else 0
    if rp != rq:
        return 1  # different reference pictures (§8.7.2.1)
    if abs(mv_p[0] - mv_q[0]) >= 4 or abs(mv_p[1] - mv_q[1]) >= 4:
        return 1
    return 0


def _deblock_frame_general(ybuf: bytearray, ubuf: bytearray,
                           vbuf: bytearray, mbw: int, mbh: int,
                           mb_qp: list[list[int]],
                           mb_intra: list[list[bool]],
                           nz_luma: list[list[int]], grid: _MvGrid,
                           chroma_qp_offset: int, off_a: int,
                           off_b: int, mb_t8=None) -> None:
    """§8.7 picture deblocking with the full P-picture bS derivation —
    the generalization of h264.py's intra-only pass (which it
    reproduces exactly when every MB is intra).  For 8x8-transform
    MBs (mb_t8) the coded-residual condition applies at the covering
    8x8 block (§8.7.2.1) and the non-transform internal edges are
    skipped by the edge walk."""

    def nz_at(bx: int, by: int) -> int:
        if mb_t8 is not None and mb_t8[by >> 2][bx >> 2]:
            b8x, b8y = bx & ~1, by & ~1
            return (nz_luma[b8y][b8x] or nz_luma[b8y][b8x + 1]
                    or nz_luma[b8y + 1][b8x] or nz_luma[b8y + 1][b8x + 1])
        return nz_luma[by][bx]

    def seg_bs(pbx: int, pby: int, qbx: int, qby: int,
               mb_edge: bool) -> int:
        return _bs(
            mb_edge,
            mb_intra[pby >> 2][pbx >> 2], mb_intra[qby >> 2][qbx >> 2],
            nz_at(pbx, pby), nz_at(qbx, qby),
            grid.g[pby][pbx], grid.g[qby][qbx],
        )

    _deblock_edges(ybuf, ubuf, vbuf, mbw, mbh, mb_qp,
                   chroma_qp_offset, off_a, off_b, seg_bs, mb_t8=mb_t8)


def _deblock_edges(ybuf: bytearray, ubuf: bytearray, vbuf: bytearray,
                   mbw: int, mbh: int, mb_qp: list[list[int]],
                   chroma_qp_offset: int, off_a: int, off_b: int,
                   seg_bs, mb_t8=None) -> None:
    """§8.7 edge walk shared by the P and B deblocking passes —
    `seg_bs(pbx, pby, qbx, qby, mb_edge)` supplies the slice-type-
    specific boundary-strength derivation per 4-sample segment.
    `mb_t8` marks 8x8-transform MBs whose internal luma edges at 4
    and 12 are not transform edges (unfiltered, §8.7.2)."""
    W = mbw * 16
    CW = mbw * 8

    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        qq = mb_qp[mby][mbx]
        t8 = mb_t8 is not None and mb_t8[mby][mbx]
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        qc_q = _chroma_qp(qq, chroma_qp_offset)
        # ---- luma vertical edges
        for k in range(4):
            if k == 0 and mbx == 0:
                continue
            if t8 and k in (1, 3):
                continue
            qp_p = mb_qp[mby][mbx - 1] if k == 0 else qq
            qav = (qp_p + qq + 1) >> 1
            ia = _clip3(0, 51, qav + off_a)
            alpha = _DB_ALPHA[ia]
            if alpha == 0:
                continue
            beta = _DB_BETA[_clip3(0, 51, qav + off_b)]
            qbx = mbx * 4 + k
            for s in range(4):
                qby = mby * 4 + s
                bs = seg_bs(qbx - 1, qby, qbx, qby, k == 0)
                if bs == 0:
                    continue
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                base = (y0 + 4 * s) * W + x0 + 4 * k
                for r in range(4):
                    _db_filter_luma_line(ybuf, base + r * W, 1, bs,
                                         alpha, beta, tc0)
        # ---- luma horizontal edges
        for k in range(4):
            if k == 0 and mby == 0:
                continue
            if t8 and k in (1, 3):
                continue
            qp_p = mb_qp[mby - 1][mbx] if k == 0 else qq
            qav = (qp_p + qq + 1) >> 1
            ia = _clip3(0, 51, qav + off_a)
            alpha = _DB_ALPHA[ia]
            if alpha == 0:
                continue
            beta = _DB_BETA[_clip3(0, 51, qav + off_b)]
            qby = mby * 4 + k
            for s in range(4):
                qbx = mbx * 4 + s
                bs = seg_bs(qbx, qby - 1, qbx, qby, k == 0)
                if bs == 0:
                    continue
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                base = (y0 + 4 * k) * W + x0 + 4 * s
                for c in range(4):
                    _db_filter_luma_line(ybuf, base + c, W, bs,
                                         alpha, beta, tc0)
        # ---- chroma edges (luma blocks 0 / 2 per MB axis; each chroma
        # line r maps to the luma segment at 2r)
        for k in range(2):
            if k == 0 and mbx == 0:
                continue
            qc_p = (_chroma_qp(mb_qp[mby][mbx - 1], chroma_qp_offset)
                    if k == 0 else qc_q)
            qav = (qc_p + qc_q + 1) >> 1
            ia = _clip3(0, 51, qav + off_a)
            alpha = _DB_ALPHA[ia]
            if alpha == 0:
                continue
            beta = _DB_BETA[_clip3(0, 51, qav + off_b)]
            qbx = mbx * 4 + 2 * k
            base = cy0 * CW + cx0 + 4 * k
            for r in range(8):
                qby = mby * 4 + (r >> 1)
                bs = seg_bs(qbx - 1, qby, qbx, qby, k == 0)
                if bs == 0:
                    continue
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                for cbuf in (ubuf, vbuf):
                    _db_filter_chroma_line(cbuf, base + r * CW, 1, bs,
                                           alpha, beta, tc0)
        for k in range(2):
            if k == 0 and mby == 0:
                continue
            qc_p = (_chroma_qp(mb_qp[mby - 1][mbx], chroma_qp_offset)
                    if k == 0 else qc_q)
            qav = (qc_p + qc_q + 1) >> 1
            ia = _clip3(0, 51, qav + off_a)
            alpha = _DB_ALPHA[ia]
            if alpha == 0:
                continue
            beta = _DB_BETA[_clip3(0, 51, qav + off_b)]
            qby = mby * 4 + 2 * k
            base = (cy0 + 4 * k) * CW + cx0
            for c in range(8):
                qbx = mbx * 4 + (c >> 1)
                bs = seg_bs(qbx, qby - 1, qbx, qby, k == 0)
                if bs == 0:
                    continue
                tc0 = _DB_TC0[bs - 1][ia] if bs < 4 else 0
                for cbuf in (ubuf, vbuf):
                    _db_filter_chroma_line(cbuf, base + c, CW, bs,
                                           alpha, beta, tc0)


# ---------------------------------------------- shared per-picture state


class _InterPicState:
    """Per-picture decode state shared by the P and B slice decoders
    (llm/h264_bslice.py): plane buffers, nz bookkeeping for CAVLC nC
    and deblocking, the intra-prediction mode grids, and the per-MB
    qp map."""

    def __init__(self, sps: dict, pps: dict) -> None:
        mbw, mbh = sps["w_mbs"], sps["h_mbs"]
        self.mbw, self.mbh = mbw, mbh
        self.W, self.CW = mbw * 16, mbw * 8
        self.H, self.CH = mbh * 16, mbh * 8
        self.pps = pps
        self.ybuf = bytearray(self.W * self.H)
        self.ubuf = bytearray(self.CW * self.CH)
        self.vbuf = bytearray(self.CW * self.CH)
        self.nz_luma = [[0] * (mbw * 4) for _ in range(mbh * 4)]
        self.nz_chroma = [[[0] * (mbw * 2) for _ in range(mbh * 2)]
                          for _ in range(2)]
        self.pred4_modes = [[2] * (mbw * 4) for _ in range(mbh * 4)]
        self.mb_is_i4 = [[False] * mbw for _ in range(mbh)]
        self.mb_intra = [[False] * mbw for _ in range(mbh)]
        self.mb_qp = [[0] * mbw for _ in range(mbh)]
        self.mb_t8 = [[False] * mbw for _ in range(mbh)]  # 8x8 transform

    # ---- CAVLC nC from decoded-neighbor totals (§9.2.1)
    def nc_luma(self, bx: int, by: int) -> int:
        na = self.nz_luma[by][bx - 1] if bx > 0 else None
        nb = self.nz_luma[by - 1][bx] if by > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    def nc_chroma(self, comp: int, cx: int, cy: int) -> int:
        g = self.nz_chroma[comp]
        na = g[cy][cx - 1] if cx > 0 else None
        nb = g[cy - 1][cx] if cy > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    # ---- inter residual adds (prediction already in the planes)
    def add_luma_residual8(self, mbx: int, mby: int, n8: int,
                           scan64: list[int], qp: int) -> None:
        """8x8-transform inter residual (§8.5.13.2 dequant + §8.5.12.3
        IDCT) added onto the motion-compensated prediction."""
        from .h264 import _dequant_8x8, _idct8x8

        h = _idct8x8(_dequant_8x8(scan64, qp))
        x0 = mbx * 16 + (n8 & 1) * 8
        y0 = mby * 16 + (n8 >> 1) * 8
        W, ybuf = self.W, self.ybuf
        for r in range(8):
            base = (y0 + r) * W + x0
            for c in range(8):
                ybuf[base + c] = _clip255(
                    ybuf[base + c] + ((h[8 * r + c] + 32) >> 6))

    def add_luma_residual(self, mbx: int, mby: int, n: int,
                          coeffs: list[int], qp: int) -> None:
        dx, dy = _blk_xy(n)
        d = _dequant_ac(coeffs, qp, 0)
        h = _core_idct4x4(d)
        x0, y0 = mbx * 16, mby * 16
        W, ybuf = self.W, self.ybuf
        for r in range(4):
            base = (y0 + dy + r) * W + x0 + dx
            for c in range(4):
                ybuf[base + c] = _clip255(
                    ybuf[base + c] + ((h[4 * r + c] + 32) >> 6))

    def add_chroma_residual(self, mbx: int, mby: int, qpc: int,
                            chroma_dc, chroma_ac) -> None:
        CW = self.CW
        for comp, cbuf in ((0, self.ubuf), (1, self.vbuf)):
            cx0, cy0 = mbx * 8, mby * 8
            dcs = chroma_dc[comp]
            fdc = (dcs[0] + dcs[1] + dcs[2] + dcs[3],
                   dcs[0] - dcs[1] + dcs[2] - dcs[3],
                   dcs[0] + dcs[1] - dcs[2] - dcs[3],
                   dcs[0] - dcs[1] - dcs[2] + dcs[3])
            for n in range(4):
                dx, dy = (n & 1) * 4, (n >> 1) * 4
                d = _dequant_ac(chroma_ac[comp][n], qpc, 1)
                d[0] = _scale_chroma_dc(fdc[n], qpc)
                h = _core_idct4x4(d)
                for r in range(4):
                    base = (cy0 + dy + r) * CW + cx0 + dx
                    for c in range(4):
                        cbuf[base + c] = _clip255(
                            cbuf[base + c] + ((h[4 * r + c] + 32) >> 6))

    # ---- intra MB inside an inter slice (mirrors h264.py's I-slice
    # MB decode, with inter neighbors feeding nC and prediction
    # samples); the CALLER marks its own motion grid(s) intra.
    def decode_intra_mb(self, rd, mbx: int, mby: int, mb_type: int,
                        qp: int) -> int:
        pps = self.pps
        W, CW = self.W, self.CW
        ybuf, ubuf, vbuf = self.ybuf, self.ubuf, self.vbuf
        nz_luma, nz_chroma = self.nz_luma, self.nz_chroma
        pred4_modes = self.pred4_modes
        mb_is_i4, mb_intra = self.mb_is_i4, self.mb_intra
        x0, y0 = mbx * 16, mby * 16
        mb_intra[mby][mbx] = True
        if mb_type == 25:  # I_PCM
            if rd.is_cabac:
                raise ValueError("h264: I_PCM in CABAC slice not supported")
            br = rd.br
            while br.pos & 7:
                if br.u(1):
                    raise ValueError("h264: pcm_alignment bit not zero")
            for r in range(16):
                for c in range(16):
                    ybuf[(y0 + r) * W + x0 + c] = br.u(8)
            for cbuf in (ubuf, vbuf):
                for r in range(8):
                    for c in range(8):
                        cbuf[(mby * 8 + r) * CW + mbx * 8 + c] = br.u(8)
            for k in range(4):
                for j in range(4):
                    nz_luma[mby * 4 + k][mbx * 4 + j] = 16
            for comp in range(2):
                for k in range(2):
                    for j in range(2):
                        nz_chroma[comp][mby * 2 + k][mbx * 2 + j] = 16
            self.mb_qp[mby][mbx] = qp
            return qp
        is_i4 = mb_type == 0
        mb_is_i4[mby][mbx] = is_i4
        is_i8 = False
        if is_i4 and pps["transform_8x8"]:
            is_i8 = rd.transform_8x8_flag()
            self.mb_t8[mby][mbx] = is_i8
        modes8 = None
        if is_i8:
            # Intra_8x8 inside a P/B slice (r8) — same derivations as
            # the I-slice tier, over the shared mode-cell grid
            modes4 = None
            modes8 = [0] * 4
            for n8 in range(4):
                dx, dy = (n8 & 1) * 8, (n8 >> 1) * 8
                bx, by = mbx * 4 + (dx >> 2), mby * 4 + (dy >> 2)
                ma = None
                if bx > 0:
                    if ((bx - 1) >> 2) != mbx and not mb_is_i4[mby][mbx - 1]:
                        ma = 2
                    else:
                        ma = pred4_modes[by][bx - 1]
                mbv = None
                if by > 0:
                    if ((by - 1) >> 2) != mby and not mb_is_i4[mby - 1][mbx]:
                        mbv = 2
                    else:
                        mbv = pred4_modes[by - 1][bx]
                pred_mode = 2 if (ma is None or mbv is None) else min(ma, mbv)
                mode = rd.intra4_mode(pred_mode)  # same prev/rem coding
                modes8[n8] = mode
                for cy2 in range(by, by + 2):
                    for cx2 in range(bx, bx + 2):
                        pred4_modes[cy2][cx2] = mode
            chroma_mode = rd.chroma_pred(mbx, mby)
            cbp_luma, cbp_chroma = rd.cbp(mbx, mby, intra=True)
            i16_pred = None
        elif is_i4:
            modes4 = [0] * 16
            for n in range(16):
                dx, dy = _blk_xy(n)
                bx, by = mbx * 4 + (dx >> 2), mby * 4 + (dy >> 2)
                ma = None
                if bx > 0:
                    in_left_mb = ((bx - 1) >> 2) != mbx
                    if in_left_mb and not mb_is_i4[mby][mbx - 1]:
                        ma = 2
                    else:
                        ma = pred4_modes[by][bx - 1]
                mbv = None
                if by > 0:
                    in_above_mb = ((by - 1) >> 2) != mby
                    if in_above_mb and not mb_is_i4[mby - 1][mbx]:
                        mbv = 2
                    else:
                        mbv = pred4_modes[by - 1][bx]
                pred_mode = 2 if (ma is None or mbv is None) else min(ma, mbv)
                mode = rd.intra4_mode(pred_mode)
                modes4[n] = mode
                pred4_modes[by][bx] = mode
            chroma_mode = rd.chroma_pred(mbx, mby)
            cbp_luma, cbp_chroma = rd.cbp(mbx, mby, intra=True)
            i16_pred = None
        else:
            t = mb_type - 1
            i16_pred = t % 4
            cbp_chroma = (t >> 2) % 3
            cbp_luma = 15 if t >= 12 else 0
            chroma_mode = rd.chroma_pred(mbx, mby)
            rd.note_cbp(mbx, mby, cbp_luma, cbp_chroma)
            modes4 = None
        if chroma_mode > 3:
            raise ValueError("h264: bad chroma pred mode")
        if cbp_luma or cbp_chroma or not is_i4:
            qp = (qp + rd.qp_delta() + 52) % 52
        else:
            rd.note_no_qp_delta()
        self.mb_qp[mby][mbx] = qp
        qpc = _chroma_qp(qp, pps["chroma_qp_offset"])

        luma_dc = [0] * 16
        luma_blocks = [[0] * 16 for _ in range(16)]
        blocks8 = None
        if is_i8:
            blocks8 = [None] * 4
            for n8 in range(4):
                if cbp_luma & (1 << n8):
                    blocks8[n8] = rd.luma8(mbx, mby, n8)
                else:
                    for k in range(4):
                        dx, dy = _blk_xy(4 * n8 + k)
                        rd.luma_absent(mbx * 4 + (dx >> 2),
                                       mby * 4 + (dy >> 2))
        else:
            if not is_i4:
                luma_dc = rd.luma_dc16(mbx, mby)
            for n in range(16):
                dx, dy = _blk_xy(n)
                bx, by = mbx * 4 + (dx >> 2), mby * 4 + (dy >> 2)
                if cbp_luma & (1 << (n >> 2)):
                    luma_blocks[n] = rd.luma4(bx, by, i16=not is_i4,
                                              intra=True)
                else:
                    rd.luma_absent(bx, by)
        chroma_dc = [[0] * 4, [0] * 4]
        if cbp_chroma:
            for comp in range(2):
                chroma_dc[comp] = rd.chroma_dc(comp, mbx, mby, intra=True)
        else:
            for comp in range(2):
                rd.chroma_dc_absent(comp, mbx, mby)
        chroma_ac = [[[0] * 16 for _ in range(4)] for _ in range(2)]
        for comp in range(2):
            for n in range(4):
                cx, cy = mbx * 2 + (n & 1), mby * 2 + (n >> 1)
                if cbp_chroma & 2:
                    chroma_ac[comp][n] = rd.chroma_ac(comp, cx, cy,
                                                      intra=True)
                else:
                    rd.chroma_ac_absent(comp, cx, cy)
        from .h264 import _recon_mb

        _recon_mb(
            ybuf, ubuf, vbuf, W, CW, mbx, mby, self.mbw, self.mbh,
            is_i4, modes4, i16_pred, chroma_mode, qp, qpc,
            luma_dc, luma_blocks, chroma_dc, chroma_ac,
            i8=(modes8, blocks8) if is_i8 else None,
        )
        return qp


# ------------------------------------------------------ P-slice decode

# (block-x offset, block-y offset, width, height, mvp kind) per mb_type
_PART_LAYOUT = {
    0: ((0, 0, 4, 4, ""),),
    1: ((0, 0, 4, 2, "t"), (0, 2, 4, 2, "b")),
    2: ((0, 0, 2, 4, "l"), (2, 0, 2, 4, "r")),
}
_SUB_LAYOUT = {
    0: ((0, 0, 2, 2),),
    1: ((0, 0, 2, 1), (0, 1, 2, 1)),
    2: ((0, 0, 1, 2), (1, 0, 1, 2)),
    3: ((0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)),
}


def _parse_pred_weight_table(br, n_entries: int):
    """§7.3.3.2 pred_weight_table: (luma_log2_denom,
    chroma_log2_denom, [per entry: ((luma_w, luma_o), [(cb_w, cb_o),
    (cr_w, cr_o)])]).  One entry per active reference — a P slice
    passes num_ref_idx_l0_active, a B slice 1 + 1 (its per-list
    single references).  Absent per-entry flags yield the spec
    defaults (w = 1 << denom, o = 0), which _apply_weight treats as
    the identity."""
    ld = br.ue()  # luma_log2_weight_denom
    cd = br.ue()  # chroma_log2_weight_denom
    if ld > 7 or cd > 7:
        raise ValueError("h264: weight denominator out of range")
    out = []
    for _ in range(n_entries):
        wy = (1 << ld, 0)
        wc = [(1 << cd, 0), (1 << cd, 0)]
        if br.u(1):  # luma_weight_lX_flag
            w, o = br.se(), br.se()
            if not (-128 <= w <= 127 and -128 <= o <= 127):
                raise ValueError("h264: luma weight out of range")
            wy = (w, o)
        if br.u(1):  # chroma_weight_lX_flag
            wc = []
            for _j in range(2):
                w, o = br.se(), br.se()
                if not (-128 <= w <= 127 and -128 <= o <= 127):
                    raise ValueError("h264: chroma weight out of range")
                wc.append((w, o))
        out.append((wy, wc))
    return ld, cd, out


def _apply_weight(vals: list[int], w: int, o: int, logwd: int) -> list[int]:
    """§8.4.2.3.2 explicit uni-directional sample weighting (Clip1 at
    8 bpp); the default (w, o) is an exact identity and is skipped."""
    if (w, o) == (1 << logwd, 0):
        return vals
    if logwd:
        r = 1 << (logwd - 1)
        return [_clip255(((v * w + r) >> logwd) + o) for v in vals]
    return [_clip255(v * w + o) for v in vals]


def _te(br, max_val: int) -> int:
    """§9.1.1 te(v): one inverted bit when the range is [0, 1], plain
    ue(v) otherwise."""
    if max_val == 1:
        return 1 - br.u(1)
    return br.ue()


class _CavlcInterReader:
    """CAVLC entropy reader for P/B slices.  The slice decoders are
    written against this method surface; llm/h264_cabac_pb's
    _CabacInterReader implements the same surface, so ONE slice
    control flow serves both entropy modes (and the cross-entropy
    equivalence tests pin that the two tiers reconstruct identical
    planes from identical descriptors)."""

    is_cabac = False

    def __init__(self, br, st) -> None:
        self.br = br
        self.st = st
        self._run = None  # pending mb_skip_run countdown

    # ---- skip / slice structure
    def skip_next(self, mbx: int, mby: int, remaining: int) -> bool:
        if self._run is None:
            run = self.br.ue()
            if run > remaining:
                raise ValueError("h264: mb_skip_run past end of picture")
            self._run = run
        if self._run > 0:
            self._run -= 1
            return True
        self._run = None
        return False

    def end_mb(self, mbx: int, mby: int, last: bool) -> None:
        pass

    # ---- mb_type
    def mb_type_p(self, mbx: int, mby: int) -> int:
        return self.br.ue()

    def mb_type_b(self, mbx: int, mby: int) -> int:
        return self.br.ue()

    def sub_mb_type_p(self) -> int:
        return self.br.ue()

    def sub_mb_type_b(self) -> int:
        return self.br.ue()

    # ---- motion syntax
    def ref_idx(self, lst: int, bx: int, by: int, wb: int, hb: int,
                na: int) -> int:
        return _te(self.br, na - 1)

    def mvd(self, lst: int, bx: int, by: int, wb: int, hb: int):
        return self.br.se(), self.br.se()

    # ---- cbp / qp
    def cbp(self, mbx: int, mby: int, intra: bool):
        code = self.br.ue()
        if code > 47:
            raise ValueError("h264: coded_block_pattern out of range")
        cbp = (_CBP_INTRA if intra else _CBP_INTER)[code]
        return cbp & 15, cbp >> 4

    def note_cbp(self, mbx: int, mby: int, cl: int, cc: int) -> None:
        pass

    def qp_delta(self) -> int:
        return self.br.se()

    def note_no_qp_delta(self) -> None:
        pass

    # ---- intra prediction syntax
    def transform_8x8_flag(self) -> bool:
        return self.br.u(1) == 1

    def intra4_mode(self, pred: int) -> int:
        if self.br.u(1):
            return pred
        rem = self.br.u(3)
        return rem if rem < pred else rem + 1

    def chroma_pred(self, mbx: int, mby: int) -> int:
        return self.br.ue()

    # ---- residual blocks (nC from the shared nz bookkeeping)
    def luma_dc16(self, mbx: int, mby: int):
        coeffs, _ = _decode_cavlc_block(
            self.br, self.st.nc_luma(mbx * 4, mby * 4), 16)
        return coeffs

    def luma4(self, bx: int, by: int, i16: bool, intra: bool):
        nc = self.st.nc_luma(bx, by)
        if i16:
            tail, tot = _decode_cavlc_block(self.br, nc, 15)
            coeffs = [0] + tail
        else:
            coeffs, tot = _decode_cavlc_block(self.br, nc, 16)
        self.st.nz_luma[by][bx] = tot
        return coeffs

    def luma_absent(self, bx: int, by: int) -> None:
        self.st.nz_luma[by][bx] = 0

    def luma8(self, mbx: int, mby: int, n8: int):
        """One coded 8x8 block: four interleaved 4x4 CAVLC blocks
        (§8.5.6) → 64 coefficients in 8x8 scan order; nz bookkeeping
        per 4x4 sub-position (§9.2.1)."""
        scan64 = [0] * 64
        for k in range(4):
            dx, dy = _blk_xy(4 * n8 + k)
            bx, by = mbx * 4 + (dx >> 2), mby * 4 + (dy >> 2)
            coeffs, tot = _decode_cavlc_block(
                self.br, self.st.nc_luma(bx, by), 16)
            self.st.nz_luma[by][bx] = tot
            for i in range(16):
                scan64[4 * i + k] = coeffs[i]
        return scan64

    def chroma_dc(self, comp: int, mbx: int, mby: int, intra: bool):
        coeffs, _ = _decode_cavlc_block(self.br, -1, 4)
        return coeffs

    def chroma_dc_absent(self, comp: int, mbx: int, mby: int) -> None:
        pass

    def chroma_ac(self, comp: int, cx: int, cy: int, intra: bool):
        tail, tot = _decode_cavlc_block(
            self.br, self.st.nc_chroma(comp, cx, cy), 15)
        self.st.nz_chroma[comp][cy][cx] = tot
        return [0] + tail

    def chroma_ac_absent(self, comp: int, cx: int, cy: int) -> None:
        self.st.nz_chroma[comp][cy][cx] = 0


def _decode_pslice(rbsp: bytes, ntype: int, nal_ref_idc: int,
                   sps: dict, pps: dict, ref) -> tuple:
    """Decode one P slice covering the whole picture.  `ref` is
    either one uncropped (y, u, v) planes tuple (the single-reference
    legacy form) or the full RefPicList0 as a list of planes tuples,
    most recent reference first — multi-reference P slices (r7c)
    read a te(v) ref_idx_l0 per partition when
    num_ref_idx_l0_active > 1.  Returns the deblocked, uncropped
    (ybuf, ubuf, vbuf, motion_grid) — the grid doubles as the
    colocated motion field when this picture anchors a B slice
    (llm/h264_bslice.py); cells referencing a non-zero index carry it
    as a third element.  weighted_pred_flag == 1 parses the
    pred_weight_table and applies §8.4.2.3.2 explicit weighting to
    every inter prediction (per-refIdx weight entries).  CABAC
    slices (entropy_coding_mode_flag == 1, cabac_init_idc == 0)
    decode through the same control flow with the
    llm/h264_cabac_pb reader."""
    refs = [ref] if isinstance(ref, tuple) else list(ref)
    if not refs:
        raise ValueError("h264: P slice without a reference picture")
    br = _BitReader(rbsp)
    if br.ue() != 0:
        raise ValueError("h264: slice must start at mb 0")
    if br.ue() % 5 != 0:
        raise ValueError("h264: not a P slice")
    br.ue()  # pic_parameter_set_id
    br.u(sps["log2_max_frame_num"])  # frame_num
    if ntype == 5:
        raise ValueError("h264: IDR picture with a P slice")
    if sps["poc_type"] == 0:
        br.u(sps["poc_lsb_bits"])
    if pps["redundant"]:
        if br.ue() != 0:
            raise ValueError("h264: redundant slices not supported")
    if br.u(1):  # num_ref_idx_active_override_flag
        na = br.ue() + 1
    else:
        na = pps["num_ref_l0"]
    if na > len(refs) or na > 16:
        raise ValueError("h264: more active references than decoded")
    if br.u(1):  # ref_pic_list_modification_flag_l0
        raise ValueError("h264: reference list modification not supported")
    wp = None
    if pps["weighted_pred"]:
        # one weight entry per active reference (§7.3.3.2)
        ld, cd, entries = _parse_pred_weight_table(br, na)
        wp = (ld, cd, entries)
    if nal_ref_idc != 0:
        if br.u(1):  # adaptive_ref_pic_marking_mode_flag
            raise ValueError("h264: adaptive ref marking not supported")
    if pps["cabac"]:
        if br.ue() != 0:  # cabac_init_idc
            raise ValueError(
                "h264: cabac_init_idc 1/2 not supported (init columns "
                "unpinned in-container; see h264_cabac_pb)")
    qp = pps["pic_init_qp"] + br.se()
    deblock_idc = 0
    db_off_a = db_off_b = 0
    if pps["deblock_control"]:
        deblock_idc = br.ue()
        if deblock_idc > 2:
            raise ValueError("h264: bad disable_deblocking_filter_idc")
        if deblock_idc != 1:
            db_off_a = 2 * br.se()
            db_off_b = 2 * br.se()

    st = _InterPicState(sps, pps)
    mbw, mbh = st.mbw, st.mbh
    W, H, CW, CH = st.W, st.H, st.CW, st.CH
    ybuf, ubuf, vbuf = st.ybuf, st.ubuf, st.vbuf
    for planes in refs[:na]:
        if len(planes[0]) != W * H:
            raise ValueError("h264: reference/current picture size mismatch")
    grid = _MvGrid(mbw, mbh)

    def mc_partition(mbx: int, mby: int, pbx: int, pby: int,
                     wb: int, hb: int, mv: tuple[int, int],
                     ridx: int = 0) -> None:
        """Motion-compensate one partition into the current planes
        from RefPicList0[ridx] (explicit weighting applied when the
        slice carries weights — per-reference entries)."""
        ref_y, ref_u, ref_v = refs[ridx]
        px, py = mbx * 16 + pbx * 4, mby * 16 + pby * 4
        bw, bh = wb * 4, hb * 4
        dst = [0] * (bw * bh)
        _mc_luma(ref_y, W, H, dst, px, py, bw, bh, mv[0], mv[1])
        if wp is not None:
            dst = _apply_weight(dst, *wp[2][ridx][0], wp[0])
        for r in range(bh):
            ybuf[(py + r) * W + px: (py + r) * W + px + bw] = bytes(
                dst[r * bw: (r + 1) * bw])
        cpx, cpy = px >> 1, py >> 1
        cbw, cbh = bw >> 1, bh >> 1
        cdst = [0] * (cbw * cbh)
        for comp, (rbuf, obuf) in enumerate(((ref_u, ubuf), (ref_v, vbuf))):
            _mc_chroma(rbuf, CW, CH, cdst, cpx, cpy, cbw, cbh, mv[0], mv[1])
            out = cdst
            if wp is not None:
                out = _apply_weight(cdst, *wp[2][ridx][1][comp], wp[1])
            for r in range(cbh):
                obuf[(cpy + r) * CW + cpx: (cpy + r) * CW + cpx + cbw] = \
                    bytes(out[r * cbw: (r + 1) * cbw])

    def decode_skip_mb(mbx: int, mby: int) -> None:
        bx, by = mbx * 4, mby * 4
        mv = _skip_mv(grid, bx, by)
        grid.fill(bx, by, 4, 4, mv)
        mc_partition(mbx, mby, 0, 0, 4, 4, mv)
        st.mb_qp[mby][mbx] = qp

    if pps["cabac"]:
        if pps["transform_8x8"]:
            raise ValueError(
                "h264: CABAC 8x8 transform not supported (ctx 399+ "
                "init columns unpinned in-container)")
        from .h264_cabac_pb import _CabacInterReader

        rd = _CabacInterReader(br, st, qp, is_b=False)
    else:
        rd = _CavlcInterReader(br, st)

    nz_luma, nz_chroma = st.nz_luma, st.nz_chroma
    total = mbw * mbh
    for mb in range(total):
        mby, mbx = divmod(mb, mbw)
        last = mb == total - 1
        if rd.skip_next(mbx, mby, total - mb):
            decode_skip_mb(mbx, mby)
            rd.end_mb(mbx, mby, last)
            continue
        mb_type = rd.mb_type_p(mbx, mby)
        if mb_type >= 5:
            if mb_type > 30:
                raise ValueError("h264: bad P-slice mb_type")
            grid.fill(mbx * 4, mby * 4, 4, 4, "I")
            qp = st.decode_intra_mb(rd, mbx, mby, mb_type - 5, qp)
            rd.end_mb(mbx, mby, last)
            continue

        # ---- inter MB: §7.3.5.1 order — all ref_idx_l0 (te(v), only
        # coded when more than one reference is active), then all
        # mvd_l0; reconstruction walks partitions in order so MVP
        # chains see finished neighbors
        bx0, by0 = mbx * 4, mby * 4
        subs_all8 = True  # 16x16/16x8/8x16: no sub-partitions < 8x8
        if mb_type in (0, 1, 2):
            parts = _PART_LAYOUT[mb_type]
            ridxs = [rd.ref_idx(0, bx0 + p[0], by0 + p[1], p[2], p[3],
                                na) if na > 1 else 0
                     for p in parts]
            if any(r >= na for r in ridxs):
                raise ValueError("h264: ref_idx out of range")
            mvds = [rd.mvd(0, bx0 + p[0], by0 + p[1], p[2], p[3])
                    for p in parts]
            for (pbx, pby, wb, hb, kind), ridx, d in zip(parts, ridxs,
                                                         mvds):
                mvp = _mvp(grid, bx0 + pbx, by0 + pby, wb, hb, kind,
                           target_ref=ridx)
                mv = (mvp[0] + d[0], mvp[1] + d[1])
                grid.fill(bx0 + pbx, by0 + pby, wb, hb,
                          mv if ridx == 0 else (mv[0], mv[1], ridx))
                mc_partition(mbx, mby, pbx, pby, wb, hb, mv, ridx)
        else:  # P_8x8 (ref_idx coded) / P_8x8ref0 (all refIdx 0)
            sub_types = [rd.sub_mb_type_p() for _ in range(4)]
            if any(s > 3 for s in sub_types):
                raise ValueError("h264: bad sub_mb_type")
            subs_all8 = all(s == 0 for s in sub_types)
            if mb_type == 3 and na > 1:
                ridx8 = [rd.ref_idx(0, bx0 + (i8 & 1) * 2,
                                    by0 + (i8 >> 1) * 2, 2, 2, na)
                         for i8 in range(4)]
                if any(r >= na for r in ridx8):
                    raise ValueError("h264: ref_idx out of range")
            else:
                ridx8 = [0, 0, 0, 0]
            mvds8 = []
            for i8 in range(4):
                obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                sub = []
                for spx, spy, wb, hb in _SUB_LAYOUT[sub_types[i8]]:
                    pbx, pby = obx + spx * wb, oby + spy * hb
                    sub.append(rd.mvd(0, bx0 + pbx, by0 + pby, wb, hb))
                mvds8.append(sub)
            for i8 in range(4):
                obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                ridx = ridx8[i8]
                for (spx, spy, wb, hb), d in zip(
                        _SUB_LAYOUT[sub_types[i8]], mvds8[i8]):
                    pbx, pby = obx + spx * wb, oby + spy * hb
                    mvp = _mvp(grid, bx0 + pbx, by0 + pby, wb, hb,
                               target_ref=ridx)
                    mv = (mvp[0] + d[0], mvp[1] + d[1])
                    grid.fill(bx0 + pbx, by0 + pby, wb, hb,
                              mv if ridx == 0 else (mv[0], mv[1], ridx))
                    mc_partition(mbx, mby, pbx, pby, wb, hb, mv, ridx)

        cbp_luma, cbp_chroma = rd.cbp(mbx, mby, intra=False)
        t8 = False
        if cbp_luma and pps["transform_8x8"] and subs_all8:
            # §7.3.5: transform_size_8x8_flag for inter MBs, present
            # when luma residual exists and no sub-partition is < 8x8
            t8 = rd.transform_8x8_flag()
            st.mb_t8[mby][mbx] = t8
        if cbp_luma or cbp_chroma:
            qp = (qp + rd.qp_delta() + 52) % 52
        else:
            rd.note_no_qp_delta()
        st.mb_qp[mby][mbx] = qp
        qpc = _chroma_qp(qp, pps["chroma_qp_offset"])

        if t8:
            for n8 in range(4):
                if cbp_luma & (1 << n8):
                    scan64 = rd.luma8(mbx, mby, n8)
                    if any(scan64):
                        st.add_luma_residual8(mbx, mby, n8, scan64, qp)
                else:
                    for k in range(4):
                        dx, dy = _blk_xy(4 * n8 + k)
                        rd.luma_absent(bx0 + (dx >> 2), by0 + (dy >> 2))
        else:
            for n in range(16):
                dx, dy = _blk_xy(n)
                bx, by = bx0 + (dx >> 2), by0 + (dy >> 2)
                if cbp_luma & (1 << (n >> 2)):
                    coeffs = rd.luma4(bx, by, i16=False, intra=False)
                    if nz_luma[by][bx]:
                        st.add_luma_residual(mbx, mby, n, coeffs, qp)
                else:
                    rd.luma_absent(bx, by)
        chroma_dc = [[0] * 4, [0] * 4]
        if cbp_chroma:
            for comp in range(2):
                chroma_dc[comp] = rd.chroma_dc(comp, mbx, mby,
                                               intra=False)
        else:
            for comp in range(2):
                rd.chroma_dc_absent(comp, mbx, mby)
        chroma_ac = [[[0] * 16 for _ in range(4)] for _ in range(2)]
        for comp in range(2):
            for n in range(4):
                cx, cy = mbx * 2 + (n & 1), mby * 2 + (n >> 1)
                if cbp_chroma & 2:
                    chroma_ac[comp][n] = rd.chroma_ac(comp, cx, cy,
                                                      intra=False)
                else:
                    rd.chroma_ac_absent(comp, cx, cy)
        if cbp_chroma:
            st.add_chroma_residual(mbx, mby, qpc, chroma_dc, chroma_ac)
        rd.end_mb(mbx, mby, last)

    if deblock_idc != 1:
        _deblock_frame_general(
            ybuf, ubuf, vbuf, mbw, mbh, st.mb_qp, st.mb_intra, nz_luma,
            grid, pps["chroma_qp_offset"], db_off_a, db_off_b,
            mb_t8=st.mb_t8,
        )
    return ybuf, ubuf, vbuf, grid


def decode_h264_gop(data: bytes, *, max_frames: int = 1024):
    """Decode an Annex-B H.264 elementary stream of IDR/I + P access
    units → (width, height, [(y, u, v) planes per frame], cropped).
    Each P picture references the previous decoded picture (the
    single-reference envelope)."""
    sps = pps = None
    sps_nal = pps_nal = None
    frames: list[tuple[bytes, bytes, bytes]] = []
    ref = None
    out_w = out_h = None
    for nal in _split_nals(data):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        nri = (nal[0] >> 5) & 3
        rbsp = _strip_emulation(nal[1:])
        if ntype == 7:
            sps = _parse_sps(rbsp)
            sps_nal = nal
        elif ntype == 8:
            pps = _parse_pps(rbsp)
            pps_nal = nal
        elif ntype in (1, 5):
            if sps is None or pps is None:
                raise ValueError("h264: slice before SPS/PPS")
            if len(frames) >= max_frames:
                raise ValueError("h264: too many frames in GOP")
            peek = _BitReader(rbsp)
            if peek.ue() != 0:
                raise ValueError("h264: slice must start at mb 0")
            st = peek.ue() % 5
            if st == 2:  # I / IDR — decode through the intra tier
                sample = (b"\x00\x00\x00\x01" + sps_nal
                          + b"\x00\x00\x00\x01" + pps_nal
                          + b"\x00\x00\x00\x01" + nal)
                _, ybuf, ubuf, vbuf = _decode_iframe_uncropped(sample)
            elif st == 0:  # P
                if ref is None:
                    raise ValueError("h264: P slice before any reference")
                ybuf, ubuf, vbuf, _grid = _decode_pslice(
                    rbsp, ntype, nri, sps, pps, ref)
            else:
                raise ValueError("h264: only I and P slices supported")
            ref = (bytes(ybuf), bytes(ubuf), bytes(vbuf))
            w, h, y, u, v = _crop_planes(sps, ybuf, ubuf, vbuf)
            if out_w is None:
                out_w, out_h = w, h
            elif (w, h) != (out_w, out_h):
                raise ValueError("h264: frame size changed mid-stream")
            frames.append((y, u, v))
    if not frames:
        raise ValueError("h264: no coded pictures in stream")
    return out_w, out_h, frames


# (single-AU decode with explicit reference threading moved to the
# DPB-stateful H264AuDecoder in llm/h264_bslice.py, which the MP4
# sample walk uses so P AND B pictures resolve their references)


# ------------------------------------------------------ fixture encoder


def _encode_pslice_nal(mbw: int, mbh: int, qp: int, frame_num: int,
                       mode: str, mv: tuple[int, int] = (0, 0),
                       y_coeff: int = 0, c_coeff: int = 0,
                       poc_lsb: int | None = None,
                       weights=None, cabac: bool = False) -> bytes:
    """One whole-picture P slice NAL.  Modes: 'skip' (the whole
    picture skipped), 'mv' (every MB P_L0_16x16 with the same motion
    vector, no residual), 'residual' (mv plus a DC coefficient in
    every luma 4x4 and a chroma DC per component).  Deblocking is
    disabled in the slice header; mvd values come from the same
    grid/_mvp machinery the decoder runs.  `weights` =
    (luma_log2_denom, chroma_log2_denom, (wy, oy), [(wu, ou),
    (wv, ov)]) writes a pred_weight_table — the PPS must then set
    weighted_pred_flag.  `cabac` emits the same macroblocks through
    the llm/h264_cabac_pb writer (cabac_init_idc 0; the PPS must set
    entropy_coding_mode_flag)."""
    sl = _BitWriter()
    sl.ue(0)   # first_mb_in_slice
    sl.ue(5)   # slice_type: P (all slices in picture)
    sl.ue(0)   # pic_parameter_set_id
    sl.u(4, frame_num & 15)
    # pic_order_cnt_lsb: overridable so B-GOP fixtures can place the
    # P anchor ABOVE the B frames in POC (llm/h264_bslice.py)
    sl.u(4, (2 * frame_num if poc_lsb is None else poc_lsb) & 15)
    sl.u(1, 0)  # num_ref_idx_active_override_flag
    sl.u(1, 0)  # ref_pic_list_modification_flag_l0
    if weights is not None:
        ld, cd, (wy, oy), wc = weights
        sl.ue(ld)
        sl.ue(cd)
        sl.u(1, 1)  # luma_weight_l0_flag
        sl.se(wy)
        sl.se(oy)
        sl.u(1, 1)  # chroma_weight_l0_flag
        for w, o in wc:
            sl.se(w)
            sl.se(o)
    sl.u(1, 0)  # adaptive_ref_pic_marking_mode_flag (nal_ref_idc != 0)
    if cabac:
        sl.ue(0)  # cabac_init_idc
    sl.se(0)   # slice_qp_delta
    sl.ue(1)   # disable_deblocking_filter_idc = 1

    total = mbw * mbh
    wr = None
    if cabac:
        from .h264_cabac_pb import _CabacInterWriter

        wr = _CabacInterWriter(sl, mbw, mbh, qp, is_b=False)
    if mode == "skip":
        if cabac:
            for mb in range(total):
                mby, mbx = divmod(mb, mbw)
                wr.skip_mb(mbx, mby)
            wr.finish()
        else:
            sl.ue(total)
            sl.rbsp_trailing()
        return _nal(2, 1, sl.done())

    grid = _MvGrid(mbw, mbh)
    nz = [[0] * (mbw * 4) for _ in range(mbh * 4)]

    def nc_luma(bx: int, by: int) -> int:
        na = nz[by][bx - 1] if bx > 0 else None
        nb = nz[by - 1][bx] if by > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    for mb in range(total):
        mby, mbx = divmod(mb, mbw)
        bx0, by0 = mbx * 4, mby * 4
        mvp = _mvp(grid, bx0, by0, 4, 4, "")
        d = (mv[0] - mvp[0], mv[1] - mvp[1])
        if cabac:
            wr.coded_mb(mbx, mby)
            wr.mb_type_p(mbx, mby, 0)
            wr.mvd(0, bx0, by0, 4, 4, d[0], d[1])
        else:
            sl.ue(0)  # mb_skip_run
            sl.ue(0)  # mb_type P_L0_16x16
            sl.se(d[0])
            sl.se(d[1])
        grid.fill(bx0, by0, 4, 4, mv)
        if mode == "mv":
            if cabac:
                wr.cbp(mbx, mby, False, 0, 0)
                wr.note_no_qp_delta()
                wr.end_mb()
            else:
                sl.ue(_CBP_INTER.index(0))  # cbp 0, no residual
            for j in range(4):
                for i in range(4):
                    nz[mby * 4 + j][mbx * 4 + i] = 0
            continue
        # 'residual': all luma 8x8s coded + chroma DC only (cbp 31)
        if cabac:
            wr.cbp(mbx, mby, False, 15, 1)
            wr.qp_delta(0)
        else:
            sl.ue(_CBP_INTER.index(31))
            sl.se(0)  # mb_qp_delta
        for n in range(16):
            dx, dy = _blk_xy(n)
            bx, by = bx0 + (dx >> 2), by0 + (dy >> 2)
            if cabac:
                wr.luma4(bx, by, [y_coeff] + [0] * 15, i16=False,
                         intra=False)
            else:
                _write_cavlc_block(sl, [y_coeff] + [0] * 15,
                                   nc_luma(bx, by), 16)
            nz[by][bx] = 1 if y_coeff else 0
        for comp in range(2):
            if cabac:
                wr.chroma_dc(comp, mbx, mby, [c_coeff, 0, 0, 0],
                             intra=False)
            else:
                _write_cavlc_block(sl, [c_coeff, 0, 0, 0], -1, 4)
        if cabac:
            for comp in range(2):
                for n in range(4):
                    wr.chroma_ac_absent(comp, mbx * 2 + (n & 1),
                                        mby * 2 + (n >> 1))
            wr.end_mb()
    if cabac:
        wr.finish()
    else:
        sl.rbsp_trailing()
    return _nal(2, 1, sl.done())


def _encode_pslice_multiref_nal(mbw: int, mbh: int, frame_num: int,
                                poc_lsb: int, na: int, ref_of,
                                cabac: bool = False,
                                qp: int = 28) -> bytes:
    """Whole-picture P slice where every MB is P_L0_16x16 with zero
    motion against RefPicList0[ref_of(mb)] — the multi-reference
    fixture: the header overrides num_ref_idx_l0_active to `na` and
    each MB carries a ref_idx (te(v) in CAVLC — one inverted bit
    when na == 2, ue(v) beyond — and the §9.3.3.1.1.6 unary context
    tree in CABAC)."""
    sl = _BitWriter()
    sl.ue(0)   # first_mb_in_slice
    sl.ue(5)   # slice_type: P (all)
    sl.ue(0)   # pic_parameter_set_id
    sl.u(4, frame_num & 15)
    sl.u(4, poc_lsb & 15)
    sl.u(1, 1)  # num_ref_idx_active_override_flag
    sl.ue(na - 1)
    sl.u(1, 0)  # ref_pic_list_modification_flag_l0
    sl.u(1, 0)  # adaptive_ref_pic_marking_mode_flag
    if cabac:
        sl.ue(0)  # cabac_init_idc
    sl.se(0)
    sl.ue(1)   # deblocking off
    wr = None
    if cabac:
        from .h264_cabac_pb import _CabacInterWriter

        wr = _CabacInterWriter(sl, mbw, mbh, qp, is_b=False)
    grid = _MvGrid(mbw, mbh)
    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        ridx = ref_of(mb)
        if not 0 <= ridx < na:
            raise ValueError("h264: fixture ref index out of range")
        bx0, by0 = mbx * 4, mby * 4
        mvp = _mvp(grid, bx0, by0, 4, 4, "", target_ref=ridx)
        if cabac:
            wr.coded_mb(mbx, mby)
            wr.mb_type_p(mbx, mby, 0)
            wr.ref_idx(0, bx0, by0, 4, 4, na, ridx)
            wr.mvd(0, bx0, by0, 4, 4, 0 - mvp[0], 0 - mvp[1])
        else:
            sl.ue(0)  # mb_skip_run
            sl.ue(0)  # P_L0_16x16
            if na == 2:
                sl.u(1, 1 - ridx)  # te(v) with range [0, 1]
            else:
                sl.ue(ridx)
            sl.se(0 - mvp[0])
            sl.se(0 - mvp[1])
        grid.fill(bx0, by0, 4, 4,
                  (0, 0) if ridx == 0 else (0, 0, ridx))
        if cabac:
            wr.cbp(mbx, mby, False, 0, 0)
            wr.note_no_qp_delta()
            wr.end_mb()
        else:
            sl.ue(_CBP_INTER.index(0))
    if cabac:
        wr.finish()
    else:
        sl.rbsp_trailing()
    return _nal(2, 1, sl.done())


def encode_h264_gop_multiref(width: int, height: int, *, qp: int,
                             y_coeff: int, u_coeff: int, v_coeff: int,
                             p_y_coeff: int, p_c_coeff: int,
                             cabac: bool = False) -> list[bytes]:
    """Three-frame multi-reference GOP fixture with closed-form planes
    (h264_gop_multiref_expected): IDR flat, P1 with a uniform DC
    residual (both references), then P2 with num_ref_idx_l0_active=2
    whose MBs alternate ref_idx by raster parity — even MBs read
    RefPicList0[0] (P1), odd MBs RefPicList0[1] (the IDR).  Dims must
    be MB-aligned so the per-MB accounting stays exact."""
    from .h264 import _pps_writer, _sps_writer

    if width % 16 or height % 16 or width <= 0 or height <= 0:
        raise ValueError("h264: multiref fixture dims must be MB-aligned")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mbw, mbh = width // 16, height // 16
    sps = _sps_writer(mbw, mbh, 0, 0, num_ref_frames=2, profile_idc=77)
    pps = _pps_writer(qp, cabac=cabac)
    if cabac:
        from .h264_cabac import encode_h264_iframe_flat_cabac

        idr_body = encode_h264_iframe_flat_cabac(
            width, height, qp=qp,
            y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)
    else:
        from .h264 import encode_h264_iframe_flat

        idr_body = encode_h264_iframe_flat(
            width, height, qp=qp,
            y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)
    idr_slice = next(n for n in _split_nals(idr_body)
                     if (n[0] & 0x1F) == 5)
    idr = (_nal(3, 7, sps.done()) + _nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "residual",
                           y_coeff=p_y_coeff, c_coeff=p_c_coeff,
                           poc_lsb=2, cabac=cabac),
        _encode_pslice_multiref_nal(mbw, mbh, 2, 4, 2,
                                    lambda mb: mb % 2, cabac=cabac,
                                    qp=qp),
    ]


def h264_gop_multiref_expected(qp: int, y_coeff: int, u_coeff: int,
                               v_coeff: int, p_y_coeff: int,
                               p_c_coeff: int):
    """Closed forms for encode_h264_gop_multiref: frames 0-1 are the
    flat + residual arms; frame 2 alternates per MB — even raster MBs
    carry frame 1's values (refIdx 0), odd MBs frame 0's (refIdx 1).
    Returns [('flat', y, u, v), ('flat', y, u, v),
    ('alt', (y1, y0), (u1, u0), (v1, v0))]."""
    from .h264 import (_clip255, _dequant_ac, _scale_chroma_dc,
                       h264_flat_expected)

    yv, uv, vv = h264_flat_expected(qp, y_coeff, u_coeff, v_coeff)
    qpc = _chroma_qp(qp, 0)
    dy = (_dequant_ac([p_y_coeff] + [0] * 15, qp, 0)[0] + 32) >> 6
    dc = (_scale_chroma_dc(p_c_coeff, qpc) + 32) >> 6
    y1, u1, v1 = _clip255(yv + dy), _clip255(uv + dc), _clip255(vv + dc)
    return [
        ("flat", yv, uv, vv),
        ("flat", y1, u1, v1),
        ("alt", (y1, yv), (u1, uv), (v1, vv)),
    ]


def encode_h264_gop_steps(width: int, height: int, *, qp: int,
                          y_coeff: int, u_coeff: int, v_coeff: int,
                          mv: tuple[int, int],
                          p_y_coeff: int, p_c_coeff: int,
                          cabac: bool = False) -> list[bytes]:
    """Four-frame GOP fixture with closed-form planes
    (h264_gop_expected): IDR flat Intra_16x16, P all-skip, P with a
    uniform quarter-pel motion vector over the flat field (every frac
    phase is an identity on a constant plane — the MC paths run for
    real), and P with a uniform DC residual on every block.  Returns
    per-frame Annex-B chunks ready for the avc1 muxer.  `cabac`
    emits the SAME GOP through the CABAC tier — the closed form
    holds unchanged (the entropy layer cannot move a sample)."""
    mbw, mbh = (width + 15) // 16, (height + 15) // 16
    if cabac:
        from .h264_cabac import encode_h264_iframe_flat_cabac

        idr = encode_h264_iframe_flat_cabac(
            width, height, qp=qp,
            y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)
    else:
        from .h264 import encode_h264_iframe_flat

        idr = encode_h264_iframe_flat(
            width, height, qp=qp,
            y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)
    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "skip", cabac=cabac),
        _encode_pslice_nal(mbw, mbh, qp, 2, "mv", mv=mv, cabac=cabac),
        _encode_pslice_nal(mbw, mbh, qp, 3, "residual",
                           y_coeff=p_y_coeff, c_coeff=p_c_coeff,
                           cabac=cabac),
    ]


def h264_gop_expected(qp: int, y_coeff: int, u_coeff: int, v_coeff: int,
                      p_y_coeff: int, p_c_coeff: int):
    """Closed-form per-frame uniform plane values for
    encode_h264_gop_steps — the same quantizer arithmetic the flat
    I-frame closed form uses (h264_flat_expected), extended by the
    inter-residual add: frames 0..2 keep the IDR values (P_Skip and
    constant-field MC are identities), frame 3 adds the dequantized
    DC of every block: luma d = AC-dequant(coeff, qp)[0], pixel +=
    (d + 32) >> 6; chroma through the 2x2 DC transform and
    _scale_chroma_dc."""
    from .h264 import h264_flat_expected

    yv, uv, vv = h264_flat_expected(qp, y_coeff, u_coeff, v_coeff)
    qpc = _chroma_qp(qp, 0)
    dy = (_dequant_ac([p_y_coeff] + [0] * 15, qp, 0)[0] + 32) >> 6
    # chroma: per-MB DC vector (c,0,0,0) -> 2x2 hadamard -> all four
    # blocks get f = c -> scale -> uniform add
    dc = (_scale_chroma_dc(p_c_coeff, qpc) + 32) >> 6
    f3 = (_clip255(yv + dy), _clip255(uv + dc), _clip255(vv + dc))
    return [(yv, uv, vv), (yv, uv, vv), (yv, uv, vv), f3]
