"""H.264/AVC B-slice tier — ITU-T H.264 §8.4 bi-predictive inter
decode, pure Python, layered on llm/h264_inter.py's P machinery.
Turns the IDR+P GOP decoder into an IBP decoder: `decode_h264_gop_ipb`
walks I/P/B access units with a POC-ordered DPB, and `H264AuDecoder`
threads the same state across MP4 samples.

Supported envelope (reject-never-approximate, the module family's
contract): CAVLC B slices, 4:2:0, frame_mbs_only, one slice per
picture, num_ref_idx_l0_active == num_ref_idx_l1_active == 1 (the
nearest reference below / above the current POC), BOTH direct modes
(spatial §8.4.1.2.2 with the colocated colZeroFlag, and r7c temporal
§8.4.1.2.3 with POC-distance motion scaling — against a
single-reference colocated picture) under
direct_8x8_inference_flag == 1, no reference-list modification,
NON-REFERENCE B pictures (nal_ref_idc == 0 — the classic IBP/IBBP
pattern; B-pyramid streams are rejected, never approximated).
ALL THREE weighted_bipred_idc modes decode (r7c): 0 = the default
(a + b + 1) >> 1 average, 1 = explicit per-list pred_weight_table
weighting (§8.4.2.3.2), 2 = implicit POC-distance weights
(§8.4.2.3.1; uni-directional predictions stay unweighted per spec).
All B macroblock types decode: B_Skip / B_Direct_16x16 (§8.4.1.2.2
spatial derivation including the colocated-motion colZeroFlag from
the list-1 anchor's motion field), every Table 7-14 explicit
partition mode (L0/L1/Bi × 16x16/16x8/8x16), B_8x8 with every
Table 7-18 sub-type including B_Direct_8x8, and intra MBs inside B
slices.  Bi-prediction is the default integer average
(predL0 + predL1 + 1) >> 1 on quarter-pel luma / eighth-pel chroma
interpolations; POC follows §8.2.1 type 0 with msb wrap.  Deblocking
uses the full §8.7.2.1 B derivation (reference-set comparison, per
aligned list mv deltas).

Wire-convention provenance: the B mb_type mapping (Table 7-14) and
B sub_mb_type mapping (Table 7-18) are spec-table transcriptions,
like h264_inter's _CBP_INTER.  NO in-container AVC reference exists
to arbitrate them (libde265/libx265 are HEVC; re-verified this
round), so the tests pin the SEMANTICS of individual entries by
construction: a B_L0_L1_16x8 frame over anchors with different
values must place anchor-0 samples in the top half and anchor-1
samples in the bottom, etc. — a transcription error flips which
anchor a half reads from and the hand goldens catch it.  The graded
fixtures are additionally entropy-independent (encoder and decoder
share the tables; every pixel is checked against closed forms that
the P tier reproduces for uni-directional cases).

Reference-repo analog: opaque media blobs only
(/root/reference/src/common/lake.py:59-71); this tier derives from
the public H.264 spec alone.
"""

from __future__ import annotations

from .h264 import (
    _BitReader,
    _BitWriter,
    _blk_xy,
    _chroma_qp,
    _crop_planes,
    _decode_cavlc_block,
    _decode_iframe_uncropped,
    _nal,
    _parse_pps,
    _parse_sps,
    _pps_writer,
    _split_nals,
    _sps_writer,
    _strip_emulation,
    _write_cavlc_block,
)
from .h264 import _clip255, _clip3
from .h264_inter import (
    _CBP_INTER,
    _CavlcInterReader,
    _InterPicState,
    _MvGrid,
    _apply_weight,
    _deblock_edges,
    _decode_pslice,
    _mc_chroma,
    _mc_luma,
    _mvp,
    _parse_pred_weight_table,
)

__all__ = [
    "H264AuDecoder",
    "decode_h264_gop_ipb",
    "encode_h264_gop_b",
    "h264_gop_b_expected",
]

# --------------------------------------------------------------------------
# Table 7-14 (B slices): mb_type -> partition layout + per-partition
# prediction modes.  0 = B_Direct_16x16, 22 = B_8x8, >= 23 intra.
# Modes: 0 = Pred_L0, 1 = Pred_L1, 2 = BiPred.

_B_16x16 = {1: 0, 2: 1, 3: 2}  # B_L0/L1/Bi_16x16
# two-partition types 4..21: (part0 mode, part1 mode) pairs in table
# order, each pair appearing as 16x8 then 8x16
_B_PAIR_MODES = (
    (0, 0), (1, 1), (0, 1), (1, 0), (0, 2), (1, 2), (2, 0), (2, 1), (2, 2),
)

# Table 7-18 (B slices): sub_mb_type -> (mode | None for direct,
# sub-partition layout key into h264_inter._SUB_LAYOUT semantics)
_B_SUB = (
    (None, 0),  # 0  B_Direct_8x8
    (0, 0),     # 1  B_L0_8x8
    (1, 0),     # 2  B_L1_8x8
    (2, 0),     # 3  B_Bi_8x8
    (0, 1),     # 4  B_L0_8x4
    (0, 2),     # 5  B_L0_4x8
    (1, 1),     # 6  B_L1_8x4
    (1, 2),     # 7  B_L1_4x8
    (2, 1),     # 8  B_Bi_8x4
    (2, 2),     # 9  B_Bi_4x8
    (0, 3),     # 10 B_L0_4x4
    (1, 3),     # 11 B_L1_4x4
    (2, 3),     # 12 B_Bi_4x4
)

# sub-partition shapes within one 8x8, in 4x4-cell units (h264_inter's
# _SUB_LAYOUT, re-declared to keep this module's table adjacency clear)
_SUB_SHAPES = {
    0: ((0, 0, 2, 2),),
    1: ((0, 0, 2, 1), (0, 1, 2, 1)),
    2: ((0, 0, 1, 2), (1, 0, 1, 2)),
    3: ((0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)),
}

# 16x8 / 8x16 partition geometry with their §8.4.1.3 directional kinds
_B_PART_16x8 = ((0, 0, 4, 2, "t"), (0, 2, 4, 2, "b"))
_B_PART_8x16 = ((0, 0, 2, 4, "l"), (2, 0, 2, 4, "r"))

# direct_8x8_inference corner 4x4 (in-MB cell coords) per 8x8 index
_INFER_CORNER = ((0, 0), (3, 0), (0, 3), (3, 3))


def _min_positive(a: int, b: int) -> int:
    """§8.4.1.2.2 MinPositive: min when both non-negative, else max."""
    if a >= 0 and b >= 0:
        return min(a, b)
    return max(a, b)


def _temporal_direct(col_grid, pocs, bx0: int, by0: int):
    """§8.4.1.2.3 temporal direct derivation for the MB at cell
    (bx0, by0): the colocated block's motion (in RefPicList1[0]) is
    scaled by POC distances — mvL0 = (DistScaleFactor * mvCol + 128)
    >> 8, mvL1 = mvL0 - mvCol; intra colocated blocks contribute
    zero motion with refIdxL0 = 0.  Envelope: the colocated picture's
    references must be this slice's RefPicList0[0] (single-reference
    colocated; a multi-reference colocated cell is rejected, never
    approximated).  Returns [per-8x8 (mv0, mv1)] — both lists always
    predict in temporal direct."""
    poc_cur, poc0, poc1 = pocs
    tb = _clip3(-128, 127, poc_cur - poc0)
    td = _clip3(-128, 127, poc1 - poc0)
    if td:
        num = 16384 + (abs(td) >> 1)
        tx = num // td if td > 0 else -(num // -td)
        dsf = _clip3(-1024, 1023, (tb * tx + 32) >> 6)
    else:
        dsf = None  # same-POC anchors: mvL0 = mvCol, mvL1 = 0
    out = []
    for i8 in range(4):
        cx, cy = _INFER_CORNER[i8]
        col = col_grid.cell(bx0 + cx, by0 + cy) if col_grid is not None \
            else None
        if isinstance(col, tuple):
            if len(col) == 3:
                raise ValueError(
                    "h264: temporal direct against a multi-reference "
                    "colocated picture not supported")
            mvcol = (col[0], col[1])
        else:  # intra / missing colocated: zero motion, refIdx 0
            mvcol = (0, 0)
        if dsf is None:
            mv0, mv1 = mvcol, (0, 0)
        else:
            mv0 = ((dsf * mvcol[0] + 128) >> 8,
                   (dsf * mvcol[1] + 128) >> 8)
            mv1 = (mv0[0] - mvcol[0], mv0[1] - mvcol[1])
        out.append((mv0, mv1))
    return out


def _spatial_direct(gridL0: _MvGrid, gridL1: _MvGrid, col_grid,
                    bx0: int, by0: int):
    """§8.4.1.2.2 spatial direct derivation for the MB at cell
    (bx0, by0): returns (ref0, ref1, [per-8x8 (mv0, mv1)]) with
    refX in {-1, 0} (the single-active-reference envelope) and mv
    None when the list is unused.  `col_grid` is the list-1 anchor's
    motion grid (None = all-intra colocated picture, e.g. an I
    anchor).  Shared by decoder and fixture encoder so the two cannot
    drift."""
    refs = []
    meds = []
    for g in (gridL0, gridL1):
        _aa, ra, _ = g.neighbor(bx0 - 1, by0)
        _ab, rb, _ = g.neighbor(bx0, by0 - 1)
        ac, rc, _ = g.neighbor(bx0 + 4, by0 - 1)
        if not ac:
            _ad, rc, _ = g.neighbor(bx0 - 1, by0 - 1)
        refs.append(_min_positive(ra, _min_positive(rb, rc)))
        meds.append(_mvp(g, bx0, by0, 4, 4, ""))
    ref0, ref1 = refs
    dzp = ref0 < 0 and ref1 < 0  # directZeroPredictionFlag
    if dzp:
        ref0 = ref1 = 0
    out = []
    for i8 in range(4):
        cx, cy = _INFER_CORNER[i8]
        col = col_grid.cell(bx0 + cx, by0 + cy) if col_grid is not None \
            else None
        # colZeroFlag: colocated refIdx 0 with both mv components in
        # [-1, 1] quarter-pel (intra / missing colocated -> refIdx -1;
        # a 3-element cell marks a non-zero refIdx in a multi-ref
        # P anchor -> flag off)
        colzero = (isinstance(col, tuple) and len(col) == 2
                   and -1 <= col[0] <= 1 and -1 <= col[1] <= 1)
        mvs = []
        for ref, med in ((ref0, meds[0]), (ref1, meds[1])):
            if ref < 0:
                mvs.append(None)
            elif dzp or colzero:
                mvs.append((0, 0))
            else:
                mvs.append(med)
        out.append((mvs[0], mvs[1]))
    return ref0, ref1, out


# --------------------------------------------------------------------------
# weighted bi-prediction (§8.4.2.3.1 / .2)


def _implicit_weights(poc_cur: int, poc0: int, poc1: int) -> tuple[int, int]:
    """§8.4.2.3.1 implicit weighted-bipred weights (logWD 5, zero
    offsets), derived from POC distances; falls back to the 32/32
    average when the anchors share a POC or the clipped scale factor
    leaves [-64, 128].  The spec's '/' truncates toward zero — td is
    always positive under this DPB construction (list 1 is the future
    anchor), but the truncating form is kept for clarity."""
    if poc1 == poc0:
        return 32, 32
    tb = _clip3(-128, 127, poc_cur - poc0)
    td = _clip3(-128, 127, poc1 - poc0)
    num = 16384 + (abs(td) >> 1)
    tx = num // td if td > 0 else -(num // -td)
    dsf = _clip3(-1024, 1023, (tb * tx + 32) >> 6)
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return 32, 32
    return 64 - w1, w1


def _bi_combine(p0: list[int], p1: list[int], w0: int, o0: int,
                w1: int, o1: int, logwd: int) -> list[int]:
    """§8.4.2.3.2 weighted bi-prediction: the default weights
    reproduce the plain (a + b + 1) >> 1 average exactly."""
    r = 1 << logwd
    oo = (o0 + o1 + 1) >> 1
    return [_clip255(((a * w0 + b * w1 + r) >> (logwd + 1)) + oo)
            for a, b in zip(p0, p1)]


# --------------------------------------------------------------------------
# B-slice decoder


def _decode_bslice(rbsp: bytes, ntype: int, nri: int, sps: dict,
                   pps: dict, ref0, ref1, col_grid, pocs=None):
    """Decode one B slice covering the whole picture.  ref0/ref1 are
    the uncropped (y, u, v) planes of RefPicList0[0] / RefPicList1[0]
    (nearest reference below / above the current POC); col_grid is
    ref1's motion grid for the spatial-direct colZeroFlag (None for
    an intra anchor); pocs = (poc_cur, poc0, poc1) feeds the implicit
    weighted-bipred derivation when weighted_bipred_idc == 2.
    REFERENCE B pictures (nal_ref_idc != 0 — B-pyramid GOPs, r7c)
    parse dec_ref_pic_marking (sliding window only).  Returns
    (ybuf, ubuf, vbuf, col_export) uncropped, where col_export is the
    picture's own colocated motion field — per 4x4, the L0 motion
    when list 0 predicts, else the L1 motion (§8.4.1.2.2's colocated
    selection), for Bs that reference this picture."""
    if pps["weighted_bipred"] == 2 and pocs is None:
        raise ValueError("h264: implicit weighting needs anchor POCs")
    if pps["bottom_poc"]:
        raise ValueError("h264: bottom-field POC syntax not supported")
    if not sps["direct_8x8"]:
        raise ValueError("h264: direct_8x8_inference_flag=0 not supported")
    br = _BitReader(rbsp)
    if br.ue() != 0:
        raise ValueError("h264: slice must start at mb 0")
    if br.ue() % 5 != 1:
        raise ValueError("h264: not a B slice")
    br.ue()  # pic_parameter_set_id
    br.u(sps["log2_max_frame_num"])  # frame_num
    if ntype == 5:
        raise ValueError("h264: IDR picture with a B slice")
    if sps["poc_type"] == 0:
        br.u(sps["poc_lsb_bits"])
    else:
        raise ValueError("h264: B slices need pic_order_cnt_type 0")
    if pps["redundant"]:
        if br.ue() != 0:
            raise ValueError("h264: redundant slices not supported")
    direct_spatial = br.u(1) == 1  # direct_spatial_mv_pred_flag
    if not direct_spatial and pocs is None:
        raise ValueError("h264: temporal direct needs anchor POCs")
    if br.u(1):  # num_ref_idx_active_override_flag
        if br.ue() != 0 or br.ue() != 0:
            raise ValueError("h264: more than one reference per list")
    elif pps["num_ref_l0"] != 1 or pps["num_ref_l1"] != 1:
        raise ValueError("h264: more than one reference per list")
    if br.u(1):  # ref_pic_list_modification_flag_l0
        raise ValueError("h264: reference list modification not supported")
    if br.u(1):  # ref_pic_list_modification_flag_l1
        raise ValueError("h264: reference list modification not supported")
    # weighting mode: None (default average), explicit table (idc 1),
    # or POC-derived implicit weights (idc 2; uni preds stay plain)
    wp = None
    iw = None
    if pps["weighted_bipred"] == 1:
        wp = _parse_pred_weight_table(br, 2)
    elif pps["weighted_bipred"] == 2:
        iw = _implicit_weights(pocs[0], pocs[1], pocs[2])
    elif pps["weighted_bipred"]:
        raise ValueError("h264: bad weighted_bipred_idc")
    if nri != 0:  # reference B (B-pyramid): dec_ref_pic_marking
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
    for planes in (ref0, ref1):
        if len(planes[0]) != W * H:
            raise ValueError("h264: reference/current picture size mismatch")
    gridL0 = _MvGrid(mbw, mbh)
    gridL1 = _MvGrid(mbw, mbh)
    # deblock motion state per 4x4: 'I' or (list mask, mv0, mv1)
    db_cell = [[None] * (mbw * 4) for _ in range(mbh * 4)]

    def combine(preds, plane_idx: int):
        """Merge the per-list interpolations for one partition under
        the slice's weighting mode: explicit (§8.4.2.3.2 weights from
        the pred_weight_table), implicit (POC-derived bi weights,
        plain uni), or the default (a + b + 1) >> 1 / pass-through."""
        if len(preds) == 2:
            (_l0, p0), (_l1, p1) = preds
            if wp is not None:
                ld, cd, entries = wp
                if plane_idx == 0:
                    (w0, o0), (w1, o1) = entries[0][0], entries[1][0]
                    return _bi_combine(p0, p1, w0, o0, w1, o1, ld)
                (w0, o0) = entries[0][1][plane_idx - 1]
                (w1, o1) = entries[1][1][plane_idx - 1]
                return _bi_combine(p0, p1, w0, o0, w1, o1, cd)
            if iw is not None:
                return _bi_combine(p0, p1, iw[0], 0, iw[1], 0, 5)
            return [(a + b + 1) >> 1 for a, b in zip(p0, p1)]
        lx, p = preds[0]
        if wp is not None:
            ld, cd, entries = wp
            if plane_idx == 0:
                return _apply_weight(p, *entries[lx][0], ld)
            return _apply_weight(p, *entries[lx][1][plane_idx - 1], cd)
        return p  # implicit mode leaves uni predictions unweighted

    def mc_partition(mbx: int, mby: int, pbx: int, pby: int,
                     wb: int, hb: int, mv0, mv1) -> None:
        """Motion-compensate one partition: uni (one mv None) copies
        the single interpolation, bi combines per the weighting mode
        (default: (predL0 + predL1 + 1) >> 1)."""
        px, py = mbx * 16 + pbx * 4, mby * 16 + pby * 4
        bw, bh = wb * 4, hb * 4
        preds = []
        for lx, (mv, planes) in enumerate(((mv0, ref0), (mv1, ref1))):
            if mv is None:
                continue
            dst = [0] * (bw * bh)
            _mc_luma(planes[0], W, H, dst, px, py, bw, bh, mv[0], mv[1])
            preds.append((lx, dst))
        out = combine(preds, 0)
        for r in range(bh):
            ybuf[(py + r) * W + px: (py + r) * W + px + bw] = bytes(
                out[r * bw: (r + 1) * bw])
        cpx, cpy = px >> 1, py >> 1
        cbw, cbh = bw >> 1, bh >> 1
        for comp, obuf in ((1, ubuf), (2, vbuf)):
            cpreds = []
            for lx, (mv, planes) in enumerate(((mv0, ref0), (mv1, ref1))):
                if mv is None:
                    continue
                cdst = [0] * (cbw * cbh)
                _mc_chroma(planes[comp], CW, CH, cdst, cpx, cpy,
                           cbw, cbh, mv[0], mv[1])
                cpreds.append((lx, cdst))
            cout = combine(cpreds, comp)
            for r in range(cbh):
                obuf[(cpy + r) * CW + cpx: (cpy + r) * CW + cpx + cbw] = \
                    bytes(cout[r * cbw: (r + 1) * cbw])

    def fill_cells(bx: int, by: int, wb: int, hb: int, mv0, mv1) -> None:
        """Record one decoded partition in both MVP grids and the
        deblock motion state."""
        gridL0.fill(bx, by, wb, hb, mv0 if mv0 is not None else "I")
        gridL1.fill(bx, by, wb, hb, mv1 if mv1 is not None else "I")
        mask = (1 if mv0 is not None else 0) | (2 if mv1 is not None else 0)
        cell = (mask, mv0, mv1)
        for yy in range(by, by + hb):
            row = db_cell[yy]
            for xx in range(bx, bx + wb):
                row[xx] = cell

    def direct_mvs(bx0: int, by0: int):
        """Per-8x8 (mv0, mv1) for direct-mode prediction under the
        slice's direct_spatial_mv_pred_flag."""
        if direct_spatial:
            return _spatial_direct(gridL0, gridL1, col_grid, bx0, by0)[2]
        return _temporal_direct(col_grid, pocs, bx0, by0)

    def decode_direct_mb(mbx: int, mby: int) -> None:
        """B_Skip / B_Direct_16x16 motion + MC (residual handled by
        the caller when present)."""
        bx0, by0 = mbx * 4, mby * 4
        per8 = direct_mvs(bx0, by0)
        for i8, (mv0, mv1) in enumerate(per8):
            obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
            fill_cells(bx0 + obx, by0 + oby, 2, 2, mv0, mv1)
            mc_partition(mbx, mby, obx, oby, 2, 2, mv0, mv1)

    if pps["cabac"]:
        if pps["transform_8x8"]:
            raise ValueError(
                "h264: CABAC 8x8 transform not supported (ctx 399+ "
                "init columns unpinned in-container)")
        from .h264_cabac_pb import _CabacInterReader

        rd = _CabacInterReader(br, st, qp, is_b=True)
    else:
        rd = _CavlcInterReader(br, st)

    nz_luma, nz_chroma = st.nz_luma, st.nz_chroma
    total = mbw * mbh
    for mb in range(total):
        mby, mbx = divmod(mb, mbw)
        last = mb == total - 1
        if rd.skip_next(mbx, mby, total - mb):
            decode_direct_mb(mbx, mby)
            st.mb_qp[mby][mbx] = qp
            rd.end_mb(mbx, mby, last)
            continue
        mb_type = rd.mb_type_b(mbx, mby)
        if mb_type >= 23:
            if mb_type > 48:
                raise ValueError("h264: bad B-slice mb_type")
            gridL0.fill(mbx * 4, mby * 4, 4, 4, "I")
            gridL1.fill(mbx * 4, mby * 4, 4, 4, "I")
            for yy in range(mby * 4, mby * 4 + 4):
                for xx in range(mbx * 4, mbx * 4 + 4):
                    db_cell[yy][xx] = "I"
            qp = st.decode_intra_mb(rd, mbx, mby, mb_type - 23, qp)
            rd.end_mb(mbx, mby, last)
            continue

        bx0, by0 = mbx * 4, mby * 4
        subs_all8 = True  # non-B_8x8 types have no sub-partitions < 8x8
        if mb_type == 0:  # B_Direct_16x16
            decode_direct_mb(mbx, mby)
        elif mb_type <= 3:  # one 16x16 partition
            mode = _B_16x16[mb_type]
            mvd0 = rd.mvd(0, bx0, by0, 4, 4) if mode != 1 else None
            mvd1 = rd.mvd(1, bx0, by0, 4, 4) if mode != 0 else None
            mv0 = mv1 = None
            if mvd0 is not None:
                p = _mvp(gridL0, bx0, by0, 4, 4, "")
                mv0 = (p[0] + mvd0[0], p[1] + mvd0[1])
            if mvd1 is not None:
                p = _mvp(gridL1, bx0, by0, 4, 4, "")
                mv1 = (p[0] + mvd1[0], p[1] + mvd1[1])
            fill_cells(bx0, by0, 4, 4, mv0, mv1)
            mc_partition(mbx, mby, 0, 0, 4, 4, mv0, mv1)
        elif mb_type <= 21:  # two 16x8 / 8x16 partitions
            k = mb_type - 4
            modes = _B_PAIR_MODES[k >> 1]
            parts = _B_PART_16x8 if (k & 1) == 0 else _B_PART_8x16
            # parse order: all mvd_l0, then all mvd_l1 (§7.3.5.1)
            mvds = [[None, None], [None, None]]
            for lst in range(2):
                for pi, mode in enumerate(modes):
                    if (lst == 0 and mode != 1) or (lst == 1 and mode != 0):
                        pbx, pby, wb, hb, _k = parts[pi]
                        mvds[lst][pi] = rd.mvd(lst, bx0 + pbx, by0 + pby,
                                               wb, hb)
            # reconstruct per list in partition order, then MC
            mvs = [[None, None], [None, None]]
            for lst, g in ((0, gridL0), (1, gridL1)):
                for pi, (pbx, pby, wb, hb, kind) in enumerate(parts):
                    d = mvds[lst][pi]
                    if d is None:
                        g.fill(bx0 + pbx, by0 + pby, wb, hb, "I")
                        continue
                    p = _mvp(g, bx0 + pbx, by0 + pby, wb, hb, kind)
                    mv = (p[0] + d[0], p[1] + d[1])
                    mvs[lst][pi] = mv
                    g.fill(bx0 + pbx, by0 + pby, wb, hb, mv)
            for pi, (pbx, pby, wb, hb, _kind) in enumerate(parts):
                mv0, mv1 = mvs[0][pi], mvs[1][pi]
                fill_cells(bx0 + pbx, by0 + pby, wb, hb, mv0, mv1)
                mc_partition(mbx, mby, pbx, pby, wb, hb, mv0, mv1)
        elif mb_type == 22:  # B_8x8
            subs = [rd.sub_mb_type_b() for _ in range(4)]
            if any(s > 12 for s in subs):
                raise ValueError("h264: bad B sub_mb_type")
            # 8x8-transform eligibility: direct subs ride the SPS
            # direct_8x8_inference gate (enforced above); explicit
            # subs must be full 8x8 partitions
            subs_all8 = all(s <= 3 for s in subs)
            # direct 8x8s derive once per MB (shared refs + medians)
            direct = None
            if any(s == 0 for s in subs):
                direct = direct_mvs(bx0, by0)
            # parse order: all mvd_l0 across 8x8s/sub-parts, then mvd_l1
            mvds = [[], []]
            for lst in range(2):
                for i8, s in enumerate(subs):
                    mode, shape = _B_SUB[s]
                    if mode is None:
                        mvds[lst].append(None)
                        continue
                    use = (lst == 0 and mode != 1) or (lst == 1 and mode != 0)
                    if not use:
                        mvds[lst].append(None)
                        continue
                    obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                    got = []
                    for spx, spy, wb, hb in _SUB_SHAPES[shape]:
                        pbx, pby = obx + spx * wb, oby + spy * hb
                        got.append(rd.mvd(lst, bx0 + pbx, by0 + pby,
                                          wb, hb))
                    mvds[lst].append(got)
            # reconstruct per list, 8x8s and sub-partitions in order
            mvs = [[None] * 4, [None] * 4]
            for lst, g in ((0, gridL0), (1, gridL1)):
                for i8, s in enumerate(subs):
                    mode, shape = _B_SUB[s]
                    obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                    if mode is None:  # B_Direct_8x8
                        dmv = direct[i8][lst]
                        g.fill(bx0 + obx, by0 + oby, 2, 2,
                               dmv if dmv is not None else "I")
                        mvs[lst][i8] = ("direct", dmv)
                        continue
                    d = mvds[lst][i8]
                    if d is None:
                        g.fill(bx0 + obx, by0 + oby, 2, 2, "I")
                        continue
                    got = []
                    for (spx, spy, wb, hb), dv in zip(_SUB_SHAPES[shape], d):
                        pbx, pby = obx + spx * wb, oby + spy * hb
                        p = _mvp(g, bx0 + pbx, by0 + pby, wb, hb)
                        mv = (p[0] + dv[0], p[1] + dv[1])
                        got.append((pbx, pby, wb, hb, mv))
                        g.fill(bx0 + pbx, by0 + pby, wb, hb, mv)
                    mvs[lst][i8] = ("parts", got)
            for i8 in range(4):
                obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                e0, e1 = mvs[0][i8], mvs[1][i8]
                if (e0 is not None and e0[0] == "direct") or \
                        (e1 is not None and e1[0] == "direct"):
                    mv0 = e0[1] if e0 is not None else None
                    mv1 = e1[1] if e1 is not None else None
                    fill_cells(bx0 + obx, by0 + oby, 2, 2, mv0, mv1)
                    mc_partition(mbx, mby, obx, oby, 2, 2, mv0, mv1)
                    continue
                # explicit sub-partitions: both lists (when present)
                # share ONE shape per Table 7-18 — walk that shape
                shape_parts = (e0 or e1)[1]
                for pbx, pby, wb, hb, _mv in shape_parts:
                    mv0 = mv1 = None
                    if e0 is not None:
                        mv0 = next(m for px, py_, w_, h_, m in e0[1]
                                   if (px, py_) == (pbx, pby))
                    if e1 is not None:
                        mv1 = next(m for px, py_, w_, h_, m in e1[1]
                                   if (px, py_) == (pbx, pby))
                    fill_cells(bx0 + pbx, by0 + pby, wb, hb, mv0, mv1)
                    mc_partition(mbx, mby, pbx, pby, wb, hb, mv0, mv1)
        else:
            raise ValueError("h264: bad B-slice mb_type")

        # ---- residual (shared CBP-inter machinery)
        cbp_luma, cbp_chroma = rd.cbp(mbx, mby, intra=False)
        t8 = False
        if cbp_luma and pps["transform_8x8"] and subs_all8:
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
        def nz_at(bx: int, by: int) -> int:
            if st.mb_t8[by >> 2][bx >> 2]:
                b8x, b8y = bx & ~1, by & ~1
                return (nz_luma[b8y][b8x] or nz_luma[b8y][b8x + 1]
                        or nz_luma[b8y + 1][b8x]
                        or nz_luma[b8y + 1][b8x + 1])
            return nz_luma[by][bx]

        def seg_bs(pbx: int, pby: int, qbx: int, qby: int,
                   mb_edge: bool) -> int:
            if st.mb_intra[pby >> 2][pbx >> 2] or \
                    st.mb_intra[qby >> 2][qbx >> 2]:
                return 4 if mb_edge else 3
            if nz_at(pbx, pby) or nz_at(qbx, qby):
                return 2
            p, q = db_cell[pby][pbx], db_cell[qby][qbx]
            if p == "I" or q == "I" or p is None or q is None:
                return 1  # conservative; unreachable for decoded MBs
            if p[0] != q[0]:
                return 1  # different reference-picture sets (§8.7.2.1)
            for mp, mq in ((p[1], q[1]), (p[2], q[2])):
                if mp is None:
                    continue
                if abs(mp[0] - mq[0]) >= 4 or abs(mp[1] - mq[1]) >= 4:
                    return 1
            return 0

        _deblock_edges(ybuf, ubuf, vbuf, mbw, mbh, st.mb_qp,
                       pps["chroma_qp_offset"], db_off_a, db_off_b,
                       seg_bs, mb_t8=st.mb_t8)

    # colocated export (§8.4.1.2.2 selection): L0 motion when list 0
    # predicts the cell, else L1 motion, else intra
    col_export = _MvGrid(mbw, mbh)
    for yy in range(mbh * 4):
        for xx in range(mbw * 4):
            c0 = gridL0.g[yy][xx]
            c1 = gridL1.g[yy][xx]
            if isinstance(c0, tuple):
                col_export.g[yy][xx] = c0
            elif isinstance(c1, tuple):
                col_export.g[yy][xx] = c1
            else:
                col_export.g[yy][xx] = "I"
    return ybuf, ubuf, vbuf, col_export


# --------------------------------------------------------------------------
# POC (§8.2.1, pic_order_cnt_type 0) + DPB stream walk


def _slice_info(rbsp: bytes, sps: dict) -> tuple[int, int, int]:
    """(slice_type %5, frame_num, pic_order_cnt_lsb) from a slice
    header prefix — enough for the DPB walk to classify and order."""
    br = _BitReader(rbsp)
    if br.ue() != 0:
        raise ValueError("h264: slice must start at mb 0")
    stype = br.ue() % 5
    br.ue()  # pic_parameter_set_id
    frame_num = br.u(sps["log2_max_frame_num"])
    poc_lsb = 0
    if sps["poc_type"] == 0:
        # idr_pic_id precedes the POC lsb on IDR NALs — the caller
        # re-parses for IDR; non-IDR reads it directly
        poc_lsb = br.u(sps["poc_lsb_bits"])
    return stype, frame_num, poc_lsb


class H264AuDecoder:
    """Stateful access-unit decoder for I/P/B streams: tracks SPS/PPS,
    the §8.2.1 POC state and a sliding-window DPB of reference
    pictures (planes + motion grid), so MP4 sample walks decode
    IBP GOPs.  decode(au) -> (sps, ybuf, ubuf, vbuf, poc) uncropped,
    in DECODE order (composition reordering is the container's job —
    the avc1 muxer records it in ctts)."""

    def __init__(self) -> None:
        self.sps = None
        self.pps = None
        self._dpb: list[dict] = []
        self._prev_msb = 0
        self._prev_lsb = 0

    def _poc(self, rbsp: bytes, ntype: int, nri: int) -> int:
        sps = self.sps
        if sps["poc_type"] != 0:
            return 0  # I/P-only streams never consult POC here
        br = _BitReader(rbsp)
        br.ue()  # first_mb_in_slice
        br.ue()  # slice_type
        br.ue()  # pic_parameter_set_id
        br.u(sps["log2_max_frame_num"])
        if ntype == 5:
            br.ue()  # idr_pic_id
            self._prev_msb = self._prev_lsb = 0
        lsb = br.u(sps["poc_lsb_bits"])
        max_lsb = 1 << sps["poc_lsb_bits"]
        if lsb < self._prev_lsb and self._prev_lsb - lsb >= max_lsb // 2:
            msb = self._prev_msb + max_lsb
        elif lsb > self._prev_lsb and lsb - self._prev_lsb > max_lsb // 2:
            msb = self._prev_msb - max_lsb
        else:
            msb = self._prev_msb
        if nri != 0:
            self._prev_msb, self._prev_lsb = msb, lsb
        return msb + lsb

    def decode(self, au: bytes):
        """Decode ONE access unit (Annex-B bytes, parameter sets
        in-band allowed); returns (sps, ybuf, ubuf, vbuf) uncropped."""
        slice_nal = None
        for nal in _split_nals(au):
            if not nal:
                continue
            ntype = nal[0] & 0x1F
            if ntype == 7:
                self.sps = _parse_sps(_strip_emulation(nal[1:]))
            elif ntype == 8:
                self.pps = _parse_pps(_strip_emulation(nal[1:]))
            elif ntype in (1, 5) and slice_nal is None:
                slice_nal = nal
        if self.sps is None or self.pps is None or slice_nal is None:
            raise ValueError("h264: need SPS, PPS and one coded slice")
        sps, pps = self.sps, self.pps
        ntype = slice_nal[0] & 0x1F
        nri = (slice_nal[0] >> 5) & 3
        rbsp = _strip_emulation(slice_nal[1:])
        stype, _fn, _lsb = _slice_info(rbsp, sps)
        poc = self._poc(rbsp, ntype, nri)
        if ntype == 5:
            self._dpb.clear()
        if stype == 2:  # I / IDR
            _s, yb, ub, vb = _decode_iframe_uncropped(au)
            grid = None
        elif stype == 0:  # P — RefPicList0 = refs by decode order,
            # most recent first (PicNum descending; no frame_num gaps
            # in the envelope, so decode order IS PicNum order)
            if not self._dpb:
                raise ValueError("h264: P slice without a reference picture")
            list0 = [e["planes"] for e in reversed(self._dpb)]
            yb, ub, vb, grid = _decode_pslice(
                rbsp, ntype, nri, sps, pps, list0)
        elif stype == 1:  # B — nearest refs below/above in POC
            past = [e for e in self._dpb if e["poc"] < poc]
            future = [e for e in self._dpb if e["poc"] > poc]
            if not past or not future:
                raise ValueError("h264: B slice without both anchors")
            r0 = max(past, key=lambda e: e["poc"])
            r1 = min(future, key=lambda e: e["poc"])
            yb, ub, vb, grid = _decode_bslice(
                rbsp, ntype, nri, sps, pps,
                r0["planes"], r1["planes"], r1["grid"],
                pocs=(poc, r0["poc"], r1["poc"]))
        else:
            raise ValueError("h264: only I, P and B slices supported")
        if nri != 0:
            self._dpb.append({
                "poc": poc,
                "planes": (bytes(yb), bytes(ub), bytes(vb)),
                "grid": grid,
            })
            cap = max(1, sps["num_ref_frames"])
            while len(self._dpb) > cap:  # §8.2.5.3 sliding window
                self._dpb.pop(0)
        return sps, yb, ub, vb, poc


def decode_h264_gop_ipb(data: bytes, *, max_frames: int = 1024):
    """Decode an Annex-B H.264 elementary stream of I/P/B access
    units -> (width, height, [(y, u, v) per frame], [poc per frame]),
    frames in DECODE order (sort by POC for display order)."""
    dec = H264AuDecoder()
    frames: list[tuple[bytes, bytes, bytes]] = []
    pocs: list[int] = []
    out_w = out_h = None
    sps_nal = pps_nal = None
    for nal in _split_nals(data):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        if ntype == 7:
            sps_nal = nal
        elif ntype == 8:
            pps_nal = nal
        elif ntype in (1, 5):
            if sps_nal is None or pps_nal is None:
                raise ValueError("h264: slice before SPS/PPS")
            if len(frames) >= max_frames:
                raise ValueError("h264: too many frames in GOP")
            au = (b"\x00\x00\x00\x01" + sps_nal
                  + b"\x00\x00\x00\x01" + pps_nal
                  + b"\x00\x00\x00\x01" + nal)
            sps, yb, ub, vb, poc = dec.decode(au)
            w, h, y, u, v = _crop_planes(sps, yb, ub, vb)
            if out_w is None:
                out_w, out_h = w, h
            elif (w, h) != (out_w, out_h):
                raise ValueError("h264: frame size changed mid-stream")
            frames.append((y, u, v))
            pocs.append(poc)
    if not frames:
        raise ValueError("h264: no coded pictures in stream")
    return out_w, out_h, frames, pocs


# --------------------------------------------------------------------------
# Fixture encoders + closed forms


def _b_slice_header(qp_delta: int, frame_num: int, poc_lsb: int,
                    spatial: bool = True,
                    ref_b: bool = False,
                    cabac: bool = False) -> _BitWriter:
    sl = _BitWriter()
    sl.ue(0)   # first_mb_in_slice
    sl.ue(6)   # slice_type: B (all slices in picture)
    sl.ue(0)   # pic_parameter_set_id
    sl.u(4, frame_num & 15)
    sl.u(4, poc_lsb & 15)  # pic_order_cnt_lsb
    sl.u(1, 1 if spatial else 0)  # direct_spatial_mv_pred_flag
    sl.u(1, 0)  # num_ref_idx_active_override_flag
    sl.u(1, 0)  # ref_pic_list_modification_flag_l0
    sl.u(1, 0)  # ref_pic_list_modification_flag_l1
    if ref_b:  # reference B (B-pyramid): dec_ref_pic_marking
        sl.u(1, 0)  # adaptive_ref_pic_marking_mode_flag
    if cabac:
        sl.ue(0)  # cabac_init_idc
    sl.se(qp_delta)  # slice_qp_delta
    sl.ue(1)   # disable_deblocking_filter_idc = 1
    return sl


def _encode_bslice_nal(mbw: int, mbh: int, frame_num: int, poc_lsb: int,
                       mode: str, mv0: tuple[int, int] = (0, 0),
                       mv1: tuple[int, int] = (0, 0),
                       y_coeff: int = 0, c_coeff: int = 0,
                       col_zero: bool = True,
                       spatial: bool = True,
                       ref_b: bool = False,
                       cabac: bool = False, qp: int = 28) -> bytes:
    """One whole-picture non-reference B slice NAL (CAVLC, deblocking
    off).  Modes: 'skip' (one mb_skip_run covering the picture —
    spatial direct everywhere), 'bi_res' (every MB B_Bi_16x16 with
    (mv0, mv1) plus a DC coefficient in every luma 4x4 and a chroma DC
    per component), 'l1mv' (every MB B_L1_16x16 with mv1, no
    residual), 'l0l1_16x8' (every MB B_L0_L1_16x8: top half reads
    anchor 0 with mv0, bottom half anchor 1 with mv1), 'mixed8x8'
    (every MB B_8x8 with sub types [Direct, Bi, Bi, L0], zero motion
    — the Bi cells in the top-right/bottom-left 8x8s keep BOTH
    MB-neighbor reference minima non-negative for every MB position,
    so the spatial-direct 8x8 stays bi-predictive picture-wide and
    the closed form is uniform).  `col_zero` declares whether the
    colocated anchor's motion is zero (the fixture GOP's P anchor is
    all-P_L0_16x16 with mv 0) so the shared _spatial_direct
    derivation sees the same colZeroFlag the decoder will."""
    sl = _b_slice_header(0, frame_num, poc_lsb, spatial=spatial,
                         ref_b=ref_b, cabac=cabac)
    nri = 2 if ref_b else 0
    total = mbw * mbh
    wr = None
    if cabac:
        from .h264_cabac_pb import _CabacInterWriter

        wr = _CabacInterWriter(sl, mbw, mbh, qp, is_b=True)
    if mode == "skip":
        if cabac:
            for mb in range(total):
                mby, mbx = divmod(mb, mbw)
                wr.skip_mb(mbx, mby)
            wr.finish()
        else:
            sl.ue(total)
            sl.rbsp_trailing()
        return _nal(nri, 1, sl.done())

    gridL0 = _MvGrid(mbw, mbh)
    gridL1 = _MvGrid(mbw, mbh)
    col = _MvGrid(mbw, mbh)
    if col_zero:
        col.fill(0, 0, mbw * 4, mbh * 4, (0, 0))
    else:
        col = None
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
        if cabac:
            wr.coded_mb(mbx, mby)
        else:
            sl.ue(0)  # mb_skip_run
        if mode == "bi_res":
            p0 = _mvp(gridL0, bx0, by0, 4, 4, "")
            p1 = _mvp(gridL1, bx0, by0, 4, 4, "")
            d0 = (mv0[0] - p0[0], mv0[1] - p0[1])
            d1 = (mv1[0] - p1[0], mv1[1] - p1[1])
            if cabac:
                wr.mb_type_b(mbx, mby, 3)  # B_Bi_16x16
                wr.mvd(0, bx0, by0, 4, 4, d0[0], d0[1])
                wr.mvd(1, bx0, by0, 4, 4, d1[0], d1[1])
            else:
                sl.ue(3)  # B_Bi_16x16
                sl.se(d0[0])
                sl.se(d0[1])
                sl.se(d1[0])
                sl.se(d1[1])
            gridL0.fill(bx0, by0, 4, 4, mv0)
            gridL1.fill(bx0, by0, 4, 4, mv1)
            # cbp 31: all luma 8x8s + chroma DC-only
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
        elif mode == "l1mv":
            p1 = _mvp(gridL1, bx0, by0, 4, 4, "")
            d1 = (mv1[0] - p1[0], mv1[1] - p1[1])
            if cabac:
                wr.mb_type_b(mbx, mby, 2)  # B_L1_16x16
                wr.mvd(1, bx0, by0, 4, 4, d1[0], d1[1])
                wr.cbp(mbx, mby, False, 0, 0)
                wr.note_no_qp_delta()
            else:
                sl.ue(2)  # B_L1_16x16
                sl.se(d1[0])
                sl.se(d1[1])
                sl.ue(_CBP_INTER.index(0))  # no residual
            gridL0.fill(bx0, by0, 4, 4, "I")
            gridL1.fill(bx0, by0, 4, 4, mv1)
        elif mode == "l0l1_16x8":
            # mvd order: all mvd_l0 (partition 0), then mvd_l1 (part 1)
            p0 = _mvp(gridL0, bx0, by0, 4, 2, "t")
            d0 = (mv0[0] - p0[0], mv0[1] - p0[1])
            if cabac:
                wr.mb_type_b(mbx, mby, 8)  # B_L0_L1_16x8
                wr.mvd(0, bx0, by0, 4, 2, d0[0], d0[1])
            else:
                sl.ue(8)  # B_L0_L1_16x8
                sl.se(d0[0])
                sl.se(d0[1])
            gridL0.fill(bx0, by0, 4, 2, mv0)
            gridL0.fill(bx0, by0 + 2, 4, 2, "I")
            gridL1.fill(bx0, by0, 4, 2, "I")
            p1 = _mvp(gridL1, bx0, by0 + 2, 4, 2, "b")
            d1 = (mv1[0] - p1[0], mv1[1] - p1[1])
            if cabac:
                wr.mvd(1, bx0, by0 + 2, 4, 2, d1[0], d1[1])
                wr.cbp(mbx, mby, False, 0, 0)
                wr.note_no_qp_delta()
            else:
                sl.se(d1[0])
                sl.se(d1[1])
                sl.ue(_CBP_INTER.index(0))  # no residual
            gridL1.fill(bx0, by0 + 2, 4, 2, mv1)
        elif mode == "mixed8x8":
            subs = (0, 3, 3, 1)  # [Direct, Bi, Bi, L0]
            if cabac:
                wr.mb_type_b(mbx, mby, 22)  # B_8x8
                for s in subs:
                    wr.sub_mb_type_b(s)
            else:
                sl.ue(22)  # B_8x8
                for s in subs:
                    sl.ue(s)
            # Direct derives; explicit subs carry zero mvs.  mvd order:
            # all mvd_l0 across 8x8s, then all mvd_l1 (§7.3.5.1).
            _r0, _r1, per8 = _spatial_direct(gridL0, gridL1, col,
                                             bx0, by0)
            # list-order grid fill mirrors the decoder exactly
            for lst, g in ((0, gridL0), (1, gridL1)):
                for i8, s in enumerate(subs):
                    smode, _shape = _B_SUB[s]
                    obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
                    if smode is None:
                        dmv = per8[i8][lst]
                        g.fill(bx0 + obx, by0 + oby, 2, 2,
                               dmv if dmv is not None else "I")
                        continue
                    uses = (lst == 0 and smode != 1) or \
                           (lst == 1 and smode != 0)
                    if not uses:
                        g.fill(bx0 + obx, by0 + oby, 2, 2, "I")
                        continue
                    p = _mvp(g, bx0 + obx, by0 + oby, 2, 2)
                    if cabac:
                        wr.mvd(lst, bx0 + obx, by0 + oby, 2, 2,
                               0 - p[0], 0 - p[1])
                    else:
                        sl.se(0 - p[0])
                        sl.se(0 - p[1])
                    g.fill(bx0 + obx, by0 + oby, 2, 2, (0, 0))
            if cabac:
                wr.cbp(mbx, mby, False, 0, 0)
                wr.note_no_qp_delta()
            else:
                sl.ue(_CBP_INTER.index(0))  # no residual
        else:
            raise ValueError("unknown B fixture mode")
        if cabac:
            wr.end_mb()
    if cabac:
        wr.finish()
    else:
        sl.rbsp_trailing()
    return _nal(nri, 1, sl.done())


def _flat_idr(width: int, height: int, qp: int, y_coeff: int,
              u_coeff: int, v_coeff: int, cabac: bool) -> bytes:
    """Flat Intra_16x16 IDR for the GOP fixtures, in the requested
    entropy tier (the GOP's PPS covers every slice, so a CABAC GOP
    needs a CABAC IDR too)."""
    if cabac:
        from .h264_cabac import encode_h264_iframe_flat_cabac

        return encode_h264_iframe_flat_cabac(
            width, height, qp=qp,
            y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)
    from .h264 import encode_h264_iframe_flat

    return encode_h264_iframe_flat(
        width, height, qp=qp,
        y_coeff=y_coeff, u_coeff=u_coeff, v_coeff=v_coeff)


def encode_h264_gop_b(width: int, height: int, *, qp: int,
                      y_coeff: int, u_coeff: int, v_coeff: int,
                      p_y_coeff: int, p_c_coeff: int,
                      b_y_coeff: int, b_c_coeff: int,
                      mv0: tuple[int, int] = (1, 0),
                      mv1: tuple[int, int] = (0, 1),
                      cabac: bool = False) -> list[bytes]:
    """Seven-frame IBP GOP fixture with closed-form planes
    (h264_gop_b_expected), DECODE order / POC: IDR flat (0), P with a
    uniform DC residual (12), then five non-reference B pictures
    between the anchors — all-B_Skip (2: spatial direct bi-pred of
    the two flat anchors), all-B_Bi_16x16 with quarter-pel motion
    plus a uniform DC residual (4), all-B_8x8 with sub types
    [Direct, Bi, Bi, L0] (6), all-B_L1_16x16 with motion (8), and
    all-B_L0_L1_16x8 (10: top half anchor 0, bottom half anchor 1 —
    pins the Table 7-14 two-partition mapping at the sample level).
    Dimensions must be MB-aligned so the mixed frame's per-8x8
    accounting stays exact.  Returns per-frame Annex-B chunks for
    the avc1 muxer (composition order = POC order)."""
    from .h264 import encode_h264_iframe_flat
    from .h264_inter import _encode_pslice_nal

    if width % 16 or height % 16 or width <= 0 or height <= 0:
        raise ValueError("h264: B GOP fixture dims must be MB-aligned")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mbw, mbh = width // 16, height // 16
    sps = _sps_writer(mbw, mbh, 0, 0, num_ref_frames=2, profile_idc=77)
    pps = _pps_writer(qp, cabac=cabac)
    idr_body = _flat_idr(width, height, qp, y_coeff, u_coeff, v_coeff,
                         cabac)
    # the flat I encoder writes its own baseline SPS (1 ref frame);
    # re-head the GOP with the 2-reference main-profile SPS/PPS
    idr_nals = _split_nals(idr_body)
    idr_slice = next(n for n in idr_nals if (n[0] & 0x1F) == 5)
    idr = (_nal(3, 7, sps.done()) + _nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "residual",
                           y_coeff=p_y_coeff, c_coeff=p_c_coeff,
                           poc_lsb=6, cabac=cabac),
        _encode_bslice_nal(mbw, mbh, 2, 1, "skip", cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 2, 2, "bi_res", mv0=mv0, mv1=mv1,
                           y_coeff=b_y_coeff, c_coeff=b_c_coeff,
                           cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 2, 3, "mixed8x8", cabac=cabac,
                           qp=qp),
        _encode_bslice_nal(mbw, mbh, 2, 4, "l1mv", mv1=mv1,
                           cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 2, 5, "l0l1_16x8",
                           mv0=mv0, mv1=mv1, cabac=cabac, qp=qp),
    ]


def h264_gop_b_expected(qp: int, y_coeff: int, u_coeff: int, v_coeff: int,
                        p_y_coeff: int, p_c_coeff: int,
                        b_y_coeff: int, b_c_coeff: int):
    """Closed-form expectations for encode_h264_gop_b, per DECODE-order
    frame: frames 0-1 follow the P-tier closed form (flat + residual
    arms); frame 2 is the pixelwise bi-pred average (a0 + a1 + 1) >> 1
    of the two anchors; frame 3 adds the dequantized uniform DC on top
    of the average (quarter-pel MC over constant planes is an
    identity); frame 4 mixes per 8x8 — [avg, avg, avg, a0] per MB;
    frame 5 is anchor 1; frame 6 is anchor 0 over the top half and
    anchor 1 over the bottom.  Returns [(kind, per-plane values...)]:
    'flat' frames carry (y, u, v); 'mixed' carries
    ((avgY, y0), (avgU, u0), (avgV, v0)); 'halves' carries
    ((y0, y1), (u0, u1), (v0, v1)) as (top, bottom)."""
    from .h264 import (_clip255 as _c255, _dequant_ac, _scale_chroma_dc,
                       h264_flat_expected)

    yv, uv, vv = h264_flat_expected(qp, y_coeff, u_coeff, v_coeff)
    qpc = _chroma_qp(qp, 0)
    dy1 = (_dequant_ac([p_y_coeff] + [0] * 15, qp, 0)[0] + 32) >> 6
    dc1 = (_scale_chroma_dc(p_c_coeff, qpc) + 32) >> 6
    y1, u1, v1 = _c255(yv + dy1), _c255(uv + dc1), _c255(vv + dc1)
    ay, au, av = (yv + y1 + 1) >> 1, (uv + u1 + 1) >> 1, (vv + v1 + 1) >> 1
    dyb = (_dequant_ac([b_y_coeff] + [0] * 15, qp, 0)[0] + 32) >> 6
    dcb = (_scale_chroma_dc(b_c_coeff, qpc) + 32) >> 6
    return [
        ("flat", yv, uv, vv),
        ("flat", y1, u1, v1),
        ("flat", ay, au, av),
        ("flat", _c255(ay + dyb), _c255(au + dcb), _c255(av + dcb)),
        ("mixed", (ay, yv), (au, uv), (av, vv)),
        ("flat", y1, u1, v1),
        ("halves", (yv, y1), (uv, u1), (vv, v1)),
    ]


def encode_h264_gop_bpyramid(width: int, height: int, *, qp: int,
                             y_coeff: int, u_coeff: int, v_coeff: int,
                             p_y_coeff: int, p_c_coeff: int,
                             cabac: bool = False) -> list[bytes]:
    """Hierarchical-B (B-pyramid) GOP fixture, decode order / POC:
    IDR flat (0), P with a uniform DC residual (8), a REFERENCE B at
    the midpoint (4, nal_ref_idc != 0 — it enters the DPB with its
    exported colocated motion field), then two non-reference Bs at 2
    and 6 whose nearest anchors are (0, 4) and (4, 8) — i.e. they
    reference the middle B.  All Bs are all-skip spatial direct, so
    the closed forms are nested bi-averages: v4 = avg(a0, a1),
    v2 = avg(a0, v4), v6 = avg(v4, a1)."""
    from .h264 import encode_h264_iframe_flat
    from .h264_inter import _encode_pslice_nal

    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("h264: dims must be positive and even")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    sps = _sps_writer(mbw, mbh, (mbw * 16 - width) // 2,
                      (mbh * 16 - height) // 2,
                      num_ref_frames=3, profile_idc=77)
    pps = _pps_writer(qp, cabac=cabac)
    idr_body = _flat_idr(width, height, qp, y_coeff, u_coeff, v_coeff,
                         cabac)
    idr_slice = next(n for n in _split_nals(idr_body)
                     if (n[0] & 0x1F) == 5)
    idr = (_nal(3, 7, sps.done()) + _nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "residual",
                           y_coeff=p_y_coeff, c_coeff=p_c_coeff,
                           poc_lsb=8, cabac=cabac),
        _encode_bslice_nal(mbw, mbh, 2, 4, "skip", ref_b=True,
                           cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 3, 2, "skip", cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 3, 6, "skip", cabac=cabac, qp=qp),
    ]


def encode_h264_gop_tdirect(width: int, height: int, *, qp: int,
                            y_coeff: int, u_coeff: int, v_coeff: int,
                            p_y_coeff: int, p_c_coeff: int,
                            col_mv: tuple[int, int] = (16, 8),
                            cabac: bool = False) -> list[bytes]:
    """Temporal-direct GOP fixture (decode order / POC): IDR flat
    (0), P with uniform motion `col_mv` plus a DC residual (4 — the
    colocated picture, so its motion field feeds the §8.4.1.2.3
    scaling), and an all-skip TEMPORAL-direct B at POC 2 whose
    derived motion is the exact POC midpoint (DistScaleFactor 128:
    mvL0 = col_mv/2, mvL1 = -col_mv/2).  Over the flat anchors MC is
    an identity, so the closed form is the plain bi-average —
    tests/test_h264_bslice.py pins the scaling itself on PCM
    gradients."""
    from .h264 import encode_h264_iframe_flat
    from .h264_inter import _encode_pslice_nal

    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("h264: dims must be positive and even")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    sps = _sps_writer(mbw, mbh, (mbw * 16 - width) // 2,
                      (mbh * 16 - height) // 2,
                      num_ref_frames=2, profile_idc=77)
    pps = _pps_writer(qp, cabac=cabac)
    idr_body = _flat_idr(width, height, qp, y_coeff, u_coeff, v_coeff,
                         cabac)
    idr_slice = next(n for n in _split_nals(idr_body)
                     if (n[0] & 0x1F) == 5)
    idr = (_nal(3, 7, sps.done()) + _nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "residual", mv=col_mv,
                           y_coeff=p_y_coeff, c_coeff=p_c_coeff,
                           poc_lsb=4, cabac=cabac),
        _encode_bslice_nal(mbw, mbh, 2, 2, "skip", spatial=False,
                           cabac=cabac, qp=qp),
    ]


def encode_h264_gop_wp(width: int, height: int, *, qp: int,
                       y_coeff: int, u_coeff: int, v_coeff: int,
                       wy: int, oy: int, wu: int, ou: int,
                       wv: int, ov: int,
                       cabac: bool = False) -> list[bytes]:
    """Weighted-prediction GOP fixture (h264_gop_wp_expected): the PPS
    sets weighted_pred_flag (explicit P weighting) AND
    weighted_bipred_idc == 2 (implicit B weighting).  Frames in
    decode order / POC: IDR flat (0); an all-skip P at POC 6 whose
    P_Skip predictions run through the slice's explicit weight/offset
    pairs (logWD 5 both planes); two all-skip B pictures at POC 2 and
    4 whose zero-motion bi-predictions use the POC-derived implicit
    weights — (43, 21) and (22, 42), pinned by
    test_implicit_weight_constants."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("h264: dims must be positive and even")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    from .h264 import encode_h264_iframe_flat

    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    crop_r = (mbw * 16 - width) // 2
    crop_b = (mbh * 16 - height) // 2
    sps = _sps_writer(mbw, mbh, crop_r, crop_b,
                      num_ref_frames=2, profile_idc=77)
    pps = _pps_writer(qp, weighted_pred=True, weighted_bipred=2,
                      cabac=cabac)
    idr_body = _flat_idr(width, height, qp, y_coeff, u_coeff, v_coeff,
                         cabac)
    idr_slice = next(n for n in _split_nals(idr_body)
                     if (n[0] & 0x1F) == 5)
    idr = (_nal(3, 7, sps.done()) + _nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    from .h264_inter import _encode_pslice_nal

    return [
        idr,
        _encode_pslice_nal(mbw, mbh, qp, 1, "skip", poc_lsb=6,
                           weights=(5, 5, (wy, oy), [(wu, ou), (wv, ov)]),
                           cabac=cabac),
        _encode_bslice_nal(mbw, mbh, 2, 2, "skip", cabac=cabac, qp=qp),
        _encode_bslice_nal(mbw, mbh, 2, 4, "skip", cabac=cabac, qp=qp),
    ]


def h264_gop_wp_expected(qp: int, y_coeff: int, u_coeff: int,
                         v_coeff: int, wy: int, oy: int, wu: int,
                         ou: int, wv: int, ov: int):
    """Closed-form per-frame uniform plane values for
    encode_h264_gop_wp: frame 1 applies the §8.4.2.3.2 explicit
    weighting to the flat IDR values (logWD 5:
    clip(((v*w + 16) >> 5) + o)); frames 2-3 are the implicit
    bi-predictions clip((w0*a0 + w1*a1 + 32) >> 6) at the POC-derived
    weights for POC 2 and 4 between anchors at 0 and 6."""
    from .h264 import h264_flat_expected

    a0 = h264_flat_expected(qp, y_coeff, u_coeff, v_coeff)
    a1 = tuple(_clip255(((v * w + 16) >> 5) + o)
               for v, w, o in zip(a0, (wy, wu, wv), (oy, ou, ov)))
    out = [("flat",) + a0, ("flat",) + a1]
    for poc in (2, 4):
        w0, w1 = _implicit_weights(poc, 0, 6)
        out.append(("flat",) + tuple(
            _clip255((w0 * v0 + w1 * v1 + 32) >> 6)
            for v0, v1 in zip(a0, a1)))
    return out
