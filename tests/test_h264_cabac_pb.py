"""H.264 CABAC P/B entropy tier (llm/h264_cabac_pb) — the r7
VERDICT's #1 directive.

Pinning strategy (no AVC reference exists in-container, re-verified
r8 with a byte-pattern sweep of ~270k system files):

1. CROSS-ENTROPY EQUIVALENCE — the same GOP descriptors through the
   CAVLC and CABAC encoders must reconstruct byte-identical planes,
   for every GOP family (P steps, multiref, IBP, B-pyramid,
   temporal direct, weighted).  The entropy layer cannot move a
   sample, so any drift between the two slice-decode paths or any
   encode/decode asymmetry surfaces here.
2. CLOSED FORMS — the CABAC GOPs are additionally checked against
   the entropy-independent integer closed forms the CAVLC tier is
   pinned to.
3. SYNTAX ROUND-TRIP — every P/B binarization (mb_type trees,
   sub_mb_type, unary ref_idx, UEG3 mvd, CBP bins, qp_delta)
   round-trips through the writer/reader pair over randomized
   element sequences, exercising the neighbor-context state.
4. REJECTIONS — cabac_init_idc 1/2 and I_PCM-in-CABAC reject
   cleanly (reject-never-approximate).
"""

from __future__ import annotations

import random

import pytest

from data_lake_skyfit_spark.llm import h264_bslice as hb
from data_lake_skyfit_spark.llm import h264_inter as hi
from data_lake_skyfit_spark.llm.h264 import _BitReader, _BitWriter
from data_lake_skyfit_spark.llm.h264_cabac_pb import (
    _CabacInterReader,
    _CabacInterWriter,
    _INIT_PB0,
)


def _decode_all(chunks):
    return hb.decode_h264_gop_ipb(b"".join(chunks))


# ---------------------------------------------------------------- 1+2


def test_p_gop_cross_entropy_equivalence_and_closed_form():
    for qp in (20, 30, 44):
        kw = dict(qp=qp, y_coeff=120, u_coeff=60, v_coeff=-40,
                  mv=(5, 7), p_y_coeff=90, p_c_coeff=70)
        wa, ha, fa, _ = _decode_all(
            hi.encode_h264_gop_steps(48, 32, **kw))
        wb, hbm, fb, _ = _decode_all(
            hi.encode_h264_gop_steps(48, 32, cabac=True, **kw))
        assert (wa, ha) == (wb, hbm)
        assert fa == fb  # byte-identical planes, all frames
        exp = hi.h264_gop_expected(qp, 120, 60, -40, 90, 70)
        for (ey, eu, ev), (y, u, v) in zip(exp, fb):
            assert set(y) == {ey} and set(u) == {eu} and set(v) == {ev}


def test_multiref_gop_cross_entropy_equivalence():
    kw = dict(qp=28, y_coeff=9, u_coeff=5, v_coeff=7,
              p_y_coeff=3, p_c_coeff=2)
    _, _, fa, pa = _decode_all(hi.encode_h264_gop_multiref(48, 32, **kw))
    _, _, fb, pb = _decode_all(
        hi.encode_h264_gop_multiref(48, 32, cabac=True, **kw))
    assert pa == pb == [0, 2, 4]
    assert fa == fb


def test_ibp_gop_cross_entropy_equivalence_and_closed_form():
    for qp in (24, 36):
        kw = dict(qp=qp, y_coeff=120, u_coeff=60, v_coeff=-40,
                  p_y_coeff=90, p_c_coeff=70, b_y_coeff=45, b_c_coeff=33)
        _, _, fa, pa = _decode_all(hb.encode_h264_gop_b(48, 32, **kw))
        _, _, fb, pb = _decode_all(
            hb.encode_h264_gop_b(48, 32, cabac=True, **kw))
        assert pa == pb
        assert fa == fb
        exp = hb.h264_gop_b_expected(qp, 120, 60, -40, 90, 70, 45, 33)
        for e, (y, u, v) in zip(exp, fb):
            if e[0] == "flat":
                assert set(y) == {e[1]} and set(u) == {e[2]} \
                    and set(v) == {e[3]}


def test_bpyramid_tdirect_wp_cross_entropy_equivalence():
    kw = dict(qp=28, y_coeff=100, u_coeff=50, v_coeff=-30,
              p_y_coeff=80, p_c_coeff=60)
    for enc in (hb.encode_h264_gop_bpyramid, hb.encode_h264_gop_tdirect):
        _, _, fa, pa = _decode_all(enc(48, 32, **kw))
        _, _, fb, pb = _decode_all(enc(48, 32, cabac=True, **kw))
        assert pa == pb and fa == fb, enc.__name__
    wkw = dict(qp=28, y_coeff=100, u_coeff=50, v_coeff=-30,
               wy=40, oy=5, wu=30, ou=-3, wv=34, ov=2)
    _, _, fa, pa = _decode_all(hb.encode_h264_gop_wp(48, 32, **wkw))
    _, _, fb, pb = _decode_all(hb.encode_h264_gop_wp(48, 32, cabac=True,
                                                     **wkw))
    assert pa == pb and fa == fb


def test_mvd_ueg3_suffix_path():
    # |mvd| >= 9 exits the context-coded prefix into the bypass EG3
    # suffix; constant planes make the huge-motion MC an identity
    # (edge clamping), so the closed form still holds
    for mv in ((37, -202), (999, 3)):
        kw = dict(qp=30, y_coeff=120, u_coeff=60, v_coeff=-40,
                  mv=mv, p_y_coeff=0, p_c_coeff=0)
        _, _, fa, _ = _decode_all(hi.encode_h264_gop_steps(48, 32, **kw))
        _, _, fb, _ = _decode_all(
            hi.encode_h264_gop_steps(48, 32, cabac=True, **kw))
        assert fa == fb


# ------------------------------------------------------------------ 3


def _wr_rd_pair(mbw=4, mbh=3, qp=30, is_b=False):
    sl = _BitWriter()
    sl.u(8, 0xA5)  # pre-CABAC filler so alignment is non-trivial
    sl.u(3, 5)
    wr = _CabacInterWriter(sl, mbw, mbh, qp, is_b=is_b)
    return sl, wr


class _FakeSt:
    def __init__(self, mbw, mbh):
        self.mbw, self.mbh = mbw, mbh
        self.nz_luma = [[0] * (mbw * 4) for _ in range(mbh * 4)]
        self.nz_chroma = [[[0] * (mbw * 2) for _ in range(mbh * 2)]
                          for _ in range(2)]


def _reader_for(sl, mbw=4, mbh=3, qp=30, is_b=False):
    br = _BitReader(sl.done())
    br.u(8)
    br.u(3)
    return _CabacInterReader(br, _FakeSt(mbw, mbh), qp, is_b=is_b)


def test_syntax_round_trip_p_elements():
    rng = random.Random(7)
    mbw, mbh = 4, 3
    script = []
    sl, wr = _wr_rd_pair(mbw, mbh, qp=26)
    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        ops = []
        if rng.random() < 0.3:
            wr.skip_mb(mbx, mby)
            script.append((mbx, mby, "skip", None))
            continue
        wr.coded_mb(mbx, mby)
        mt = rng.choice([0, 1, 2, 3])
        wr.mb_type_p(mbx, mby, mt)
        ops.append(("mt", mt))
        if mt == 3:
            subs = [rng.randrange(4) for _ in range(4)]
            for s in subs:
                wr.sub_mb_type_p(s)
            ops.append(("subs", subs))
        ridx = rng.randrange(4)
        wr.ref_idx(0, mbx * 4, mby * 4, 4, 4, 4, ridx)
        ops.append(("ref", ridx))
        mvd = (rng.randrange(-300, 300), rng.randrange(-300, 300))
        wr.mvd(0, mbx * 4, mby * 4, 4, 4, mvd[0], mvd[1])
        ops.append(("mvd", mvd))
        cl, cc = rng.randrange(16), rng.randrange(3)
        wr.cbp(mbx, mby, False, cl, cc)
        ops.append(("cbp", (cl, cc)))
        if cl or cc:
            d = rng.randrange(-26, 26)
            wr.qp_delta(d)
            ops.append(("qpd", d))
        else:
            wr.note_no_qp_delta()
        wr.end_mb()
        script.append((mbx, mby, "coded", ops))
    wr.finish()

    rd = _reader_for(sl, mbw, mbh, qp=26)
    for mbx, mby, kind, ops in script:
        got_skip = rd.skip_next(mbx, mby, 99)
        if kind == "skip":
            assert got_skip
            rd.end_mb(mbx, mby, False) if (mbx, mby) != (
                mbw - 1, mbh - 1) else rd.end_mb(mbx, mby, True)
            continue
        assert not got_skip
        for op, val in ops:
            if op == "mt":
                assert rd.mb_type_p(mbx, mby) == val
            elif op == "subs":
                assert [rd.sub_mb_type_p() for _ in range(4)] == val
            elif op == "ref":
                assert rd.ref_idx(0, mbx * 4, mby * 4, 4, 4, 4) == val
            elif op == "mvd":
                assert rd.mvd(0, mbx * 4, mby * 4, 4, 4) == val
            elif op == "cbp":
                assert rd.cbp(mbx, mby, False) == val
            elif op == "qpd":
                assert rd.qp_delta() == val
        if not any(op == "qpd" for op, _ in ops):
            rd.note_no_qp_delta()
        last = (mbx, mby) == (mbw - 1, mbh - 1)
        rd.end_mb(mbx, mby, last)


def test_syntax_round_trip_b_and_intra_elements():
    rng = random.Random(11)
    mbw, mbh = 4, 3
    script = []
    sl, wr = _wr_rd_pair(mbw, mbh, qp=34, is_b=True)
    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        ops = []
        wr.coded_mb(mbx, mby)
        mt = rng.choice([0, 1, 2, 3, 5, 8, 11, 14, 17, 20, 21, 22,
                         23, 24, 29, 36, 47])
        wr.mb_type_b(mbx, mby, mt)
        ops.append(("mt", mt))
        if mt == 22:
            subs = [rng.randrange(13) for _ in range(4)]
            for s in subs:
                wr.sub_mb_type_b(s)
            ops.append(("subs", subs))
        elif mt >= 23:  # intra suffix landed; exercise intra syntax
            if mt == 23:  # I_NxN: 16 pred modes
                modes = [(rng.randrange(9), rng.randrange(9))
                         for _ in range(16)]
                for pred, mode in modes:
                    wr.intra4_mode(pred, mode if mode != pred else pred)
                ops.append(("i4", modes))
            cm = rng.randrange(4)
            wr.chroma_pred(mbx, mby, cm)
            ops.append(("cm", cm))
        elif mt >= 1:
            for lst in (0, 1):
                mvd = (rng.randrange(-40, 40), rng.randrange(-40, 40))
                wr.mvd(lst, mbx * 4, mby * 4, 4, 4, mvd[0], mvd[1])
                ops.append((f"mvd{lst}", mvd))
        wr.end_mb()
        script.append((mbx, mby, ops))
    wr.finish()

    rd = _reader_for(sl, mbw, mbh, qp=34, is_b=True)
    for mbx, mby, ops in script:
        assert not rd.skip_next(mbx, mby, 99)
        for op, val in ops:
            if op == "mt":
                assert rd.mb_type_b(mbx, mby) == val
            elif op == "subs":
                assert [rd.sub_mb_type_b() for _ in range(4)] == val
            elif op == "i4":
                for pred, mode in val:
                    want = mode if mode != pred else pred
                    assert rd.intra4_mode(pred) == want
            elif op == "cm":
                assert rd.chroma_pred(mbx, mby) == val
            elif op.startswith("mvd"):
                lst = int(op[3])
                assert rd.mvd(lst, mbx * 4, mby * 4, 4, 4) == val
        last = (mbx, mby) == (mbw - 1, mbh - 1)
        rd.end_mb(mbx, mby, last)


def test_init_table_structure():
    # every P/B-reachable context 11..275 is covered, pre-clip values
    # land in the engine's legal range at every slice QP
    from data_lake_skyfit_spark.llm.h264_cabac_pb import _init_contexts_pb

    assert set(_INIT_PB0) == set(range(11, 276))
    for qp in (0, 26, 51):
        states = _init_contexts_pb(qp)
        assert len(states) == 276
        for ps, mps in states:
            assert 0 <= ps <= 62 and mps in (0, 1)


# ------------------------------------------------------------------ 4


def test_cabac_init_idc_nonzero_rejects():
    chunks = hi.encode_h264_gop_steps(
        48, 32, qp=30, y_coeff=1, u_coeff=1, v_coeff=1, mv=(0, 0),
        p_y_coeff=0, p_c_coeff=0, cabac=True)
    # patch the P slice's cabac_init_idc ue(0) ('1') to ue(1) ('010'):
    # regenerate the slice with idc=1 by bit surgery is brittle —
    # instead drive the decoder contract directly
    from data_lake_skyfit_spark.llm.h264 import (_parse_pps, _parse_sps,
                                                 _split_nals,
                                                 _strip_emulation)
    nals = [n for n in _split_nals(b"".join(chunks))]
    sps = pps = None
    for n in nals:
        t = n[0] & 0x1F
        if t == 7:
            sps = _parse_sps(_strip_emulation(n[1:]))
        elif t == 8:
            pps = _parse_pps(_strip_emulation(n[1:]))
    p_slice = next(n for n in nals if (n[0] & 0x1F) == 1)
    rbsp = _strip_emulation(p_slice[1:])
    # rebuild the header with idc=1: copy fields via a bit rewrite
    br = _BitReader(rbsp)
    w = _BitWriter()
    w.ue(br.ue())        # first_mb
    w.ue(br.ue())        # slice_type
    w.ue(br.ue())        # pps id
    w.u(4, br.u(4))      # frame_num
    w.u(4, br.u(4))      # poc lsb
    w.u(1, br.u(1))      # override flag
    w.u(1, br.u(1))      # list mod flag
    w.u(1, br.u(1))      # marking flag
    assert br.ue() == 0  # original cabac_init_idc
    w.ue(1)              # patched to 1
    w.se(br.se())        # qp delta
    w.ue(br.ue())        # deblock idc
    # tail: the CABAC payload is byte-aligned after alignment ones —
    # any tail suffices, the reject fires before engine init completes
    w.u(1, 1)
    while len(w.bits) & 7:
        w.u(1, 1)
    w.bits.extend([0] * 16)
    patched = w.done()
    with pytest.raises(ValueError, match="cabac_init_idc"):
        hi._decode_pslice(patched, 1, 2, sps, pps,
                          (bytes(48 * 32 * 16 // 16), bytes(384),
                           bytes(384)))


def test_pcm_in_cabac_p_slice_rejects():
    sl, wr = _wr_rd_pair(2, 1, qp=30)
    wr.coded_mb(0, 0)
    with pytest.raises(ValueError, match="I_PCM"):
        wr.mb_type_p(0, 0, 5 + 25)


def test_p8x8ref0_has_no_cabac_binarization():
    sl, wr = _wr_rd_pair(2, 1, qp=30)
    wr.coded_mb(0, 0)
    with pytest.raises(ValueError, match="P_8x8ref0"):
        wr.mb_type_p(0, 0, 4)
