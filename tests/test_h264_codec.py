"""H.264 baseline I-frame codec tests (llm/h264.py).

No H.264 reference implementation exists in this container, so the
wire convention is pinned three ways:
  1. structural invariants of every VLC table (prefix-freeness and
     Kraft sums matching the published tables' completeness),
  2. hand-derived bit goldens — including the widely-published CAVLC
     worked example whose full coded bitstring is reproduced below
     from the §9.2 coding process step by step, and
  3. exhaustive encoder↔decoder round trips across the level /
     total_zeros / run_before space (any internal inconsistency in a
     table pair surfaces immediately).
"""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from data_lake_skyfit_spark.llm import h264 as H


def _all_vlcs():
    yield "coeff_nc0", H._COEFF_TOKEN_NC0, Fraction(32767, 32768)
    yield "coeff_nc2", H._COEFF_TOKEN_NC2, Fraction(8191, 8192)
    yield "coeff_nc4", H._COEFF_TOKEN_NC4, Fraction(1023, 1024)
    yield "coeff_chroma_dc", H._COEFF_TOKEN_CHROMA_DC, Fraction(1)
    for tc, t in H._TOTAL_ZEROS_4x4.items():
        yield f"tz4x4_{tc}", t, Fraction(511, 512) if tc == 1 else Fraction(1)
    for tc, t in H._TOTAL_ZEROS_CHROMA_DC.items():
        yield f"tzdc_{tc}", t, Fraction(1)
    for zl, t in H._RUN_BEFORE.items():
        yield f"run_{zl}", t, Fraction(2047, 2048) if zl == 7 else Fraction(1)


def test_vlc_tables_prefix_free_and_complete():
    for name, table, kraft in _all_vlcs():
        codes = list(table)
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not a.startswith(b) and not b.startswith(a), (name, a, b)
        assert sum(Fraction(1, 2 ** len(c)) for c in codes) == kraft, name


def test_exp_golomb_hand_golden():
    """ue: 0→'1', 1→'010', 2→'011', 5→'00110'; se: 1→'010', -1→'011',
    3→'00110' — straight from the §9.1 mapping."""
    bw = H._BitWriter()
    for v in (0, 1, 2, 5):
        bw.ue(v)
    for v in (1, -1, 3):
        bw.se(v)
    assert "".join(map(str, bw.bits)) == "1" "010" "011" "00110" "010" "011" "00110"
    br = H._BitReader(bw.done())
    assert [br.ue() for _ in range(4)] == [0, 1, 2, 5]
    assert [br.se() for _ in range(3)] == [1, -1, 3]


def test_cavlc_published_worked_example():
    """The classic published CAVLC example: zigzag coefficients
    [0, 3, 0, 1, -1, -1, 0, 1, 0, ...] with nC = 0.

    Hand derivation per §9.2 (TotalCoeff 5, TrailingOnes 3,
    total_zeros 3):
      coeff_token(5,3)          '0000100'
      T1 signs (hi-freq first: +1, -1, -1) '0' '1' '1'
      level +1  (suffixLen 0, code 0)      '1'
      level +3  (suffixLen 1, code 4)      '0010'
      total_zeros (tc 5, tz 3)             '111'
      run_before 1 (zerosLeft 3)           '10'
      run_before 0 (zerosLeft 2)           '1'
      run_before 0 (zerosLeft 2)           '1'
      run_before 1 (zerosLeft 2)           '01'
    = '000010001110010111101101' — the exact bitstring the published
    worked example arrives at."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    bw = H._BitWriter()
    total = H._write_cavlc_block(bw, coeffs, 0, 16)
    assert total == 5
    assert "".join(map(str, bw.bits)) == "000010001110010111101101"
    bw.u(8, 0xFF)
    br = H._BitReader(bw.done())
    got, tot = H._decode_cavlc_block(br, 0, 16)
    assert got == coeffs and tot == 5


@pytest.mark.parametrize("trial_block", range(4))
def test_cavlc_roundtrip_property(trial_block: int):
    rnd = random.Random(100 + trial_block)
    for _ in range(400):
        kind = rnd.randrange(4)
        if kind == 0:
            nc, mx = -1, 4
        elif kind == 1:
            nc, mx = rnd.choice([0, 1]), rnd.choice([15, 16])
        elif kind == 2:
            nc, mx = rnd.choice([2, 3, 4, 5, 6, 7]), rnd.choice([15, 16])
        else:
            nc, mx = rnd.choice([8, 12, 16]), 16
        coeffs = [0] * mx
        for p in rnd.sample(range(mx), rnd.randrange(0, mx + 1)):
            coeffs[p] = rnd.choice([1, 1, 2, 3, 5, 17, 200, 2000]) * rnd.choice([1, -1])
        bw = H._BitWriter()
        try:
            H._write_cavlc_block(bw, coeffs, nc, mx)
        except ValueError:
            continue  # beyond the encoder's 12-bit escape range
        bw.u(8, 0xFF)
        br = H._BitReader(bw.done())
        got, _tot = H._decode_cavlc_block(br, nc, mx)
        assert got == coeffs


def test_flat_frames_match_closed_form():
    for rid in (0, 1, 7, 23, 42, 101, 555):
        w, h = 32 + 2 * (rid % 9), 32 + 2 * (rid % 7)
        qp = (20, 28, 36, 44)[rid % 4]
        cy, cu, cv = 1 + rid % 90, 1 + rid % 40, 1 + (rid // 3) % 40
        data = H.encode_h264_iframe_flat(w, h, qp=qp, y_coeff=cy, u_coeff=cu, v_coeff=cv)
        ey, eu, ev = H.h264_flat_expected(qp, cy, cu, cv)
        mw, mh, y, u, v = H.decode_h264_iframe(data)
        assert (mw, mh) == (w, h)
        assert set(y) == {ey} and set(u) == {eu} and set(v) == {ev}


def test_ipcm_frames_roundtrip_exact():
    data = H.encode_h264_iframe_flat(34, 38, pcm_levels=(201, 17, 250))
    w, h, y, u, v = H.decode_h264_iframe(data)
    assert (w, h) == (34, 38)
    assert set(y) == {201} and set(u) == {17} and set(v) == {250}


def test_i4x4_hand_built_slice():
    """Single 16x16 MB coded I_NxN, every 4x4 mode inferred-DC
    (prev_intra4x4_pred_mode_flag = 1 throughout), cbp = 1 (luma 8x8
    block 0 coded), one DC coefficient +5 in the first 4x4 block.

    qp stays 26 (all deltas 0).  Expected: block (0,0) pixels are
    128 + ((d + 32) >> 6) with d = (5 * V[26 % 6 = 2][0]) << (26//6 - 4)
    = (5 * 13) << 0 = 65 (§8.5.12.1 qp >= 24 branch) → (65 + 32) >> 6
    = 1 → 129; every other pixel DC-predicts ripple-free from its
    already-decoded neighbours."""
    sps = H._BitWriter()
    sps.u(8, 66); sps.u(8, 0xC0); sps.u(8, 30)
    sps.ue(0); sps.ue(0); sps.ue(0); sps.ue(0)
    sps.ue(1); sps.u(1, 0)
    sps.ue(0); sps.ue(0)          # 1x1 MBs
    sps.u(1, 1); sps.u(1, 1); sps.u(1, 0); sps.u(1, 0)
    sps.rbsp_trailing()
    pps = H._BitWriter()
    pps.ue(0); pps.ue(0); pps.u(1, 0); pps.u(1, 0); pps.ue(0)
    pps.ue(0); pps.ue(0); pps.u(1, 0); pps.u(2, 0)
    pps.se(0); pps.se(0); pps.se(0)
    pps.u(1, 1); pps.u(1, 0); pps.u(1, 0)
    pps.rbsp_trailing()
    sl = H._BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(4, 0); sl.ue(0); sl.u(4, 0)
    sl.u(1, 0); sl.u(1, 0); sl.se(0); sl.ue(1)
    sl.ue(0)                       # mb_type I_NxN
    for _ in range(16):
        sl.u(1, 1)                 # use inferred mode (DC everywhere)
    sl.ue(0)                       # chroma DC
    sl.ue(H._CBP_INTRA.index(1))   # cbp = 1 → luma 8x8 #0
    sl.se(0)                       # mb_qp_delta
    blk = [5] + [0] * 15
    H._write_cavlc_block(sl, blk, 0, 16)       # block 0 (nC 0)
    for nc in (1, 1, 1):                        # blocks 1..3, all empty
        H._write_cavlc_block(sl, [0] * 16, nc, 16)
    sl.rbsp_trailing()
    data = (H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done())
            + H._nal(3, 5, sl.done()))
    w, h, y, u, v = H.decode_h264_iframe(data)
    assert (w, h) == (16, 16)
    assert set(u) == {128} and set(v) == {128}
    d = (5 * 13) << 0  # qp 26 >= 24: (c * LS) << (qp//6 - 4)
    exp = 128 + ((d + 32) >> 6)
    assert exp == 129
    blk00 = {y[r * 16 + c] for r in range(4) for c in range(4)}
    assert blk00 == {exp}
    # block (1,0): above unavailable → left-only DC over block 0's
    # right edge = exp exactly; no residual
    assert y[4] == exp


def test_decoder_rejects_malformed():
    good = H.encode_h264_iframe_flat(32, 32, qp=28, y_coeff=3, u_coeff=2, v_coeff=1)
    # the whole IDR frame is ~34 bytes (SPS@0, PPS@11, slice@19) —
    # truncate inside each NAL
    for bad in (b"", b"\x00\x00\x00\x01", good[:15], good[:25]):
        with pytest.raises(ValueError):
            H.decode_h264_iframe(bad)
    # deblocking-enabled stream (idc=0 + offsets) decodes since r7;
    # a flat frame is a filter no-op, so planes match the idc=1 form
    sl = H._BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(4, 0); sl.ue(0); sl.u(4, 0)
    sl.u(1, 0); sl.u(1, 0); sl.se(0)
    sl.ue(0)  # disable_deblocking_filter_idc = 0: filter ON
    sl.se(0); sl.se(0)  # alpha/beta offsets
    for mb in range(4):
        sl.ue(3); sl.ue(0); sl.se(0)
        H._write_cavlc_block(sl, [0] * 16, 0, 16)
    sl.rbsp_trailing()
    sps_pps = good[: good.rindex(b"\x00\x00\x00\x01")]
    w2, h2, y2, u2, v2 = H.decode_h264_iframe(sps_pps + H._nal(3, 5, sl.done()))
    assert (w2, h2) == (32, 32) and set(y2) == {128}
    # idc out of range must still refuse
    sl = H._BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(4, 0); sl.ue(0); sl.u(4, 0)
    sl.u(1, 0); sl.u(1, 0); sl.se(0)
    sl.ue(3)  # bad disable_deblocking_filter_idc
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="deblocking"):
        H.decode_h264_iframe(sps_pps + H._nal(3, 5, sl.done()))
    # random corruption: decode-or-ValueError, never hang or IndexError
    for k in range(8, len(good), 11):
        mutated = bytearray(good)
        mutated[k] ^= 0x3C
        try:
            H.decode_h264_iframe(bytes(mutated))
        except ValueError:
            pass


def test_avc_mp4_video_pixels_contract():
    from data_lake_skyfit_spark.llm.multimodal import (
        _mp4_video_pixels,
        encode_mp4_frames,
    )

    frames = [
        H.encode_h264_iframe_flat(32, 32, qp=28, y_coeff=1 + f, u_coeff=2, v_coeff=3)
        for f in range(3)
    ]
    data = encode_mp4_frames(frames, codec="avc1")
    rows = _mp4_video_pixels(data, 400)
    assert len(rows) == 3
    for f, (idx, ts, w, h, ch, psum, psq) in enumerate(rows):
        ey, eu, ev = H.h264_flat_expected(28, 1 + f, 2, 3)
        assert (idx, ts, w, h, ch) == (f, f * 500, 32, 32)[0:4] + (3,)
        assert psum == 32 * 32 * ey + 16 * 16 * (eu + ev)
        assert psq == 32 * 32 * ey * ey + 16 * 16 * (eu * eu + ev * ev)


def test_length_prefixed_avcc_samples_decode_identically():
    """MP4 avc1 samples in the wild are 4-byte-length-prefixed, not
    Annex-B; _split_nals handles both framings."""
    import struct as _struct

    annexb = H.encode_h264_iframe_flat(32, 32, qp=36, y_coeff=9, u_coeff=4, v_coeff=6)
    nals = H._split_nals(annexb)
    assert len(nals) == 3  # SPS, PPS, IDR slice
    avcc = b"".join(_struct.pack(">I", len(n)) + n for n in nals)
    assert H.decode_h264_iframe(avcc) == H.decode_h264_iframe(annexb)
