"""H.264 High-profile 8x8 transform tier (r8 — VERDICT r7 #3).

Pins (no AVC reference exists in-container):
* closed-form flat fixtures across both §8.5.13.2 dequant branches
  (the whole CAVLC High pipeline: SPS/PPS extensions, the
  transform_size_8x8_flag, interleaved 4x4 CAVLC, 8x8 dequant/IDCT,
  8x8 DC prediction);
* per-mode prediction provenance against an INDEPENDENT in-test
  transcription of §8.3.2 (the r7 deblock discipline), fed by I_PCM
  neighbour macroblocks;
* the generated 8x8 zigzag against the published Table 8-8 prefix;
* a hand-built P slice exercising the inter 8x8 residual path;
* deblock: 8x8-transform MBs keep their non-transform internal
  edges unfiltered;
* rejection posture: CABAC + transform_8x8 PPSes refuse cleanly.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_lake_skyfit_spark.llm import h264 as H
from data_lake_skyfit_spark.llm.h264 import (
    _ZIGZAG_8x8,
    decode_h264_iframe,
    encode_h264_iframe_i8,
    h264_i8_flat_expected,
)


def test_zigzag8x8_matches_published_table_prefix():
    assert _ZIGZAG_8x8[:16] == [0, 1, 8, 16, 9, 2, 3, 10,
                                17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(_ZIGZAG_8x8) == list(range(64))
    assert _ZIGZAG_8x8[-3:] == [55, 62, 63]


@pytest.mark.parametrize("qp", [0, 12, 20, 28, 35, 36, 44, 51])
def test_i8_flat_closed_form_qp_sweep(qp):
    for coeffs in ((7, 5, 3), (-9, 11, -2), (1, 1, 1)):
        data = encode_h264_iframe_i8(48, 32, qp=qp, y_coeff=coeffs[0],
                                     u_coeff=coeffs[1], v_coeff=coeffs[2])
        w, h, y, u, v = decode_h264_iframe(data)
        yv, uv, vv = h264_i8_flat_expected(qp, *coeffs)
        assert (w, h) == (48, 32)
        assert set(y) == {yv}
        assert set(u) == {uv} and set(v) == {vv}


# ---------------------------------------------------------------------------
# independent §8.3.2 transcription (kept deliberately separate in
# style and data flow from llm/h264._pred_luma8)


def _ref_filter(above16, left8, corner, have_a, have_l, have_c):
    fa = fl = fc = None
    if have_a:
        fa = np.empty(16, np.int64)
        src = above16.astype(np.int64)
        if have_c:
            fa[0] = (corner + 2 * src[0] + src[1] + 2) >> 2
        else:
            fa[0] = (3 * src[0] + src[1] + 2) >> 2
        for i in range(1, 15):
            fa[i] = (src[i - 1] + 2 * src[i] + src[i + 1] + 2) >> 2
        fa[15] = (src[14] + 3 * src[15] + 2) >> 2
    if have_c:
        if have_a and have_l:
            fc = (int(above16[0]) + 2 * corner + int(left8[0]) + 2) >> 2
        elif have_a:
            fc = (3 * corner + int(above16[0]) + 2) >> 2
        else:
            fc = (3 * corner + int(left8[0]) + 2) >> 2
    if have_l:
        fl = np.empty(8, np.int64)
        src = left8.astype(np.int64)
        if have_c:
            fl[0] = (corner + 2 * src[0] + src[1] + 2) >> 2
        else:
            fl[0] = (3 * src[0] + src[1] + 2) >> 2
        for i in range(1, 7):
            fl[i] = (src[i - 1] + 2 * src[i] + src[i + 1] + 2) >> 2
        fl[7] = (src[6] + 3 * src[7] + 2) >> 2
    return fa, fl, fc


def _spec_pred8(mode, fa, fl, fc):
    out = np.zeros((8, 8), np.int64)
    if mode == 0:
        out[:, :] = fa[:8]
    elif mode == 1:
        out[:, :] = fl.reshape(8, 1)
    elif mode == 2:
        if fa is not None and fl is not None:
            out[:, :] = (int(fa[:8].sum()) + int(fl.sum()) + 8) >> 4
        elif fa is not None:
            out[:, :] = (int(fa[:8].sum()) + 4) >> 3
        elif fl is not None:
            out[:, :] = (int(fl.sum()) + 4) >> 3
        else:
            out[:, :] = 128
    elif mode == 3:
        for y in range(8):
            for x in range(8):
                if x == y == 7:
                    out[y, x] = (fa[14] + 3 * fa[15] + 2) >> 2
                else:
                    out[y, x] = (fa[x + y] + 2 * fa[x + y + 1]
                                 + fa[x + y + 2] + 2) >> 2
    elif mode == 4:
        def a_of(i):
            return fc if i < 0 else fa[i]

        def l_of(i):
            return fc if i < 0 else fl[i]

        for y in range(8):
            for x in range(8):
                if x > y:
                    out[y, x] = (a_of(x - y - 2) + 2 * a_of(x - y - 1)
                                 + fa[x - y] + 2) >> 2
                elif x < y:
                    out[y, x] = (l_of(y - x - 2) + 2 * l_of(y - x - 1)
                                 + fl[y - x] + 2) >> 2
                else:
                    out[y, x] = (fa[0] + 2 * fc + fl[0] + 2) >> 2
    elif mode == 5:
        def a_of(i):
            return fc if i < 0 else fa[i]

        for y in range(8):
            for x in range(8):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    k = x - (y >> 1)
                    out[y, x] = (a_of(k - 1) + fa[k] + 1) >> 1
                elif z > 0:
                    k = x - (y >> 1)
                    out[y, x] = (a_of(k - 2) + 2 * a_of(k - 1)
                                 + fa[k] + 2) >> 2
                elif z == -1:
                    out[y, x] = (fl[0] + 2 * fc + fa[0] + 2) >> 2
                else:
                    k = y - 2 * x
                    third = fc if k - 3 < 0 else fl[k - 3]
                    out[y, x] = (fl[k - 1] + 2 * fl[k - 2]
                                 + third + 2) >> 2
    elif mode == 6:
        def l_of(i):
            return fc if i < 0 else fl[i]

        for y in range(8):
            for x in range(8):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    k = y - (x >> 1)
                    out[y, x] = (l_of(k - 1) + fl[k] + 1) >> 1
                elif z > 0:
                    k = y - (x >> 1)
                    out[y, x] = (l_of(k - 2) + 2 * l_of(k - 1)
                                 + fl[k] + 2) >> 2
                elif z == -1:
                    out[y, x] = (fl[0] + 2 * fc + fa[0] + 2) >> 2
                else:
                    k = x - 2 * y
                    third = fc if k - 3 < 0 else fa[k - 3]
                    out[y, x] = (fa[k - 1] + 2 * fa[k - 2]
                                 + third + 2) >> 2
    elif mode == 7:
        for y in range(8):
            for x in range(8):
                k = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (fa[k] + fa[k + 1] + 1) >> 1
                else:
                    out[y, x] = (fa[k] + 2 * fa[k + 1] + fa[k + 2] + 2) >> 2
    elif mode == 8:
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                if z < 13 and z % 2 == 0:
                    k = y + (x >> 1)
                    out[y, x] = (fl[k] + fl[k + 1] + 1) >> 1
                elif z < 13:
                    k = y + (x >> 1)
                    out[y, x] = (fl[k] + 2 * fl[k + 1] + fl[k + 2] + 2) >> 2
                elif z == 13:
                    out[y, x] = (fl[6] + 3 * fl[7] + 2) >> 2
                else:
                    out[y, x] = fl[7]
    return np.clip(out, 0, 255)


def _pcm_plus_i8_stream(pcm_y, pcm_u, pcm_v, modes8):
    """2x1-MB picture: MB0 = I_PCM (arbitrary samples), MB1 = I_8x8
    with explicit per-8x8 modes and no residual."""
    sl = H._BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(4, 0); sl.ue(0); sl.u(4, 0)
    sl.u(1, 0); sl.u(1, 0); sl.se(0)
    sl.ue(1)  # deblocking off
    # MB0: I_PCM
    sl.ue(25)
    while len(sl.bits) & 7:
        sl.u(1, 0)
    for r in range(16):
        for c in range(16):
            sl.u(8, int(pcm_y[r, c]))
    for plane in (pcm_u, pcm_v):
        for r in range(8):
            for c in range(8):
                sl.u(8, int(plane[r, c]))
    # MB1: I_NxN + transform_size_8x8
    sl.ue(0)
    sl.u(1, 1)
    for n8 in range(4):
        mode = modes8[n8]
        # predicted mode per §8.3.2.1 over the cell grid: left of
        # blocks 0/2 is MB0 (PCM, not NxN → DC substitute); above of
        # blocks 0/1 is outside the picture (→ DC); blocks 1/3 see
        # their left sibling's mode, 2/3 their upper sibling's
        ma = 2 if n8 in (0, 2) else modes8[n8 - 1]
        mbv = None if n8 in (0, 1) else modes8[n8 - 2]
        pred = 2 if mbv is None else min(ma, mbv)
        if mode == pred:
            sl.u(1, 1)
        else:
            sl.u(1, 0)
            sl.u(3, mode if mode < pred else mode - 1)
    sl.ue(0)  # chroma DC
    sl.ue(H._CBP_INTRA.index(0))  # no residual → no qp_delta
    sl.rbsp_trailing()
    sps = H._sps_writer(2, 1, 0, 0, profile_idc=100)
    pps = H._pps_writer(26, transform_8x8=True)
    return (H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done())
            + H._nal(3, 5, sl.done()))


@pytest.mark.parametrize("mode", [1, 2, 4, 5, 6, 8])
def test_i8_mode_provenance_left_border(mode):
    """MB1's 8x8 block 0 predicts mode `mode` from MB0's PCM right
    edge (modes needing 'above' are excluded: the top row has none);
    expected planes computed by the independent in-test §8.3.2
    transcription."""
    rng = np.random.default_rng(40 + mode)
    pcm_y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    pcm_u = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    pcm_v = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    if mode in (4, 5, 6):
        # both-border modes are unreachable for block 0 of the top
        # row (no above); use them on block 2 instead via DC top
        modes8 = [2, 2, mode, 2]
    else:
        modes8 = [mode, 2, 2, 2]
    data = _pcm_plus_i8_stream(pcm_y, pcm_u, pcm_v, modes8)
    w, h, y, u, v = decode_h264_iframe(data)
    assert (w, h) == (32, 16)
    got = np.frombuffer(y, np.uint8).reshape(16, 32).astype(np.int64)
    # reproduce the decode with the independent predictor, walking the
    # four 8x8s in order over the reconstructed plane
    ref = got.copy()
    ref[:, 16:] = 0
    for n8 in range(4):
        x0 = 16 + (n8 & 1) * 8
        y0 = (n8 >> 1) * 8
        have_a = y0 > 0
        have_l = True  # x0 >= 16 > 0
        have_c = have_a
        above16 = None
        if have_a:
            ar_ok = n8 == 2  # block 3's above-right crosses the MB edge
            row = ref[y0 - 1]
            a = row[x0 : x0 + 8]
            ar = row[x0 + 8 : x0 + 16] if ar_ok else np.full(8, a[7])
            above16 = np.concatenate([a, ar])
        left8 = ref[y0 : y0 + 8, x0 - 1]
        corner = int(ref[y0 - 1, x0 - 1]) if have_c else None
        fa, fl, fc = _ref_filter(above16, left8, corner,
                                 have_a, have_l, have_c)
        ref[y0 : y0 + 8, x0 : x0 + 8] = _spec_pred8(modes8[n8], fa, fl, fc)
    assert (got == ref).all(), np.argwhere(got != ref)[:5]


def test_i8_modes_v_ddl_vl_bottom_row():
    """Above-only modes (V/DDL/VL) on the bottom-row 8x8s, predicting
    from the top 8x8s' reconstructions."""
    for mode in (0, 3, 7):
        rng = np.random.default_rng(60 + mode)
        pcm_y = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        pcm_u = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        pcm_v = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        modes8 = [2, 2, mode, mode]
        data = _pcm_plus_i8_stream(pcm_y, pcm_u, pcm_v, modes8)
        w, h, y, u, v = decode_h264_iframe(data)
        got = np.frombuffer(y, np.uint8).reshape(16, 32).astype(np.int64)
        ref = got.copy()
        ref[:, 16:] = 0
        for n8 in range(4):
            x0 = 16 + (n8 & 1) * 8
            y0 = (n8 >> 1) * 8
            have_a = y0 > 0
            have_c = have_a
            above16 = None
            if have_a:
                ar_ok = n8 == 2
                row = ref[y0 - 1]
                a = row[x0 : x0 + 8]
                ar = (row[x0 + 8 : x0 + 16] if ar_ok
                      else np.full(8, a[7]))
                above16 = np.concatenate([a, ar])
            left8 = ref[y0 : y0 + 8, x0 - 1]
            corner = int(ref[y0 - 1, x0 - 1]) if have_c else None
            fa, fl, fc = _ref_filter(above16, left8, corner,
                                     have_a, True, have_c)
            ref[y0 : y0 + 8, x0 : x0 + 8] = _spec_pred8(
                modes8[n8], fa, fl, fc)
        assert (got == ref).all(), (mode, np.argwhere(got != ref)[:5])


def test_inter_8x8_transform_residual_in_p_slice():
    """Hand-built GOP: flat High-profile IDR, then a P slice whose
    single MB is P_L0_16x16 zero-motion with transform_size_8x8 and
    one DC coefficient in 8x8 block 0 — the §8.5.13.2 inter branch."""
    from data_lake_skyfit_spark.llm.h264_bslice import decode_h264_gop_ipb

    qp, c = 28, 6
    sps = H._sps_writer(1, 1, 0, 0, profile_idc=100)
    pps = H._pps_writer(qp, transform_8x8=True)
    idr_body = H.encode_h264_iframe_flat(16, 16, qp=qp, y_coeff=40,
                                         u_coeff=10, v_coeff=-10)
    idr_slice = next(n for n in H._split_nals(idr_body)
                     if (n[0] & 0x1F) == 5)
    idr = (H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done())
           + b"\x00\x00\x00\x01" + idr_slice)
    sl = H._BitWriter()
    sl.ue(0); sl.ue(5); sl.ue(0)
    sl.u(4, 1)  # frame_num
    sl.u(4, 2)  # poc lsb
    sl.u(1, 0); sl.u(1, 0); sl.u(1, 0)
    sl.se(0); sl.ue(1)
    sl.ue(0)  # mb_skip_run
    sl.ue(0)  # P_L0_16x16
    sl.se(0); sl.se(0)  # zero mvd
    from data_lake_skyfit_spark.llm.h264_inter import _CBP_INTER
    sl.ue(_CBP_INTER.index(1))  # luma 8x8 block 0
    sl.u(1, 1)  # transform_size_8x8_flag
    sl.se(0)    # mb_qp_delta
    H._write_cavlc_block(sl, [c] + [0] * 15, 0, 16)
    H._write_cavlc_block(sl, [0] * 16, 1, 16)
    H._write_cavlc_block(sl, [0] * 16, 1, 16)
    H._write_cavlc_block(sl, [0] * 16, 1, 16)
    sl.rbsp_trailing()
    data = idr + H._nal(2, 1, sl.done())
    w, h, frames, pocs = decode_h264_gop_ipb(data)
    base = H.h264_flat_expected(qp, 40, 10, -10)[0]
    yv8, _, _ = h264_i8_flat_expected(qp, c, 0, 0)
    delta = yv8 - 128
    y1 = np.frombuffer(frames[1][0], np.uint8).reshape(16, 16)
    assert set(y1[:8, :8].flatten()) == {base + delta}
    assert set(y1[8:, :].flatten()) == {base}
    assert set(y1[:8, 8:].flatten()) == {base}


def test_t8_internal_nontransform_edges_unfiltered():
    """With deblocking ON, an i8 MB's luma columns 2..5 must be
    untouched (the x=4 edge is not a transform edge; the x=0 MB edge
    reaches columns 0-2 only from the left side, and x=8 reaches
    6..9) — compare against the deblock-off decode."""
    qp, c = 40, 25
    on = encode_h264_iframe_i8(32, 32, qp=qp, y_coeff=c, u_coeff=9,
                               v_coeff=9, deblock=True)
    off = encode_h264_iframe_i8(32, 32, qp=qp, y_coeff=c, u_coeff=9,
                                v_coeff=9, deblock=False)
    _, _, y_on, _, _ = decode_h264_iframe(on)
    _, _, y_off, _, _ = decode_h264_iframe(off)
    a = np.frombuffer(y_on, np.uint8).reshape(32, 32)
    b = np.frombuffer(y_off, np.uint8).reshape(32, 32)
    for x0 in (0, 16):
        assert (a[:, x0 + 2 : x0 + 6] == b[:, x0 + 2 : x0 + 6]).all()


def test_cabac_with_transform_8x8_rejects():
    sps = H._sps_writer(2, 1, 0, 0, profile_idc=100)
    pps = H._pps_writer(28, cabac=True, transform_8x8=True)
    body = H.encode_h264_iframe_flat(32, 16, qp=28, y_coeff=1,
                                     u_coeff=1, v_coeff=1)
    idr_slice = next(n for n in H._split_nals(body)
                     if (n[0] & 0x1F) == 5)
    data = (H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done())
            + b"\x00\x00\x00\x01" + idr_slice)
    with pytest.raises(ValueError, match="8x8 transform"):
        decode_h264_iframe(data)


def test_high_profile_sps_envelope_rejections():
    # non-4:2:0 / 10-bit / scaling-matrix SPSes refuse cleanly
    def high_sps(chroma=1, bd=0, scaling=0):
        s = H._BitWriter()
        s.u(8, 100); s.u(8, 0); s.u(8, 30); s.ue(0)
        s.ue(chroma); s.ue(bd); s.ue(bd); s.u(1, 0); s.u(1, scaling)
        s.ue(0); s.ue(0); s.ue(0); s.ue(1); s.u(1, 0)
        s.ue(1); s.ue(0); s.u(1, 1); s.u(1, 1); s.u(1, 0); s.u(1, 0)
        s.rbsp_trailing()
        return s.done()

    assert H._parse_sps(high_sps())["w_mbs"] == 2
    for kw in ({"chroma": 2}, {"bd": 2}, {"scaling": 1}):
        with pytest.raises(ValueError):
            H._parse_sps(high_sps(**kw))


def test_vr_hd_corner_tap_positions():
    """§8.3.1.2.6/.7: at zVR==-2 / zHD==-2 the third filter tap is
    the CORNER p[-1,-1] — a wrapped array read stood there until r8.
    Craft a buffer where the corner differs wildly from the wrapped
    sample and check the single affected position."""
    stride = 16
    buf = bytearray(stride * 16)
    # block at (4, 4); corner at (3,3)=200, left col values, above row
    for i in range(4):
        buf[(4 + i) * stride + 3] = 10 * (i + 1)   # left l4[0..3]
        buf[3 * stride + 4 + i] = 7 * (i + 1)      # above a4[0..3]
    buf[3 * stride + 3] = 200                       # corner tl
    ref = bytearray(buf)
    H._pred_luma4(buf, stride, 4, 4, 5, 256, 256)   # VR
    # position (0,2): (l4[1] + 2*l4[0] + tl + 2) >> 2
    want = (20 + 2 * 10 + 200 + 2) >> 2
    assert buf[(4 + 2) * stride + 4] == want
    H._pred_luma4(ref, stride, 4, 4, 6, 256, 256)   # HD
    # position (2,0): (a4[1] + 2*a4[0] + tl + 2) >> 2
    want = (14 + 2 * 7 + 200 + 2) >> 2
    assert ref[4 * stride + 4 + 2] == want
