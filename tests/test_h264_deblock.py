"""H.264 §8.7 in-loop deblocking filter tests.

The production filter (`llm/h264.py:_deblock_frame`) is pinned two
independent ways, per the repo's arithmetic-table discipline:

1. `_ref_deblock` below is a SEPARATE transcription of the §8.7
   equations — written functionally over extracted 8-sample lines,
   the opposite decomposition from production's in-place strided
   writes — and the two are compared byte-exactly over randomized 2D
   frames (cascades across MB rows/columns, chroma, I_PCM qP=0 rows,
   nonzero slice alpha/beta offsets).
2. The stepped-frame fixtures decode end-to-end to
   `h264_steps_expected`'s integer closed form, which was derived on
   paper from the same equations (strong/weak/no-filter regimes plus
   the internal bS=3 cascade).

Reference-repo analog: none (opaque blobs only,
/root/reference/src/common/lake.py:59-71); everything derives from
the public ITU-T H.264 spec.
"""

from __future__ import annotations

import pytest

from data_lake_skyfit_spark.llm.h264 import (
    _DB_ALPHA,
    _DB_BETA,
    _DB_TC0,
    _chroma_qp,
    _deblock_frame,
    decode_h264_iframe,
    encode_h264_iframe_flat,
    encode_h264_iframe_steps,
    h264_flat_expected,
    h264_steps_expected,
)


# ---------------------------------------------------------------------------
# Independent §8.7 reference transcription (line-extraction style)


def _clip3(lo, hi, v):
    return max(lo, min(hi, v))


def _clip1(v):
    return max(0, min(255, v))


def _ref_filter_line(line, bs, alpha, beta, tc0, chroma):
    """line = [p3, p2, p1, p0, q0, q1, q2, q3] → filtered copy.
    Direct transcription of §8.7.2.3/.4 equations."""
    p3, p2, p1, p0, q0, q1, q2, q3 = line
    out = list(line)
    if bs == 0 or alpha == 0:
        return out
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta and abs(q1 - q0) < beta):
        return out
    ap = abs(p2 - p0)
    aq = abs(q2 - q0)
    if bs < 4:
        if chroma:
            tc = tc0 + 1
        else:
            tc = tc0 + (1 if ap < beta else 0) + (1 if aq < beta else 0)
        delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        out[3] = _clip1(p0 + delta)
        out[4] = _clip1(q0 - delta)
        if not chroma and ap < beta and tc0 > 0:
            out[2] = p1 + _clip3(
                -tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1
            )
        if not chroma and aq < beta and tc0 > 0:
            out[5] = q1 + _clip3(
                -tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1
            )
        return out
    # bS == 4
    if chroma:
        out[3] = (2 * p1 + p0 + q1 + 2) >> 2
        out[4] = (2 * q1 + q0 + p1 + 2) >> 2
        return out
    if ap < beta and abs(p0 - q0) < (alpha >> 2) + 2:
        out[3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        out[2] = (p2 + p1 + p0 + q0 + 2) >> 2
        out[1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    else:
        out[3] = (2 * p1 + p0 + q1 + 2) >> 2
    if aq < beta and abs(p0 - q0) < (alpha >> 2) + 2:
        out[4] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        out[5] = (q2 + q1 + q0 + p0 + 2) >> 2
        out[6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    else:
        out[4] = (2 * q1 + q0 + p1 + 2) >> 2
    return out


def _ref_edge(plane, q0_positions, step, bs, ia, ib, tc0, chroma):
    alpha = _DB_ALPHA[ia]
    beta = _DB_BETA[ib]
    for q0pos in q0_positions:
        idx = [q0pos + (k - 4) * step for k in range(8)]
        line = [plane[i] for i in idx]
        new = _ref_filter_line(line, bs, alpha, beta, tc0, chroma)
        for i, v in zip(idx, new):
            plane[i] = v


def _ref_deblock(y, u, v, mbw, mbh, mb_qp, cq_off, off_a, off_b):
    """Whole-picture §8.7 pass: MB raster order, vertical edges left
    to right then horizontal top to bottom, intra bS (4 MB-edge / 3
    internal), qPav with the I_PCM qP=0 values already in mb_qp."""
    W, CW = mbw * 16, mbw * 8

    def idx_pair(qp_p, qp_q):
        qav = (qp_p + qp_q + 1) >> 1
        return _clip3(0, 51, qav + off_a), _clip3(0, 51, qav + off_b)

    for mby in range(mbh):
        for mbx in range(mbw):
            qq = mb_qp[mby][mbx]
            # luma vertical
            for k in range(4):
                if k == 0 and mbx == 0:
                    continue
                bs = 4 if k == 0 else 3
                qp_p = mb_qp[mby][mbx - 1] if k == 0 else qq
                ia, ib = idx_pair(qp_p, qq)
                tc0 = _DB_TC0[2][ia] if bs == 3 else 0
                x = mbx * 16 + 4 * k
                pos = [(mby * 16 + r) * W + x for r in range(16)]
                _ref_edge(y, pos, 1, bs, ia, ib, tc0, False)
            # luma horizontal
            for k in range(4):
                if k == 0 and mby == 0:
                    continue
                bs = 4 if k == 0 else 3
                qp_p = mb_qp[mby - 1][mbx] if k == 0 else qq
                ia, ib = idx_pair(qp_p, qq)
                tc0 = _DB_TC0[2][ia] if bs == 3 else 0
                yy = mby * 16 + 4 * k
                pos = [yy * W + mbx * 16 + c for c in range(16)]
                _ref_edge(y, pos, W, bs, ia, ib, tc0, False)
            # chroma vertical then horizontal, both planes
            qcq = _chroma_qp(qq, cq_off)
            for k in range(2):
                if k == 0 and mbx == 0:
                    continue
                bs = 4 if k == 0 else 3
                qcp = (
                    _chroma_qp(mb_qp[mby][mbx - 1], cq_off) if k == 0 else qcq
                )
                qav = (qcp + qcq + 1) >> 1
                ia = _clip3(0, 51, qav + off_a)
                ib = _clip3(0, 51, qav + off_b)
                tc0 = _DB_TC0[2][ia] if bs == 3 else 0
                x = mbx * 8 + 4 * k
                pos = [(mby * 8 + r) * CW + x for r in range(8)]
                for pl in (u, v):
                    _ref_edge(pl, pos, 1, bs, ia, ib, tc0, True)
            for k in range(2):
                if k == 0 and mby == 0:
                    continue
                bs = 4 if k == 0 else 3
                qcp = (
                    _chroma_qp(mb_qp[mby - 1][mbx], cq_off) if k == 0 else qcq
                )
                qav = (qcp + qcq + 1) >> 1
                ia = _clip3(0, 51, qav + off_a)
                ib = _clip3(0, 51, qav + off_b)
                tc0 = _DB_TC0[2][ia] if bs == 3 else 0
                yy = mby * 8 + 4 * k
                pos = [yy * CW + mbx * 8 + c for c in range(8)]
                for pl in (u, v):
                    _ref_edge(pl, pos, CW, bs, ia, ib, tc0, True)


# ---------------------------------------------------------------------------
# deterministic pseudo-random plane content (no RNG state dependence)


def _prng_plane(n, seed, lo=0, hi=255):
    out = bytearray(n)
    x = seed * 2654435761 % (1 << 32)
    span = hi - lo + 1
    for i in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out[i] = lo + (x >> 8) % span
    return out


def _run_both(mbw, mbh, mb_qp, cq_off, off_a, off_b, seed):
    W, H = mbw * 16, mbh * 16
    y1 = _prng_plane(W * H, seed)
    u1 = _prng_plane(W * H // 4, seed + 1)
    v1 = _prng_plane(W * H // 4, seed + 2)
    y2, u2, v2 = map(bytearray, (y1, u1, v1))
    _deblock_frame(y1, u1, v1, mbw, mbh, mb_qp, cq_off, off_a, off_b)
    ry, ru, rv = list(y2), list(u2), list(v2)
    _ref_deblock(ry, ru, rv, mbw, mbh, mb_qp, cq_off, off_a, off_b)
    return (y1, u1, v1), (bytearray(ry), bytearray(ru), bytearray(rv))


class TestFilterParity:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_2d_frames(self, seed):
        mbw, mbh = 3, 2
        qps = [[20 + ((seed * 7 + r * 3 + c * 5) % 28) for c in range(mbw)]
               for r in range(mbh)]
        got, ref = _run_both(mbw, mbh, qps, 0, 0, 0, seed + 10)
        assert got == ref

    @pytest.mark.parametrize("off_a,off_b", [(-6, 4), (4, -6), (12, 12), (-12, -12)])
    def test_slice_offsets(self, off_a, off_b):
        qps = [[30, 38], [26, 44]]
        got, ref = _run_both(2, 2, qps, 0, off_a, off_b, 99)
        assert got == ref

    def test_chroma_qp_offset(self):
        qps = [[34, 42, 28]]
        got, ref = _run_both(3, 1, qps, 6, 0, 0, 7)
        assert got == ref

    def test_pcm_qp0_rows(self):
        # an I_PCM MB carries qP 0 for deblocking: edges against a
        # high-qp neighbor still average to a filtering index while
        # PCM-PCM edges land at alpha=0 (never filtered)
        qps = [[0, 46], [0, 0]]
        got, ref = _run_both(2, 2, qps, 0, 0, 0, 3)
        assert got == ref

    def test_smooth_content_strong_path(self):
        # low-amplitude content at high qp drives the bS=4 strong
        # branch and the bS=3 p1/q1 corrections
        mbw, mbh = 2, 2
        W, H = 32, 32
        y = _prng_plane(W * H, 5, lo=118, hi=138)
        u = _prng_plane(W * H // 4, 6, lo=120, hi=132)
        v = _prng_plane(W * H // 4, 7, lo=124, hi=130)
        qps = [[48, 50], [51, 46]]
        y2, u2, v2 = list(y), list(u), list(v)
        _deblock_frame(y, u, v, mbw, mbh, qps, 0, 0, 0)
        _ref_deblock(y2, u2, v2, mbw, mbh, qps, 0, 0, 0)
        assert (y, u, v) == (bytearray(y2), bytearray(u2), bytearray(v2))

    def test_filter_changes_something(self):
        # guard against a silently dead filter: the smooth-content
        # frame above must actually be modified
        W, H = 32, 32
        y = _prng_plane(W * H, 5, lo=100, hi=156)
        before = bytes(y)
        u = _prng_plane(W * H // 4, 6, lo=120, hi=132)
        v = _prng_plane(W * H // 4, 7, lo=124, hi=130)
        _deblock_frame(y, u, v, 2, 2, [[40, 40], [40, 40]], 0, 0, 0)
        assert bytes(y) != before


class TestTables:
    def test_alpha_beta_shape(self):
        assert len(_DB_ALPHA) == 52 and len(_DB_BETA) == 52
        assert _DB_ALPHA[:16] == (0,) * 16 and _DB_BETA[:16] == (0,) * 16
        assert _DB_ALPHA[51] == 255 and _DB_BETA[51] == 18
        assert all(a <= b for a, b in zip(_DB_ALPHA, _DB_ALPHA[1:]))
        assert all(a <= b for a, b in zip(_DB_BETA, _DB_BETA[1:]))

    def test_tc0_structure(self):
        for row in _DB_TC0:
            assert len(row) == 52
            assert row[:16] == (0,) * 16
            assert all(a <= b for a, b in zip(row, row[1:]))
        # pointwise bS ordering and published extremes
        for i in range(52):
            assert _DB_TC0[0][i] <= _DB_TC0[1][i] <= _DB_TC0[2][i]
        assert _DB_TC0[2][16] == 1  # first nonzero exactly at indexA 16
        assert _DB_TC0[2][51] == 25  # published maximum
        assert _DB_TC0[0][51] == 13 and _DB_TC0[1][51] == 17


class TestSteppedFrames:
    @pytest.mark.parametrize("qp,f", [(36, 60), (36, 150), (36, 330),
                                      (40, 150), (44, 200), (48, 60), (48, 160)])
    @pytest.mark.parametrize("horizontal", [False, True])
    def test_closed_form(self, qp, f, horizontal):
        for n in (2, 4, 5):
            s = encode_h264_iframe_steps(
                n, horizontal=horizontal, qp=qp, base_coeff=(qp % 5) - 2,
                step_coeff=f, u_coeff=11, v_coeff=4,
            )
            w, h, y, u, v = decode_h264_iframe(s)
            assert (w, h) == ((16, 16 * n) if horizontal else (16 * n, 16))
            exp = h264_steps_expected(n, qp, (qp % 5) - 2, f, 11, 4)
            assert sum(y) + sum(u) + sum(v) == exp["pixel_sum"]
            assert set(u) == {exp["u"]} and set(v) == {exp["v"]}

    def test_deblock_actually_fired_per_pixel(self):
        # strong-regime steps at qp 40 (delta 15) move p0/p1/p2 around
        # every MB edge even though symmetric rounding cancels the SUM
        # delta; pin the full decoded plane against the independent
        # reference filter applied to the per-MB flat pre-filter frame
        n, qp, f = 4, 40, 60
        s = encode_h264_iframe_steps(n, qp=qp, base_coeff=0, step_coeff=f,
                                     u_coeff=3, v_coeff=5)
        w, h, y, u, v = decode_h264_iframe(s)
        exp = h264_steps_expected(n, qp, 0, f, 3, 5)
        W, H = 16 * n, 16
        pre = [exp["a"][c // 16] for _ in range(H) for c in range(W)]
        assert bytes(y) != bytes(pre)  # the filter really moved pixels
        ru = [exp["u"]] * (W * H // 4)
        rv = [exp["v"]] * (W * H // 4)
        ry = list(pre)
        _ref_deblock(ry, ru, rv, n, 1, [[qp] * n], 0, 0, 0)
        assert list(y) == ry
        assert list(u) == ru and list(v) == rv

    def test_flat_frame_filter_is_noop(self):
        # deblocking an edge between equal values must not move pixels
        s = encode_h264_iframe_steps(3, qp=40, base_coeff=4, step_coeff=0)
        w, h, y, u, v = decode_h264_iframe(s)
        assert len(set(y)) == 1

    def test_disabled_filter_regression(self):
        # idc=1 streams (the r6 fixtures) still bypass the filter
        s = encode_h264_iframe_flat(32, 32, qp=30, y_coeff=9, u_coeff=2, v_coeff=1)
        w, h, y, u, v = decode_h264_iframe(s)
        yv, uv, vv = h264_flat_expected(30, 9, 2, 1)
        assert set(y) == {yv}
