"""H.264 inter (P-frame) tier validation — llm/h264_inter.py.

No AVC reference exists in-container (re-verified r7), so the pin
contract mirrors the intra tier's: closed-form fixtures, an
INDEPENDENT in-test transcription of the §8.4.2.2.1 interpolation
compared sample-exactly on random frames (the §8.7 deblock test's
discipline), linear-ramp exactness for the 6-tap (interpolating a
linear field reproduces its midpoints exactly in integer arithmetic),
hand-built partition streams, and structural invariants for the one
spec table with no independent pin (_CBP_INTER)."""

from __future__ import annotations

import random

import pytest

from data_lake_skyfit_spark.llm import h264_inter as hi
from data_lake_skyfit_spark.llm.h264 import (
    _BitWriter,
    _nal,
    _pps_writer,
    _sps_writer,
    _write_cavlc_block,
    decode_h264_iframe,
    encode_h264_iframe_flat,
)


def _pcm_idr(width: int, height: int, yplane: bytes, uplane: bytes,
             vplane: bytes) -> bytes:
    """IDR frame carrying arbitrary planes via I_PCM macroblocks —
    the exact-sample bootstrap for MC tests (dims must be MB-aligned
    here so planes map 1:1)."""
    assert width % 16 == 0 and height % 16 == 0
    mbw, mbh = width // 16, height // 16
    sps = _sps_writer(mbw, mbh, 0, 0)
    pps = _pps_writer(28)
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(4, 0)
    sl.ue(0)
    sl.u(4, 0)
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    sl.ue(1)  # deblocking off
    cw = width // 2
    for mb in range(mbw * mbh):
        mby, mbx = divmod(mb, mbw)
        sl.ue(25)  # I_PCM
        sl.align_zero()
        for r in range(16):
            for c in range(16):
                sl.u(8, yplane[(mby * 16 + r) * width + mbx * 16 + c])
        for plane in (uplane, vplane):
            for r in range(8):
                for c in range(8):
                    sl.u(8, plane[(mby * 8 + r) * cw + mbx * 8 + c])
    sl.rbsp_trailing()
    return _nal(3, 7, sps.done()) + _nal(3, 8, pps.done()) + _nal(3, 5, sl.done())


def _ref_mc_luma(ref: bytes, W: int, H: int, px: int, py: int,
                 bw: int, bh: int, mvx: int, mvy: int) -> list[int]:
    """Independent transcription of §8.4.2.2.1: build the padded
    half-pel planes wholesale (b, h, j over the needed window), then
    pick/average per Table 8-12 — structured differently from the
    decoder's per-sample functional form."""
    fx, fy = mvx & 3, mvy & 3
    ox, oy = px + (mvx >> 2), py + (mvy >> 2)

    def E(x, y):
        return ref[min(max(y, 0), H - 1) * W + min(max(x, 0), W - 1)]

    out = []
    for r in range(bh):
        for c in range(bw):
            x, y = ox + c, oy + r
            # full six-tap surfaces around (x, y)
            bvals = {}
            for yy in range(y - 2, y + 4):
                t = (E(x - 2, yy) - 5 * E(x - 1, yy) + 20 * E(x, yy)
                     + 20 * E(x + 1, yy) - 5 * E(x + 2, yy) + E(x + 3, yy))
                bvals[yy] = t
            b0 = min(255, max(0, (bvals[y] + 16) >> 5))
            b1 = min(255, max(0, (bvals[y + 1] + 16) >> 5))
            hraw0 = (E(x, y - 2) - 5 * E(x, y - 1) + 20 * E(x, y)
                     + 20 * E(x, y + 1) - 5 * E(x, y + 2) + E(x, y + 3))
            h0 = min(255, max(0, (hraw0 + 16) >> 5))
            hraw1 = (E(x + 1, y - 2) - 5 * E(x + 1, y - 1) + 20 * E(x + 1, y)
                     + 20 * E(x + 1, y + 1) - 5 * E(x + 1, y + 2)
                     + E(x + 1, y + 3))
            h1 = min(255, max(0, (hraw1 + 16) >> 5))
            j1 = (bvals[y - 2] - 5 * bvals[y - 1] + 20 * bvals[y]
                  + 20 * bvals[y + 1] - 5 * bvals[y + 2] + bvals[y + 3])
            j0 = min(255, max(0, (j1 + 512) >> 10))
            table = {
                (0, 0): E(x, y),
                (1, 0): (E(x, y) + b0 + 1) >> 1,
                (2, 0): b0,
                (3, 0): (b0 + E(x + 1, y) + 1) >> 1,
                (0, 1): (E(x, y) + h0 + 1) >> 1,
                (1, 1): (b0 + h0 + 1) >> 1,
                (2, 1): (b0 + j0 + 1) >> 1,
                (3, 1): (b0 + h1 + 1) >> 1,
                (0, 2): h0,
                (1, 2): (h0 + j0 + 1) >> 1,
                (2, 2): j0,
                (3, 2): (j0 + h1 + 1) >> 1,
                (0, 3): (h0 + E(x, y + 1) + 1) >> 1,
                (1, 3): (b1 + h0 + 1) >> 1,
                (2, 3): (j0 + b1 + 1) >> 1,
                (3, 3): (b1 + h1 + 1) >> 1,
            }
            out.append(table[(fx, fy)])
    return out


def test_mc_luma_matches_independent_transcription():
    rnd = random.Random(0x264)
    W, H = 48, 32
    ref = bytes(rnd.randrange(256) for _ in range(W * H))
    for mvx in range(-9, 10, 1):
        for mvy in (-7, -2, 0, 1, 3, 6):
            for (px, py, bw, bh) in ((4, 4, 8, 8), (0, 0, 4, 4),
                                     (44, 28, 4, 4), (16, 8, 16, 16)):
                dst = [0] * (bw * bh)
                hi._mc_luma(ref, W, H, dst, px, py, bw, bh, mvx, mvy)
                want = _ref_mc_luma(ref, W, H, px, py, bw, bh, mvx, mvy)
                assert dst == want, (mvx, mvy, px, py, bw, bh)


def test_mc_luma_halfpel_exact_on_linear_ramp():
    """The 6-tap interpolator reproduces a linear field's midpoints
    exactly — an arithmetic identity independent of any transcription:
    conv(1,-5,20,20,-5,1) of v(x)=a+2x gives 32*(v+1), so the half-pel
    sample is exactly v+1."""
    W, H = 64, 16
    ref = bytes(10 + 2 * x for x in range(W)) * H
    dst = [0] * (8 * 4)
    # interior block, pure horizontal half-pel
    hi._mc_luma(ref, W, H, dst, 16, 4, 8, 4, 2, 0)
    for r in range(4):
        for c in range(8):
            assert dst[r * 8 + c] == 10 + 2 * (16 + c) + 1
    # quarter-pel = average of integer and half-pel neighbours
    hi._mc_luma(ref, W, H, dst, 16, 4, 8, 4, 1, 0)
    for r in range(4):
        for c in range(8):
            v = 10 + 2 * (16 + c)
            assert dst[r * 8 + c] == (v + v + 1 + 1) >> 1


def test_mc_chroma_bilinear_exact():
    rnd = random.Random(7)
    CW, CH = 24, 16
    ref = bytes(rnd.randrange(256) for _ in range(CW * CH))
    for mvx, mvy in ((0, 0), (4, 4), (-3, 5), (17, -9), (7, 7)):
        dst = [0] * 16
        hi._mc_chroma(ref, CW, CH, dst, 8, 8, 4, 4, mvx, mvy)
        fx, fy = mvx & 7, mvy & 7
        for r in range(4):
            for c in range(4):
                x, y = 8 + c + (mvx >> 3), 8 + r + (mvy >> 3)

                def E(xx, yy):
                    return ref[min(max(yy, 0), CH - 1) * CW
                               + min(max(xx, 0), CW - 1)]

                want = ((8 - fx) * (8 - fy) * E(x, y)
                        + fx * (8 - fy) * E(x + 1, y)
                        + (8 - fx) * fy * E(x, y + 1)
                        + fx * fy * E(x + 1, y + 1) + 32) >> 6
                assert dst[r * 4 + c] == want


def test_cbp_inter_is_a_permutation():
    assert sorted(hi._CBP_INTER) == list(range(48))
    # the first twelve entries are the well-known high-probability
    # inter CBPs (0 = none, 16 = chroma-DC-only first)
    assert hi._CBP_INTER[0] == 0 and hi._CBP_INTER[1] == 16


def test_gop_closed_form_all_qp_classes():
    for k in range(16):
        qp = (20, 28, 36, 44)[k % 4]
        mv = ((1, 0), (2, 1), (3, 3), (0, 2))[k % 4]
        frames = hi.encode_h264_gop_steps(
            32 + 2 * (k % 9), 32 + 2 * (k % 7), qp=qp,
            y_coeff=1 + k % 60, u_coeff=1 + k % 30, v_coeff=1 + k % 25,
            mv=mv, p_y_coeff=1 + k % 8, p_c_coeff=1 + k % 5)
        w, h, decoded = hi.decode_h264_gop(b"".join(frames))
        expected = hi.h264_gop_expected(
            qp, 1 + k % 60, 1 + k % 30, 1 + k % 25, 1 + k % 8, 1 + k % 5)
        assert len(decoded) == 4
        for (y, u, v), (ey, eu, ev) in zip(decoded, expected):
            assert set(y) == {ey} and set(u) == {eu} and set(v) == {ev}, k


def test_gop_mc_translation_of_pcm_strips():
    """A P frame with a uniform integer MV translates the reference:
    strips of distinct values move by exactly (mvx>>2, mvy>>2) with
    edge clamp — checked pixel-for-pixel against a Python shift."""
    W, H = 48, 32
    y = bytes(((x // 16) * 60 + 40) for _ in range(H) for x in range(W))
    u = bytes(((x // 8) * 50 + 30) for _ in range(H // 2) for x in range(W // 2))
    v = bytes(200 - ((x // 8) * 50) for _ in range(H // 2) for x in range(W // 2))
    idr = _pcm_idr(W, H, y, u, v)
    for mvq in ((-16 * 4, 0), (16 * 4, 0), (4 * 4, 8 * 4)):
        p = hi._encode_pslice_nal(W // 16, H // 16, 28, 1, "mv", mv=mvq)
        w, h, frames = hi.decode_h264_gop(idr + p)
        assert (w, h) == (W, H) and len(frames) == 2
        dx, dy = mvq[0] >> 2, mvq[1] >> 2
        fy, fu, fv = frames[1]
        for yy in range(H):
            for xx in range(W):
                sx = min(max(xx + dx, 0), W - 1)
                sy = min(max(yy + dy, 0), H - 1)
                assert fy[yy * W + xx] == y[sy * W + sx], (mvq, xx, yy)
        for plane, refp in ((fu, u), (fv, v)):
            for yy in range(H // 2):
                for xx in range(W // 2):
                    sx = min(max(xx + dx // 2, 0), W // 2 - 1)
                    sy = min(max(yy + dy // 2, 0), H // 2 - 1)
                    assert plane[yy * (W // 2) + xx] == refp[sy * (W // 2) + sx]


def _partition_pslice(mbw: int, mbh: int, parts_writer) -> bytes:
    """Hand-build a P slice with caller-controlled MB payloads."""
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(5)
    sl.ue(0)
    sl.u(4, 1)
    sl.u(4, 2)
    sl.u(1, 0)
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    sl.ue(1)
    parts_writer(sl)
    sl.rbsp_trailing()
    return _nal(2, 1, sl.done())


def test_gop_partition_shapes_decode():
    """16x8 / 8x16 / P_8x8 sub-partitions with per-partition MVs: each
    partition pulls its own translated region of a PCM strip frame."""
    W, H = 32, 32
    y = bytes((x * 8 + yy * 3) % 256 for yy in range(H) for x in range(W))
    u = bytes((x * 5 + yy * 7) % 256 for yy in range(H // 2) for x in range(W // 2))
    v = bytes((x * 11 + yy) % 256 for yy in range(H // 2) for x in range(W // 2))
    idr = _pcm_idr(W, H, y, u, v)
    mvs_16x8 = [(8, 0), (0, 8)]     # top / bottom, quarter-pel
    mvs_8x16 = [(-4, 4), (12, -8)]  # left / right

    def writer(sl: _BitWriter) -> None:
        grid = hi._MvGrid(2, 2)
        # MB0: 16x8
        sl.ue(0)
        sl.ue(1)
        for (pbx, pby, wb, hb, kind), mv in zip(hi._PART_LAYOUT[1], mvs_16x8):
            mvp = hi._mvp(grid, pbx, pby, wb, hb, kind)
            sl.se(mv[0] - mvp[0])
            sl.se(mv[1] - mvp[1])
            grid.fill(pbx, pby, wb, hb, mv)
        sl.ue(hi._CBP_INTER.index(0))
        # MB1: 8x16
        sl.ue(0)
        sl.ue(2)
        for (pbx, pby, wb, hb, kind), mv in zip(hi._PART_LAYOUT[2], mvs_8x16):
            mvp = hi._mvp(grid, 4 + pbx, pby, wb, hb, kind)
            sl.se(mv[0] - mvp[0])
            sl.se(mv[1] - mvp[1])
            grid.fill(4 + pbx, pby, wb, hb, mv)
        sl.ue(hi._CBP_INTER.index(0))
        # MB2: P_8x8 with sub shapes 8x8 / 8x4 / 4x8 / 4x4
        sl.ue(0)
        sl.ue(3)
        for st in (0, 1, 2, 3):
            sl.ue(st)
        subs = []
        for i8, st in enumerate((0, 1, 2, 3)):
            obx, oby = (i8 & 1) * 2, 4 + (i8 >> 1) * 2
            for j, (spx, spy, wb, hb) in enumerate(hi._SUB_LAYOUT[st]):
                mv = (4 * (i8 + 1), -4 * j)
                subs.append((obx + spx * wb, oby + spy * hb, wb, hb, mv))
        for pbx, pby, wb, hb, mv in subs:
            mvp = hi._mvp(grid, pbx, pby, wb, hb)
            sl.se(mv[0] - mvp[0])
            sl.se(mv[1] - mvp[1])
            grid.fill(pbx, pby, wb, hb, mv)
        sl.ue(hi._CBP_INTER.index(0))
        # MB3: skip (trailing run)
        sl.ue(1)

    p = _partition_pslice(2, 2, writer)
    w, h, frames = hi.decode_h264_gop(idr + p)
    assert len(frames) == 2
    fy = frames[1][0]

    def check_region(px, py, bw, bh, mv):
        dx, dy = mv[0] >> 2, mv[1] >> 2
        assert mv[0] % 4 == 0 and mv[1] % 4 == 0
        for r in range(bh):
            for c in range(bw):
                sx = min(max(px + c + dx, 0), W - 1)
                sy = min(max(py + r + dy, 0), H - 1)
                assert fy[(py + r) * W + px + c] == y[sy * W + sx], (px, py, mv)

    check_region(0, 0, 16, 8, mvs_16x8[0])
    check_region(0, 8, 16, 8, mvs_16x8[1])
    check_region(16, 0, 8, 16, mvs_8x16[0])
    check_region(24, 0, 8, 16, mvs_8x16[1])


def test_intra_mb_inside_p_slice():
    """A P slice mixing skip MBs with an Intra_16x16 MB: the intra MB
    reconstructs through the shared intra machinery with inter
    neighbors' samples feeding its prediction."""
    W, H = 32, 16
    flat = encode_h264_iframe_flat(W, H, qp=28, y_coeff=40,
                                   u_coeff=10, v_coeff=10)
    yv = decode_h264_iframe(flat)[2][0]

    def writer(sl: _BitWriter) -> None:
        sl.ue(1)       # skip MB0
        sl.ue(5 + 3)   # MB1: I_16x16, DC pred, no residual, cbp 0
        sl.ue(0)       # chroma DC pred
        sl.se(0)       # mb_qp_delta
        _write_cavlc_block(sl, [0] * 16, 1, 16)

    p = _partition_pslice(2, 1, writer)
    w, h, frames = hi.decode_h264_gop(flat + p)
    fy = frames[1][0]
    # both halves equal the flat value: skip copies it, the intra MB
    # DC-predicts it from the skip MB's reconstructed samples
    assert set(fy) == {yv}


def test_p_slice_rejections():
    W, H = 32, 16
    flat = encode_h264_iframe_flat(W, H, qp=28)
    with pytest.raises(ValueError):  # P before any reference
        hi.decode_h264_gop(
            hi._encode_pslice_nal(2, 1, 28, 1, "skip"))
    # truncated P slice raises, never hangs
    p = hi._encode_pslice_nal(2, 1, 28, 1, "residual", y_coeff=5, c_coeff=3)
    for cut in range(1, len(p), 7):
        try:
            hi.decode_h264_gop(flat + p[:cut])
        except ValueError:
            pass


def test_multiref_gop_closed_forms():
    """num_ref_idx_l0_active = 2: MBs alternating ref_idx read the
    right DPB entries (closed-form sweep, decoded through the DPB
    walker)."""
    from data_lake_skyfit_spark.llm.h264_bslice import decode_h264_gop_ipb

    for qp in (20, 36):
        chunks = hi.encode_h264_gop_multiref(
            48, 32, qp=qp, y_coeff=9, u_coeff=5, v_coeff=7,
            p_y_coeff=3, p_c_coeff=2)
        w, h, frames, pocs = decode_h264_gop_ipb(b"".join(chunks))
        assert pocs == [0, 2, 4]
        exp = hi.h264_gop_multiref_expected(qp, 9, 5, 7, 3, 2)
        _, (ya, yb), (ua, ub), (va, vb) = exp[2]
        y = frames[2][0]
        for mb in range(6):
            mby, mbx = divmod(mb, 3)
            want = ya if mb % 2 == 0 else yb
            assert y[(mby * 16 + 7) * w + mbx * 16 + 7] == want, (qp, mb)


def test_multiref_partition_provenance():
    """Per-partition ref_idx with distinct motion over two structured
    anchors: a 16x8 MB splits its halves between RefPicList0[0] (a
    shifted P picture) and RefPicList0[1] (the PCM IDR), each with
    its own MV — pixel-level provenance against Python shifts; a
    three-reference P_8x8 exercises the ue(v) te branch."""
    from data_lake_skyfit_spark.llm.h264 import (_nal as nal,
                                                 _pps_writer as ppsw,
                                                 _sps_writer as spsw)
    from data_lake_skyfit_spark.llm.h264_bslice import decode_h264_gop_ipb

    W, H = 32, 32
    y = bytes((x * 8 + yy * 3) % 256 for yy in range(H) for x in range(W))
    u = bytes((x * 5 + yy * 7) % 256
              for yy in range(H // 2) for x in range(W // 2))
    v = bytes((x * 11 + yy) % 256
              for yy in range(H // 2) for x in range(W // 2))
    # head a PCM IDR with a 3-reference main SPS
    sps = spsw(2, 2, 0, 0, num_ref_frames=3, profile_idc=77)
    pps = ppsw(28)
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(4, 0)
    sl.ue(0)
    sl.u(4, 0)
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    sl.ue(1)
    cw = W // 2
    for mb in range(4):
        mby, mbx = divmod(mb, 2)
        sl.ue(25)
        sl.align_zero()
        for r in range(16):
            for c in range(16):
                sl.u(8, y[(mby * 16 + r) * W + mbx * 16 + c])
        for plane in (u, v):
            for r in range(8):
                for c in range(8):
                    sl.u(8, plane[(mby * 8 + r) * cw + mbx * 8 + c])
    sl.rbsp_trailing()
    idr = nal(3, 7, sps.done()) + nal(3, 8, pps.done()) + nal(3, 5, sl.done())
    # P1: uniform full-pel shift of the IDR -> a distinct anchor
    p1 = hi._encode_pslice_nal(2, 2, 28, 1, "mv", mv=(16, 8), poc_lsb=2)

    def shift(px, py_, dx, dy):
        sx = min(max(px + dx, 0), W - 1)
        sy = min(max(py_ + dy, 0), H - 1)
        return y[sy * W + sx]

    # P2: MB0 = P_16x8, top half ref 0 (P1) mv (8,0), bottom half
    # ref 1 (IDR) mv (0,8); remaining MBs P_L0_16x16 ref 1 zero-mv
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(5)
    sl.ue(0)
    sl.u(4, 2)
    sl.u(4, 4)
    sl.u(1, 1)  # override
    sl.ue(1)    # num_ref_idx_l0_active = 2
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    sl.ue(1)
    grid = hi._MvGrid(2, 2)
    sl.ue(0)  # skip run
    sl.ue(1)  # P_16x8
    sl.u(1, 1 - 0)  # ref_idx part0 = 0 (te inverted bit)
    sl.u(1, 1 - 1)  # ref_idx part1 = 1
    for (pbx, pby, wb, hb, kind), ridx, mv in zip(
            hi._PART_LAYOUT[1], (0, 1), ((8, 0), (0, 8))):
        p = hi._mvp(grid, pbx, pby, wb, hb, kind, target_ref=ridx)
        sl.se(mv[0] - p[0])
        sl.se(mv[1] - p[1])
        grid.fill(pbx, pby, wb, hb,
                  mv if ridx == 0 else (mv[0], mv[1], ridx))
    sl.ue(hi._CBP_INTER.index(0))
    for mb in range(1, 4):
        mby, mbx = divmod(mb, 2)
        sl.ue(0)
        sl.ue(0)  # P_L0_16x16
        sl.u(1, 0)  # ref_idx 1
        p = hi._mvp(grid, mbx * 4, mby * 4, 4, 4, "", target_ref=1)
        sl.se(0 - p[0])
        sl.se(0 - p[1])
        grid.fill(mbx * 4, mby * 4, 4, 4, (0, 0, 1))
        sl.ue(hi._CBP_INTER.index(0))
    sl.rbsp_trailing()
    p2 = nal(2, 1, sl.done())

    w, h, frames, pocs = decode_h264_gop_ipb(idr + p1 + p2)
    assert pocs == [0, 2, 4]
    fy = frames[2][0]
    # top half of MB0: P1 (shift 4,2) then mv (8,0) -> +2 more in x
    for r in range(0, 8, 3):
        for c in range(0, 16, 5):
            assert fy[r * W + c] == shift(c, r, 4 + 2, 2), (c, r)
    # bottom half: IDR with mv (0,8) -> shift (0,2)
    for r in range(8, 16, 3):
        for c in range(0, 16, 5):
            assert fy[r * W + c] == shift(c, r, 0, 2), (c, r)
    # other MBs: IDR zero-mv copy
    assert fy[0 * W + 20] == y[20]
    assert fy[20 * W + 4] == y[20 * W + 4]

    # three-reference ue(v) branch: P3 reads each 8x8 of a P_8x8 from
    # a different list entry (list0 = [P2, P1, IDR])
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(5)
    sl.ue(0)
    sl.u(4, 3)
    sl.u(4, 6)
    sl.u(1, 1)
    sl.ue(2)  # na = 3
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    sl.ue(1)
    grid = hi._MvGrid(2, 2)
    sl.ue(0)
    sl.ue(3)  # P_8x8
    for st in (0, 0, 0, 0):
        sl.ue(st)
    for ridx in (0, 1, 2, 2):
        sl.ue(ridx)  # te == ue when na > 2
    for i8, ridx in enumerate((0, 1, 2, 2)):
        obx, oby = (i8 & 1) * 2, (i8 >> 1) * 2
        p = hi._mvp(grid, obx, oby, 2, 2, target_ref=ridx)
        sl.se(0 - p[0])
        sl.se(0 - p[1])
        grid.fill(obx, oby, 2, 2,
                  (0, 0) if ridx == 0 else (0, 0, ridx))
    sl.ue(hi._CBP_INTER.index(0))
    sl.ue(3)  # trailing skips
    sl.rbsp_trailing()
    p3 = nal(2, 1, sl.done())
    w, h, frames, pocs = decode_h264_gop_ipb(idr + p1 + p2 + p3)
    fy3 = frames[3][0]
    fy2 = frames[2][0]
    fy1 = frames[1][0]
    # 8x8 0 -> P2, 8x8 1 -> P1, 8x8 2/3 -> IDR
    assert fy3[4 * W + 4] == fy2[4 * W + 4]
    assert fy3[4 * W + 12] == fy1[4 * W + 12]
    assert fy3[12 * W + 4] == y[12 * W + 4]
    assert fy3[12 * W + 12] == y[12 * W + 12]


def test_multiref_rejections():
    """ref_idx beyond the active count and an active count beyond the
    DPB raise; a P slice declaring more references than decoded is
    refused rather than misread."""
    import pytest as _pytest
    from data_lake_skyfit_spark.llm.h264_bslice import decode_h264_gop_ipb

    chunks = hi.encode_h264_gop_multiref(32, 32, qp=28, y_coeff=9,
                                         u_coeff=5, v_coeff=7,
                                         p_y_coeff=3, p_c_coeff=2)
    # na=2 P as the SECOND frame (only one reference decoded yet)
    bad = chunks[0] + chunks[2]
    with _pytest.raises(ValueError):
        decode_h264_gop_ipb(bad)


def test_gop_bitflip_fuzz():
    rnd = random.Random(99)
    frames = hi.encode_h264_gop_steps(32, 32, qp=28, y_coeff=20,
                                      u_coeff=8, v_coeff=6, mv=(2, 2),
                                      p_y_coeff=3, p_c_coeff=2)
    base = b"".join(frames)
    for _ in range(250):
        mut = bytearray(base)
        mut[rnd.randrange(len(mut))] ^= 1 << rnd.randrange(8)
        try:
            hi.decode_h264_gop(bytes(mut))
        except ValueError:
            pass
