"""H.264 CABAC entropy tier (llm/h264_cabac.py).

Validation layers, strongest first:
1. ENGINE TABLES re-extracted from the system libde265/libx265
   binaries at test time (HEVC shares H.264's M-coder tables
   verbatim) and compared to the shipped constants.
2. ENGINE FLOW pinned by a hand-derived bit golden, every step
   worked from the §9.3.3.2 flowcharts in comments.
3. CROSS-ENTROPY EQUIVALENCE: the same random macroblock descriptors
   encoded through BOTH entropy tiers (the validated CAVLC writer and
   the CABAC writer) must decode to byte-identical planes — pinning
   the whole CABAC syntax layer against the CAVLC tier's established
   goldens.
4. Closed-form fixtures (flat/stepped-DC) and malformed-input
   rejection.

What this CANNOT pin: the context-initialization (m, n) transcription
(no AVC reference exists in-container) — see the module docstring.
"""

import random

import pytest

import data_lake_skyfit_spark.llm.h264 as H
import data_lake_skyfit_spark.llm.h264_cabac as C


# ---------------------------------------------------------------------------
# 1. engine tables vs the reference binaries


def test_engine_tables_match_reference_binaries():
    import os

    path = "/lib/x86_64-linux-gnu/libde265.so.0"
    if not os.path.exists(path):
        pytest.skip("libde265 not present")
    blob = open(path, "rb").read()
    flat = bytes(v for row in C._RANGE_LPS for v in row)
    assert flat in blob, "rangeTabLPS no longer matches libde265"
    assert bytes(C._TRANS_LPS) in blob, "transIdxLPS no longer matches libde265"


def test_engine_table_structure():
    # every row strictly increases across the 4 range quartiles and
    # decreases down the state axis (higher state = more skewed LPS)
    for row in C._RANGE_LPS[:-1]:
        assert row[0] < row[1] < row[2] < row[3]
    for i in range(62):
        assert C._RANGE_LPS[i][0] >= C._RANGE_LPS[i + 1][0]
    assert C._RANGE_LPS[63] == (2, 2, 2, 2)
    assert len(C._TRANS_LPS) == 64 and C._TRANS_LPS[63] == 63
    for i, t in enumerate(C._TRANS_LPS[:-1]):
        assert t <= i  # LPS never increases confidence


# ---------------------------------------------------------------------------
# 2. hand-derived engine golden (§9.3.3.2 flowcharts)


def test_decode_decision_hand_golden():
    """Stream 0x80 0x00 0x00, context 69 at SliceQP 26.

    Init (§9.3.1.1): (m, n) = (3, 62) → preCtxState =
    clip3(1,126,(3*26 >> 4)+62) = 4+62 = 66 > 63 → pStateIdx 2, MPS 1.
    Engine init: codIRange 510, codIOffset = first 9 bits = 1 0000 0000
    = 256.

    dec#1: qIdx = (510>>6)&3 = 3 → LPS = rangeTab[2][3] = 216;
      range 510-216 = 294; offset 256 < 294 → MPS bin = 1;
      pState 2→3; 294 ≥ 256, no renorm.
    dec#2: qIdx = (294>>6)&3 = 0 → LPS = rangeTab[3][0] = 123;
      range 294-123 = 171; offset 256 ≥ 171 → LPS bin = 0;
      offset 85, range 123, pState → transIdxLPS[3] = 2;
      renorm twice (123→246→492), offset 85→170→340 (stream bits 0,0).
    dec#3: qIdx = (492>>6)&3 = 3 → LPS = rangeTab[2][3] = 216;
      range 492-216 = 276; offset 340 ≥ 276 → LPS bin = 0;
      offset 64, range 216, pState → transIdxLPS[2] = 1;
      renorm once (216→432), offset 128→129? stream bit 11 = 0 → 128.
    """
    br = H._BitReader(bytes([0x80, 0x00, 0x00]))
    cd = C._CabacDec(br, 26)
    assert cd.state[69] == [2, 1]
    assert cd.dec(69) == 1
    assert (cd.range, cd.offset, cd.state[69]) == (294, 256, [3, 1])
    assert cd.dec(69) == 0
    assert (cd.range, cd.offset, cd.state[69]) == (492, 340, [2, 1])
    assert cd.dec(69) == 0
    assert (cd.range, cd.offset, cd.state[69]) == (432, 128, [1, 1])


def test_bypass_and_terminate_hand_golden():
    """Bypass (§9.3.3.2.3): offset = offset<<1 | bit, bin = offset >=
    range (then subtract).  Terminate (§9.3.3.2.5): range -= 2, bin =
    offset >= range (no renorm on 1).

    Stream 0xBF 0x80 (0xFF would init offset 511 ≥ 510, forbidden):
    offset = first 9 bits 1 0111 1111 = 383 (bit 8 = MSB of 0x80 = 1).
    bypass#1: offset = 766 | bit9(0) = 766; 766 ≥ 510 → bin 1,
      offset 766 − 510 = 256.
    terminate#1: range 508; 256 < 508 → bin 0; no renorm (508 ≥ 256).
    bypass#2: offset = 512 | bit10(0) = 512 ≥ 508 → bin 1, offset 4.
    """
    br = H._BitReader(bytes([0xBF, 0x80]))
    cd = C._CabacDec(br, 26)
    assert cd.offset == 383
    assert cd.bypass() == 1 and cd.offset == 256
    assert cd.terminate() == 0 and cd.range == 508
    assert cd.bypass() == 1 and cd.offset == 4


def test_encoder_decoder_engine_roundtrip_bits():
    """Random decision/bypass/terminate sequences survive the engine
    round trip — states, renorm, outstanding-bit carry, flush."""
    rnd = random.Random(9)
    for trial in range(200):
        qp = rnd.randrange(0, 52)
        seq = []
        for _ in range(rnd.randrange(1, 120)):
            kind = rnd.randrange(3)
            if kind == 0:
                seq.append(("d", rnd.choice([3, 6, 60, 68, 69, 105, 227]),
                            rnd.randrange(2)))
            elif kind == 1:
                seq.append(("b", rnd.randrange(2)))
            else:
                seq.append(("t", 0))
        seq.append(("t", 1))
        bw = H._BitWriter()
        ce = C._CabacEnc(bw, qp)
        for op in seq:
            if op[0] == "d":
                ce.enc(op[1], op[2])
            elif op[0] == "b":
                ce.bypass_enc(op[1])
            else:
                ce.terminate_enc(op[1])
        bw.align_zero()
        br = H._BitReader(bw.done())
        cd = C._CabacDec(br, qp)
        for op in seq:
            if op[0] == "d":
                assert cd.dec(op[1]) == op[2], (trial, op)
            elif op[0] == "b":
                assert cd.bypass() == op[1], (trial, op)
            else:
                assert cd.terminate() == op[1], (trial, op)


# ---------------------------------------------------------------------------
# 3. cross-entropy equivalence: CAVLC twin writer


def _encode_islice_cavlc(mbs, mbw, mbh, qp0, deblock):
    """Generic CAVLC I-slice writer for the SAME mb-descriptor format
    as encode_islice_cabac — the test-side twin that lets one random
    descriptor stream drive both entropy tiers."""
    sl = H._BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(4, 0)
    sl.ue(0)
    sl.u(4, 0)
    sl.u(1, 0)
    sl.u(1, 0)
    sl.se(0)
    if deblock:
        sl.ue(0)
        sl.se(0)
        sl.se(0)
    else:
        sl.ue(1)

    st = C._SliceCtxState(mbw, mbh)  # reuse mode-prediction tracking
    nz_luma = [[0] * (mbw * 4) for _ in range(mbh * 4)]
    nz_chroma = [[[0] * (mbw * 2) for _ in range(mbh * 2)] for _ in range(2)]

    def nc_of(grid, x, y):
        na = grid[y][x - 1] if x > 0 else None
        nb = grid[y - 1][x] if y > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    for mb, d in enumerate(mbs):
        mby, mbx = divmod(mb, mbw)
        is_i4 = d["kind"] == "i4"
        cbp_chroma = d.get("cbp_chroma", 0)
        st.kind[mby][mbx] = 0 if is_i4 else 1
        st.is_i4[mby][mbx] = is_i4
        if is_i4:
            cbp_luma = d.get("cbp_luma", 0)
            sl.ue(0)
            for n in range(16):
                predm = st.predicted_mode4(n, mbx, mby)
                mode = d["modes4"][n]
                if mode == predm:
                    sl.u(1, 1)
                else:
                    sl.u(1, 0)
                    sl.u(3, mode if mode < predm else mode - 1)
                st.set_mode4(n, mbx, mby, mode)
            sl.ue(d.get("chroma_mode", 0))
            sl.ue(H._CBP_INTRA.index(cbp_luma + 16 * cbp_chroma))
            if cbp_luma or cbp_chroma:
                sl.se(d.get("qp_delta", 0))
        else:
            cbp_ac = d.get("cbp_ac", 0)
            cbp_luma = 15 if cbp_ac else 0
            sl.ue(1 + d.get("pred", 0) + 4 * cbp_chroma + 12 * cbp_ac)
            sl.ue(d.get("chroma_mode", 0))
            sl.se(d.get("qp_delta", 0))
        st.chroma_mode[mby][mbx] = d.get("chroma_mode", 0)
        st.cbp_luma[mby][mbx] = cbp_luma
        st.cbp_chroma[mby][mbx] = cbp_chroma

        if not is_i4:
            nc = nc_of(nz_luma, mbx * 4, mby * 4)
            H._write_cavlc_block(sl, list(d.get("luma_dc") or [0] * 16), nc, 16)
        for n in range(16):
            dx, dy = H._blk_xy(n)
            bx, by = mbx * 4 + (dx >> 2), mby * 4 + (dy >> 2)
            if cbp_luma & (1 << (n >> 2)):
                nc = nc_of(nz_luma, bx, by)
                if is_i4:
                    blk = list(d["luma_blocks"][n])
                    tot = H._write_cavlc_block(sl, blk, nc, 16)
                else:
                    tail = list((d.get("luma_ac") or [[0] * 15] * 16)[n])
                    tot = H._write_cavlc_block(sl, tail, nc, 15)
                nz_luma[by][bx] = tot
            else:
                nz_luma[by][bx] = 0
        if cbp_chroma:
            cdc = d.get("chroma_dc") or [[0] * 4, [0] * 4]
            for comp in range(2):
                H._write_cavlc_block(sl, list(cdc[comp]), -1, 4)
        cac = d.get("chroma_ac") or [[[0] * 15] * 4, [[0] * 15] * 4]
        for comp in range(2):
            for n in range(4):
                cx, cy = mbx * 2 + (n & 1), mby * 2 + (n >> 1)
                if cbp_chroma & 2:
                    nc = nc_of(nz_chroma[comp], cx, cy)
                    tot = H._write_cavlc_block(sl, list(cac[comp][n]), nc, 15)
                    nz_chroma[comp][cy][cx] = tot
                else:
                    nz_chroma[comp][cy][cx] = 0
    sl.rbsp_trailing()
    return sl


def _frame_bytes(mbs, mbw, mbh, qp, deblock, cabac):
    sps = H._sps_writer(mbw, mbh, 0, 0)
    pps = H._pps_writer(qp, cabac=cabac)
    if cabac:
        sl = C._cabac_slice_header(qp, deblock=deblock)
        C.encode_islice_cabac(mbs, mbw, mbh, qp, sl)
    else:
        sl = _encode_islice_cavlc(mbs, mbw, mbh, qp, deblock)
    return H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done()) + H._nal(3, 5, sl.done())


def _rand_block(rnd, n, density):
    blk = [0] * n
    for p in rnd.sample(range(n), rnd.randrange(0, max(1, int(n * density)))):
        blk[p] = rnd.choice([1, -1, 2, -2, 3, 7, -15, 40, -200, 1500])
    return blk


def _rand_mb(rnd, mbx, mby):
    left, top = mbx > 0, mby > 0
    chroma_modes = [0] + ([1] if left else []) + ([2] if top else []) \
        + ([3] if left and top else [])
    if rnd.random() < 0.5:
        cbp_chroma = rnd.choice([0, 1, 2])
        cbp_ac = rnd.randrange(2)
        return {
            "kind": "i16",
            "pred": rnd.choice([2] + ([0] if top else []) + ([1] if left else [])
                               + ([3] if left and top else [])),
            "cbp_chroma": cbp_chroma,
            "cbp_ac": cbp_ac,
            "chroma_mode": rnd.choice(chroma_modes),
            "qp_delta": rnd.choice([0, 0, 0, 1, -1, 2, -3]),
            "luma_dc": _rand_block(rnd, 16, 0.4),
            "luma_ac": [_rand_block(rnd, 15, 0.3) for _ in range(16)]
            if cbp_ac else None,
            "chroma_dc": [_rand_block(rnd, 4, 0.8) for _ in range(2)]
            if cbp_chroma else None,
            "chroma_ac": [[_rand_block(rnd, 15, 0.25) for _ in range(4)]
                          for _ in range(2)] if cbp_chroma == 2 else None,
        }
    modes4 = []
    for n in range(16):
        dx, dy = H._blk_xy(n)
        px, py = mbx * 16 + dx, mby * 16 + dy
        allowed = [2]
        if py > 0:
            allowed += [0, 3, 7]
        if px > 0:
            allowed += [1, 8]
        if px > 0 and py > 0:
            allowed += [4, 5, 6]
        modes4.append(rnd.choice(allowed))
    cbp_luma = rnd.randrange(16)
    cbp_chroma = rnd.choice([0, 1, 2])
    return {
        "kind": "i4",
        "modes4": modes4,
        "chroma_mode": rnd.choice(chroma_modes),
        "cbp_luma": cbp_luma,
        "cbp_chroma": cbp_chroma,
        "qp_delta": rnd.choice([0, 0, 1, -2]) if (cbp_luma or cbp_chroma) else 0,
        "luma_blocks": [
            _rand_block(rnd, 16, 0.4) if cbp_luma & (1 << (n >> 2)) else [0] * 16
            for n in range(16)
        ],
        "chroma_dc": [_rand_block(rnd, 4, 0.8) for _ in range(2)]
        if cbp_chroma else None,
        "chroma_ac": [[_rand_block(rnd, 15, 0.25) for _ in range(4)]
                      for _ in range(2)] if cbp_chroma == 2 else None,
    }


@pytest.mark.parametrize("trial_block", range(4))
def test_cabac_equals_cavlc_on_random_slices(trial_block):
    """The decisive syntax-layer pin: identical macroblock descriptors
    through both entropy tiers decode to byte-identical planes (the
    CAVLC tier carries the established hand goldens and the published
    worked example; plane equality transfers that pin to every CABAC
    binarization, context choice and scan)."""
    rnd = random.Random(400 + trial_block)
    for _ in range(12):
        mbw = rnd.randrange(1, 4)
        mbh = rnd.randrange(1, 3)
        qp = rnd.randrange(10, 48)
        deblock = rnd.random() < 0.5
        mbs = [_rand_mb(rnd, mb % mbw, mb // mbw) for mb in range(mbw * mbh)]
        cavlc = H.decode_h264_iframe(_frame_bytes(mbs, mbw, mbh, qp, deblock, False))
        cabac = H.decode_h264_iframe(_frame_bytes(mbs, mbw, mbh, qp, deblock, True))
        assert cavlc == cabac


# ---------------------------------------------------------------------------
# 4. closed forms + rejection


def test_cabac_flat_frames_match_closed_form():
    for rid in (0, 3, 11, 29):
        w, h = 32 + 2 * (rid % 9), 32 + 2 * (rid % 7)
        qp = (20, 28, 36, 44)[rid % 4]
        cy, cu, cv = 1 + rid % 90, 1 + rid % 40, 1 + (rid // 3) % 40
        data = C.encode_h264_iframe_flat_cabac(
            w, h, qp=qp, y_coeff=cy, u_coeff=cu, v_coeff=cv
        )
        ey, eu, ev = H.h264_flat_expected(qp, cy, cu, cv)
        mw, mh, y, u, v = H.decode_h264_iframe(data)
        assert (mw, mh) == (w, h)
        assert set(y) == {ey} and set(u) == {eu} and set(v) == {ev}


def test_cabac_steps_match_deblock_closed_form():
    for n_mb, qp, base, step, horiz in [
        (2, 36, 5, 60, False), (4, 40, 0, 70, True), (5, 28, 8, 25, False),
    ]:
        data = C.encode_h264_iframe_steps_cabac(
            n_mb, horizontal=horiz, qp=qp, base_coeff=base,
            step_coeff=step, u_coeff=4, v_coeff=6,
        )
        w, h, y, u, v = H.decode_h264_iframe(data)
        exp = H.h264_steps_expected(n_mb, qp, base, step, 4, 6)
        assert sum(y) + sum(u) + sum(v) == exp["pixel_sum"]


def test_cabac_rejects_malformed():
    good = C.encode_h264_iframe_flat_cabac(32, 32, qp=30, y_coeff=9)
    with pytest.raises(ValueError):
        H.decode_h264_iframe(good[:-6])  # truncated slice
    # corrupt bytes inside the CABAC payload: either a clean ValueError
    # (engine desync detected) or a decode to SOME frame — never a hang
    # or foreign exception
    rnd = random.Random(2)
    for _ in range(40):
        b = bytearray(good)
        pos = rnd.randrange(len(good) - 12, len(good))
        b[pos] ^= 1 << rnd.randrange(8)
        try:
            H.decode_h264_iframe(bytes(b))
        except ValueError:
            pass


def test_cabac_ipcm_rejected():
    """A CABAC slice whose first mb_type prefix decodes toward I_PCM
    must raise the documented unsupported error, not desync."""
    sps = H._sps_writer(1, 1, 0, 0)
    pps = H._pps_writer(26, cabac=True)
    sl = C._cabac_slice_header(26, deblock=False)
    ce = C._CabacEnc(sl, 26)
    ce.enc(3 + 0, 1)       # not I_NxN
    ce.terminate_enc(1)    # I_PCM marker (flushes the engine)
    sl.align_zero()
    data = (H._nal(3, 7, sps.done()) + H._nal(3, 8, pps.done())
            + H._nal(3, 5, sl.done()))
    with pytest.raises(ValueError, match="I_PCM"):
        H.decode_h264_iframe(data)
