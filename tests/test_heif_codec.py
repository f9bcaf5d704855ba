"""HEIC / HEIF still-image validation.

The arbitration matrix (libheif 1.15 normalizes its OUTPUT to RGB for
still images, so the pins are split by what each reference can
arbitrate exactly):

* GRAY-content fixtures (neutral chroma) decode EXACTLY through
  libheif's whole pipeline — the YCbCr→RGB→YCbCr normalization is an
  identity on neutral chroma, so container + wire are arbitrated
  end-to-end through the reference.
* Arbitrary-content fixtures: libheif must ACCEPT the container and
  report the right geometry, and libde265 decodes the repo's extracted
  item bitstreams bit-identically (the wire arbiter).
* libheif-ENCODED files (the Apple grid layout): the repo's item walk
  must resolve every tile, each tile must decode bit-identically to
  libde265, and the composited geometry must match.
* An embedded libheif-encoded golden pins the walk + decode without
  native libraries.

Plus grid-ORDER pins (position-sensitive, a sum can't catch tile
swaps) and malformed-input fuzz per the repo's decoder rules.
"""

from __future__ import annotations

import base64
import hashlib
import struct

import numpy as np
import pytest

from data_lake_skyfit_spark.llm import multimodal as M
from data_lake_skyfit_spark.llm.multimodal import (
    _heic_pixels,
    _HeifMeta,
    encode_heic_fixture,
    encode_heic_grid_fixture,
)

try:
    from . import libde265_oracle, libheif_oracle
except ImportError:  # pragma: no cover
    import libde265_oracle
    import libheif_oracle

_HEIF = libheif_oracle.load()
_DE265 = libde265_oracle.load()

needs_heif = pytest.mark.skipif(_HEIF is None, reason="libheif absent")
needs_both = pytest.mark.skipif(_HEIF is None or _DE265 is None,
                                reason="references absent")


def _planes(seed: int, w: int, h: int, gray: bool = False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    if gray:
        cb = np.full((h // 2, w // 2), 128, np.uint8)
        cr = cb.copy()
    else:
        cb = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        cr = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    return y, cb, cr


def test_fixture_roundtrip_exact():
    for seed, w, h in ((1, 32, 32), (2, 64, 48), (3, 48, 64)):
        y, cb, cr = _planes(seed, w, h)
        heic = encode_heic_fixture(w, h, y.tobytes(), cb.tobytes(), cr.tobytes())
        dw, dh, ch, raw = _heic_pixels(heic)
        assert (dw, dh, ch) == (w, h, 3)
        assert raw == y.tobytes() + cb.tobytes() + cr.tobytes()


def test_grid_fixture_roundtrip_and_tile_order():
    # four DISTINCT tiles: a placement error changes the planes even
    # though the total sum would not
    tiles = []
    exp = np.zeros((64, 64), np.uint8)
    for t in range(4):
        y, cb, cr = _planes(10 + t, 32, 32)
        r, c = divmod(t, 2)
        exp[r * 32 : (r + 1) * 32, c * 32 : (c + 1) * 32] = y
        tiles.append((y.tobytes(), cb.tobytes(), cr.tobytes()))
    heic = encode_heic_grid_fixture(32, 32, 2, 2, tiles)
    w, h, ch, raw = _heic_pixels(heic)
    assert (w, h) == (64, 64)
    assert raw[: 64 * 64] == exp.tobytes()
    # swapped tile list ⇒ different luma arrangement
    heic2 = encode_heic_grid_fixture(32, 32, 2, 2,
                                     [tiles[1], tiles[0], tiles[2], tiles[3]])
    assert _heic_pixels(heic2)[3][: 64 * 64] != exp.tobytes()


@needs_heif
def test_gray_fixtures_exact_through_libheif():
    y, cb, cr = _planes(4, 64, 48, gray=True)
    heic = encode_heic_fixture(64, 48, y.tobytes(), cb.tobytes(), cr.tobytes())
    lw, lh, ly, lcb, lcr = _HEIF.decode(heic)
    assert (lw, lh) == (64, 48)
    assert ly == y.tobytes() and lcb == cb.tobytes() and lcr == cr.tobytes()
    # and the grid layout
    tiles = []
    exp = np.zeros((64, 64), np.uint8)
    for t in range(4):
        ty, tcb, tcr = _planes(20 + t, 32, 32, gray=True)
        r, c = divmod(t, 2)
        exp[r * 32 : (r + 1) * 32, c * 32 : (c + 1) * 32] = ty
        tiles.append((ty.tobytes(), tcb.tobytes(), tcr.tobytes()))
    gheic = encode_heic_grid_fixture(32, 32, 2, 2, tiles)
    lw, lh, ly, lcb, lcr = _HEIF.decode(gheic)
    assert (lw, lh) == (64, 64)
    assert ly == exp.tobytes()


@needs_heif
def test_color_fixture_container_accepted_by_libheif():
    y, cb, cr = _planes(5, 48, 48)
    heic = encode_heic_fixture(48, 48, y.tobytes(), cb.tobytes(), cr.tobytes())
    lw, lh, _, _, _ = _HEIF.decode(heic)
    assert (lw, lh) == (48, 48)


@needs_both
@pytest.mark.parametrize("quality,lossless", [(70, False), (90, False),
                                              (100, True)])
def test_external_libheif_files_tilewise_bit_exact(quality, lossless):
    y, cb, cr = _planes(quality, 64, 48)
    heic = _HEIF.encode(64, 48, y.tobytes(), cb.tobytes(), cr.tobytes(),
                        lossless=lossless, quality=quality)
    meta = _HeifMeta(heic)
    w, h, ch, raw = _heic_pixels(heic)
    assert (w, h) == (64, 48)
    tiles = meta.refs.get(meta.primary)
    if tiles is None:
        assert meta.item_types[meta.primary] == b"hvc1"
        tiles = [meta.primary]
    for tid in tiles:
        cfg, ispe = meta.item_props(tid)
        au = M._hevc_sample_to_annexb(meta.item_data(tid), cfg)
        ref = _DE265.decode(au)[0]
        mine = meta.decode_hvc1_item(tid)
        assert mine[2] == ref[2] and mine[3] == ref[3] and mine[4] == ref[4]


@needs_heif
def test_irot_imir_transforms_match_libheif():
    """Rotation/mirror properties (the iPhone-photo orientation path):
    every irot x imir combination applied to gray-content fixtures must
    reproduce libheif's output exactly (gray chroma keeps its RGB
    normalization an identity, so the reference arbitrates the
    transform conventions — which is how the imir axis numbering was
    pinned, the spec revisions having renamed the field)."""
    rng = np.random.default_rng(8)
    y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    gray = np.full((24, 32), 128, np.uint8)
    for rot in (0, 1, 2, 3):
        for mir in (None, 0, 1):
            heic = encode_heic_fixture(
                64, 48, y.tobytes(), gray.tobytes(), gray.tobytes(),
                rotation=rot, mirror=mir)
            mw, mh, ch, raw = _heic_pixels(heic)
            lw, lh, ly, lcb, lcr = _HEIF.decode(heic)
            assert (mw, mh) == (lw, lh), (rot, mir)
            assert raw[: mw * mh] == ly, (rot, mir)


def test_irot_changes_plane_layout():
    y = np.arange(48 * 64, dtype=np.uint8).reshape(48, 64) % 251
    c = np.full((24, 32), 100, np.uint8)
    heic = encode_heic_fixture(64, 48, y.tobytes(), c.tobytes(), c.tobytes(),
                               rotation=1)
    w, h, ch, raw = _heic_pixels(heic)
    assert (w, h) == (48, 64)
    got = np.frombuffer(raw[: 48 * 64], np.uint8).reshape(64, 48)
    assert (got == np.rot90(y, 1)).all()


# --------------------------------------------------------------- golden

# libheif-encoded .heic (generated via tests/libheif_oracle.py; every
# tile cross-checked against libde265 at embed time); md5 is over the
# repo decoder's composited native planes
_GOLDEN = (64, 48, "21647148b6cd6e5eb8c0895939561dd8",
    "AAAAHGZ0eXBoZWljAAAAAG1pZjFoZWljbWlhZgAAAaptZXRhAAAAAAAAACFoZGxyAAAAAAAA"
    "AABwaWN0AAAAAAAAAAAAAAAAAAAAAA5waXRtAAAAAAACAAAAEGlkYXQAAAAAAEAAMAAAADhp"
    "bG9jAQAAAERAAAIAAQAAAAAAAAHOAAEAAAAAAAAOkAACAAEAAAAAAAAAAQAAAAAAAAAIAAAA"
    "OGlpbmYAAAAAAAIAAAAVaW5mZQIAAAEAAQAAaHZjMQAAAAAVaW5mZQIAAAAAAgAAZ3JpZAAA"
    "AADVaXBycAAAALNpcGNvAAAAc2h2Y0MBA3AAAAAAAAAAAAAe8AD8/fj4AAAPAyAAAQAYQAEM"
    "Af//A3AAAAMAkAAAAwAAAwAeugJAIQABACdCAQEDcAAAAwCQAAADAAADAB6gIIEFlurkprmw"
    "IAAAAwAgAAADACEiAAEABkQBwXPAiQAAABRpc3BlAAAAAAAAAEAAAABAAAAAFGlzcGUAAAAA"
    "AAAAQAAAADAAAAAQcGl4aQAAAAADCAgIAAAAGmlwbWEAAAAAAAAAAgABAoECAAICA4QAAAAa"
    "aXJlZgAAAAAAAAAOZGltZwACAAEAAQAADphtZGF0AAAOjCgBrw7gV4RQL////4O08/JSjVnR"
    "Ws1KHMLNxDNSltTOVt5kPomuEX4AQ2ORoY01jw5cG7kcLSq2KLf8iUmTi3cIKTLFoK6pDFk+"
    "574lbO8bD4DHJR9tHUQ3CZlZx0nch65/XQma4ryLNSJ4cgvTkvdg3nUmSYla9UiSm8mWhPVt"
    "PPjXH+fCuf4PwfAbuUFRRg1OAtXIpaG4RadE0qpgDrYyTt4Z7aOQ+xuxsCj2ljNCZItbIT9m"
    "+4SSSlEYLGEapAN0lzRDBFCRtZnnTOgdxQD7mM9jJLBue157QijaGTY0wv4G4j/Uvm08vL7Y"
    "AarCfa7TOux9jy+VhKcrngDzVXUdi2KxYtWWMYGnP+71oHsFS8/ci9cQsfZte6+DUn+UsFsJ"
    "8eKq/OJYpiNUM7bEQoHRlLl2OAEz5mpS6N3ACnQ0M8I+9exjr/4za57V7UTuGxWDLSE2OARM"
    "7DJBSAVDjzznf7FRkZWwbIuKU2q5f0qbiqFyup6l3DDX9aAv1yvc68bgdFfychHQrQvYUeYI"
    "sX/tqgbFFZV0qN51R6PpxSjAwBa/KfS81qbqNYd9huIj4hI8lPa/QZsriKg7Xl8vPs4A6Vgp"
    "5Hdhb+ZiUHfdK+55jNQxO6D1HzY1tGb//mw9m5FcAsNbefCjX/spvnYBCPpPSA6U7DqTAXWJ"
    "YfZcndc8Y14GtvMMEthtniTJfOBCKUeTaKBg4zmu90E9vsRpjzrcktkMc556KgIjJKIp0g6d"
    "vzNsh9uOAxPoQMioz59IegGCMs3b+qvF5yKPlsHre258gAE3IrckFgVF4kdAT8jAjwBw0UGo"
    "738MUhtp7yVqT1WWSoNX0mPJMUjv9ZX+Tpsm/83powV/m+tGOPWwjjvCLvvgc/UtiA8j0kYx"
    "ghGKZ3CbWV8Jys1DprSoKulMr96Aca3q4ya4nSD+MrcxVIOgEKnSmABcuUZ3CqY6YEkpuDpz"
    "I7lyN24AuXgBE2+pSz694HYRiafGQn/RAHpTpn6zA4EuE3cRk8+DS4X2ufqhNM1+2Z8NyVF9"
    "SnoUmn2LJ+j5AqJ8JhYJW9d/k/ySldieaoAJ2kuCS6C3HZyIBg//EXerafSkCagl0+rEf9JJ"
    "x6fcAqN+a1et0NG27IQmTMzV6xyQb08B7137Ft9lubdMjksvEnzdiyR6sQYPcz8tQtL1lbRp"
    "OvYnhZ5c7jXY4vWI9gYwQLaGUM3znSCjNnlNeo/FFWDXzDeUJ9EfnWhht5baiLQ2yh1ZnsTP"
    "0/L7BFEk8DZijqdxzouoQ3VwHslG68DNVRRLMSPyxrVm2fhiVrZylL6C0ehwfT3pnC1Mm2Sk"
    "nsWVIqjKcNSGBW+RElHAr8j0FyB+VnpHxdkdc753VscsDkBfG8ORj7Fn7Pt6eA0SFDVed5My"
    "9iP7nhwbP2O7u3ZuwD1TtZipcfxDl63Y+z64IsGjUDCAHQfzsWUZaaR3F6Ybzn8NG2K4nbOz"
    "+iXaNlmmPO9yG8Xgl3FnbXnbvofUPwqyseQGV3RDy16OU1U/SOLTfHW+FLW8hf1IzwNbhbtW"
    "d+bJPIqvtqEfAVWulUVe4OPImuhLaxCWShIeFNPa/40qiOU4Fn8vn8wRcJZj9KMWHFZ8zOHP"
    "givSFYhGV5ZlGtwkj7I1o+iUQUT1ZnTrHTRS1joH9R01rDJ1x3bNjqpRt8Quk9GD/5ur8qJx"
    "HMLc8RYXGM01j8cAYzVCVUruV2LBiykyJR/IOyEU5Q7g9z97eRORkaDyp7VlxYpQqyRmsj+y"
    "Tz2eCF3rgQGI+wHJmUPcfNtwuFMSCUnpbf2v+HQU7rvVlcn80BWpvwGwR3YA1hG7qLRA+FSf"
    "KXFvIMHNfBVMhM2B3UyXqzUIiEH49rCIamhIIwN3EqolPzW6pnk2+syyQN02DBkus0l5mJGC"
    "e4yHsn9rxVAlYmtk3y8QDxnYeglkWf9z9wuA7VCHMjkNA2eFktpiTSGq9YNRrCszw2VtP6UV"
    "YYo/Itlb8SJRth0PacuWX4+meYsmhbBHy2SPd8KqYotoBD2byTmFYF90Dt9yf+KDrWjhETVa"
    "2xWUo6KWIhnIxjSgugO5RPpkEWNDTRzYNGJ/yob6U9YXmcCik8EpA5aUTEtfWWw1MD/BguKH"
    "CV7+wF4btX5+ap7/31sXmlnJp1chjIqasbavKN5boYP6snXy2pFSLkWltC5WUSCeIn5nAfs4"
    "mmnkGznmqFvBIb10AOIf2QC6j6THVrUNOgxwvvjjKtS6owtxXlos559j3HiaiwDDoVxcVWYW"
    "YVo2QKhuklJElZ3H8SQKDvQpPTAWM9B9Q66jAl+IcHIro8rrAUJ4AOXLvKtOXl6FIcQk+kLi"
    "uV0fuE1h1bOrozuE2LCieRVWRoQ8OhivCCZsxooHaX+sF1554qfaNFF63E+zG5q8/OKk1REw"
    "6og0HL1LQljbrEyCEDJ6KtpZ+JxeVUANV3JZ3oBP4yZ907ShGBpCvuEyB8g/3KUkiy7JiN1j"
    "QmN+xYFbb9hSwajszaUKLFydRoLpYBtC5leyeLAIuC0wvwoq8opdEkWCg1zVPFZM6K168CTm"
    "PgS2EpSs+x+R5vebWKCESAySRTQpFK5Deo2vXP7MMhrKwk1+cNbR5Dk/dVcockfVoSW/jWcO"
    "rXaQrMiqrBqOZzjqlipnYj65KQKtXAfAMVwbRkx/UFTF6qEF4Qh83IXxvFVYfZjgdUcu0KzO"
    "/51My8BfI3sK3UCXp47jSn/N/N9EJmHJqMERrhZ25/jwjEZwkzEeVhx4vOTqGfMlkiXbxjA3"
    "NNbTcX3yTxa1TAK1LiPivph3TOiGekTi0grcPL6KJDwJqa8UtpuupTLgRvYpJoACqT0sEFCD"
    "Re9s5oUvl4IXS4HOA18ryi7jfuoAQg/y+5RJKUjstQmgt0JkiS7Hq1ZWLFvP0u5olLUQfcnY"
    "/VCR2n7lrjn00DdshyzjFZEyRyDS7LhsynWOAUR6tjkrxQQqIlanKF2c4kIlrzdV4TGtWRK4"
    "iJGTxfHRv32f+263/S8qhfkaPYd2dHJU+jntZDfokvXkR+4p3C5UsB3N6LQNzdzSLS7RHpjZ"
    "7uXHk66tkIUjLu6LIMRQv+gepfeR6ue1RlS2NjyWApvKKj+QSJPrJhXqiPNqhWpNXbaqql3w"
    "1/VrFW8v/Gv3j6yl5iGskjtz7c3o/5ktV82+bFXD28R0+POiLJo8PbPT97FA3C+Rj5Ot0bM9"
    "mFYWff/4Z95UOjEKYLPDUbDxKDjUMYkrCYICDQ4y7fOYsUGRcMJOokDOo9p/o6R0PtTPie+a"
    "U0n4DZV3sTjLnJveHW18jlagJgaWUP+zonR2ooTdaMLQPIPseruXoSgvFgyiwUMPdxFxWpWD"
    "tt6WGR4WwQ/NNU3/pK7aGR4JIB6wYRyEt0cRabfKesNr8WINn+E5F52xtBOJsxc48w69j0UM"
    "RnMbuI6Tfx5Nz8bMrHqA9oklXGJS5jooG+WZI82KQrnU6xJOm6GMq74WV4K9Qz+SUd8ZQPvy"
    "ITQUOJi9qwW55+t5n2U1TgGzXxCXn++SmJI4kIfbdQM9YuUMxX8xVYLPgNzJLsheTtWWj/S8"
    "qqeVDRBsM2unXiNq9xvYlWvD7GlKZrmsTwFD4TsUTXfDi8s3Yi5m28+SPegU4CzSjl4YdaFL"
    "TFnSu8FEceQ9pgge91bNN5kqIEPSkQtQaU7usFfFdwedPcEcd929Gs3r5Sw8wTgwf7edtD8m"
    "dzncSQgEVHh+6c0lH9KxjBpmE6Zzr9jt4kgFYHw3nyoiOagQ3w2M7vY5+Ob+9DkCIsmUXeST"
    "sihx1Jt+bbG9u848SIdLyY06GBpRo+Pe+CM0RLeCZ1rGPnLp2wx8M3v2GNp4Qj3f38iWGF1j"
    "+Fj/T5mGiOI1zwjdXfrovojew7ZTnuI/sf84yEt7+eWKxpiwEFSZlSuws/ZQhcQq9FHKYp7y"
    "qERNUucYMtZY6VtCQJzb5h7yAcNE5RtOqLivMQ9PV+8Y8J14vG0Z1Xmj3UrEoCcHQ6p1TgLa"
    "+Ro0EiGRkUTdo1s4e0Kucd0RW6Ze+NQN25Hgc90g4pTg6FN1OkROH6GgEVWXFlJL6Wj9ssyw"
    "O+Lv8ThPmTSh3va/syvycvP//5/zG1/h/NPvVB9zF/bndrrMi0s+oWw1/SVBK6Xv+AVAKYHo"
    "Ai/QrTq1uQYLll/hQgWvlbBQIVD9cvkMrHbtRysKcgFJzYQK8a24K7eEFEv5NOQ/ZTlocdqC"
    "OWLmImlZ0Im+x1podT3+fgheWMfbkA+Lvfz2m5JscmBIZwC5mHVpIc6y7R/98/s2Nc6MprPs"
    "V6bXGa0wBl1yqMi9ASFBKg8xRAdZkslfA5Hd5FNqgP7mmFh4z+DekklKdNYIKbiHbYo38mhK"
    "gHuK4o59Ld3Iuj1MFWyYcxOQJm7WmQ9CbtmeL/Q9Dr8Dm/a78h61ND6uqxTFKAqtoJM4jWJf"
    "YoPJuuhCvOb1UFeLlwMmF2i1Uxr7a/zG+ZBydHAMx8ggTKeqbrXrB+Hi70+9WMjN3U7/HisZ"
    "zpA//fKjSOHCHesTDmnev9EZXEaA5v89l/kduUQUDlXqEFckZuYtxKQxSfdslPHKtka109zP"
    "xHcRjQyqZ0WIU5guZL7b9hmbAheZn4/bwGcntL8O6Jisli1ggxAHmIUEldlW5XU5OEPIEUim"
    "H6vwPEQPvILzDtDlSv0XVWBtTHtahyQZbIWQ6IZwwCIGLjPcFHyzOkpgQhAUfJCdBtDP2dOU"
    "YZ9WZ+BT+9s8Lgv9dlFnuMyYgOP31E1pMCVVZfn+3RgEI3y5USzI2hzNLmMRMvbyoGybibkH"
    "ACzPXULvJxnhRuAVIacu8rJNDcLIhomJB9x7PgJQMp21g1Fhkr5qNfaLIGTYG7fvdhtJlGxf"
    "s15KYKB6AE5EvFzYKbZgEQ/jpL/EaUbtcgqZUlq1kto9XkDtOi2uF3DOqJwp9bfAtzBwVbbG"
    "5PQQDOGqj/Y1Of9fNh9+KI/2KSRKdbLnhC7sVNbOXHw=")


def test_embedded_external_golden():
    w, h, md5 = _GOLDEN[0], _GOLDEN[1], _GOLDEN[2]
    heic = base64.b64decode("".join(_GOLDEN[3:]))
    dw, dh, ch, raw = _heic_pixels(heic)
    assert (dw, dh, ch) == (w, h, 3)
    assert hashlib.md5(raw).hexdigest() == md5


# ----------------------------------------------------------------- misc


def test_mp4_hvc1_roundtrip_matches_closed_form():
    from data_lake_skyfit_spark.llm.hevc import encode_hevc_iframe_bypass

    y, cb, cr = _planes(9, 48, 32)
    frames = [encode_hevc_iframe_bypass(48, 32, y.tobytes(), cb.tobytes(),
                                        cr.tobytes())]
    mp4 = M.encode_mp4_frames(frames, codec="hvc1")
    rows = M._mp4_video_pixels(mp4, 400)
    want = int(y.astype(int).sum() + cb.astype(int).sum() + cr.astype(int).sum())
    assert [r[5] for r in rows] == [want]
    assert rows[0][2:5] == (48, 32, 3)


def test_image_channel_bytes_serves_heic_yuv_replicated():
    y, cb, cr = _planes(11, 32, 32)
    heic = encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(), cr.tobytes())
    got = M._image_channel_bytes(heic)
    assert got is not None
    w, h, ch, raw = got
    assert (w, h, ch) == (32, 32, 3)
    # spot-check replication: pixel (3,5) carries chroma block (1,2)
    o = (3 * 32 + 5) * 3
    assert raw[o] == y[3, 5]
    assert raw[o + 1] == cb[1, 2] and raw[o + 2] == cr[1, 2]


def test_rejects_truncation_and_junk():
    y, cb, cr = _planes(12, 32, 32)
    heic = encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(), cr.tobytes())
    for cut in (12, 40, len(heic) // 2, len(heic) - 2):
        with pytest.raises((ValueError, struct.error, IndexError)):
            _heic_pixels(heic[:cut])
    with pytest.raises((ValueError, struct.error, IndexError)):
        _heic_pixels(b"\x00\x00\x00\x18ftypheic" + b"\xaa" * 64)


def test_adversarial_grid_declaration_rejected_before_allocation():
    # ADVICE r7: a grid whose declared rows/cols exceed what the output
    # size covers must reject BEFORE the canvas allocation (ISO
    # 23008-12 requires (cols-1)*tile_w < out_w) — otherwise a crafted
    # grid drives a huge np.zeros and MemoryError escapes the fake path
    tiles = []
    for t in range(4):
        y, cb, cr = _planes(30 + t, 64, 64)
        tiles.append((y.tobytes(), cb.tobytes(), cr.tobytes()))
    heic = encode_heic_grid_fixture(64, 64, 2, 2, tiles)
    # the ImageGrid config is the 8-byte idat payload:
    # version, flags, rows-1, cols-1, out_w:u16, out_h:u16
    cfg = bytes([0, 0, 1, 1]) + struct.pack(">HH", 128, 128)
    assert cfg in heic
    # shrink the declared output so the 2x2 tile grid over-covers it:
    # (cols-1)*tw = 64 >= out_w = 64 → must raise, not allocate
    bad = heic.replace(cfg, bytes([0, 0, 1, 1]) + struct.pack(">HH", 64, 64))
    with pytest.raises(ValueError, match="grid"):
        _heic_pixels(bad)


def test_zero_iloc_length_size_rejected():
    # ADVICE r7: length_size==0 lets ~2e9 zero-byte extents hide in a
    # 60KB file (a multi-minute CPU spin before any decode)
    y, cb, cr = _planes(34, 32, 32)
    heic = encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(), cr.tobytes())
    i = heic.find(b"iloc")
    assert i > 0
    ver_flags_sizes = heic[i + 4 : i + 10]
    sizes = struct.unpack_from(">H", ver_flags_sizes, 4)[0]
    patched = (sizes & ~0x0F00)  # length_size → 0
    bad = (heic[: i + 8]
           + struct.pack(">H", patched)
           + heic[i + 10 :])
    with pytest.raises((ValueError, struct.error, IndexError)):
        _heic_pixels(bad)


def test_bit_flip_fuzz_never_hangs():
    y, cb, cr = _planes(13, 32, 32)
    heic = bytearray(encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(),
                                         cr.tobytes()))
    rng = np.random.default_rng(0)
    for _ in range(200):
        pos = int(rng.integers(12, len(heic)))
        bit = 1 << int(rng.integers(8))
        heic[pos] ^= bit
        try:
            M._heic_pixels(bytes(heic))
        except (ValueError, struct.error, IndexError):
            pass  # bounded failure modes only
        finally:
            heic[pos] ^= bit


def test_high_bit_depth_mp4_video_real_stats():
    # Main10 tracks are REALLY decodable since the late-r8 HBD inter
    # tier: the stats surface sums uint16 SAMPLES (never raw bytes —
    # the pre-r8 guard existed exactly to prevent that mis-sum)
    from .test_hevc_codec import _GOLDEN_10BIT
    from data_lake_skyfit_spark.llm.hevc import decode_hevc_intra_stream

    stream = base64.b64decode("".join(_GOLDEN_10BIT[3:]))
    (w, h, yb, ub, vb), = decode_hevc_intra_stream(stream)
    planes = [np.frombuffer(b, "<u2").astype(np.int64)
              for b in (yb, ub, vb)]
    want_sum = int(sum(int(a.sum()) for a in planes))
    want_sq = int(sum(int((a * a).sum()) for a in planes))
    mp4 = M.encode_mp4_frames([stream], codec="hvc1")
    rows = M._mp4_video_pixels(mp4, 400)
    assert rows == [(0, 0, w, h, 3, want_sum, want_sq)]


def test_decode_images_sniff_order_keeps_other_formats():
    # the heif sniff must not swallow plain MP4s or other ftyp files
    assert not M._looks_like_heif(
        M.encode_mp4_frames([b"framebytes0123456789abcdef"]))
    y, cb, cr = _planes(14, 32, 32)
    assert M._looks_like_heif(
        encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(), cr.tobytes()))


def test_hbd_inter_mp4_track_real_stats():
    """A 10-bit x265 P GOP muxed as an hvc1 track: every sampled frame
    reports sample-wise uint16 stats through the incremental AU
    decoder (needs the 10-bit encode bridge)."""
    from . import libx265_oracle
    from data_lake_skyfit_spark.llm import hevc as H

    enc = libx265_oracle.load(10)
    if enc is None:
        pytest.skip("10-bit x265 bridge absent")
    rng = np.random.default_rng(5)
    y0 = rng.integers(0, 1024, (32, 48)).astype("<u2")
    cb0 = rng.integers(0, 1024, (16, 24)).astype("<u2")
    cr0 = rng.integers(0, 1024, (16, 24)).astype("<u2")
    frames = [(np.roll(y0, 3 * i, 1).tobytes(), cb0.tobytes(),
               cr0.tobytes()) for i in range(4)]
    stream = enc.encode(48, 32, frames,
                        {"keyint": "250", "min-keyint": "250",
                         "scenecut": "0", "bframes": "0", "ref": "1",
                         "aq-mode": "0", "qp": "30"})
    decoded = H.decode_hevc_stream(stream, max_frames=8)
    aus = M._hevc_split_aus(stream)
    assert len(aus) == 4
    mp4 = M.encode_mp4_frames(aus, codec="hvc1")
    rows = M._mp4_video_pixels(mp4, 1)  # emit every sample
    assert len(rows) == 4
    for i, (idx, _ts, w, h, nch, psum, psq) in enumerate(rows):
        dw, dh, yb, ub, vb = decoded[i]
        planes = [np.frombuffer(b, "<u2").astype(np.int64)
                  for b in (yb, ub, vb)]
        assert (w, h, nch) == (dw, dh, 3)
        assert psum == int(sum(int(a.sum()) for a in planes))
        assert psq == int(sum(int((a * a).sum()) for a in planes))


def test_non_420_hevc_item_rejects_into_fake_path(monkeypatch):
    """4:2:2/4:4:4 decode at the codec layer (late r8) but the HEIC
    still-image serving convention is 4:2:0 byte planes — the item
    walk must REJECT (fake path) rather than mis-slice the
    interleave."""
    y, cb, cr = _planes(6, 32, 32)
    heic = encode_heic_fixture(32, 32, y.tobytes(), cb.tobytes(),
                               cr.tobytes())
    full = bytes(32 * 32)  # 4:4:4-shaped chroma
    monkeypatch.setattr(M, "decode_hevc_iframe",
                        lambda au: (32, 32, y.tobytes(), full, full))
    with pytest.raises(ValueError, match="non-4:2:0"):
        M._HeifMeta(heic).decode_hvc1_item(M._HeifMeta(heic).primary)


def test_rext_chroma_mp4_track_real_stats():
    """4:2:2 and 4:4:4 hvc1 GOP tracks (late r8): the MP4 stats
    surface sums whatever native planes the decoder returns, so the
    REXT formats flow end-to-end — pinned frame-by-frame against the
    codec-layer decode."""
    from . import libx265_oracle
    from data_lake_skyfit_spark.llm import hevc as H

    enc = libx265_oracle.load(8)
    if enc is None:
        pytest.skip("x265 bridge absent")
    rng = np.random.default_rng(8)
    for csp, cdim in (("i422", (32, 24)), ("i444", (32, 48))):
        y0 = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        cb0 = rng.integers(0, 256, cdim).astype(np.uint8)
        cr0 = rng.integers(0, 256, cdim).astype(np.uint8)
        frames = [(np.roll(y0, 3 * i, 1).tobytes(), cb0.tobytes(),
                   cr0.tobytes()) for i in range(4)]
        stream = enc.encode(48, 32, frames,
                            {"keyint": "250", "min-keyint": "250",
                             "scenecut": "0", "bframes": "0",
                             "ref": "1", "aq-mode": "0", "qp": "30",
                             "input-csp": csp})
        decoded = H.decode_hevc_stream(stream, max_frames=8)
        aus = M._hevc_split_aus(stream)
        mp4 = M.encode_mp4_frames(aus, codec="hvc1")
        rows = M._mp4_video_pixels(mp4, 1)
        assert len(rows) == 4, csp
        for i, (_idx, _ts, w, h, nch, psum, psq) in enumerate(rows):
            dw, dh, yb, ub, vb = decoded[i]
            assert (w, h, nch) == (dw, dh, 3)
            allv = np.concatenate([np.frombuffer(b, np.uint8)
                                   for b in (yb, ub, vb)]).astype(np.int64)
            assert psum == int(allv.sum()), (csp, i)
            assert psq == int((allv * allv).sum()), (csp, i)
