"""minih264 codec contract: Exp-Golomb and NAL/emulation-prevention
machinery, LOSSLESS I_PCM roundtrips (the property the closed-form
DuckDB oracle for multimodal_h264_decode depends on), frame
cropping, hostile PCM byte patterns that force escaping, and the
documented rejection surface (CABAC, non-I_PCM macroblocks, inter
slices, interlace).

Unlike minivp8/miniwebp there is NO self-consistency caveat here:
I_PCM streams carry only spec-defined bit syntax (Rec. H.264
§7.3-7.4), no implementation-chosen tables.

No reference analogue (the reference crawler decodes no video);
build-spec frontier for the multimodal family.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minih264 as h264
from goto_eater_crawler_spark.functions.miniimg import ImageFormatError

# ---------------------------------------------------------------------------
# bit syntax
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 2**20), max_size=50),
       st.lists(st.integers(-2**18, 2**18), max_size=50))
@settings(max_examples=60, deadline=None)
def test_exp_golomb_roundtrip(ues, ses):
    w = h264.BitWriter()
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.rbsp_trailing()
    r = h264.BitReader(w.to_bytes())
    assert [r.ue() for _ in ues] == ues
    assert [r.se() for _ in ses] == ses


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_emulation_prevention_roundtrip(payload):
    ebsp = h264.rbsp_to_ebsp(payload)
    # no start-code or escape-eligible pattern may survive in EBSP
    for i in range(len(ebsp) - 2):
        if ebsp[i] == 0 and ebsp[i + 1] == 0:
            assert ebsp[i + 2] > 3, ebsp[i:i + 3]
    assert h264.ebsp_to_rbsp(ebsp) == payload


def test_more_rbsp_data_stop_bit():
    w = h264.BitWriter()
    w.ue(3)
    w.rbsp_trailing()
    r = h264.BitReader(w.to_bytes())
    assert r.more_rbsp_data()
    assert r.ue() == 3
    assert not r.more_rbsp_data()


# ---------------------------------------------------------------------------
# lossless roundtrip
# ---------------------------------------------------------------------------


@given(st.integers(0, 10**9))
@settings(max_examples=20, deadline=None)
def test_ipcm_roundtrip_lossless(seed):
    rnd = random.Random(seed)
    w = 2 * rnd.randrange(8, 25)   # even, 16..48, incl. non-MB-aligned
    h = 2 * rnd.randrange(8, 17)
    # bias toward 0x00/0x01/0x03 to stress emulation prevention
    pick = lambda: rnd.choice([0, 0, 1, 2, 3, 255, rnd.randrange(256)])
    y = [[pick() for _ in range(w)] for _ in range(h)]
    u = [[pick() for _ in range(w // 2)] for _ in range(h // 2)]
    v = [[pick() for _ in range(w // 2)] for _ in range(h // 2)]
    data = h264.h264_encode_ipcm(w, h, y, u, v)
    W, H, dy, du, dv = h264.h264_decode(data)
    assert (W, H) == (w, h)
    assert dy == y and du == u and dv == v


def test_cropping_non_mb_aligned():
    y = [[x % 256 for x in range(36)] for _ in range(20)]
    u = [[7] * 18 for _ in range(10)]
    v = [[9] * 18 for _ in range(10)]
    data = h264.h264_encode_ipcm(36, 20, y, u, v)
    W, H, dy, du, dv = h264.h264_decode(data)
    assert (W, H) == (36, 20)
    assert dy == y and du == u and dv == v
    with pytest.raises(ValueError, match="even"):
        h264.h264_encode_ipcm(15, 16, [[0] * 15] * 16, [[0] * 7] * 8,
                              [[0] * 7] * 8)


# ---------------------------------------------------------------------------
# rejection surface
# ---------------------------------------------------------------------------


def _flip_pps_cabac(data: bytes) -> bytes:
    # rebuild the stream with entropy_coding_mode_flag = 1
    units = h264.split_annexb(data)
    out = bytearray()
    for ebsp in units:
        rbsp = h264.ebsp_to_rbsp(ebsp)
        if rbsp[0] & 0x1F == 8:
            body = bytearray(rbsp[1:])
            # pps_id=0 -> '1', sps_id=0 -> '1', then the cabac flag is
            # bit 2 of the first byte (MSB-first): set it
            body[0] |= 0x20
            rbsp = rbsp[:1] + bytes(body)
        out += b"\x00\x00\x00\x01" + h264.rbsp_to_ebsp(rbsp)
    return bytes(out)


def test_error_modes():
    good = h264.h264_encode_ipcm(16, 16, [[9] * 16] * 16, [[1] * 8] * 8,
                                 [[2] * 8] * 8)
    with pytest.raises(ImageFormatError, match="start code"):
        h264.h264_decode(b"\xff" * 12)
    with pytest.raises(ImageFormatError, match="CABAC"):
        h264.h264_decode(_flip_pps_cabac(good))
    # slice before its PPS/SPS
    units = h264.split_annexb(good)
    idr_only = b"\x00\x00\x00\x01" + units[2]
    with pytest.raises(ImageFormatError, match="unknown PPS"):
        h264.h264_decode(idr_only)
    # truncated PCM samples
    with pytest.raises(ImageFormatError):
        h264.h264_decode(good[:len(good) // 2])


# ---------------------------------------------------------------------------
# CAVLC family: block codec, flat-class exactness, encoder-recon parity
# ---------------------------------------------------------------------------


@given(st.integers(0, 10**9))
@settings(max_examples=60, deadline=None)
def test_cavlc_block_roundtrip(seed):
    rnd = random.Random(seed)
    max_coeff = rnd.choice([16, 15, 4])
    nc = rnd.choice([-1] if max_coeff == 4 else [0, 1, 2, 3, 5, 7, 8, 20])
    coeffs = [0] * max_coeff
    for pos in rnd.sample(range(max_coeff), rnd.randint(0, max_coeff)):
        mag = rnd.choice([1, 1, 2, 3, rnd.randrange(1, 2064)])
        coeffs[pos] = mag * rnd.choice([1, -1])
    w = h264.BitWriter()
    h264._cavlc_write_block(w, coeffs, nc, max_coeff)
    # back-to-back second block exercises bit-exact continuation
    h264._cavlc_write_block(w, coeffs, nc, max_coeff)
    w.rbsp_trailing()
    r = h264.BitReader(w.to_bytes())
    assert h264._cavlc_read_block(r, nc, max_coeff) == coeffs
    assert h264._cavlc_read_block(r, nc, max_coeff) == coeffs


def test_vlc_tables_prefix_free_and_kraft():
    tables = [h264._CT_NC0, h264._CT_NC2, h264._CT_NC4,
              h264._CT_CHROMA_DC, *h264._TZ_4X4.values(),
              *h264._TZ_CHROMA_DC.values(), *h264._RUN_BEFORE.values()]
    for t in tables:
        h264._validate_prefix_free(t)
        assert sum(2.0 ** -len(c) for c in t.values()) <= 1.0 + 1e-12


def test_flat_residual_exact_bands():
    # QP-0 quant rounding lands inside the inverse transform's
    # +32>>6 window: documented exactness bands
    for r in range(-81, 82):
        res = [[r] * 16 for _ in range(16)]
        assert h264._enc_i16_luma(res, 0)[2] == res
    for r in range(-161, 162):
        res = [[r] * 8 for _ in range(8)]
        assert h264._enc_chroma(res, 0, True)[2] == res
        assert h264._enc_chroma(res, 0, False)[2] == res
    for r in (-255, -128, 127, 255):
        res = [[r] * 16 for _ in range(16)]
        assert h264._enc_inter_luma(res, 0)[1] == res


def _flat_frame(w, h, mbw, vals_y, vals_u, vals_v):
    y = [[vals_y[(x // 16) + (yy // 16) * mbw] for x in range(w)]
         for yy in range(h)]
    u = [[vals_u[(x // 8) + (yy // 8) * mbw] for x in range(w // 2)]
         for yy in range(h // 2)]
    v = [[vals_v[(x // 8) + (yy // 8) * mbw] for x in range(w // 2)]
         for yy in range(h // 2)]
    return (y, u, v)


@given(st.integers(0, 10**9))
@settings(max_examples=15, deadline=None)
def test_cavlc_flat_class_lossless(seed):
    # per-MB flat values within the exact band -> decode == source
    rnd = random.Random(seed)
    mbw, mbh = rnd.randint(1, 3), rnd.randint(1, 2)
    W, H = mbw * 16, mbh * 16
    n = mbw * mbh
    f1 = _flat_frame(W, H, mbw,
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)])
    f2 = _flat_frame(W, H, mbw,
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)])
    data = h264.h264_encode(W, H, [f1, f2], qp=0, subpel=False)
    w, h, frames = h264.h264_decode_frames(data)
    assert (w, h) == (W, H)
    assert frames == [f1, f2]


@given(st.integers(0, 10**9))
@settings(max_examples=15, deadline=None)
def test_cavlc_decode_matches_encoder_recon(seed):
    # arbitrary content, mixed QP: the decoder must reproduce the
    # encoder's own reconstruction bit-exactly (lossy but determinate)
    rnd = random.Random(seed)
    W = 2 * rnd.randrange(8, 25)
    H = 2 * rnd.randrange(8, 17)
    qp = rnd.choice([0, 4, 12, 23, 34, 45])
    frames_in = []
    for _ in range(rnd.randint(1, 3)):
        y = [[rnd.randrange(256) for _ in range(W)] for _ in range(H)]
        u = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        v = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        frames_in.append((y, u, v))
    data, recons = h264.h264_encode_with_recon(W, H, frames_in, qp=qp)
    w, h, frames = h264.h264_decode_frames(data)
    assert (w, h) == (W, H)
    assert frames == recons


def test_cavlc_p_skip_and_motion():
    rnd = random.Random(5)
    W, H = 48, 32
    y1 = [[(x * 7 + yy * 13) % 200 + 20 for x in range(W)]
          for yy in range(H)]
    u1 = [[(x * 3 + yy * 5) % 200 + 20 for x in range(W // 2)]
          for yy in range(H // 2)]
    v1 = [[(x * 11 + yy * 2) % 200 + 20 for x in range(W // 2)]
          for yy in range(H // 2)]
    fA = (y1, u1, v1)
    # identical second frame -> every MB skips, tiny slice, exact copy
    data = h264.h264_encode(W, H, [fA, fA], qp=0)
    _, _, frames = h264.h264_decode_frames(data)
    assert frames[1] == frames[0]
    p_slice = h264.split_annexb(data)[-1]
    assert len(p_slice) < 12, "all-skip P slice should be a few bytes"
    # shifted second frame -> motion search recovers it losslessly
    y2 = [[y1[yy][max(0, x - 8)] for x in range(W)] for yy in range(H)]
    u2 = [[u1[yy][max(0, x - 4)] for x in range(W // 2)]
          for yy in range(H // 2)]
    v2 = [[v1[yy][max(0, x - 4)] for x in range(W // 2)]
          for yy in range(H // 2)]
    fB = (y2, u2, v2)
    data, recons = h264.h264_encode_with_recon(W, H, [fA, fB], qp=0)
    _, _, frames = h264.h264_decode_frames(data)
    assert frames == recons
    # interior MBs (away from the left clamp edge) must be exact
    assert [row[16:] for row in frames[1][0]] == \
        [row[16:] for row in y2]


def test_cavlc_rejection_surface():
    f = _flat_frame(16, 16, 1, [120], [120], [120])
    good = h264.h264_encode(16, 16, [f, f], qp=0)
    # a CAVLC payload mislabeled as CABAC must fail parsing (the
    # CABAC arm now accepts real CABAC I slices, so the error is the
    # alignment check, not a blanket rejection)
    with pytest.raises(ImageFormatError, match="cabac_alignment"):
        h264.h264_decode_frames(_flip_pps_cabac(good))
    # P slice without its reference (drop the IDR slice NAL)
    units = h264.split_annexb(good)
    no_ref = b"".join(b"\x00\x00\x00\x01" + u
                      for u in units if (h264.ebsp_to_rbsp(u)[0] & 0x1F)
                      not in (5,))
    with pytest.raises(ImageFormatError, match="reference"):
        h264.h264_decode_frames(no_ref)
    # the old I_PCM-only decoder must still reject CAVLC macroblocks
    with pytest.raises(ImageFormatError, match="I_PCM"):
        h264.h264_decode(good)


def test_halfpel_motion():
    # half-pel interpolation identities on flat fields, then an
    # end-to-end stream whose best match IS a half-pel shift
    flat = [[77] * 24 for _ in range(24)]
    for mv in ((2, 0), (0, 2), (2, 2), (6, 4),
               (1, 0), (3, 0), (0, 1), (1, 1), (3, 3), (1, 2), (2, 3)):
        assert h264._mc_luma(flat, 4, 4, 8, 8, *mv) == [[77] * 8] * 8
        assert h264._mc_chroma(flat, 4, 4, 8, 8, *mv) == [[77] * 8] * 8
    # quarter positions average their two nearest samples (+1 >> 1):
    # on a two-valued column pattern the (1,0) sample must equal
    # avg(G, b) computed from the same taps
    two = [[10 if x < 4 else 90 for x in range(12)]] * 8
    g_val = two[0][3]
    b_val = min(255, max(0, (
        two[0][1] - 5 * two[0][2] + 20 * two[0][3] + 20 * two[0][4]
        - 5 * two[0][5] + two[0][6] + 16) >> 5))
    got = h264._mc_luma(two, 3, 2, 1, 1, 1, 0)[0][0]
    assert got == (g_val + b_val + 1) >> 1
    # 6-tap on a step edge matches the spec arithmetic
    row = [0, 0, 0, 100, 100, 100, 100, 100]
    plane = [row] * 8
    got = h264._mc_luma(plane, 2, 0, 2, 1, 2, 0)[0]
    # at x=2: taps over (0,0,0,100,100,100) -> (20*0+20*100-5*100+100+16)>>5
    assert got[0] == min(255, max(0, (0 - 0 + 0 + 2000 - 500 + 100 + 16) >> 5))
    # end-to-end: frame2 = horizontal average of neighbours (a
    # half-pel-ish signal); decode must equal the encoder recon
    rnd = random.Random(11)
    W, H = 32, 16
    y1 = [[rnd.randrange(256) for _ in range(W)] for _ in range(H)]
    u1 = [[rnd.randrange(256) for _ in range(W // 2)] for _ in range(H // 2)]
    v1 = [[rnd.randrange(256) for _ in range(W // 2)] for _ in range(H // 2)]
    y2 = [[(y1[r][c] + y1[r][min(c + 1, W - 1)]) // 2 for c in range(W)]
          for r in range(H)]
    data, recons = h264.h264_encode_with_recon(
        W, H, [(y1, u1, v1), (y2, u1, v1)], qp=8)
    w, h, frames = h264.h264_decode_frames(data)
    assert frames == recons


def test_ipcm_through_frames_decoder():
    # the CAVLC decoder handles I_PCM macroblocks too (mb_type 25 in
    # I slices): an I_PCM-only stream decodes identically through
    # both entries, and its blocks seed nC context as TotalCoeff 16
    rnd = random.Random(3)
    y = [[rnd.randrange(256) for _ in range(16)] for _ in range(16)]
    u = [[rnd.randrange(256) for _ in range(8)] for _ in range(8)]
    v = [[rnd.randrange(256) for _ in range(8)] for _ in range(8)]
    data = h264.h264_encode_ipcm(16, 16, y, u, v)
    w, h, frames = h264.h264_decode_frames(data)
    assert (w, h, frames[0]) == (16, 16, (y, u, v))
    assert h264.h264_decode(data)[2:] == (y, u, v)


def test_deblocking_filter():
    rnd = random.Random(21)
    W, H = 48, 32
    frames = []
    for _ in range(2):
        y = [[rnd.randrange(256) for _ in range(W)] for _ in range(H)]
        u = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        v = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        frames.append((y, u, v))
    # decode == encoder recon with the filter ON, across QPs
    for qp in (8, 30, 44):
        data, recons = h264.h264_encode_with_recon(
            W, H, frames, qp=qp, deblock=True)
        _, _, got = h264.h264_decode_frames(data)
        assert got == recons, qp
    # the filter must actually move pixels where thresholds admit
    _, filt = h264.h264_encode_with_recon(W, H, frames, qp=44,
                                          deblock=True)
    _, unfilt = h264.h264_encode_with_recon(W, H, frames, qp=44,
                                            deblock=False)
    assert filt != unfilt
    # strong-filter smoothing: a quantization step across an intra MB
    # edge shrinks after filtering
    base = [[100 if x < 16 else 140 for x in range(32)] for _ in range(16)]
    fr = (base, [[120] * 16] * 8, [[120] * 16] * 8)
    _, (sm,) = h264.h264_encode_with_recon(32, 16, [fr], qp=40,
                                           deblock=True)
    _, (raw,) = h264.h264_encode_with_recon(32, 16, [fr], qp=40,
                                            deblock=False)
    step_raw = abs(raw[0][0][16] - raw[0][0][15])
    step_sm = abs(sm[0][0][16] - sm[0][0][15])
    assert step_sm < step_raw


def test_b_slices_roundtrip():
    # low-delay GOP I,P,B,P,B: decode == encoder recon at several
    # QPs, with and without the in-loop filter; the B frames must be
    # coded as slice_type 1 and stay out of the reference chain
    rnd = random.Random(31)
    W, H = 48, 32
    base = [[rnd.randrange(256) for _ in range(W)] for _ in range(H)]
    frames = []
    for i in range(5):
        y = [[min(255, v + i) for v in row] for row in base]
        u = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        v = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        frames.append((y, u, v))
    for qp, db in ((0, False), (24, False), (32, True)):
        data, recons = h264.h264_encode_with_recon(
            W, H, frames, qp=qp, deblock=db)
        _, _, got = h264.h264_decode_frames(data)
        assert got == recons, (qp, db)
    types = []
    for ebsp in h264.split_annexb(data):
        rbsp = h264.ebsp_to_rbsp(ebsp)
        if rbsp[0] & 0x1F in (1, 5):
            r = h264.BitReader(rbsp[1:])
            r.ue()
            types.append(r.ue() % 5)
    assert types == [2, 0, 1, 0, 1]  # I P B P B
    # a B slice arriving without two stored refs must be rejected
    units = h264.split_annexb(data)
    keep = [u for u in units
            if (h264.ebsp_to_rbsp(u)[0] & 0x1F) in (7, 8)]
    b_units = [u for u in units
               if (h264.ebsp_to_rbsp(u)[0] & 0x1F) == 1]
    broken = b"".join(b"\x00\x00\x00\x01" + u
                      for u in keep + [b_units[-1]])
    with pytest.raises(ImageFormatError, match="reference"):
        h264.h264_decode_frames(broken)


# ---------------------------------------------------------------------------
# CABAC arm (minih264_cabac)
# ---------------------------------------------------------------------------

from goto_eater_crawler_spark.functions import minih264_cabac as cb  # noqa: E402


def test_cabac_tables_structural():
    # [self]-derived tables (Marpe et al. 2003 method): LPS share
    # shrinks monotonically in state and per-state in confidence;
    # LPS transitions never increase confidence; MPS walk saturates
    for s in range(63):
        for q in range(4):
            assert 2 <= cb.LPS_RANGE[s][q] < 256
        assert cb.LPS_RANGE[s] == sorted(cb.LPS_RANGE[s])
        if s:
            for q in range(4):
                assert cb.LPS_RANGE[s][q] <= cb.LPS_RANGE[s - 1][q]
        assert cb.TRANS_LPS[s] <= s
    assert cb.TRANS_MPS[62] == 62
    assert cb.TRANS_LPS[0] == 0  # state-0 LPS flips MPS, stays


@given(st.integers(0, 10**9))
@settings(max_examples=25, deadline=None)
def test_cabac_engine_roundtrip(seed):
    # mixed schedule of context-coded, bypass, and mid-stream
    # terminate(0) bins -> decode reproduces every bit
    rnd = random.Random(seed)
    n = rnd.randint(1, 400)
    schedule = []
    for _ in range(n):
        kind = rnd.choice(("ctx", "ctx", "ctx", "byp", "term"))
        key = rnd.randrange(5)
        bit = rnd.randrange(2) if kind != "term" else 0
        schedule.append((kind, key, bit))
    w = h264.BitWriter()
    e = cb.CabacEncoder(w)
    ctx = cb._Ctx()
    for kind, key, bit in schedule:
        if kind == "ctx":
            e.encode(ctx("t", key), bit)
        elif kind == "byp":
            e.encode_bypass(bit)
        else:
            e.encode_terminate(0)
    e.encode_terminate(1)
    w.byte_align_zero()
    d = cb.CabacDecoder(w.to_bytes())
    ctx2 = cb._Ctx()
    for kind, key, bit in schedule:
        if kind == "ctx":
            assert d.decode(ctx2("t", key)) == bit
        elif kind == "byp":
            assert d.decode_bypass() == bit
        else:
            assert d.decode_terminate() == 0
    assert d.decode_terminate() == 1


def test_cabac_engine_adapts():
    # a heavily biased source must code well below 1 bit/bin once the
    # context has adapted (the whole point of the state machine)
    w = h264.BitWriter()
    e = cb.CabacEncoder(w)
    ctx = cb._Ctx()
    n = 4000
    for _ in range(n):
        e.encode(ctx("b"), 0)
    e.encode_terminate(1)
    w.byte_align_zero()
    assert len(w.to_bytes()) * 8 < n / 4


@given(st.integers(0, 10**9))
@settings(max_examples=10, deadline=None)
def test_cabac_flat_class_lossless(seed):
    rnd = random.Random(seed)
    mbw, mbh = rnd.randint(1, 3), rnd.randint(1, 2)
    W, H = mbw * 16, mbh * 16
    n = mbw * mbh
    f1 = _flat_frame(W, H, mbw,
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)],
                     [rnd.randint(98, 158) for _ in range(n)])
    data = cb.h264_encode_cabac(W, H, [f1], qp=0)
    w, h, frames = h264.h264_decode_frames(data)
    assert (w, h) == (W, H)
    assert frames == [f1]


@given(st.integers(0, 10**9))
@settings(max_examples=10, deadline=None)
def test_cabac_decode_matches_encoder_recon(seed):
    # arbitrary content, mixed QP: the CABAC decode must equal the
    # intra encoder's own reconstruction (shared with the CAVLC arm
    # up to the entropy layer), frame by frame
    rnd = random.Random(seed)
    W = 2 * rnd.randrange(8, 25)
    H = 2 * rnd.randrange(8, 17)
    qp = rnd.choice([0, 4, 12, 23, 34, 45])
    frames_in = []
    for _ in range(rnd.randint(1, 2)):
        y = [[rnd.randrange(256) for _ in range(W)] for _ in range(H)]
        u = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        v = [[rnd.randrange(256) for _ in range(W // 2)]
             for _ in range(H // 2)]
        frames_in.append((y, u, v))
    data = cb.h264_encode_cabac(W, H, frames_in, qp=qp)
    w, h, frames = h264.h264_decode_frames(data)
    assert (w, h) == (W, H)
    for fi, fr in enumerate(frames_in):
        _, recons = h264.h264_encode_with_recon(W, H, [fr], qp=qp)
        assert frames[fi] == recons[0]


def test_cabac_rejection_surface():
    f = _flat_frame(16, 16, 1, [128], [128], [128])
    data = cb.h264_encode_cabac(16, 16, [f], qp=0)
    # the I_PCM-only decoder refuses CABAC streams with a clear error
    with pytest.raises(ImageFormatError, match="CABAC"):
        h264.h264_decode(data)


@given(st.integers(0, 10**9))
@settings(max_examples=8, deadline=None)
def test_cabac_inter_roundtrip(seed):
    # CABAC I/P/B streams decode to the encoder's own reconstruction
    # across QPs, sizes, skip-inducing identical frames, and subpel
    rnd = random.Random(seed)
    mbw, mbh = rnd.randint(1, 3), rnd.randint(1, 2)
    w, hh = mbw * 16, mbh * 16
    qp = rnd.choice([0, 8, 20, 30, 40])
    frames = []
    base = [[rnd.randrange(40, 216) for _ in range(w)] for _ in range(hh)]
    for fi in range(rnd.randint(2, 5)):
        if fi and rnd.random() < 0.3:
            frames.append(frames[-1])  # P_Skip coverage
            continue
        dy = rnd.randrange(-4, 5)
        y = [[min(255, max(0, base[r][c] + dy + rnd.randrange(-2, 3)))
              for c in range(w)] for r in range(hh)]
        u = [[rnd.randrange(90, 170) for _ in range(w // 2)]
             for _ in range(hh // 2)]
        v = [[rnd.randrange(90, 170) for _ in range(w // 2)]
             for _ in range(hh // 2)]
        frames.append((y, u, v))
    data, recons = cb.h264_encode_cabac_video(
        w, hh, frames, qp=qp, subpel=bool(seed % 2))
    dw, dh, dec = h264.h264_decode_frames(data)
    assert (dw, dh) == (w, hh) and len(dec) == len(frames)
    for df, rf in zip(dec, recons):
        assert list(df) == list(rf)


def test_cabac_cavlc_recon_parity():
    # the two entropy arms share every transform/prediction helper, so
    # identical input must give IDENTICAL reconstructions — a defect
    # in either arm's entropy layer shows as a decode mismatch instead
    rnd = random.Random(7)
    w, hh = 48, 32
    frames = []
    for fi in range(4):
        y = [[rnd.randrange(60, 200) for _ in range(w)] for _ in range(hh)]
        u = [[rnd.randrange(90, 170) for _ in range(w // 2)]
             for _ in range(hh // 2)]
        v = [[rnd.randrange(90, 170) for _ in range(w // 2)]
             for _ in range(hh // 2)]
        frames.append((y, u, v))
    _, rec_cavlc = h264.h264_encode_with_recon(
        w, hh, frames, qp=12, subpel=True)
    data, rec_cabac = cb.h264_encode_cabac_video(
        w, hh, frames, qp=12, subpel=True)
    assert rec_cavlc == rec_cabac
    _, _, dec = h264.h264_decode_frames(data)
    assert [list(f) for f in dec] == [list(f) for f in rec_cabac]


def test_cabac_inter_compression_and_skip():
    # identical frames after the IDR must P_Skip into a few bytes/frame
    f = _flat_frame(48, 32, 3, [120] * 6, [110] * 6, [130] * 6)
    data, _ = cb.h264_encode_cabac_video(48, 32, [f] * 6, qp=0)
    one, _ = cb.h264_encode_cabac_video(48, 32, [f], qp=0)
    assert len(data) - len(one) < 5 * 20  # ~<20 bytes per skipped frame
