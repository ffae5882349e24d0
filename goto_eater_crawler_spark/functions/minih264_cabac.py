"""CABAC entropy-coding arm for minih264 (Rec. H.264 §9.3) — closes
the codec family's last documented stub.  Scope: the SAME I/P/B
16x16 subset as the CAVLC arm, re-entropy-coded — IDR I slices of
I_16x16 (DC intra prediction), P slices with P_Skip/P_L0_16x16, and
B slices with B_L0/B_L1/B_Bi_16x16 over low-delay both-past
reference lists; reconstruction, motion search, and sub-pel
interpolation are minih264's own helpers, so the two entropy arms
produce IDENTICAL reconstructions for identical input (pytest-
pinned).  Still rejected: B_Skip/direct, intra-in-inter-slices,
sub-16x16 partitions, per-MB QP changes.

Spec-STRUCTURAL pieces (§9.3 flow followed exactly):
- decoding engine (§9.3.3.2): 9-bit codIRange/codIOffset, quantized
  range index (range>>6)&3, MPS/LPS resolution, state 0 MPS flip,
  bit-at-a-time renormalization, DecodeBypass, DecodeTerminate
  (range -= 2, no adaptation, renorm only on the continue path);
- encoding engine (§9.3.4): low/range mirror with outstanding-bit
  accounting (PutBit), the first emitted bit discarded, bypass with
  doubled low, and EncodeFlush (range=2, renorm, (low>>9)&1 then
  ((low>>7)&3)|1 — the trailing 1 doubles as the RBSP stop bit);
- binarizations (§9.3.2): TU for coeff prefixes (cMax 14), UEG0
  bypass suffix, per-bin context selection, forward-scan
  significance map with last-significant flags and the implicit
  final-position rule, reverse-scan level coding with the
  numDecodAbsLevelGt1/Eq1 context schedule, end_of_slice_flag via
  the terminate engine after every macroblock.

Honesty note (the minivp8/miniwebp/minih264 contract, accepted in
r3/r4): the probability TABLES are [self], regenerated from the
published derivation in Marpe, Schwarz & Wiegand, "Context-Based
Adaptive Binary Arithmetic Coding in the H.264/AVC Video Compression
Standard" (IEEE TCSVT 2003): p0 = 0.5, alpha = (0.01875/0.5)^(1/63),
rangeTabLPS[s][q] = round(Q_q * p_s) on the quantized-range interval
midpoints Q = (288, 352, 416, 480), transIdxMPS[s] = min(s+1, 62),
and transIdxLPS[s] = the state nearest the LPS-updated probability
alpha*p_s + (1-alpha).  Rounding detail may differ +/-1 from the
spec's printed Table 9-44, so byte-level third-party interop is NOT
claimed for this arm.  The context LAYOUT is likewise [self]: the
spec's global ctxIdx table is replaced by descriptive keys with the
same neighbour/position/schedule conditioning, all initialized to
(state 0, MPS 0) — "uniform init" — instead of the spec's per-QP
(m, n) init tables.  Encoder and decoder share one engine and one
context pool, and tests fuzz-pin decode == encoder reconstruction
end-to-end, so the arm is exact and deterministic under the same
self-consistency contract as the VLC [self] tables.

The reference crawler has no video analogue (its binaries are
PDFs/XLSX, both really decoded); like the rest of minih264 this is
build-spec frontier surface (multimodal pipeline), not parity.
"""

from __future__ import annotations

from .miniimg import ImageFormatError

# ---------------------------------------------------------------------------
# [self] probability tables — Marpe et al. 2003 derivation (see module
# docstring); validated structurally at import.
# ---------------------------------------------------------------------------

_ALPHA = (0.01875 / 0.5) ** (1.0 / 63.0)
_P_LPS = [0.5 * _ALPHA ** s for s in range(64)]
# quantized-range interval midpoints for (range>>6)&3 in [256, 511]
_Q_MID = (288, 352, 416, 480)

LPS_RANGE = [
    [max(2, int(round(q * _P_LPS[s]))) for q in _Q_MID] for s in range(64)
]
TRANS_MPS = [min(s + 1, 62) for s in range(64)]


def _nearest_state(p: float) -> int:
    return min(range(63), key=lambda k: abs(_P_LPS[k] - p))


TRANS_LPS = [
    _nearest_state(_ALPHA * _P_LPS[s] + (1.0 - _ALPHA)) for s in range(64)
]

# structural invariants: LPS share shrinks with state, stays codable
for _s in range(63):
    for _q in range(4):
        assert 2 <= LPS_RANGE[_s][_q] < 256
        if _s:
            assert LPS_RANGE[_s][_q] <= LPS_RANGE[_s - 1][_q]
    assert TRANS_LPS[_s] <= _s  # LPS never increases confidence


# ---------------------------------------------------------------------------
# arithmetic engine (§9.3.3.2 decode / §9.3.4 encode)
# ---------------------------------------------------------------------------


class CabacEncoder:
    """§9.3.4 M-coder mirror of :class:`CabacDecoder`.  ``ctx`` is a
    mutable ``[state, mps]`` pair owned by the shared context pool."""

    def __init__(self, writer) -> None:
        self.w = writer
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self._first = True

    def _put(self, bit: int) -> None:
        if self._first:
            self._first = False
        else:
            self.w.u(1, bit)
        while self.outstanding:
            self.w.u(1, 1 - bit)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put(1)
            elif self.low < 256:
                self._put(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.low <<= 1
            self.range <<= 1

    def encode(self, ctx: list, bit: int) -> None:
        rlps = LPS_RANGE[ctx[0]][(self.range >> 6) & 3]
        self.range -= rlps
        if bit != ctx[1]:
            self.low += self.range
            self.range = rlps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = TRANS_LPS[ctx[0]]
        else:
            ctx[0] = TRANS_MPS[ctx[0]]
        self._renorm()

    def encode_bypass(self, bit: int) -> None:
        self.low <<= 1
        if bit:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._put(1)
        elif self.low < 512:
            self._put(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def encode_terminate(self, bit: int) -> None:
        self.range -= 2
        if bit:
            self.low += self.range
            self.range = 2
            self._renorm()
            # EncodeFlush (§9.3.4.5); the final forced 1 is the stop bit
            self._put((self.low >> 9) & 1)
            self.w.u(2, ((self.low >> 7) & 3) | 1)
        else:
            self._renorm()


class CabacDecoder:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()

    def _bit(self) -> int:
        # past-the-end renormalization bits read as 0 (the encoder's
        # flush guarantees the decisions no longer depend on them)
        byte = self._pos >> 3
        b = (
            (self._data[byte] >> (7 - (self._pos & 7))) & 1
            if byte < len(self._data)
            else 0
        )
        self._pos += 1
        return b

    def _renorm(self) -> None:
        while self.range < 256:
            self.range <<= 1
            self.offset = ((self.offset << 1) | self._bit()) & 0x1FFFF

    def decode(self, ctx: list) -> int:
        rlps = LPS_RANGE[ctx[0]][(self.range >> 6) & 3]
        self.range -= rlps
        if self.offset >= self.range:
            bit = 1 - ctx[1]
            self.offset -= self.range
            self.range = rlps
            if ctx[0] == 0:
                ctx[1] = 1 - ctx[1]
            ctx[0] = TRANS_LPS[ctx[0]]
        else:
            bit = ctx[1]
            ctx[0] = TRANS_MPS[ctx[0]]
        self._renorm()
        return bit

    def decode_bypass(self) -> int:
        self.offset = ((self.offset << 1) | self._bit()) & 0x1FFFF
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        self._renorm()
        return 0


class _Ctx:
    """Shared context pool: descriptive keys -> mutable [state, mps],
    uniform-initialized ([self]; see module honesty note)."""

    def __init__(self) -> None:
        self._m: dict = {}

    def __call__(self, *key) -> list:
        c = self._m.get(key)
        if c is None:
            c = [0, 0]
            self._m[key] = c
        return c


# ---------------------------------------------------------------------------
# binarization helpers shared by encode/decode (§9.3.2)
# ---------------------------------------------------------------------------

_TU_CMAX = 14  # coeff_abs_level_minus1 prefix cap before the EG0 suffix


def _enc_level(e: CabacEncoder, ctx: _Ctx, cat: int, val: int,
               num_eq1: int, num_gt1: int) -> None:
    """coeff_abs_level_minus1: TU(14) prefix + EG0 bypass suffix."""
    inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
    incN = 5 + min(4, num_gt1)
    prefix = min(val, _TU_CMAX)
    for i in range(prefix):
        e.encode(ctx("abs", cat, inc0 if i == 0 else incN), 1)
    if prefix < _TU_CMAX:
        e.encode(ctx("abs", cat, inc0 if prefix == 0 else incN), 0)
    else:
        v = val - _TU_CMAX
        k = 0
        while v >= (1 << k):
            e.encode_bypass(1)
            v -= 1 << k
            k += 1
        e.encode_bypass(0)
        for i in range(k - 1, -1, -1):
            e.encode_bypass((v >> i) & 1)


def _dec_level(d: CabacDecoder, ctx: _Ctx, cat: int,
               num_eq1: int, num_gt1: int) -> int:
    inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
    incN = 5 + min(4, num_gt1)
    prefix = 0
    while prefix < _TU_CMAX and d.decode(
        ctx("abs", cat, inc0 if prefix == 0 else incN)
    ):
        prefix += 1
    if prefix < _TU_CMAX:
        return prefix
    k = 0
    base = 0
    while d.decode_bypass():
        base += 1 << k
        k += 1
    v = 0
    for _ in range(k):
        v = (v << 1) | d.decode_bypass()
    return _TU_CMAX + base + v


def _enc_block(e: CabacEncoder, ctx: _Ctx, cat: int, coeffs: list,
               cbf_inc: int) -> int:
    """residual_block_cabac (§7.3.5.3.3 order): coded_block_flag,
    forward-scan significance map, reverse-scan levels + bypass
    signs.  Returns the coded_block_flag for the neighbour grids."""
    n = len(coeffs)
    cbf = 1 if any(coeffs) else 0
    e.encode(ctx("cbf", cat, cbf_inc), cbf)
    if not cbf:
        return 0
    sig = [1 if c else 0 for c in coeffs]
    last = max(i for i in range(n) if sig[i])
    for i in range(n - 1):
        e.encode(ctx("sig", cat, i), sig[i])
        if sig[i]:
            e.encode(ctx("last", cat, i), 1 if i == last else 0)
            if i == last:
                break
    num_eq1 = num_gt1 = 0
    for i in range(last, -1, -1):
        if not sig[i]:
            continue
        a = abs(coeffs[i])
        _enc_level(e, ctx, cat, a - 1, num_eq1, num_gt1)
        e.encode_bypass(1 if coeffs[i] < 0 else 0)
        if a == 1:
            num_eq1 += 1
        else:
            num_gt1 += 1
    return 1


def _dec_block(d: CabacDecoder, ctx: _Ctx, cat: int, n: int,
               cbf_inc: int) -> tuple:
    if not d.decode(ctx("cbf", cat, cbf_inc)):
        return [0] * n, 0
    sig = [0] * n
    last = n - 1
    i = 0
    while i < n - 1:
        sig[i] = d.decode(ctx("sig", cat, i))
        if sig[i] and d.decode(ctx("last", cat, i)):
            last = i
            break
        i += 1
    if i == n - 1:
        sig[n - 1] = 1  # implicit: no earlier last-flag fired
    else:
        for j in range(last + 1, n):
            sig[j] = 0
    coeffs = [0] * n
    num_eq1 = num_gt1 = 0
    for i in range(last, -1, -1):
        if not sig[i]:
            continue
        a = _dec_level(d, ctx, cat, num_eq1, num_gt1) + 1
        if d.decode_bypass():
            a = -a
        coeffs[i] = a
        aa = abs(a)
        if aa == 1:
            num_eq1 += 1
        else:
            num_gt1 += 1
    return coeffs, 1


# block categories ([self] ids in spec order): 0 Intra16x16DCLevel,
# 1 Intra16x16ACLevel, 3 ChromaDCLevel, 4 ChromaACLevel
_CAT_LDC, _CAT_LAC, _CAT_CDC, _CAT_CAC = 0, 1, 3, 4


class _CbfGrids:
    """Per-category coded_block_flag neighbour state for ctxIdxInc =
    condA + 2*condB (left/top same-category block; unavailable -> 0,
    a documented [self] simplification of §9.3.3.1.1.9)."""

    def __init__(self, mb_w: int, mb_h: int) -> None:
        self.ldc = [[0] * mb_w for _ in range(mb_h)]
        self.lac = [[0] * (mb_w * 4) for _ in range(mb_h * 4)]
        self.cdc = [
            [[0] * mb_w for _ in range(mb_h)] for _ in (0, 1)
        ]
        self.cac = [
            [[0] * (mb_w * 2) for _ in range(mb_h * 2)] for _ in (0, 1)
        ]

    @staticmethod
    def _inc(grid: list, x: int, y: int) -> int:
        a = grid[y][x - 1] if x > 0 else 0
        b = grid[y - 1][x] if y > 0 else 0
        return a + 2 * b


# luma 4x4 sub-block raster offsets, matching minih264._BLK_XY order
def _blk_xy(idx: int) -> tuple:
    from .minih264 import _BLK_XY

    return _BLK_XY[idx]


# ---------------------------------------------------------------------------
# I_16x16 macroblock layer (encode/decode mirrors)
# ---------------------------------------------------------------------------


def _mb_header_enc(e: CabacEncoder, ctx: _Ctx, mbx: int, mby: int,
                   cbp_l: int, cbp_c: int, pm: int) -> None:
    # mb_type: bin0 "not I_4x4" with neighbour-availability inc,
    # bin1 "not I_PCM" via the terminate engine (§9.3.2.5), then
    # cbp-luma flag, cbp-chroma (TU2), 2 pred-mode bits
    inc = (1 if mbx > 0 else 0) + (1 if mby > 0 else 0)
    e.encode(ctx("mbtype_i", inc), 1)
    e.encode_terminate(0)  # not I_PCM
    e.encode(ctx("mbt_cbpl"), 1 if cbp_l else 0)
    e.encode(ctx("mbt_cbpc0"), 1 if cbp_c else 0)
    if cbp_c:
        e.encode(ctx("mbt_cbpc1"), 1 if cbp_c == 2 else 0)
    e.encode(ctx("mbt_pm0"), (pm >> 1) & 1)
    e.encode(ctx("mbt_pm1"), pm & 1)
    # intra_chroma_pred_mode = DC (TU bin 0), mb_qp_delta = 0
    e.encode(ctx("icp", 0), 0)
    e.encode(ctx("qpd", 0), 0)


def _mb_header_dec(d: CabacDecoder, ctx: _Ctx, mbx: int, mby: int) -> tuple:
    inc = (1 if mbx > 0 else 0) + (1 if mby > 0 else 0)
    if not d.decode(ctx("mbtype_i", inc)):
        raise ImageFormatError(
            "h264: CABAC I_4x4 macroblocks unsupported (I_16x16 subset)"
        )
    if d.decode_terminate():
        raise ImageFormatError("h264: CABAC I_PCM unsupported")
    cbp_l = 15 if d.decode(ctx("mbt_cbpl")) else 0
    cbp_c = 0
    if d.decode(ctx("mbt_cbpc0")):
        cbp_c = 2 if d.decode(ctx("mbt_cbpc1")) else 1
    pm = (d.decode(ctx("mbt_pm0")) << 1) | d.decode(ctx("mbt_pm1"))
    if d.decode(ctx("icp", 0)):
        raise ImageFormatError(
            "h264: CABAC non-DC chroma intra prediction unsupported"
        )
    if d.decode(ctx("qpd", 0)):
        raise ImageFormatError("h264: CABAC mb_qp_delta unsupported")
    return cbp_l, cbp_c, pm


def _mb_residual_enc(e: CabacEncoder, ctx: _Ctx, g: _CbfGrids,
                     cbp_l: int, cbp_c: int,
                     dc_scan: list, ac_scans: list, cdc: tuple,
                     cac: tuple, mbx: int, mby: int) -> None:
    bx0, by0 = mbx * 4, mby * 4
    g.ldc[mby][mbx] = _enc_block(
        e, ctx, _CAT_LDC, dc_scan, g._inc(g.ldc, mbx, mby)
    )
    if cbp_l:
        for idx in range(16):
            bx, by = _blk_xy(idx)
            x, y = bx0 + bx, by0 + by
            g.lac[y][x] = _enc_block(
                e, ctx, _CAT_LAC, ac_scans[idx], g._inc(g.lac, x, y)
            )
    cx0, cy0 = mbx * 2, mby * 2
    if cbp_c:
        for comp in (0, 1):
            g.cdc[comp][mby][mbx] = _enc_block(
                e, ctx, _CAT_CDC, cdc[comp],
                g._inc(g.cdc[comp], mbx, mby),
            )
    if cbp_c == 2:
        for comp in (0, 1):
            for idx in range(4):
                bx, by = idx & 1, idx >> 1
                x, y = cx0 + bx, cy0 + by
                g.cac[comp][y][x] = _enc_block(
                    e, ctx, _CAT_CAC, cac[comp][idx],
                    g._inc(g.cac[comp], x, y),
                )


def _mb_residual_dec(d: CabacDecoder, ctx: _Ctx, g: _CbfGrids,
                     cbp_l: int, cbp_c: int, mbx: int, mby: int) -> tuple:
    bx0, by0 = mbx * 4, mby * 4
    dc_scan, cbf = _dec_block(
        d, ctx, _CAT_LDC, 16, g._inc(g.ldc, mbx, mby)
    )
    g.ldc[mby][mbx] = cbf
    ac_scans = []
    nz16 = []
    for idx in range(16):
        bx, by = _blk_xy(idx)
        x, y = bx0 + bx, by0 + by
        if cbp_l:
            blk, cbf = _dec_block(
                d, ctx, _CAT_LAC, 15, g._inc(g.lac, x, y)
            )
            g.lac[y][x] = cbf
        else:
            blk = [0] * 15
        ac_scans.append(blk)
        nz16.append((x, y, sum(1 for v in blk if v)))
    cdc = [[0] * 4, [0] * 4]
    if cbp_c:
        for comp in (0, 1):
            cdc[comp], cbf = _dec_block(
                d, ctx, _CAT_CDC, 4, g._inc(g.cdc[comp], mbx, mby)
            )
            g.cdc[comp][mby][mbx] = cbf
    cac = [[], []]
    cx0, cy0 = mbx * 2, mby * 2
    nzc = []
    for comp in (0, 1):
        for idx in range(4):
            bx, by = idx & 1, idx >> 1
            x, y = cx0 + bx, cy0 + by
            if cbp_c == 2:
                blk, cbf = _dec_block(
                    d, ctx, _CAT_CAC, 15, g._inc(g.cac[comp], x, y)
                )
                g.cac[comp][y][x] = cbf
            else:
                blk = [0] * 15
            cac[comp].append(blk)
            nzc.append((comp, x, y, sum(1 for v in blk if v)))
    return dc_scan, ac_scans, cdc, cac, nz16, nzc


# ---------------------------------------------------------------------------
# frame-level encoder / slice decoder (wired from minih264)
# ---------------------------------------------------------------------------


def h264_encode_cabac(width: int, height: int, frames, qp: int = 0) -> bytes:
    """Encode frames as a CABAC Annex-B stream: SPS, PPS with
    entropy_coding_mode_flag=1, and one IDR I slice of I_16x16
    macroblocks (DC prediction) per frame.  Mirrors the intra path of
    minih264._encode_cavlc exactly up to the entropy layer."""
    from . import minih264 as h

    if not frames:
        raise ValueError("h264: no frames")
    if width % 2 or height % 2:
        raise ValueError("h264: dimensions must be even (4:2:0 chroma)")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    pw, ph = mb_w * 16, mb_h * 16
    crop_r, crop_b = (pw - width) // 2, (ph - height) // 2
    cqp = h._chroma_qp(qp)

    w = h.BitWriter()
    w.u(8, 66)
    w.u(8, 0xC0)
    w.u(8, 10)
    w.ue(0)
    w.ue(0)
    w.ue(2)  # pic_order_cnt_type = 2
    w.ue(1)
    w.u(1, 0)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)
    w.u(1, 0)
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    out = bytearray(h._nal(7, 3, w.to_bytes()))

    w = h.BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode_flag: CABAC
    w.u(1, 0)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(1, 0)
    w.u(2, 0)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)  # deblocking_filter_control_present
    w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    out += h._nal(8, 3, w.to_bytes())

    for ys, us, vs in frames:
        src_y = h._pad_plane(ys, width, height, pw, ph)
        src_u = h._pad_plane(us, width // 2, height // 2, pw // 2, ph // 2)
        src_v = h._pad_plane(vs, width // 2, height // 2, pw // 2, ph // 2)
        cur_y = [[0] * pw for _ in range(ph)]
        cur_u = [[0] * (pw // 2) for _ in range(ph // 2)]
        cur_v = [[0] * (pw // 2) for _ in range(ph // 2)]

        w = h.BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: all-I
        w.ue(0)  # pps_id
        w.u(4, 0)  # frame_num (every frame IDR)
        w.ue(0)  # idr_pic_id
        w.u(1, 0)
        w.u(1, 0)
        w.se(qp - 26)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc: off
        # cabac_alignment_one_bit (§7.3.4)
        while len(w._bits) % 8:
            w.u(1, 1)

        e = CabacEncoder(w)
        ctx = _Ctx()
        g = _CbfGrids(mb_w, mb_h)
        nmbs = mb_w * mb_h
        for mbi in range(nmbs):
            mbx, mby = mbi % mb_w, mbi // mb_w
            px, py = mbx * 16, mby * 16
            cx, cy = px // 2, py // 2
            pred_y = h._pred_i16(cur_y, px, py, 2, mbx > 0, mby > 0)
            dc_scan, ac_scans, rec_res = h._enc_i16_luma(
                h._sub(src_y, pred_y, px, py, 16), qp
            )
            pred_u = h._pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
            pred_v = h._pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
            cdcu, cacu, rec_u = h._enc_chroma(
                h._sub(src_u, pred_u, cx, cy, 8), cqp, True
            )
            cdcv, cacv, rec_v = h._enc_chroma(
                h._sub(src_v, pred_v, cx, cy, 8), cqp, True
            )
            cbp_l = 15 if any(v for s in ac_scans for v in s) else 0
            if any(v for comp in (cacu, cacv) for s in comp for v in s):
                cbp_c = 2
            elif any(cdcu) or any(cdcv):
                cbp_c = 1
            else:
                cbp_c = 0
            _mb_header_enc(e, ctx, mbx, mby, cbp_l, cbp_c, 2)
            _mb_residual_enc(
                e, ctx, g, cbp_l, cbp_c, dc_scan, ac_scans,
                (cdcu, cdcv), (cacu, cacv), mbx, mby,
            )
            e.encode_terminate(1 if mbi == nmbs - 1 else 0)
            h._place(cur_y, h._add_clip(pred_y, rec_res), px, py)
            h._place(cur_u, h._add_clip(pred_u, rec_u), cx, cy)
            h._place(cur_v, h._add_clip(pred_v, rec_v), cx, cy)
        w.byte_align_zero()
        out += h._nal(5, 3, w.to_bytes())
    return bytes(out)


def decode_i_slice(r, qp: int, cqp: int, mb_w: int, mb_h: int,
                   cur_y: list, cur_u: list, cur_v: list,
                   nz_y: list, nz_c: tuple, minfo: list) -> None:
    """Parse one CABAC I slice from BitReader ``r`` (positioned after
    the slice header) into the caller's frame buffers.  Called from
    minih264.h264_decode_frames when the active PPS sets
    entropy_coding_mode_flag."""
    from . import minih264 as h

    # cabac_alignment_one_bit: byte-align on 1-bits
    while r.pos % 8:
        if r.u(1) != 1:
            raise ImageFormatError("h264: bad cabac_alignment_one_bit")
    d = CabacDecoder(r._data[r.pos >> 3:])
    ctx = _Ctx()
    g = _CbfGrids(mb_w, mb_h)
    nmbs = mb_w * mb_h
    for mbi in range(nmbs):
        mbx, mby = mbi % mb_w, mbi // mb_w
        px, py = mbx * 16, mby * 16
        cx, cy = px // 2, py // 2
        cbp_l, cbp_c, pm = _mb_header_dec(d, ctx, mbx, mby)
        dc_scan, ac_scans, cdc, cac, nz16, nzc = _mb_residual_dec(
            d, ctx, g, cbp_l, cbp_c, mbx, mby
        )
        for x, y, t in nz16:
            nz_y[y][x] = t
        for comp, x, y, t in nzc:
            nz_c[comp][y][x] = t
        pred_y = h._pred_i16(cur_y, px, py, pm, mbx > 0, mby > 0)
        pred_u = h._pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
        pred_v = h._pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
        h._place(
            cur_y,
            h._add_clip(pred_y, h._recon_i16_luma(dc_scan, ac_scans, qp)),
            px, py,
        )
        h._place(
            cur_u,
            h._add_clip(pred_u, h._recon_chroma(cdc[0], cac[0], cqp)),
            cx, cy,
        )
        h._place(
            cur_v,
            h._add_clip(pred_v, h._recon_chroma(cdc[1], cac[1], cqp)),
            cx, cy,
        )
        minfo[mby][mbx] = ("I",)
        eos = d.decode_terminate()
        if eos != (1 if mbi == nmbs - 1 else 0):
            raise ImageFormatError("h264: CABAC end_of_slice mismatch")


# ---------------------------------------------------------------------------
# Inter (P/B) slice layer — round-4 session-14 extension closing the
# CABAC-inter stub.  Same [self] context-layout contract as the intra
# arm (descriptive keys, uniform init); binarizations follow §9.3.2:
# mb_skip_flag (neighbour-conditioned), P/B mb_type bin trees, mvd as
# UEG3 (TU(9) context prefix with the 3/32 neighbour-threshold inc for
# bin 0, EG3 bypass suffix, bypass sign), inter coded_block_pattern
# (4 neighbour-conditioned luma bins + 2 chroma bins), LumaLevel4x4
# residual category for inter blocks.  Reconstruction, motion search,
# and sub-pel interpolation are minih264's own helpers — only the
# entropy layer differs from the CAVLC arm (minih264.py:1434-1760).
# ---------------------------------------------------------------------------

_CAT_L4 = 2  # LumaLevel4x4 (inter luma residual blocks, 16 coeffs)


class _InterState:
    """Per-slice neighbour state for inter context increments."""

    def __init__(self, mb_w: int, mb_h: int) -> None:
        self.skip = [[0] * mb_w for _ in range(mb_h)]      # P_Skip flags
        self.coded = [[0] * mb_w for _ in range(mb_h)]     # any coded MB
        self.mvda = {
            0: [[(0, 0)] * mb_w for _ in range(mb_h)],
            1: [[(0, 0)] * mb_w for _ in range(mb_h)],
        }
        self.cb8 = [[0] * (mb_w * 2) for _ in range(mb_h * 2)]  # luma 8x8
        self.cbc = [[0] * mb_w for _ in range(mb_h)]            # chroma cbp


def _skip_inc(s: _InterState, mbx: int, mby: int) -> int:
    a = 1 if mbx > 0 and s.coded[mby][mbx - 1] and not s.skip[mby][mbx - 1] \
        else 0
    b = 1 if mby > 0 and s.coded[mby - 1][mbx] and not s.skip[mby - 1][mbx] \
        else 0
    return a + b


def _mvd_inc(s: _InterState, lst: int, comp: int, mbx: int, mby: int) -> int:
    e = 0
    if mbx > 0:
        e += s.mvda[lst][mby][mbx - 1][comp]
    if mby > 0:
        e += s.mvda[lst][mby - 1][mbx][comp]
    if e < 3:
        return 0
    return 1 if e <= 32 else 2


def _enc_mvd(e: CabacEncoder, ctx: _Ctx, lst: int, comp: int,
             inc0: int, val: int) -> None:
    """mvd UEG3: TU(9) context prefix, EG3 bypass suffix, bypass sign."""
    u = abs(val)
    prefix = min(u, 9)
    for i in range(prefix):
        e.encode(ctx("mvd", comp, inc0 if i == 0 else min(i + 2, 6)), 1)
    if prefix < 9:
        e.encode(ctx("mvd", comp, inc0 if prefix == 0 else
                     min(prefix + 2, 6)), 0)
    else:
        v = u - 9
        k = 3
        while v >= (1 << k):
            e.encode_bypass(1)
            v -= 1 << k
            k += 1
        e.encode_bypass(0)
        for i in range(k - 1, -1, -1):
            e.encode_bypass((v >> i) & 1)
    if u:
        e.encode_bypass(1 if val < 0 else 0)


def _dec_mvd(d: CabacDecoder, ctx: _Ctx, lst: int, comp: int,
             inc0: int) -> int:
    prefix = 0
    while prefix < 9 and d.decode(
        ctx("mvd", comp, inc0 if prefix == 0 else min(prefix + 2, 6))
    ):
        prefix += 1
    u = prefix
    if prefix == 9:
        k = 3
        base = 0
        while d.decode_bypass():
            base += 1 << k
            k += 1
        v = 0
        for _ in range(k):
            v = (v << 1) | d.decode_bypass()
        u = 9 + base + v
    if u and d.decode_bypass():
        return -u
    return u


def _cbp_inc_l(s: _InterState, gx: int, gy: int) -> int:
    # condTermN = neighbouring 8x8's cbp bit == 0 (unavailable -> 0)
    a = 1 if gx > 0 and s.cb8[gy][gx - 1] == 0 else 0
    b = 1 if gy > 0 and s.cb8[gy - 1][gx] == 0 else 0
    # within-frame availability: crossing a MB row/col boundary into
    # an uncoded area still reads 0 from the grid, the documented
    # [self] simplification (matches the intra arm's _CbfGrids rule)
    if gx == 0:
        a = 0
    if gy == 0:
        b = 0
    return a + 2 * b


def _enc_cbp(e: CabacEncoder, ctx: _Ctx, s: _InterState, mbx: int,
             mby: int, cbp_l: int, cbp_c: int) -> None:
    gx0, gy0 = mbx * 2, mby * 2
    for i8 in range(4):
        gx, gy = gx0 + (i8 & 1), gy0 + (i8 >> 1)
        bit = (cbp_l >> i8) & 1
        e.encode(ctx("cbp_l", _cbp_inc_l(s, gx, gy)), bit)
        s.cb8[gy][gx] = bit
    a = 1 if mbx > 0 and s.cbc[mby][mbx - 1] else 0
    b = 1 if mby > 0 and s.cbc[mby - 1][mbx] else 0
    e.encode(ctx("cbp_c0", a + 2 * b), 1 if cbp_c else 0)
    if cbp_c:
        a2 = 1 if mbx > 0 and s.cbc[mby][mbx - 1] == 2 else 0
        b2 = 1 if mby > 0 and s.cbc[mby - 1][mbx] == 2 else 0
        e.encode(ctx("cbp_c1", a2 + 2 * b2), 1 if cbp_c == 2 else 0)
    s.cbc[mby][mbx] = cbp_c


def _dec_cbp(d: CabacDecoder, ctx: _Ctx, s: _InterState, mbx: int,
             mby: int) -> tuple:
    gx0, gy0 = mbx * 2, mby * 2
    cbp_l = 0
    for i8 in range(4):
        gx, gy = gx0 + (i8 & 1), gy0 + (i8 >> 1)
        bit = d.decode(ctx("cbp_l", _cbp_inc_l(s, gx, gy)))
        cbp_l |= bit << i8
        s.cb8[gy][gx] = bit
    a = 1 if mbx > 0 and s.cbc[mby][mbx - 1] else 0
    b = 1 if mby > 0 and s.cbc[mby - 1][mbx] else 0
    cbp_c = 0
    if d.decode(ctx("cbp_c0", a + 2 * b)):
        a2 = 1 if mbx > 0 and s.cbc[mby][mbx - 1] == 2 else 0
        b2 = 1 if mby > 0 and s.cbc[mby - 1][mbx] == 2 else 0
        cbp_c = 2 if d.decode(ctx("cbp_c1", a2 + 2 * b2)) else 1
    s.cbc[mby][mbx] = cbp_c
    return cbp_l, cbp_c


def _mb_inter_residual_enc(e: CabacEncoder, ctx: _Ctx, g: _CbfGrids,
                           cbp_l: int, cbp_c: int, scans: list,
                           cdc: tuple, cac: tuple,
                           mbx: int, mby: int) -> None:
    bx0, by0 = mbx * 4, mby * 4
    for idx in range(16):
        if not cbp_l & (1 << (idx >> 2)):
            continue
        bx, by = _blk_xy(idx)
        x, y = bx0 + bx, by0 + by
        g.lac[y][x] = _enc_block(
            e, ctx, _CAT_L4, scans[idx], g._inc(g.lac, x, y)
        )
    cx0, cy0 = mbx * 2, mby * 2
    if cbp_c:
        for comp in (0, 1):
            g.cdc[comp][mby][mbx] = _enc_block(
                e, ctx, _CAT_CDC, cdc[comp],
                g._inc(g.cdc[comp], mbx, mby),
            )
    if cbp_c == 2:
        for comp in (0, 1):
            for idx in range(4):
                bx, by = idx & 1, idx >> 1
                x, y = cx0 + bx, cy0 + by
                g.cac[comp][y][x] = _enc_block(
                    e, ctx, _CAT_CAC, cac[comp][idx],
                    g._inc(g.cac[comp], x, y),
                )


def _mb_inter_residual_dec(d: CabacDecoder, ctx: _Ctx, g: _CbfGrids,
                           cbp_l: int, cbp_c: int, mbx: int, mby: int,
                           nz_y: list, nz_c: tuple) -> tuple:
    bx0, by0 = mbx * 4, mby * 4
    scans = []
    for idx in range(16):
        bx, by = _blk_xy(idx)
        x, y = bx0 + bx, by0 + by
        if cbp_l & (1 << (idx >> 2)):
            blk, cbf = _dec_block(
                d, ctx, _CAT_L4, 16, g._inc(g.lac, x, y)
            )
            g.lac[y][x] = cbf
        else:
            blk = [0] * 16
        scans.append(blk)
        nz_y[y][x] = sum(1 for v in blk if v)
    cdc = [[0] * 4, [0] * 4]
    if cbp_c:
        for comp in (0, 1):
            cdc[comp], cbf = _dec_block(
                d, ctx, _CAT_CDC, 4, g._inc(g.cdc[comp], mbx, mby)
            )
            g.cdc[comp][mby][mbx] = cbf
    cac = [[], []]
    cx0, cy0 = mbx * 2, mby * 2
    for comp in (0, 1):
        for idx in range(4):
            bx, by = idx & 1, idx >> 1
            x, y = cx0 + bx, cy0 + by
            if cbp_c == 2:
                blk, cbf = _dec_block(
                    d, ctx, _CAT_CAC, 15, g._inc(g.cac[comp], x, y)
                )
                g.cac[comp][y][x] = cbf
            else:
                blk = [0] * 15
            cac[comp].append(blk)
            nz_c[comp][y][x] = sum(1 for v in blk if v)
    return scans, cdc, cac


def _enc_mb_type_p(e: CabacEncoder, ctx: _Ctx) -> None:
    # P_L0_16x16 = bins 0,0,0 (Table 9-34 P tree; [self] fixed-key ctxs)
    e.encode(ctx("mbtype_p", 0), 0)
    e.encode(ctx("mbtype_p", 1), 0)
    e.encode(ctx("mbtype_p", 2), 0)


def _dec_mb_type_p(d: CabacDecoder, ctx: _Ctx) -> None:
    if d.decode(ctx("mbtype_p", 0)):
        raise ImageFormatError(
            "h264: CABAC intra macroblocks in P slices unsupported")
    if d.decode(ctx("mbtype_p", 1)) or d.decode(ctx("mbtype_p", 2)):
        raise ImageFormatError(
            "h264: CABAC P sub-partitions unsupported (16x16 subset)")


def _enc_mb_type_b(e: CabacEncoder, ctx: _Ctx, s: _InterState,
                   mbx: int, mby: int, bmode: int) -> None:
    # B tree (Table 9-34): '100' B_L0_16x16, '101' B_L1_16x16,
    # '110000' B_Bi_16x16; bin 0 neighbour-conditioned on coded
    # (non-direct) B macroblocks
    a = 1 if mbx > 0 and s.coded[mby][mbx - 1] else 0
    b = 1 if mby > 0 and s.coded[mby - 1][mbx] else 0
    e.encode(ctx("mbtype_b", a + b), 1)
    if bmode in (1, 2):
        e.encode(ctx("mbtype_bb", 1), 0)
        e.encode(ctx("mbtype_bb", 2), bmode - 1)
    else:  # B_Bi_16x16
        e.encode(ctx("mbtype_bb", 1), 1)
        for i in range(4):
            e.encode(ctx("mbtype_bb", 3 + i), 0)


def _dec_mb_type_b(d: CabacDecoder, ctx: _Ctx, s: _InterState,
                   mbx: int, mby: int) -> int:
    a = 1 if mbx > 0 and s.coded[mby][mbx - 1] else 0
    b = 1 if mby > 0 and s.coded[mby - 1][mbx] else 0
    if not d.decode(ctx("mbtype_b", a + b)):
        raise ImageFormatError("h264: B_Direct macroblocks unsupported")
    if not d.decode(ctx("mbtype_bb", 1)):
        return 1 + d.decode(ctx("mbtype_bb", 2))
    for i in range(4):
        if d.decode(ctx("mbtype_bb", 3 + i)):
            raise ImageFormatError(
                "h264: B sub-partitions/intra-in-B unsupported "
                "(B_{L0,L1,Bi}_16x16 subset)")
    return 3


def decode_slice(r, kind: str, qp: int, cqp: int, mb_w: int, mb_h: int,
                 cur_y: list, cur_u: list, cur_v: list,
                 nz_y: list, nz_c: tuple, minfo: list,
                 refs: list) -> None:
    """Parse one CABAC slice (I, P, or B) from BitReader ``r``
    (positioned after the slice header) into the caller's frame
    buffers.  Called from minih264.h264_decode_frames when the active
    PPS sets entropy_coding_mode_flag; reconstruction helpers are
    minih264's own (the CAVLC decode loop semantics, entropy swapped)."""
    from . import minih264 as h

    while r.pos % 8:
        if r.u(1) != 1:
            raise ImageFormatError("h264: bad cabac_alignment_one_bit")
    d = CabacDecoder(r._data[r.pos >> 3:])
    ctx = _Ctx()
    g = _CbfGrids(mb_w, mb_h)
    s = _InterState(mb_w, mb_h)
    ref = refs[0] if refs else None
    nmbs = mb_w * mb_h
    for mbi in range(nmbs):
        mbx, mby = mbi % mb_w, mbi // mb_w
        px, py = mbx * 16, mby * 16
        cx, cy = px // 2, py // 2
        if kind in ("P", "B"):
            skip = d.decode(ctx("skip", kind, _skip_inc(s, mbx, mby)))
            s.coded[mby][mbx] = 1
            if skip:
                if kind == "B":
                    raise ImageFormatError(
                        "h264: B_Skip macroblocks unsupported")
                s.skip[mby][mbx] = 1
                smv = h._skip_mv(minfo, mbx, mby, mb_w)
                h._place(cur_y, h._mc_luma(ref[0], px, py, 16, 16, *smv),
                         px, py)
                h._place(cur_u, h._mc_chroma(ref[1], cx, cy, 8, 8, *smv),
                         cx, cy)
                h._place(cur_v, h._mc_chroma(ref[2], cx, cy, 8, 8, *smv),
                         cx, cy)
                minfo[mby][mbx] = ("P", smv[0], smv[1])
                if d.decode_terminate() != (1 if mbi == nmbs - 1 else 0):
                    raise ImageFormatError(
                        "h264: CABAC end_of_slice mismatch")
                continue
            mv0 = mv1 = None
            if kind == "P":
                _dec_mb_type_p(d, ctx)
                bmode = None
                mvd = (
                    _dec_mvd(d, ctx, 0, 0, _mvd_inc(s, 0, 0, mbx, mby)),
                    _dec_mvd(d, ctx, 0, 1, _mvd_inc(s, 0, 1, mbx, mby)),
                )
                s.mvda[0][mby][mbx] = (abs(mvd[0]), abs(mvd[1]))
                mvp = h._mv_pred(minfo, mbx, mby, mb_w)
                mv0 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            else:
                bmode = _dec_mb_type_b(d, ctx, s, mbx, mby)
                if bmode in (1, 3):
                    mvd = (
                        _dec_mvd(d, ctx, 0, 0,
                                 _mvd_inc(s, 0, 0, mbx, mby)),
                        _dec_mvd(d, ctx, 0, 1,
                                 _mvd_inc(s, 0, 1, mbx, mby)),
                    )
                    s.mvda[0][mby][mbx] = (abs(mvd[0]), abs(mvd[1]))
                    mvp = h._mv_pred_b(minfo, mbx, mby, mb_w, 0)
                    mv0 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                if bmode in (2, 3):
                    mvd = (
                        _dec_mvd(d, ctx, 1, 0,
                                 _mvd_inc(s, 1, 0, mbx, mby)),
                        _dec_mvd(d, ctx, 1, 1,
                                 _mvd_inc(s, 1, 1, mbx, mby)),
                    )
                    s.mvda[1][mby][mbx] = (abs(mvd[0]), abs(mvd[1]))
                    mvp = h._mv_pred_b(minfo, mbx, mby, mb_w, 1)
                    mv1 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            cbp_l, cbp_c = _dec_cbp(d, ctx, s, mbx, mby)
            if (cbp_l or cbp_c) and d.decode(ctx("qpd", 0)):
                raise ImageFormatError(
                    "h264: CABAC mb_qp_delta unsupported")
            scans, cdc, cac = _mb_inter_residual_dec(
                d, ctx, g, cbp_l, cbp_c, mbx, mby, nz_y, nz_c
            )

            def mc(rp, mv):
                return (h._mc_luma(rp[0], px, py, 16, 16, *mv),
                        h._mc_chroma(rp[1], cx, cy, 8, 8, *mv),
                        h._mc_chroma(rp[2], cx, cy, 8, 8, *mv))

            if bmode is None or bmode == 1:
                rp = ref if bmode is None else refs[0]
                pred_y, pred_u, pred_v = mc(rp, mv0)
            elif bmode == 2:
                pred_y, pred_u, pred_v = mc(refs[1], mv1)
            else:
                p0 = mc(refs[0], mv0)
                p1 = mc(refs[1], mv1)
                pred_y, pred_u, pred_v = (
                    [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                     for ra, rb in zip(x0, x1)]
                    for x0, x1 in zip(p0, p1)
                )
            h._place(cur_y, h._add_clip(
                pred_y, h._recon_inter_luma(scans, qp)), px, py)
            h._place(cur_u, h._add_clip(
                pred_u, h._recon_chroma(cdc[0], cac[0], cqp)), cx, cy)
            h._place(cur_v, h._add_clip(
                pred_v, h._recon_chroma(cdc[1], cac[1], cqp)), cx, cy)
            minfo[mby][mbx] = (
                ("P", mv0[0], mv0[1]) if bmode is None
                else ("B", mv0, mv1))
        else:
            cbp_l, cbp_c, pm = _mb_header_dec(d, ctx, mbx, mby)
            dc_scan, ac_scans, cdc, cac, nz16, nzc = _mb_residual_dec(
                d, ctx, g, cbp_l, cbp_c, mbx, mby
            )
            for x, y, t in nz16:
                nz_y[y][x] = t
            for comp, x, y, t in nzc:
                nz_c[comp][y][x] = t
            pred_y = h._pred_i16(cur_y, px, py, pm, mbx > 0, mby > 0)
            pred_u = h._pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
            pred_v = h._pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
            h._place(
                cur_y,
                h._add_clip(pred_y,
                            h._recon_i16_luma(dc_scan, ac_scans, qp)),
                px, py,
            )
            h._place(
                cur_u,
                h._add_clip(pred_u, h._recon_chroma(cdc[0], cac[0], cqp)),
                cx, cy,
            )
            h._place(
                cur_v,
                h._add_clip(pred_v, h._recon_chroma(cdc[1], cac[1], cqp)),
                cx, cy,
            )
            minfo[mby][mbx] = ("I",)
        eos = d.decode_terminate()
        if eos != (1 if mbi == nmbs - 1 else 0):
            raise ImageFormatError("h264: CABAC end_of_slice mismatch")


def h264_encode_cabac_video(width: int, height: int, frames,
                            qp: int = 0, subpel: bool = True) -> tuple:
    """Encode frames as a CABAC Annex-B stream with minih264's GOP
    pattern (IDR I, P, then alternating non-reference B with both-past
    reference lists / P) -> (bytes, recons).  The motion search,
    transforms, and reconstruction are the CAVLC encoder's exact
    semantics (minih264._encode_cavlc); only the entropy layer is
    CABAC.  Returns the encoder reconstruction so tests can pin
    decode == recon."""
    from . import minih264 as h

    if not frames:
        raise ValueError("h264: no frames")
    if width % 2 or height % 2:
        raise ValueError("h264: dimensions must be even (4:2:0 chroma)")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    pw, ph = mb_w * 16, mb_h * 16
    crop_r, crop_b = (pw - width) // 2, (ph - height) // 2
    cqp = h._chroma_qp(qp)

    w = h.BitWriter()
    w.u(8, 66)
    w.u(8, 0xC0)
    w.u(8, 10)
    w.ue(0)
    w.ue(0)
    w.ue(2)      # pic_order_cnt_type = 2
    w.ue(2)      # max_num_ref_frames = 2 (P chain + B L1)
    w.u(1, 0)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)
    w.u(1, 0)
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    out = bytearray(h._nal(7, 3, w.to_bytes()))

    w = h.BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)    # entropy_coding_mode_flag: CABAC
    w.u(1, 0)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(1, 0)
    w.u(2, 0)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)
    w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    out += h._nal(8, 3, w.to_bytes())

    refs: list = []
    ref_count = 0
    recons = []
    for fi, (ys, us, vs) in enumerate(frames):
        src_y = h._pad_plane(ys, width, height, pw, ph)
        src_u = h._pad_plane(us, width // 2, height // 2, pw // 2, ph // 2)
        src_v = h._pad_plane(vs, width // 2, height // 2, pw // 2, ph // 2)
        cur_y = [[0] * pw for _ in range(ph)]
        cur_u = [[0] * (pw // 2) for _ in range(ph // 2)]
        cur_v = [[0] * (pw // 2) for _ in range(ph // 2)]
        minfo = [[None] * mb_w for _ in range(mb_h)]
        idr = fi == 0
        is_b = (not idr) and fi % 2 == 0 and len(refs) >= 2
        ref = refs[0] if refs else None

        w = h.BitWriter()
        w.ue(0)
        w.ue(7 if idr else (6 if is_b else 5))
        w.ue(0)
        w.u(4, ref_count & 15)
        if idr:
            w.ue(0)
        else:
            if is_b:
                w.u(1, 0)
            w.u(1, 0)
            w.u(1, 0)
            if is_b:
                w.u(1, 0)
        if idr:
            w.u(1, 0)
            w.u(1, 0)
        elif not is_b:
            w.u(1, 0)
        w.se(qp - 26)
        w.ue(1)      # disable_deblocking_filter_idc: off
        while len(w._bits) % 8:
            w.u(1, 1)  # cabac_alignment_one_bit

        e = CabacEncoder(w)
        ctx = _Ctx()
        g = _CbfGrids(mb_w, mb_h)
        s = _InterState(mb_w, mb_h)
        nmbs = mb_w * mb_h

        def search16(rp_y, px, py):
            best = None
            for dx, dy in h._MV_CANDIDATES:
                cand = (dx * 4, dy * 4)
                py16 = h._mc_luma(rp_y, px, py, 16, 16, *cand)
                sad = sum(abs(src_y[py + r][px + c] - py16[r][c])
                          for r in range(16) for c in range(16))
                if best is None or sad < best[0]:
                    best = (sad, cand, py16)
            rings = (((-2, 0), (2, 0), (0, -2), (0, 2),
                      (-1, 0), (1, 0), (0, -1), (0, 1))
                     if subpel else ())
            for hdx, hdy in rings:
                cand = (best[1][0] + hdx, best[1][1] + hdy)
                py16 = h._mc_luma(rp_y, px, py, 16, 16, *cand)
                sad = sum(abs(src_y[py + r][px + c] - py16[r][c])
                          for r in range(16) for c in range(16))
                if sad < best[0]:
                    best = (sad, cand, py16)
            return best

        for mbi in range(nmbs):
            mbx, mby = mbi % mb_w, mbi // mb_w
            px, py = mbx * 16, mby * 16
            cx, cy = px // 2, py // 2
            if not idr and not is_b:
                # ---- P: skip probe, else P_L0_16x16 ----
                smv = h._skip_mv(minfo, mbx, mby, mb_w)
                sy = h._mc_luma(ref[0], px, py, 16, 16, *smv)
                su = h._mc_chroma(ref[1], cx, cy, 8, 8, *smv)
                sv = h._mc_chroma(ref[2], cx, cy, 8, 8, *smv)
                inc = _skip_inc(s, mbx, mby)
                s.coded[mby][mbx] = 1
                if (sy == [row[px:px + 16] for row in src_y[py:py + 16]]
                        and su == [row[cx:cx + 8]
                                   for row in src_u[cy:cy + 8]]
                        and sv == [row[cx:cx + 8]
                                   for row in src_v[cy:cy + 8]]):
                    e.encode(ctx("skip", "P", inc), 1)
                    s.skip[mby][mbx] = 1
                    h._place(cur_y, sy, px, py)
                    h._place(cur_u, su, cx, cy)
                    h._place(cur_v, sv, cx, cy)
                    minfo[mby][mbx] = ("P", smv[0], smv[1])
                    e.encode_terminate(1 if mbi == nmbs - 1 else 0)
                    continue
                e.encode(ctx("skip", "P", inc), 0)
                _, mv, pred_y = search16(ref[0], px, py)
                pred_u = h._mc_chroma(ref[1], cx, cy, 8, 8, *mv)
                pred_v = h._mc_chroma(ref[2], cx, cy, 8, 8, *mv)
                scans, rec_res = h._enc_inter_luma(
                    h._sub(src_y, pred_y, px, py, 16), qp)
                cdcu, cacu, rec_u = h._enc_chroma(
                    h._sub(src_u, pred_u, cx, cy, 8), cqp, False)
                cdcv, cacv, rec_v = h._enc_chroma(
                    h._sub(src_v, pred_v, cx, cy, 8), cqp, False)
                cbp_l = 0
                for i8 in range(4):
                    if any(v for j in range(4) for v in scans[i8 * 4 + j]):
                        cbp_l |= 1 << i8
                if any(v for comp in (cacu, cacv) for sc in comp
                       for v in sc):
                    cbp_c = 2
                elif any(cdcu) or any(cdcv):
                    cbp_c = 1
                else:
                    cbp_c = 0
                _enc_mb_type_p(e, ctx)
                mvp = h._mv_pred(minfo, mbx, mby, mb_w)
                mvd = (mv[0] - mvp[0], mv[1] - mvp[1])
                _enc_mvd(e, ctx, 0, 0, _mvd_inc(s, 0, 0, mbx, mby),
                         mvd[0])
                _enc_mvd(e, ctx, 0, 1, _mvd_inc(s, 0, 1, mbx, mby),
                         mvd[1])
                s.mvda[0][mby][mbx] = (abs(mvd[0]), abs(mvd[1]))
                _enc_cbp(e, ctx, s, mbx, mby, cbp_l, cbp_c)
                if cbp_l or cbp_c:
                    e.encode(ctx("qpd", 0), 0)
                _mb_inter_residual_enc(e, ctx, g, cbp_l, cbp_c, scans,
                                       (cdcu, cdcv), (cacu, cacv),
                                       mbx, mby)
                h._place(cur_y, h._add_clip(pred_y, rec_res), px, py)
                h._place(cur_u, h._add_clip(pred_u, rec_u), cx, cy)
                h._place(cur_v, h._add_clip(pred_v, rec_v), cx, cy)
                minfo[mby][mbx] = ("P", mv[0], mv[1])
                e.encode_terminate(1 if mbi == nmbs - 1 else 0)
                continue
            if is_b:
                # ---- B_{L0,L1,Bi}_16x16 (no B_Skip) ----
                rl0, rl1 = refs[0], refs[1]
                inc = _skip_inc(s, mbx, mby)
                e.encode(ctx("skip", "B", inc), 0)
                s.coded[mby][mbx] = 1
                s0 = search16(rl0[0], px, py)
                s1 = search16(rl1[0], px, py)
                bi_y = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                        for ra, rb in zip(s0[2], s1[2])]
                sad_bi = sum(abs(src_y[py + r][px + c] - bi_y[r][c])
                             for r in range(16) for c in range(16))
                bmode, sad = 1, s0[0]
                if s1[0] < sad:
                    bmode, sad = 2, s1[0]
                if sad_bi < sad:
                    bmode = 3
                mv0 = s0[1] if bmode in (1, 3) else None
                mv1 = s1[1] if bmode in (2, 3) else None
                if bmode == 1:
                    pred_y = s0[2]
                    pred_u = h._mc_chroma(rl0[1], cx, cy, 8, 8, *mv0)
                    pred_v = h._mc_chroma(rl0[2], cx, cy, 8, 8, *mv0)
                elif bmode == 2:
                    pred_y = s1[2]
                    pred_u = h._mc_chroma(rl1[1], cx, cy, 8, 8, *mv1)
                    pred_v = h._mc_chroma(rl1[2], cx, cy, 8, 8, *mv1)
                else:
                    pred_y = bi_y
                    u0 = h._mc_chroma(rl0[1], cx, cy, 8, 8, *mv0)
                    u1 = h._mc_chroma(rl1[1], cx, cy, 8, 8, *mv1)
                    v0 = h._mc_chroma(rl0[2], cx, cy, 8, 8, *mv0)
                    v1 = h._mc_chroma(rl1[2], cx, cy, 8, 8, *mv1)
                    pred_u = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                              for ra, rb in zip(u0, u1)]
                    pred_v = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                              for ra, rb in zip(v0, v1)]
                scans, rec_res = h._enc_inter_luma(
                    h._sub(src_y, pred_y, px, py, 16), qp)
                cdcu, cacu, rec_u = h._enc_chroma(
                    h._sub(src_u, pred_u, cx, cy, 8), cqp, False)
                cdcv, cacv, rec_v = h._enc_chroma(
                    h._sub(src_v, pred_v, cx, cy, 8), cqp, False)
                cbp_l = 0
                for i8 in range(4):
                    if any(v for j in range(4) for v in scans[i8 * 4 + j]):
                        cbp_l |= 1 << i8
                if any(v for comp in (cacu, cacv) for sc in comp
                       for v in sc):
                    cbp_c = 2
                elif any(cdcu) or any(cdcv):
                    cbp_c = 1
                else:
                    cbp_c = 0
                _enc_mb_type_b(e, ctx, s, mbx, mby, bmode)
                if mv0 is not None:
                    mvp0 = h._mv_pred_b(minfo, mbx, mby, mb_w, 0)
                    mvd0 = (mv0[0] - mvp0[0], mv0[1] - mvp0[1])
                    _enc_mvd(e, ctx, 0, 0,
                             _mvd_inc(s, 0, 0, mbx, mby), mvd0[0])
                    _enc_mvd(e, ctx, 0, 1,
                             _mvd_inc(s, 0, 1, mbx, mby), mvd0[1])
                    s.mvda[0][mby][mbx] = (abs(mvd0[0]), abs(mvd0[1]))
                if mv1 is not None:
                    mvp1 = h._mv_pred_b(minfo, mbx, mby, mb_w, 1)
                    mvd1 = (mv1[0] - mvp1[0], mv1[1] - mvp1[1])
                    _enc_mvd(e, ctx, 1, 0,
                             _mvd_inc(s, 1, 0, mbx, mby), mvd1[0])
                    _enc_mvd(e, ctx, 1, 1,
                             _mvd_inc(s, 1, 1, mbx, mby), mvd1[1])
                    s.mvda[1][mby][mbx] = (abs(mvd1[0]), abs(mvd1[1]))
                _enc_cbp(e, ctx, s, mbx, mby, cbp_l, cbp_c)
                if cbp_l or cbp_c:
                    e.encode(ctx("qpd", 0), 0)
                _mb_inter_residual_enc(e, ctx, g, cbp_l, cbp_c, scans,
                                       (cdcu, cdcv), (cacu, cacv),
                                       mbx, mby)
                h._place(cur_y, h._add_clip(pred_y, rec_res), px, py)
                h._place(cur_u, h._add_clip(pred_u, rec_u), cx, cy)
                h._place(cur_v, h._add_clip(pred_v, rec_v), cx, cy)
                minfo[mby][mbx] = ("B", mv0, mv1)
                e.encode_terminate(1 if mbi == nmbs - 1 else 0)
                continue
            # ---- IDR I_16x16, DC prediction ----
            pred_y = h._pred_i16(cur_y, px, py, 2, mbx > 0, mby > 0)
            dc_scan, ac_scans, rec_res = h._enc_i16_luma(
                h._sub(src_y, pred_y, px, py, 16), qp
            )
            pred_u = h._pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
            pred_v = h._pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
            cdcu, cacu, rec_u = h._enc_chroma(
                h._sub(src_u, pred_u, cx, cy, 8), cqp, True
            )
            cdcv, cacv, rec_v = h._enc_chroma(
                h._sub(src_v, pred_v, cx, cy, 8), cqp, True
            )
            cbp_l = 15 if any(v for sc in ac_scans for v in sc) else 0
            if any(v for comp in (cacu, cacv) for sc in comp for v in sc):
                cbp_c = 2
            elif any(cdcu) or any(cdcv):
                cbp_c = 1
            else:
                cbp_c = 0
            _mb_header_enc(e, ctx, mbx, mby, cbp_l, cbp_c, 2)
            _mb_residual_enc(
                e, ctx, g, cbp_l, cbp_c, dc_scan, ac_scans,
                (cdcu, cdcv), (cacu, cacv), mbx, mby,
            )
            h._place(cur_y, h._add_clip(pred_y, rec_res), px, py)
            h._place(cur_u, h._add_clip(pred_u, rec_u), cx, cy)
            h._place(cur_v, h._add_clip(pred_v, rec_v), cx, cy)
            minfo[mby][mbx] = ("I",)
            e.encode_terminate(1 if mbi == nmbs - 1 else 0)
        w.byte_align_zero()
        out += h._nal(5 if idr else 1,
                      3 if idr else (0 if is_b else 2), w.to_bytes())
        if not is_b:
            refs = [(cur_y, cur_u, cur_v)] + refs[:1]
            ref_count += 1
        recons.append((
            [row[:width] for row in cur_y[:height]],
            [row[:width // 2] for row in cur_u[:height // 2]],
            [row[:width // 2] for row in cur_v[:height // 2]]))
    return bytes(out), recons
