"""CABAC entropy-coding arm for minih264 (Rec. H.264 §9.3) — closes
the codec family's last documented stub.  Scope: IDR I slices of
I_16x16 macroblocks (DC intra prediction), i.e. the intra subset of
the CAVLC arm re-entropy-coded; CABAC P/B slices stay rejected.

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
