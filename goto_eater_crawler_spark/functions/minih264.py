"""Pure-python H.264/AVC (ITU-T Rec. H.264) baseline subset in the
miniimg style: a real Annex-B elementary-stream codec — NAL framing
with emulation prevention, Exp-Golomb syntax, SPS/PPS, and two
macroblock families:

1. I_PCM IDR frames (h264_encode_ipcm / h264_decode): byte-aligned
   raw 4:2:0 samples, lossless, pure spec syntax (§7.3-7.4, §8.3.5).
2. CAVLC entropy-coded frames (h264_encode / h264_decode_frames):
   IDR I slices of I_16x16 macroblocks (DC/V/H intra prediction,
   §8.3.3) and P slices with P_Skip and P_L0_16x16 (median MV
   prediction §8.4.1.3, full/half/quarter-pel motion compensation —
   6-tap + quarter averaging luma, eighth-pel bilinear chroma,
   §8.4.2.2), 4x4 integer transforms + luma-DC/chroma-DC
   Hadamard paths (§8.5), and CAVLC residual coding (§9.2:
   coeff_token with nC neighbour context, trailing-one signs,
   adaptive-suffix levels, total_zeros, run_before).

Honesty note (the minivp8/miniwebp contract, accepted in r3/r4):
all STRUCTURE is spec-faithful; VLC table VALUES split into [spec]
tables (run_before, the nC>=8 FLC, the table-free level machinery,
Exp-Golomb) and [self] reconstructions validated prefix-free at
import (coeff_token columns, total_zeros families, the inter-CBP
me(v) bijection) — see the table section below.  Encoder and
decoder share one table object, and tests fuzz-pin
decode == encoder-reconstruction end-to-end, so the codec is exact
and deterministic; byte-level third-party interop is claimed only
for the I_PCM family and the [spec] subset.

At QP 0 the flat-macroblock input class reconstructs EXACTLY
(verified for luma residuals |r| <= 81, chroma |r| <= 161; the
inter path for all r): the quant ladder's rounding lands inside the
inverse transform's +32>>6 window, so the multimodal CAVLC gate's
DuckDB oracle is closed-form in doc_id with no approximation.

A CABAC arm lives in minih264_cabac.py (the same I/P/B 16x16 subset
as this CAVLC arm, re-entropy-coded: spec-structural §9.3 engine with
[self]-derived probability tables — see that module's honesty note);
h264_decode_frames dispatches on the PPS entropy_coding_mode_flag.
NOT implemented, rejected with ImageFormatError: I_4x4 and
plane/non-DC-chroma intra modes, more than one reference per list,
B_Skip/direct modes, sub-16x16 partitions, interlace, slice groups,
multi-slice pictures, bit depths above 8.  SUPPORTED beyond the
original intra subset: P and B slices (B_L0/B_L1/B_Bi 16x16 with
per-list median MV prediction and default bi-prediction averaging,
low-delay both-past reference lists so decode order == display
order), full/half/quarter-pel motion, and the §8.7 in-loop
deblocking filter (spec-structural kernels + [self] threshold
tables); the oracle synth still pins the search full-pel and the
filter off.  Motion is full/half/quarter-pel
complete (§8.4.2.2).

The reference crawler has no video analogue (its binaries are
PDFs/XLSX, both really decoded); this codec family is build-spec
frontier surface (multimodal pipeline), not reference parity.
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
    cabac = r.u(1)  # entropy_coding_mode_flag (CABAC arm: I slices)
    bottom_field_poc = r.u(1)
    if r.ue() != 0:
        raise ImageFormatError("h264: slice groups unsupported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    init_qp = 26 + r.se()
    r.se()
    chroma_qp_off = r.se()
    deblock_ctrl = r.u(1)
    r.u(1)
    r.u(1)
    return {"id": pps_id, "sps_id": sps_id, "deblock_ctrl": deblock_ctrl,
            "bottom_field_poc": bottom_field_poc, "init_qp": init_qp,
            "chroma_qp_off": chroma_qp_off, "cabac": cabac}


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
            if pps["cabac"]:
                raise ImageFormatError(
                    "h264: CABAC stream; use h264_decode_frames")
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


# --- CAVLC residual block codec (§9.2) --------------------------------------
# Levels are clamped to +/- _LEVEL_CAP at quantization time: lc =
# 2*2063 - 1 = 4125 = the suffix_len-0 escape ceiling (30 + 4095), and
# every suffix_len > 0 ceiling is higher, so a clamped level is
# encodable in ANY suffix state.  The encoder reconstructs from the
# clamped levels, so decode == encoder-reconstruction always holds.

_LEVEL_CAP = 2063


def _cavlc_write_block(w: BitWriter, coeffs: list, nc: int,
                       max_coeff: int) -> int:
    """Encode one scan-ordered coefficient list; returns total_coeff
    (the value the caller must store for neighbour nC context)."""
    nz = [i for i, c in enumerate(coeffs) if c]
    total = len(nz)
    t1 = 0
    for i in reversed(nz):
        if abs(coeffs[i]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    table = _ct_table(nc)
    if table is None:  # nC >= 8: 6-bit FLC [spec]
        w.u(6, 0b000011 if total == 0 else ((total - 1) << 2) | t1)
    else:
        for b in table[(t1, total)]:
            w.u(1, b == "1")
    if total == 0:
        return 0
    for k in range(t1):  # trailing-one signs, reverse scan [spec]
        w.u(1, 0 if coeffs[nz[-1 - k]] > 0 else 1)
    # levels with adaptive suffix length [spec, table-free]
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    for k in range(t1, total):
        level = coeffs[nz[-1 - k]]
        lc = 2 * level - 2 if level > 0 else -2 * level - 1
        if k == t1 and t1 < 3:
            lc -= 2
        if suffix_len == 0:
            if lc < 14:
                w.u(lc + 1, 1)  # unary prefix: lc zeros + stop bit
            elif lc < 30:
                w.u(15, 1)
                w.u(4, lc - 14)
            else:
                w.u(16, 1)
                w.u(12, lc - 30)
        else:
            if (lc >> suffix_len) < 15:
                w.u((lc >> suffix_len) + 1, 1)
                w.u(suffix_len, lc & ((1 << suffix_len) - 1))
            else:
                w.u(16, 1)
                w.u(12, lc - (15 << suffix_len))
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeff:
        tz = nz[-1] + 1 - total
        fam = (_TZ_CHROMA_DC if max_coeff == 4 else _TZ_4X4)[total]
        for b in fam[tz]:
            w.u(1, b == "1")
        zeros_left = tz
        for k in range(total - 1):
            if zeros_left == 0:
                break
            run = nz[-1 - k] - nz[-2 - k] - 1
            for b in _RUN_BEFORE[min(zeros_left, 7)][run]:
                w.u(1, b == "1")
            zeros_left -= run
    return total


def _read_vlc(r: BitReader, table: dict) -> object:
    """Read one prefix-free codeword from a {symbol: bits} table."""
    inv = {v: k for k, v in table.items()}
    code = ""
    maxlen = max(len(v) for v in table.values())
    while len(code) <= maxlen:
        code += "1" if r.u(1) else "0"
        if code in inv:
            return inv[code]
    raise ImageFormatError("h264: invalid VLC codeword")


def _cavlc_read_block(r: BitReader, nc: int, max_coeff: int) -> list:
    """Decode one residual block -> scan-ordered coefficient list of
    length max_coeff."""
    table = _ct_table(nc)
    if table is None:
        v = r.u(6)
        if v == 0b000011:
            total, t1 = 0, 0
        else:
            total, t1 = (v >> 2) + 1, v & 3
    else:
        t1, total = _read_vlc(r, table)
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs
    if total > max_coeff:
        raise ImageFormatError("h264: total_coeff exceeds block size")
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    for k in range(t1, total):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 16:
                raise ImageFormatError("h264: bad level prefix")
        if suffix_len == 0:
            if prefix < 14:
                lc = prefix
            elif prefix == 14:
                lc = 14 + r.u(4)
            else:
                lc = 30 + r.u(12)
        else:
            if prefix < 15:
                lc = (prefix << suffix_len) | r.u(suffix_len)
            else:
                lc = (15 << suffix_len) + r.u(12)
        if k == t1 and t1 < 3:
            lc += 2
        level = (lc + 2) >> 1 if lc % 2 == 0 else -((lc + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeff:
        fam = (_TZ_CHROMA_DC if max_coeff == 4 else _TZ_4X4)[total]
        tz = _read_vlc(r, fam)
    else:
        tz = 0
    zeros_left = tz
    runs = []
    for k in range(total - 1):
        if zeros_left == 0:
            runs.append(0)
            continue
        run = _read_vlc(r, _RUN_BEFORE[min(zeros_left, 7)])
        runs.append(run)
        zeros_left -= run
    # place coefficients: reverse-scan levels -> scan positions
    pos = total - 1 + tz  # index of the last nonzero in scan order
    for k in range(total):
        if pos >= max_coeff:
            raise ImageFormatError("h264: run_before overruns block")
        coeffs[pos] = levels[k]
        if k < total - 1:
            pos -= 1 + runs[k]
    return coeffs


# --- scan helpers -----------------------------------------------------------


def _scan16(mat: list) -> list:
    return [mat[r][c] for (r, c) in _ZIGZAG]


def _unscan16(lst: list) -> list:
    mat = [[0] * 4 for _ in range(4)]
    for k, (r, c) in enumerate(_ZIGZAG):
        mat[r][c] = lst[k]
    return mat


def _scan15(mat: list) -> list:
    return [mat[r][c] for (r, c) in _ZIGZAG[1:]]


def _unscan15(lst: list) -> list:
    mat = [[0] * 4 for _ in range(4)]
    for k, (r, c) in enumerate(_ZIGZAG[1:]):
        mat[r][c] = lst[k]
    return mat


def _nc_ctx(grid: list, bx: int, by: int) -> int:
    """nC from left/above neighbouring block total_coeffs (§9.2.1)."""
    a = grid[by][bx - 1] if bx > 0 else None
    b = grid[by - 1][bx] if by > 0 else None
    if a is not None and b is not None:
        return (a + b + 1) >> 1
    if a is not None:
        return a
    if b is not None:
        return b
    return 0


# --- quant / recon per macroblock path --------------------------------------


def _quant_dc(c: int, qp: int, intra: bool) -> int:
    """Luma/chroma DC quantization: the Hadamard path quantizes with a
    doubled rounding term and one extra shift (§8.5 encoder mirror)."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    level = min((abs(c) * _MF[qp % 6][0] + 2 * f) >> (qbits + 1), _LEVEL_CAP)
    return -level if c < 0 else level


def _recon_i16_luma(dc_scan: list, ac_scans: list, qp: int) -> list:
    """Residual 16x16 from I_16x16 luma levels: inverse-Hadamard the
    DC matrix, scale (§8.5.10), then per-block dequant + inverse core
    transform with the DC override."""
    f = _hadamard4(_unscan16(dc_scan), fwd=False)
    dcy = _dequant_luma_dc(f, qp)
    res = [[0] * 16 for _ in range(16)]
    for idx in range(16):
        bx, by = _BLK_XY[idx]
        d = _dequant4x4(_unscan15(ac_scans[idx]), qp, dcy[by][bx])
        blk = _inv4x4(d)
        for r in range(4):
            for c in range(4):
                res[by * 4 + r][bx * 4 + c] = blk[r][c]
    return res


def _recon_inter_luma(scans: list, qp: int) -> list:
    res = [[0] * 16 for _ in range(16)]
    for idx in range(16):
        bx, by = _BLK_XY[idx]
        blk = _inv4x4(_dequant4x4(_unscan16(scans[idx]), qp, None))
        for r in range(4):
            for c in range(4):
                res[by * 4 + r][bx * 4 + c] = blk[r][c]
    return res


def _recon_chroma(dc_scan: list, ac_scans: list, cqp: int) -> list:
    """Residual 8x8 for one chroma component (§8.5.11)."""
    f = _hadamard2([[dc_scan[0], dc_scan[1]], [dc_scan[2], dc_scan[3]]])
    dcc = _dequant_chroma_dc(f, cqp)
    res = [[0] * 8 for _ in range(8)]
    for idx in range(4):
        bx, by = idx & 1, idx >> 1
        d = _dequant4x4(_unscan15(ac_scans[idx]), cqp, dcc[by][bx])
        blk = _inv4x4(d)
        for r in range(4):
            for c in range(4):
                res[by * 4 + r][bx * 4 + c] = blk[r][c]
    return res


def _enc_i16_luma(res: list, qp: int) -> tuple:
    """-> (dc_scan[16], ac_scans[16][15], recon_res)"""
    dcs = [[0] * 4 for _ in range(4)]
    ac_scans = []
    for idx in range(16):
        bx, by = _BLK_XY[idx]
        sub = [[res[by * 4 + r][bx * 4 + c] for c in range(4)]
               for r in range(4)]
        w4 = _fwd4x4(sub)
        dcs[by][bx] = w4[0][0]
        ac_scans.append(_scan15(_quant4x4(w4, qp, True, True)))
    dch = _hadamard4(dcs, fwd=True)
    dc_scan = [_quant_dc(v, qp, True) for v in _scan16(dch)]
    return dc_scan, ac_scans, _recon_i16_luma(dc_scan, ac_scans, qp)


def _enc_inter_luma(res: list, qp: int) -> tuple:
    scans = []
    for idx in range(16):
        bx, by = _BLK_XY[idx]
        sub = [[res[by * 4 + r][bx * 4 + c] for c in range(4)]
               for r in range(4)]
        scans.append(_scan16(_quant4x4(_fwd4x4(sub), qp, False, False)))
    return scans, _recon_inter_luma(scans, qp)


def _enc_chroma(res: list, cqp: int, intra: bool) -> tuple:
    """-> (dc_scan[4], ac_scans[4][15], recon_res) for one component."""
    dcs = [[0] * 2 for _ in range(2)]
    ac_scans = []
    for idx in range(4):
        bx, by = idx & 1, idx >> 1
        sub = [[res[by * 4 + r][bx * 4 + c] for c in range(4)]
               for r in range(4)]
        w4 = _fwd4x4(sub)
        dcs[by][bx] = w4[0][0]
        ac_scans.append(_scan15(_quant4x4(w4, cqp, intra, True)))
    dch = _hadamard2(dcs)
    dc_scan = [_quant_dc(dch[0][0], cqp, intra),
               _quant_dc(dch[0][1], cqp, intra),
               _quant_dc(dch[1][0], cqp, intra),
               _quant_dc(dch[1][1], cqp, intra)]
    return dc_scan, ac_scans, _recon_chroma(dc_scan, ac_scans, cqp)


# --- prediction (§8.3 intra, §8.4 inter full-pel) ---------------------------


def _pred_i16(plane: list, px: int, py: int, mode: int,
              have_l: bool, have_a: bool) -> list:
    if mode == 0:  # vertical
        if not have_a:
            raise ImageFormatError("h264: vertical pred without above MB")
        top = plane[py - 1][px:px + 16]
        return [list(top) for _ in range(16)]
    if mode == 1:  # horizontal
        if not have_l:
            raise ImageFormatError("h264: horizontal pred without left MB")
        return [[plane[py + r][px - 1]] * 16 for r in range(16)]
    if mode == 2:  # DC
        if have_l and have_a:
            s = sum(plane[py - 1][px:px + 16]) + \
                sum(plane[py + r][px - 1] for r in range(16))
            dc = (s + 16) >> 5
        elif have_l:
            dc = (sum(plane[py + r][px - 1] for r in range(16)) + 8) >> 4
        elif have_a:
            dc = (sum(plane[py - 1][px:px + 16]) + 8) >> 4
        else:
            dc = 128
        return [[dc] * 16 for _ in range(16)]
    raise ImageFormatError(f"h264: intra16 pred mode {mode} unsupported")


def _pred_chroma_dc(plane: list, px: int, py: int,
                    have_l: bool, have_a: bool) -> list:
    """8x8 chroma DC prediction: per-4x4 sub-block neighbour sets —
    corner blocks average both edges, the off-diagonal blocks prefer
    the adjacent edge (§8.3.4)."""
    out = [[0] * 8 for _ in range(8)]
    for sb in range(4):
        bx, by = sb & 1, sb >> 1
        sa = sum(plane[py - 1][px + bx * 4:px + bx * 4 + 4]) \
            if have_a else None
        sl = sum(plane[py + by * 4 + r][px - 1] for r in range(4)) \
            if have_l else None
        if bx == by:  # (0,0) and (1,1): both edges when available
            if sa is not None and sl is not None:
                dc = (sa + sl + 4) >> 3
            elif sa is not None:
                dc = (sa + 2) >> 2
            elif sl is not None:
                dc = (sl + 2) >> 2
            else:
                dc = 128
        elif bx == 1:  # (1,0): prefer above
            dc = (sa + 2) >> 2 if sa is not None else (
                (sl + 2) >> 2 if sl is not None else 128)
        else:  # (0,1): prefer left
            dc = (sl + 2) >> 2 if sl is not None else (
                (sa + 2) >> 2 if sa is not None else 128)
        for r in range(4):
            for c in range(4):
                out[by * 4 + r][bx * 4 + c] = dc
    return out


def _median3(a: int, b: int, c: int) -> int:
    return sorted((a, b, c))[1]


def _mv_pred(minfo: list, x: int, y: int, mb_w: int) -> tuple:
    """Median MV predictor for a 16x16 partition (§8.4.1.3): C is the
    above-right MB, replaced by above-left when unavailable; if only A
    exists (B, C, D all outside) the predictor is mvA; a lone inter
    neighbour wins outright (single matching refIdx with one ref)."""
    def get(mx: int, my: int):
        if mx < 0 or my < 0 or mx >= mb_w:
            return None
        v = minfo[my][mx]
        return v  # None until decoded (raster order makes that outside)
    a, b = get(x - 1, y), get(x, y - 1)
    c = get(x + 1, y - 1)
    if c is None:
        c = get(x - 1, y - 1)
    if b is None and c is None and a is not None:
        return (a[1], a[2]) if a[0] == "P" else (0, 0)
    mvs, inter = [], []
    for n in (a, b, c):
        if n is None or n[0] != "P":
            mvs.append((0, 0))
        else:
            mvs.append((n[1], n[2]))
            inter.append((n[1], n[2]))
    if len(inter) == 1:
        return inter[0]
    return (_median3(mvs[0][0], mvs[1][0], mvs[2][0]),
            _median3(mvs[0][1], mvs[1][1], mvs[2][1]))


def _mv_pred_b(minfo: list, x: int, y: int, mb_w: int,
               lst: int) -> tuple:
    """Median MV predictor for one reference list of a B 16x16
    partition: the §8.4.1.3 rules applied per list — neighbours not
    using the list count as unavailable-for-refIdx (zero vector in
    the median), a lone user of the list wins outright, and the
    lone-A rule applies when B/C are outside the picture."""
    def get(mx: int, my: int):
        if mx < 0 or my < 0 or mx >= mb_w:
            return None
        return minfo[my][mx]

    def list_mv(n):
        if n is None or n[0] == "I":
            return None
        if n[0] == "P":
            return (n[1], n[2]) if lst == 0 else None
        return n[1 + lst]

    a, b = get(x - 1, y), get(x, y - 1)
    c = get(x + 1, y - 1)
    if c is None:
        c = get(x - 1, y - 1)
    if b is None and c is None and a is not None:
        mv = list_mv(a)
        return mv if mv is not None else (0, 0)
    mvs, users = [], []
    for n in (a, b, c):
        mv = list_mv(n)
        if mv is None:
            mvs.append((0, 0))
        else:
            mvs.append(mv)
            users.append(mv)
    if len(users) == 1:
        return users[0]
    return (_median3(mvs[0][0], mvs[1][0], mvs[2][0]),
            _median3(mvs[0][1], mvs[1][1], mvs[2][1]))


def _skip_mv(minfo: list, x: int, y: int, mb_w: int) -> tuple:
    """P_Skip motion vector (§8.4.1.1): zero when a left/above MB is
    missing or is an inter MB with a zero vector, else the predictor."""
    a = minfo[y][x - 1] if x > 0 else None
    b = minfo[y - 1][x] if y > 0 else None
    if a is None or b is None:
        return (0, 0)
    if a == ("P", 0, 0) or b == ("P", 0, 0):
        return (0, 0)
    return _mv_pred(minfo, x, y, mb_w)


def _mc_block(plane: list, x0: int, y0: int, w: int, h: int,
              dx: int, dy: int) -> list:
    """Full-pel motion compensation with edge clamping (§8.4.2.1
    reference-frame padding semantics)."""
    ph, pw = len(plane), len(plane[0])
    out = []
    for r in range(h):
        sy = min(max(y0 + dy + r, 0), ph - 1)
        row = plane[sy]
        out.append([row[min(max(x0 + dx + c, 0), pw - 1)]
                    for c in range(w)])
    return out


# --- shared MB residual syntax (encode/decode mirrors) ----------------------


def _write_residual(w: BitWriter, kind: str, cbp_l: int, cbp_c: int,
                    dc_scan, ac_scans, cdc, cac,
                    nz_y: list, nz_c: tuple, mbx: int, mby: int) -> None:
    bx0, by0 = mbx * 4, mby * 4
    if kind == "i16":
        _cavlc_write_block(w, dc_scan, _nc_ctx(nz_y, bx0, by0), 16)
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            t = _cavlc_write_block(
                w, ac_scans[idx], _nc_ctx(nz_y, bx0 + bx, by0 + by), 15) \
                if cbp_l else 0
            nz_y[by0 + by][bx0 + bx] = t
    else:
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            t = _cavlc_write_block(
                w, ac_scans[idx], _nc_ctx(nz_y, bx0 + bx, by0 + by), 16) \
                if cbp_l & (1 << (idx >> 2)) else 0
            nz_y[by0 + by][bx0 + bx] = t
    cx0, cy0 = mbx * 2, mby * 2
    if cbp_c:
        for comp in (0, 1):
            _cavlc_write_block(w, cdc[comp], -1, 4)
    for comp in (0, 1):
        for idx in range(4):
            bx, by = idx & 1, idx >> 1
            t = _cavlc_write_block(
                w, cac[comp][idx],
                _nc_ctx(nz_c[comp], cx0 + bx, cy0 + by), 15) \
                if cbp_c == 2 else 0
            nz_c[comp][cy0 + by][cx0 + bx] = t


def _read_residual(r: BitReader, kind: str, cbp_l: int, cbp_c: int,
                   nz_y: list, nz_c: tuple, mbx: int, mby: int) -> tuple:
    bx0, by0 = mbx * 4, mby * 4
    dc_scan = [0] * 16
    ac_scans = []
    if kind == "i16":
        dc_scan = _cavlc_read_block(r, _nc_ctx(nz_y, bx0, by0), 16)
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            if cbp_l:
                blk = _cavlc_read_block(
                    r, _nc_ctx(nz_y, bx0 + bx, by0 + by), 15)
            else:
                blk = [0] * 15
            ac_scans.append(blk)
            nz_y[by0 + by][bx0 + bx] = sum(1 for v in blk if v)
    else:
        for idx in range(16):
            bx, by = _BLK_XY[idx]
            if cbp_l & (1 << (idx >> 2)):
                blk = _cavlc_read_block(
                    r, _nc_ctx(nz_y, bx0 + bx, by0 + by), 16)
            else:
                blk = [0] * 16
            ac_scans.append(blk)
            nz_y[by0 + by][bx0 + bx] = sum(1 for v in blk if v)
    cdc = [[0] * 4, [0] * 4]
    if cbp_c:
        cdc = [_cavlc_read_block(r, -1, 4) for _ in (0, 1)]
    cac = [[], []]
    cx0, cy0 = mbx * 2, mby * 2
    for comp in (0, 1):
        for idx in range(4):
            bx, by = idx & 1, idx >> 1
            if cbp_c == 2:
                blk = _cavlc_read_block(
                    r, _nc_ctx(nz_c[comp], cx0 + bx, cy0 + by), 15)
            else:
                blk = [0] * 15
            cac[comp].append(blk)
            nz_c[comp][cy0 + by][cx0 + bx] = sum(1 for v in blk if v)
    return dc_scan, ac_scans, cdc, cac


# --- CAVLC encoder: IDR I_16x16 frame + P_L0_16x16/P_Skip frames ------------


def _pad_plane(rows, w: int, h: int, pw: int, ph: int) -> list:
    return [[rows[min(y, h - 1)][min(x, w - 1)] for x in range(pw)]
            for y in range(ph)]


def _add_clip(pred: list, res: list) -> list:
    return [[min(255, max(0, p + q)) for p, q in zip(pr, rr)]
            for pr, rr in zip(pred, res)]


def _sub(src: list, pred: list, px: int, py: int, n: int) -> list:
    return [[src[py + r][px + c] - pred[r][c] for c in range(n)]
            for r in range(n)]


def _place(plane: list, blk: list, px: int, py: int) -> None:
    for r, row in enumerate(blk):
        plane[py + r][px:px + len(row)] = row


# deterministic full-pel, even-displacement candidate MVs (luma px)
_MV_CANDIDATES = [(0, 0), (-2, 0), (2, 0), (0, -2), (0, 2),
                  (-4, 0), (4, 0), (0, -4), (0, 4),
                  (-8, 0), (8, 0), (0, -8), (0, 8),
                  (-16, 0), (16, 0), (0, -16), (0, 16)]


def h264_encode(width: int, height: int, frames, qp: int = 0,
                subpel: bool = True, deblock: bool = False) -> bytes:
    """Encode a list of planar YUV420 frames [(y, u, v), ...] as a
    baseline Annex-B stream: one IDR I slice (all I_16x16, DC
    prediction, CAVLC residuals), then one P slice per later frame
    (P_Skip / P_L0_16x16, full-/half-pel motion, CAVLC residuals).
    ``subpel=False`` pins the motion search to the full-pel candidate
    set (the closed-form oracle class relies on that pin; the decoder
    supports half-pel either way).  Deterministic; in-loop deblocking
    encoded disabled."""
    return _encode_cavlc(width, height, frames, qp, subpel, deblock)[0]


def h264_encode_with_recon(width: int, height: int, frames,
                           qp: int = 0, subpel: bool = True,
                           deblock: bool = False) -> tuple:
    """h264_encode, also returning the encoder's own reconstruction
    (cropped) — the exact frames a conforming decoder must produce."""
    return _encode_cavlc(width, height, frames, qp, subpel, deblock)


def _encode_cavlc(width: int, height: int, frames, qp: int,
                  subpel: bool = True, deblock: bool = False) -> tuple:
    if not frames:
        raise ValueError("h264: no frames")
    if width % 2 or height % 2:
        raise ValueError("h264: dimensions must be even (4:2:0 chroma)")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    pw, ph = mb_w * 16, mb_h * 16
    crop_r, crop_b = (pw - width) // 2, (ph - height) // 2
    cqp = _chroma_qp(qp)

    w = BitWriter()
    w.u(8, 66)
    w.u(8, 0xC0)
    w.u(8, 10)
    w.ue(0)
    w.ue(0)      # log2_max_frame_num_minus4
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
    out = bytearray(_nal(7, 3, w.to_bytes()))

    w = BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 0)
    w.u(1, 0)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(1, 0)
    w.u(2, 0)
    w.se(0)      # pic_init_qp_minus26 (slice_qp_delta carries qp)
    w.se(0)
    w.se(0)      # chroma_qp_index_offset
    w.u(1, 1)
    w.u(1, 0)
    w.u(1, 0)
    w.rbsp_trailing()
    out += _nal(8, 3, w.to_bytes())

    refs: list = []   # reconstructed reference frames, newest first
    ref_count = 0
    recons = []
    for fi, (ys, us, vs) in enumerate(frames):
        src_y = _pad_plane(ys, width, height, pw, ph)
        src_u = _pad_plane(us, width // 2, height // 2, pw // 2, ph // 2)
        src_v = _pad_plane(vs, width // 2, height // 2, pw // 2, ph // 2)
        cur_y = [[0] * pw for _ in range(ph)]
        cur_u = [[0] * (pw // 2) for _ in range(ph // 2)]
        cur_v = [[0] * (pw // 2) for _ in range(ph // 2)]
        nz_y = [[0] * (mb_w * 4) for _ in range(mb_h * 4)]
        nz_c = ([[0] * (mb_w * 2) for _ in range(mb_h * 2)],
                [[0] * (mb_w * 2) for _ in range(mb_h * 2)])
        minfo = [[None] * mb_w for _ in range(mb_h)]
        idr = fi == 0
        # low-delay GOP: I, P, then alternate B (non-reference, both
        # refs in the past -> decode order == display order) and P
        is_b = (not idr) and fi % 2 == 0 and len(refs) >= 2
        ref = refs[0] if refs else None

        w = BitWriter()
        w.ue(0)                 # first_mb_in_slice
        w.ue(7 if idr else (6 if is_b else 5))  # slice_type (all-I/B/P)
        w.ue(0)                 # pps_id
        w.u(4, ref_count & 15)  # frame_num
        if idr:
            w.ue(0)             # idr_pic_id
        else:
            if is_b:
                w.u(1, 0)       # direct_spatial_mv_pred_flag
            w.u(1, 0)           # num_ref_idx_active_override_flag
            w.u(1, 0)           # ref_pic_list_modification_flag_l0
            if is_b:
                w.u(1, 0)       # ref_pic_list_modification_flag_l1
        if idr:
            w.u(1, 0)
            w.u(1, 0)
        elif not is_b:          # B frames are non-reference here
            w.u(1, 0)           # adaptive_ref_pic_marking_mode_flag
        w.se(qp - 26)           # slice_qp_delta
        if deblock:
            w.ue(0)             # disable_deblocking_filter_idc: ON
            w.se(0)             # slice_alpha_c0_offset_div2
            w.se(0)             # slice_beta_offset_div2
        else:
            w.ue(1)             # disable_deblocking_filter_idc: off

        skip_run = 0
        for mbi in range(mb_w * mb_h):
            mbx, mby = mbi % mb_w, mbi // mb_w
            px, py = mbx * 16, mby * 16
            cx, cy = px // 2, py // 2
            if is_b:
                # RefPicList0[0] = nearest past ref, RefPicList1[0] =
                # the older one (the spec's equal-lists swap rule when
                # no future references exist)
                rl0, rl1 = refs[0], refs[1]

                def search_b(rp):
                    best = None
                    for dx, dy in _MV_CANDIDATES:
                        cand = (dx * 4, dy * 4)
                        py16 = _mc_luma(rp[0], px, py, 16, 16, *cand)
                        sad = sum(
                            abs(src_y[py + r][px + c] - py16[r][c])
                            for r in range(16) for c in range(16))
                        if best is None or sad < best[0]:
                            best = (sad, cand, py16)
                    rings = (((-2, 0), (2, 0), (0, -2), (0, 2),
                              (-1, 0), (1, 0), (0, -1), (0, 1))
                             if subpel else ())
                    for hdx, hdy in rings:
                        cand = (best[1][0] + hdx, best[1][1] + hdy)
                        py16 = _mc_luma(rp[0], px, py, 16, 16, *cand)
                        sad = sum(
                            abs(src_y[py + r][px + c] - py16[r][c])
                            for r in range(16) for c in range(16))
                        if sad < best[0]:
                            best = (sad, cand, py16)
                    return best
                s0 = search_b(rl0)
                s1 = search_b(rl1)
                bi_y = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                        for ra, rb in zip(s0[2], s1[2])]
                sad_bi = sum(abs(src_y[py + r][px + c] - bi_y[r][c])
                             for r in range(16) for c in range(16))
                mode, sad = 1, s0[0]          # B_L0_16x16
                if s1[0] < sad:
                    mode, sad = 2, s1[0]      # B_L1_16x16
                if sad_bi < sad:
                    mode = 3                  # B_Bi_16x16
                mv0 = s0[1] if mode in (1, 3) else None
                mv1 = s1[1] if mode in (2, 3) else None
                if mode == 1:
                    pred_y = s0[2]
                    pred_u = _mc_chroma(rl0[1], cx, cy, 8, 8, *mv0)
                    pred_v = _mc_chroma(rl0[2], cx, cy, 8, 8, *mv0)
                elif mode == 2:
                    pred_y = s1[2]
                    pred_u = _mc_chroma(rl1[1], cx, cy, 8, 8, *mv1)
                    pred_v = _mc_chroma(rl1[2], cx, cy, 8, 8, *mv1)
                else:
                    pred_y = bi_y
                    u0 = _mc_chroma(rl0[1], cx, cy, 8, 8, *mv0)
                    u1 = _mc_chroma(rl1[1], cx, cy, 8, 8, *mv1)
                    v0 = _mc_chroma(rl0[2], cx, cy, 8, 8, *mv0)
                    v1 = _mc_chroma(rl1[2], cx, cy, 8, 8, *mv1)
                    pred_u = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                              for ra, rb in zip(u0, u1)]
                    pred_v = [[(a + b + 1) >> 1 for a, b in zip(ra, rb)]
                              for ra, rb in zip(v0, v1)]
                scans, rec_res = _enc_inter_luma(
                    _sub(src_y, pred_y, px, py, 16), qp)
                cdcu, cacu, rec_u = _enc_chroma(
                    _sub(src_u, pred_u, cx, cy, 8), cqp, False)
                cdcv, cacv, rec_v = _enc_chroma(
                    _sub(src_v, pred_v, cx, cy, 8), cqp, False)
                cbp_l = 0
                for i8 in range(4):
                    if any(v for j in range(4)
                           for v in scans[i8 * 4 + j]):
                        cbp_l |= 1 << i8
                if any(v for comp in (cacu, cacv) for sc in comp
                       for v in sc):
                    cbp_c = 2
                elif any(cdcu) or any(cdcv):
                    cbp_c = 1
                else:
                    cbp_c = 0
                w.ue(0)          # mb_skip_run (no B_Skip here)
                w.ue(mode)       # B_L0/L1/Bi_16x16
                if mv0 is not None:
                    mvp0 = _mv_pred_b(minfo, mbx, mby, mb_w, 0)
                    w.se(mv0[0] - mvp0[0])
                    w.se(mv0[1] - mvp0[1])
                if mv1 is not None:
                    mvp1 = _mv_pred_b(minfo, mbx, mby, mb_w, 1)
                    w.se(mv1[0] - mvp1[0])
                    w.se(mv1[1] - mvp1[1])
                w.ue(_CBP_INTER_INV[cbp_l | (cbp_c << 4)])
                if cbp_l or cbp_c:
                    w.se(0)
                _write_residual(w, "inter", cbp_l, cbp_c, None, scans,
                                (cdcu, cdcv), (cacu, cacv),
                                nz_y, nz_c, mbx, mby)
                _place(cur_y, _add_clip(pred_y, rec_res), px, py)
                _place(cur_u, _add_clip(pred_u, rec_u), cx, cy)
                _place(cur_v, _add_clip(pred_v, rec_v), cx, cy)
                minfo[mby][mbx] = ("B", mv0, mv1)
                continue
            if not idr:
                smv = _skip_mv(minfo, mbx, mby, mb_w)
                sy = _mc_luma(ref[0], px, py, 16, 16, smv[0], smv[1])
                su = _mc_chroma(ref[1], cx, cy, 8, 8, smv[0], smv[1])
                sv = _mc_chroma(ref[2], cx, cy, 8, 8, smv[0], smv[1])
                if (sy == [row[px:px + 16] for row in src_y[py:py + 16]]
                        and su == [row[cx:cx + 8]
                                   for row in src_u[cy:cy + 8]]
                        and sv == [row[cx:cx + 8]
                                   for row in src_v[cy:cy + 8]]):
                    _place(cur_y, sy, px, py)
                    _place(cur_u, su, cx, cy)
                    _place(cur_v, sv, cx, cy)
                    minfo[mby][mbx] = ("P", smv[0], smv[1])
                    skip_run += 1
                    continue
                # motion search: deterministic full-pel candidate set,
                # then one half-pel refinement ring around the winner
                # (strict improvement keeps the search deterministic)
                best = None
                for dx, dy in _MV_CANDIDATES:
                    cand = (dx * 4, dy * 4)
                    py16 = _mc_luma(ref[0], px, py, 16, 16, *cand)
                    sad = sum(abs(src_y[py + r][px + c] - py16[r][c])
                              for r in range(16) for c in range(16))
                    if best is None or sad < best[0]:
                        best = (sad, cand, py16)
                for hdx, hdy in (((-2, 0), (2, 0), (0, -2), (0, 2),
                                  (-2, -2), (-2, 2), (2, -2), (2, 2),
                                  (-1, 0), (1, 0), (0, -1), (0, 1))
                                 if subpel else ()):
                    cand = (best[1][0] + hdx, best[1][1] + hdy)
                    py16 = _mc_luma(ref[0], px, py, 16, 16, *cand)
                    sad = sum(abs(src_y[py + r][px + c] - py16[r][c])
                              for r in range(16) for c in range(16))
                    if sad < best[0]:
                        best = (sad, cand, py16)
                _, mv, pred_y = best
                pred_u = _mc_chroma(ref[1], cx, cy, 8, 8, *mv)
                pred_v = _mc_chroma(ref[2], cx, cy, 8, 8, *mv)
                scans, rec_res = _enc_inter_luma(
                    _sub(src_y, pred_y, px, py, 16), qp)
                cdcu, cacu, rec_u = _enc_chroma(
                    _sub(src_u, pred_u, cx, cy, 8), cqp, False)
                cdcv, cacv, rec_v = _enc_chroma(
                    _sub(src_v, pred_v, cx, cy, 8), cqp, False)
                cbp_l = 0
                for i8 in range(4):
                    if any(v for j in range(4) for v in scans[i8 * 4 + j]):
                        cbp_l |= 1 << i8
                if any(v for comp in (cacu, cacv) for s in comp for v in s):
                    cbp_c = 2
                elif any(cdcu) or any(cdcv):
                    cbp_c = 1
                else:
                    cbp_c = 0
                mvp = _mv_pred(minfo, mbx, mby, mb_w)
                w.ue(skip_run)
                skip_run = 0
                w.ue(0)          # mb_type P_L0_16x16
                w.se(mv[0] - mvp[0])
                w.se(mv[1] - mvp[1])
                w.ue(_CBP_INTER_INV[cbp_l | (cbp_c << 4)])
                if cbp_l or cbp_c:
                    w.se(0)      # mb_qp_delta
                _write_residual(w, "inter", cbp_l, cbp_c, None, scans,
                                (cdcu, cdcv), (cacu, cacv),
                                nz_y, nz_c, mbx, mby)
                _place(cur_y, _add_clip(pred_y, rec_res), px, py)
                _place(cur_u, _add_clip(pred_u, rec_u), cx, cy)
                _place(cur_v, _add_clip(pred_v, rec_v), cx, cy)
                minfo[mby][mbx] = ("P", mv[0], mv[1])
                continue
            # ---- I_16x16, DC prediction ----
            pred_y = _pred_i16(cur_y, px, py, 2, mbx > 0, mby > 0)
            dc_scan, ac_scans, rec_res = _enc_i16_luma(
                _sub(src_y, pred_y, px, py, 16), qp)
            pred_u = _pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
            pred_v = _pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
            cdcu, cacu, rec_u = _enc_chroma(
                _sub(src_u, pred_u, cx, cy, 8), cqp, True)
            cdcv, cacv, rec_v = _enc_chroma(
                _sub(src_v, pred_v, cx, cy, 8), cqp, True)
            cbp_l = 15 if any(v for s in ac_scans for v in s) else 0
            if any(v for comp in (cacu, cacv) for s in comp for v in s):
                cbp_c = 2
            elif any(cdcu) or any(cdcv):
                cbp_c = 1
            else:
                cbp_c = 0
            mb_type = 1 + 2 + 4 * cbp_c + (12 if cbp_l else 0)
            w.ue(mb_type)
            w.ue(0)              # intra_chroma_pred_mode: DC
            w.se(0)              # mb_qp_delta
            _write_residual(w, "i16", cbp_l, cbp_c, dc_scan, ac_scans,
                            (cdcu, cdcv), (cacu, cacv),
                            nz_y, nz_c, mbx, mby)
            _place(cur_y, _add_clip(pred_y, rec_res), px, py)
            _place(cur_u, _add_clip(pred_u, rec_u), cx, cy)
            _place(cur_v, _add_clip(pred_v, rec_v), cx, cy)
            minfo[mby][mbx] = ("I",)
        if skip_run:
            w.ue(skip_run)
        if deblock:
            _deblock_frame((cur_y, cur_u, cur_v), mb_w, mb_h, minfo,
                           nz_y, nz_c, qp, cqp)
        w.rbsp_trailing()
        out += _nal(5 if idr else 1,
                    3 if idr else (0 if is_b else 2), w.to_bytes())
        if not is_b:
            refs = [(cur_y, cur_u, cur_v)] + refs[:1]
            ref_count += 1
        recons.append((
            [row[:width] for row in cur_y[:height]],
            [row[:width // 2] for row in cur_u[:height // 2]],
            [row[:width // 2] for row in cur_v[:height // 2]]))
    return bytes(out), recons


# --- CAVLC decoder: general I/P frame sequence ------------------------------


def h264_decode_frames(data: bytes) -> tuple:
    """Decode an Annex-B stream of single-slice frames (I slices of
    I_16x16/I_PCM macroblocks, P slices adding P_Skip and
    P_L0_16x16, B slices adding B_L0/B_L1/B_Bi_16x16 with two
    past-reference lists, full/half/quarter-pel motion) ->
    (width, height, [(y, u, v), ...]) with frame cropping applied.

    Unsupported syntax raises ImageFormatError: CABAC, I_4x4/plane
    or non-DC chroma intra prediction, sub-pel motion, multiple
    reference frames, in-loop deblocking, interlace, POC type 0/1,
    multi-slice pictures, P sub-partitions."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    frames = []
    refs: list = []
    geom = None
    for ebsp in split_annexb(data):
        if not ebsp:
            continue
        rbsp = ebsp_to_rbsp(ebsp)
        nal_ref_idc = (rbsp[0] >> 5) & 3
        nal_type = rbsp[0] & 0x1F
        body = rbsp[1:]
        if nal_type == 7:
            sps = _parse_sps(BitReader(body))
            sps_by_id[sps["id"]] = sps
            continue
        if nal_type == 8:
            pps = _parse_pps(BitReader(body))
            pps_by_id[pps["id"]] = pps
            continue
        if nal_type not in (1, 5):
            continue
        r = BitReader(body)
        if r.ue() != 0:
            raise ImageFormatError("h264: multi-slice pictures unsupported")
        st = r.ue() % 5
        if st not in (0, 1, 2):
            raise ImageFormatError("h264: SP/SI slices unsupported")
        ptype = st == 0
        btype = st == 1
        if (ptype or btype) and nal_type == 5:
            raise ImageFormatError("h264: inter slice in IDR NAL")
        pps = pps_by_id.get(r.ue())
        if pps is None:
            raise ImageFormatError("h264: slice references unknown PPS")
        sps = sps_by_id.get(pps["sps_id"])
        if sps is None:
            raise ImageFormatError("h264: PPS references unknown SPS")
        r.u(sps["log2_max_frame_num"])
        if nal_type == 5:
            r.ue()  # idr_pic_id
        if sps["poc_type"] == 0:
            raise ImageFormatError("h264: poc_type 0 unsupported")
        if btype:
            r.u(1)  # direct_spatial_mv_pred_flag (direct mode rejected)
        if ptype or btype:
            if r.u(1):  # num_ref_idx_active_override_flag
                if r.ue() != 0 or (btype and r.ue() != 0):
                    raise ImageFormatError(
                        "h264: multiple reference frames per list "
                        "unsupported")
            if r.u(1):
                raise ImageFormatError(
                    "h264: ref_pic_list_modification unsupported")
            if btype and r.u(1):
                raise ImageFormatError(
                    "h264: ref_pic_list_modification unsupported")
        if nal_type == 5:
            r.u(1)
            r.u(1)
        elif nal_ref_idc:
            if r.u(1):
                raise ImageFormatError(
                    "h264: adaptive ref-pic marking unsupported")
        qp = pps["init_qp"] + r.se()
        if not 0 <= qp <= 51:
            raise ImageFormatError("h264: slice QP out of range")
        slice_qp = qp
        do_deblock = False
        db_a_off = db_b_off = 0
        if pps["deblock_ctrl"]:
            idc = r.ue()
            if idc != 1:
                # idc 0 filters everywhere; idc 2 skips slice
                # boundaries — identical for single-slice pictures
                do_deblock = True
                db_a_off = r.se()
                db_b_off = r.se()
        if ptype and not refs:
            raise ImageFormatError("h264: P slice without a reference frame")
        if btype and len(refs) < 2:
            raise ImageFormatError(
                "h264: B slice needs two stored reference frames")
        ref = refs[0] if refs else None
        mb_w, mb_h = sps["mb_w"], sps["mb_h"]
        pw, ph = mb_w * 16, mb_h * 16
        cur_y = [[0] * pw for _ in range(ph)]
        cur_u = [[0] * (pw // 2) for _ in range(ph // 2)]
        cur_v = [[0] * (pw // 2) for _ in range(ph // 2)]
        nz_y = [[0] * (mb_w * 4) for _ in range(mb_h * 4)]
        nz_c = ([[0] * (mb_w * 2) for _ in range(mb_h * 2)],
                [[0] * (mb_w * 2) for _ in range(mb_h * 2)])
        minfo = [[None] * mb_w for _ in range(mb_h)]
        nmbs = mb_w * mb_h

        def do_skip(mbx: int, mby: int) -> None:
            smv = _skip_mv(minfo, mbx, mby, mb_w)
            px, py = mbx * 16, mby * 16
            cx, cy = px // 2, py // 2
            _place(cur_y, _mc_luma(ref[0], px, py, 16, 16, *smv), px, py)
            _place(cur_u, _mc_chroma(ref[1], cx, cy, 8, 8, *smv), cx, cy)
            _place(cur_v, _mc_chroma(ref[2], cx, cy, 8, 8, *smv), cx, cy)
            minfo[mby][mbx] = ("P", smv[0], smv[1])

        mb = 0
        if pps["cabac"]:
            from .minih264_cabac import decode_slice

            decode_slice(
                r, "B" if btype else ("P" if ptype else "I"), qp,
                _chroma_qp(min(51, max(0, qp + pps["chroma_qp_off"]))),
                mb_w, mb_h, cur_y, cur_u, cur_v, nz_y, nz_c, minfo,
                refs)
            mb = nmbs  # whole picture parsed by the CABAC slice layer
        while mb < nmbs:
            if ptype:
                run = r.ue()
                for _ in range(run):
                    if mb >= nmbs:
                        raise ImageFormatError(
                            "h264: mb_skip_run past end of picture")
                    do_skip(mb % mb_w, mb // mb_w)
                    mb += 1
                if mb >= nmbs:
                    break
            elif btype:
                if r.ue() != 0:
                    raise ImageFormatError(
                        "h264: B_Skip/direct macroblocks unsupported")
            mbx, mby = mb % mb_w, mb // mb_w
            px, py = mbx * 16, mby * 16
            cx, cy = px // 2, py // 2
            mb_type = r.ue()
            bmode = None
            if ptype:
                if mb_type == 0:
                    it = None  # inter
                elif mb_type >= 5:
                    it = mb_type - 5
                else:
                    raise ImageFormatError(
                        "h264: P sub-partitions unsupported (16x16 subset)")
            elif btype:
                if mb_type in (1, 2, 3):
                    it = None
                    bmode = mb_type
                elif mb_type >= 23:
                    it = mb_type - 23
                elif mb_type == 0:
                    raise ImageFormatError(
                        "h264: B_Direct macroblocks unsupported")
                else:
                    raise ImageFormatError(
                        "h264: B sub-partitions unsupported (16x16 subset)")
            else:
                it = mb_type
            if it is None:
                # ---- P_L0_16x16 / B_{L0,L1,Bi}_16x16 ----
                mv0 = mv1 = None
                if bmode is None:
                    mvd = (r.se(), r.se())
                    mvp = _mv_pred(minfo, mbx, mby, mb_w)
                    mv0 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                else:
                    if bmode in (1, 3):
                        mvd = (r.se(), r.se())
                        mvp = _mv_pred_b(minfo, mbx, mby, mb_w, 0)
                        mv0 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                    if bmode in (2, 3):
                        mvd = (r.se(), r.se())
                        mvp = _mv_pred_b(minfo, mbx, mby, mb_w, 1)
                        mv1 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
                code = r.ue()
                if code >= 48:
                    raise ImageFormatError("h264: bad coded_block_pattern")
                cbp = _CBP_INTER[code]
                cbp_l, cbp_c = cbp & 15, cbp >> 4
                if cbp:
                    qp += r.se()
                    if not 0 <= qp <= 51:
                        raise ImageFormatError("h264: mb QP out of range")
                cqp = _chroma_qp(
                    min(51, max(0, qp + pps["chroma_qp_off"])))
                _, scans, cdc, cac = _read_residual(
                    r, "inter", cbp_l, cbp_c, nz_y, nz_c, mbx, mby)

                def mc(rp, mv):
                    return (_mc_luma(rp[0], px, py, 16, 16, *mv),
                            _mc_chroma(rp[1], cx, cy, 8, 8, *mv),
                            _mc_chroma(rp[2], cx, cy, 8, 8, *mv))

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
                _place(cur_y, _add_clip(
                    pred_y, _recon_inter_luma(scans, qp)), px, py)
                _place(cur_u, _add_clip(
                    pred_u, _recon_chroma(cdc[0], cac[0], cqp)), cx, cy)
                _place(cur_v, _add_clip(
                    pred_v, _recon_chroma(cdc[1], cac[1], cqp)), cx, cy)
                minfo[mby][mbx] = (
                    ("P", mv0[0], mv0[1]) if bmode is None
                    else ("B", mv0, mv1))
            elif it == 25:
                # ---- I_PCM ----
                r.byte_align()
                samples = r.bytes_raw(256 + 64 + 64)
                for i in range(256):
                    cur_y[py + i // 16][px + i % 16] = samples[i]
                for i in range(64):
                    cur_u[cy + i // 8][cx + i % 8] = samples[256 + i]
                    cur_v[cy + i // 8][cx + i % 8] = samples[320 + i]
                for by in range(4):
                    for bx in range(4):
                        nz_y[mby * 4 + by][mbx * 4 + bx] = 16
                for comp in (0, 1):
                    for by in range(2):
                        for bx in range(2):
                            nz_c[comp][mby * 2 + by][mbx * 2 + bx] = 16
                minfo[mby][mbx] = ("I",)
            elif 1 <= it <= 24:
                # ---- I_16x16 ----
                pm = (it - 1) % 4
                cbp_c = ((it - 1) // 4) % 3
                cbp_l = 15 if it >= 13 else 0
                if r.ue() != 0:
                    raise ImageFormatError(
                        "h264: only DC chroma intra prediction supported")
                qp += r.se()
                if not 0 <= qp <= 51:
                    raise ImageFormatError("h264: mb QP out of range")
                cqp = _chroma_qp(
                    min(51, max(0, qp + pps["chroma_qp_off"])))
                dc_scan, ac_scans, cdc, cac = _read_residual(
                    r, "i16", cbp_l, cbp_c, nz_y, nz_c, mbx, mby)
                pred_y = _pred_i16(cur_y, px, py, pm, mbx > 0, mby > 0)
                pred_u = _pred_chroma_dc(cur_u, cx, cy, mbx > 0, mby > 0)
                pred_v = _pred_chroma_dc(cur_v, cx, cy, mbx > 0, mby > 0)
                _place(cur_y, _add_clip(
                    pred_y, _recon_i16_luma(dc_scan, ac_scans, qp)), px, py)
                _place(cur_u, _add_clip(
                    pred_u, _recon_chroma(cdc[0], cac[0], cqp)), cx, cy)
                _place(cur_v, _add_clip(
                    pred_v, _recon_chroma(cdc[1], cac[1], cqp)), cx, cy)
                minfo[mby][mbx] = ("I",)
            else:
                raise ImageFormatError(
                    "h264: I_4x4 macroblocks unsupported (I_16x16 subset)")
            mb += 1
        if do_deblock:
            if qp != slice_qp:
                raise ImageFormatError(
                    "h264: per-MB QP changes with deblocking unsupported")
            _deblock_frame(
                (cur_y, cur_u, cur_v), mb_w, mb_h, minfo, nz_y, nz_c,
                slice_qp,
                _chroma_qp(min(51, max(0, slice_qp
                                       + pps["chroma_qp_off"]))),
                db_a_off, db_b_off)
        if nal_ref_idc:
            refs = [(cur_y, cur_u, cur_v)] + refs[:1]
        geom = sps
        cl, crr, ct, cb = geom["crop"]
        width = pw - 2 * (cl + crr)
        height = ph - 2 * (ct + cb)
        if width <= 0 or height <= 0:
            raise ImageFormatError("h264: cropping removes the whole frame")
        x0, y0 = 2 * cl, 2 * ct
        frames.append((
            [row[x0:x0 + width] for row in cur_y[y0:y0 + height]],
            [row[x0 // 2:x0 // 2 + width // 2]
             for row in cur_u[y0 // 2:y0 // 2 + height // 2]],
            [row[x0 // 2:x0 // 2 + width // 2]
             for row in cur_v[y0 // 2:y0 // 2 + height // 2]]))
    if not frames:
        raise ImageFormatError("h264: no decodable slices")
    y0f = frames[0]
    return (len(y0f[0][0]), len(y0f[0]), frames)


# --- sub-sample interpolation (§8.4.2.2): luma half-pel 6-tap + chroma
# eighth-pel bilinear. Quarter-pel luma positions (odd qpel components)
# stay unsupported and raise.


def _mc_luma(plane: list, x0: int, y0: int, w: int, h: int,
             mvx: int, mvy: int) -> list:
    """Luma MC at quarter-pel mv units, ALL 16 sub-positions
    (§8.4.2.2.1): half samples via the (1,-5,20,20,-5,1)/32
    separable 6-tap with edge clamping (the centre position filters
    un-normalized horizontal intermediates vertically, +512>>10);
    quarter samples average the two nearest integer/half samples
    with +1>>1, exactly per the spec's position table."""
    ix, fx = mvx >> 2, mvx & 3
    iy, fy = mvy >> 2, mvy & 3
    if fx == 0 and fy == 0:
        return _mc_block(plane, x0, y0, w, h, ix, iy)
    ph, pw = len(plane), len(plane[0])

    def g(yy: int, xx: int) -> int:
        return plane[min(max(yy, 0), ph - 1)][min(max(xx, 0), pw - 1)]

    def tap6(vals) -> int:
        a, b, c, d, e, f = vals
        return a - 5 * b + 20 * c + 20 * d - 5 * e + f

    def half_b(yy: int, xx: int) -> int:  # half right of (xx, yy)
        return min(255, max(0, (
            tap6([g(yy, xx + k) for k in range(-2, 4)]) + 16) >> 5))

    def half_h(yy: int, xx: int) -> int:  # half below (xx, yy)
        return min(255, max(0, (
            tap6([g(yy + k, xx) for k in range(-2, 4)]) + 16) >> 5))

    def half_j(yy: int, xx: int) -> int:  # centre
        inter = [
            tap6([g(yy + k, xx + m) for m in range(-2, 4)])
            for k in range(-2, 4)
        ]
        return min(255, max(0, (tap6(inter) + 512) >> 10))

    def avg(a: int, b: int) -> int:
        return (a + b + 1) >> 1

    def sample(yy: int, xx: int) -> int:
        # spec position lattice around integer sample G = (xx, yy)
        if fy == 0:
            if fx == 2:
                return half_b(yy, xx)
            bb = half_b(yy, xx)
            return avg(g(yy, xx), bb) if fx == 1 else avg(bb, g(yy, xx + 1))
        if fx == 0:
            if fy == 2:
                return half_h(yy, xx)
            hh = half_h(yy, xx)
            return avg(g(yy, xx), hh) if fy == 1 else avg(hh, g(yy + 1, xx))
        if fx == 2 and fy == 2:
            return half_j(yy, xx)
        if fx == 2:  # (2,1)/(2,3): between b and j
            jj = half_j(yy, xx)
            return avg(half_b(yy, xx), jj) if fy == 1 \
                else avg(jj, half_b(yy + 1, xx))
        if fy == 2:  # (1,2)/(3,2): between h and j
            jj = half_j(yy, xx)
            return avg(half_h(yy, xx), jj) if fx == 1 \
                else avg(jj, half_h(yy, xx + 1))
        # diagonal quarters (odd, odd): average the nearest b and h
        bb = half_b(yy + (1 if fy == 3 else 0), xx)
        hh = half_h(yy, xx + (1 if fx == 3 else 0))
        return avg(bb, hh)

    return [[sample(y0 + iy + r, x0 + ix + c) for c in range(w)]
            for r in range(h)]


def _mc_chroma(plane: list, x0: int, y0: int, w: int, h: int,
               mvx: int, mvy: int) -> list:
    """Chroma MC: the quarter-pel luma mv addresses eighth-pel chroma
    positions; bilinear over the 4 neighbours with /64 rounding
    (§8.4.2.2.2)."""
    ix, dx = mvx >> 3, mvx & 7
    iy, dy = mvy >> 3, mvy & 7
    if dx == 0 and dy == 0:
        return _mc_block(plane, x0, y0, w, h, ix, iy)
    ph, pw = len(plane), len(plane[0])

    def g(yy: int, xx: int) -> int:
        return plane[min(max(yy, 0), ph - 1)][min(max(xx, 0), pw - 1)]

    out = [[0] * w for _ in range(h)]
    for r in range(h):
        sy = y0 + iy + r
        for c in range(w):
            sx = x0 + ix + c
            a, b = g(sy, sx), g(sy, sx + 1)
            cc, d = g(sy + 1, sx), g(sy + 1, sx + 1)
            out[r][c] = (
                (8 - dx) * (8 - dy) * a + dx * (8 - dy) * b
                + (8 - dx) * dy * cc + dx * dy * d + 32
            ) >> 6
    return out


# --- in-loop deblocking filter (§8.7) ---------------------------------------
# Structure (edge order, bS derivation, filterSampleFlag, the normal
# tc-clipped kernel and the strong MB-edge kernel, chroma p0/q0-only
# rule) is spec-faithful.  The alpha/beta/tc0 THRESHOLD TABLES are
# [self] formula reconstructions (the published exponential shape,
# not the published values — same honesty contract as the VLC
# tables): encoder reconstruction and decoder share them, so decode
# == recon exactly; byte interop is claimed only for streams that
# encode the filter disabled.


def _db_alpha(idx: int) -> int:
    return 0 if idx < 16 else min(255, int(0.8 * (2 ** (idx / 6.0) - 1) + 0.5))


def _db_beta(idx: int) -> int:
    return 0 if idx < 16 else min(18, idx // 2 - 6)


def _db_tc0(idx: int, bs: int) -> int:
    if idx < 16:
        return 0
    base = int((2 ** (idx / 6.0) - 1) / 10 + 0.5)
    return max(bs - 1, base + bs - 1)


def _clip3(lo: int, hi: int, v: int) -> int:
    return lo if v < lo else (hi if v > hi else v)


def _filter_edge_luma(get, put, bs: int, idx_a: int, idx_b: int) -> None:
    """Filter one 1-pixel line across an edge: get(k)/put(k, v) address
    samples at signed offsets ... p1=-2, p0=-1, q0=0, q1=1 ..."""
    alpha, beta = _db_alpha(idx_a), _db_beta(idx_b)
    p0, q0 = get(-1), get(0)
    p1, q1 = get(-2), get(1)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    p2, q2 = get(-3), get(2)
    ap, aq = abs(p2 - p0), abs(q2 - q0)
    if bs < 4:
        tc0 = _db_tc0(idx_a, bs)
        tc = tc0 + (1 if ap < beta else 0) + (1 if aq < beta else 0)
        delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        put(-1, _clip3(0, 255, p0 + delta))
        put(0, _clip3(0, 255, q0 - delta))
        if ap < beta:
            put(-2, p1 + _clip3(-tc0, tc0,
                                (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
        if aq < beta:
            put(1, q1 + _clip3(-tc0, tc0,
                               (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
        return
    # bS == 4: strong filter on intra MB edges
    small_gap = abs(p0 - q0) < ((alpha >> 2) + 2)
    if ap < beta and small_gap:
        p3 = get(-4)
        put(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
        put(-2, (p2 + p1 + p0 + q0 + 2) >> 2)
        put(-3, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    else:
        put(-1, (2 * p1 + p0 + q1 + 2) >> 2)
    if aq < beta and small_gap:
        q3 = get(3)
        put(0, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
        put(1, (q2 + q1 + q0 + p0 + 2) >> 2)
        put(2, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
    else:
        put(0, (2 * q1 + q0 + p1 + 2) >> 2)


def _filter_edge_chroma(get, put, bs: int, idx_a: int, idx_b: int) -> None:
    """Chroma edges modify p0/q0 only (§8.7.2.4)."""
    alpha, beta = _db_alpha(idx_a), _db_beta(idx_b)
    p0, q0 = get(-1), get(0)
    p1, q1 = get(-2), get(1)
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return
    if bs < 4:
        tc = _db_tc0(idx_a, bs) + 1
        delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
        put(-1, _clip3(0, 255, p0 + delta))
        put(0, _clip3(0, 255, q0 - delta))
    else:
        put(-1, (2 * p1 + p0 + q1 + 2) >> 2)
        put(0, (2 * q1 + q0 + p1 + 2) >> 2)


def _edge_bs(mb_edge: bool, a_info, b_info, a_nz: int, b_nz: int) -> int:
    """Boundary strength (§8.7.2.1, 16x16-partition subset): 4/3 for
    intra, 2 when either side carries coefficients, 1 when the sides
    use different prediction structure (lists) or any shared list's
    vectors diverge by a full sample, else 0."""
    a_intra = a_info is None or a_info[0] not in ("P", "B")
    b_intra = b_info is None or b_info[0] not in ("P", "B")
    if a_intra or b_intra:
        return 4 if mb_edge else 3
    if a_nz or b_nz:
        return 2

    def mv_lists(info):
        if info[0] == "P":
            return ((info[1], info[2]), None)
        return (info[1], info[2])  # ("B", mv0 | None, mv1 | None)

    a0, a1 = mv_lists(a_info)
    b0, b1 = mv_lists(b_info)
    if (a0 is None) != (b0 is None) or (a1 is None) != (b1 is None):
        return 1
    for av, bv in ((a0, b0), (a1, b1)):
        if av is not None and (abs(av[0] - bv[0]) >= 4
                               or abs(av[1] - bv[1]) >= 4):
            return 1
    return 0


def _deblock_frame(planes: tuple, mb_w: int, mb_h: int, minfo: list,
                   nz_y: list, nz_c: tuple, qp: int, cqp: int,
                   a_off: int = 0, b_off: int = 0) -> None:
    """Apply the in-loop filter to reconstructed planes IN PLACE: per
    MB in raster order, vertical luma edges left-to-right then
    horizontal top-to-bottom (§8.7 edge order); chroma filters the
    edges aligned with luma edges 0 and 2.  QP is constant per slice
    here, so the threshold indices are fixed per call."""
    yp, up, vp = planes
    idx_a = _clip3(0, 51, qp + 2 * a_off)
    idx_b = _clip3(0, 51, qp + 2 * b_off)
    cidx_a = _clip3(0, 51, cqp + 2 * a_off)
    cidx_b = _clip3(0, 51, cqp + 2 * b_off)

    def luma_v(x: int, y: int, bs: int) -> None:
        row = yp[y]
        _filter_edge_luma(lambda k: row[x + k],
                          lambda k, v: row.__setitem__(x + k, v),
                          bs, idx_a, idx_b)

    def luma_h(x: int, y: int, bs: int) -> None:
        _filter_edge_luma(lambda k: yp[y + k][x],
                          lambda k, v: yp[y + k].__setitem__(x, v),
                          bs, idx_a, idx_b)

    def chroma_v(p, x: int, y: int, bs: int) -> None:
        row = p[y]
        _filter_edge_chroma(lambda k: row[x + k],
                            lambda k, v: row.__setitem__(x + k, v),
                            bs, cidx_a, cidx_b)

    def chroma_h(p, x: int, y: int, bs: int) -> None:
        _filter_edge_chroma(lambda k: p[y + k][x],
                            lambda k, v: p[y + k].__setitem__(x, v),
                            bs, cidx_a, cidx_b)

    for mby in range(mb_h):
        for mbx in range(mb_w):
            info = minfo[mby][mbx]
            # vertical edges (filter columns), e = edge index 0..3
            for e in range(4):
                if e == 0 and mbx == 0:
                    continue
                x = mbx * 16 + e * 4
                for r in range(16):
                    y = mby * 16 + r
                    by = mby * 4 + r // 4
                    bx = mbx * 4 + e
                    a_info = minfo[mby][mbx - 1] if e == 0 else info
                    bs = _edge_bs(e == 0, a_info, info,
                                  nz_y[by][bx - 1], nz_y[by][bx])
                    if bs:
                        luma_v(x, y, bs)
                if e in (0, 2):
                    cx = mbx * 8 + (e // 2) * 4
                    for r in range(8):
                        cy = mby * 8 + r
                        by = mby * 4 + r // 2
                        bx = mbx * 4 + e
                        a_info = minfo[mby][mbx - 1] if e == 0 else info
                        bs = _edge_bs(e == 0, a_info, info,
                                      nz_y[by][bx - 1], nz_y[by][bx])
                        if bs:
                            chroma_v(up, cx, cy, bs)
                            chroma_v(vp, cx, cy, bs)
            # horizontal edges (filter rows)
            for e in range(4):
                if e == 0 and mby == 0:
                    continue
                y = mby * 16 + e * 4
                for c in range(16):
                    x = mbx * 16 + c
                    bx = mbx * 4 + c // 4
                    by = mby * 4 + e
                    a_info = minfo[mby - 1][mbx] if e == 0 else info
                    bs = _edge_bs(e == 0, a_info, info,
                                  nz_y[by - 1][bx], nz_y[by][bx])
                    if bs:
                        luma_h(x, y, bs)
                if e in (0, 2):
                    cy = mby * 8 + (e // 2) * 4
                    for c in range(8):
                        cx = mbx * 8 + c
                        bx = mbx * 4 + c // 2
                        by = mby * 4 + e
                        a_info = minfo[mby - 1][mbx] if e == 0 else info
                        bs = _edge_bs(e == 0, a_info, info,
                                      nz_y[by - 1][bx], nz_y[by][bx])
                        if bs:
                            chroma_h(up, cx, cy, bs)
                            chroma_h(vp, cx, cy, bs)
