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
