"""miniflac — pure-stdlib FLAC (RFC 9639) encoder/decoder subset.

Completes the audio arm of the multimodal codec family (miniwav
covers the uncompressed RIFF path): REAL lossless compression with
the full container and entropy layer, not a metadata-only sniffer.

SUPPORTED (decode): fLaC magic + metadata-block walk (STREAMINFO
parsed, others skipped), frame sync + header (blocksize codes
0b0001..0b1111 including the 8/16-bit end-of-header forms, sample
rate from STREAMINFO or the 4-bit code table, UTF-8-style coded
frame number, CRC-8 verified), channel assignments independent /
left-side / right-side / mid-side (side channel read at bits+1 per
the spec), subframe types CONSTANT, VERBATIM, FIXED orders 0-4 and
LPC (any order, quantized-coefficient integer prediction), wasted
bits, Rice residual method 0 (4-bit params) and 1 (5-bit params)
with partition orders 0-15 and the raw-escape code, frame CRC-16,
and the STREAMINFO MD5 of the unencoded interleaved stream.

SUPPORTED (encode): fixed-blocksize streams, 4-32 bit samples, 1-8
channels, per-block stereo decorrelation chosen by exact cost among
independent / left-side / right-side / mid-side, per-subframe choice
of CONSTANT / FIXED 0-4 / VERBATIM by exact bit cost, single-
partition Rice with exhaustive parameter search and raw escape.
Encoder never emits LPC (decode-only, like real fixed-predictor
encoders such as Shorten); decode(encode(x)) == x for every input
by losslessness, which the tests fuzz-pin.

Everything here follows the published RFC 9639 bit layout; there are
no derived probability tables, so no [self] honesty note is needed
(CRC polynomials 0x07 / 0x8005, the fixed-predictor taps, and the
zigzag/unary conventions are all normative spec text mirrored from
the RFC).

The reference crawler has no audio analogue (its binaries are
PDFs/XLSX, both really decoded); like miniwav/minih264 this is
build-spec frontier surface for the multimodal training-data
pipeline, not parity (cf. reference scrapy pipelines handling only
text formats, e.g. goto_eater/pipelines.py).
"""

from __future__ import annotations

import hashlib

from .miniwav import AudioFormatError

_SYNC = 0b11111111111110  # 14-bit frame sync

# fixed-predictor taps, order 0..4 (RFC 9639 §9.2.3)
_FIXED_TAPS = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)

_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Writer:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, nbits: int, value: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self._buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def s(self, nbits: int, value: int) -> None:
        self.u(nbits, value & ((1 << nbits) - 1))

    def unary(self, value: int) -> None:
        # RFC 9639: `value` 0-bits followed by a terminating 1-bit
        while value >= 32:
            self.u(32, 0)
            value -= 32
        self.u(value + 1, 1)

    def align(self) -> None:
        if self._n:
            self.u(8 - self._n, 0)

    def to_bytes(self) -> bytes:
        assert self._n == 0, "unaligned FLAC frame"
        return bytes(self._buf)


class _Reader:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._data = data
        self.pos = pos_bytes * 8  # bit position

    def u(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > len(self._data) * 8:
            raise AudioFormatError("flac: bitstream overrun")
        v = 0
        p = self.pos
        d = self._data
        while nbits:
            take = min(8 - (p & 7), nbits)
            byte = d[p >> 3]
            v = (v << take) | ((byte >> (8 - (p & 7) - take)) & ((1 << take) - 1))
            p += take
            nbits -= take
        self.pos = p
        return v

    def s(self, nbits: int) -> int:
        v = self.u(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.u(1) == 0:
            n += 1
            if n > 1 << 20:
                raise AudioFormatError("flac: runaway unary code")
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_encode(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead_bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                              (7, 36)):
        if n < (1 << lead_bits):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = (0xFE << (7 - nbytes)) & 0xFF | n  # nbytes 1-bits prefix
            return bytes(out)
    raise AudioFormatError("flac: coded number out of range")


def _utf8_decode(r: _Reader) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise AudioFormatError("flac: bad coded-number lead byte")
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = r.u(8)
        if b & 0xC0 != 0x80:
            raise AudioFormatError("flac: bad coded-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-r << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if not u & 1 else -((u + 1) >> 1)


# ---------------------------------------------------------------------------
# residual coding (RFC 9639 §9.2.7)
# ---------------------------------------------------------------------------

def _rice_cost(resid: list, k: int) -> int:
    return sum((_zigzag(r) >> k) + 1 + k for r in resid)


def _best_rice(resid: list) -> tuple:
    """(param, cost_bits) — exhaustive search k in 0..14, vs the
    raw-escape alternative."""
    best_k, best_c = 0, _rice_cost(resid, 0)
    for k in range(1, 15):
        c = _rice_cost(resid, k)
        if c < best_c:
            best_k, best_c = k, c
    # raw escape stores SIGNED residuals; compute the needed width
    swidth = 0
    for r in resid:
        need = r.bit_length() + 1 if r >= 0 else (-r - 1).bit_length() + 1
        swidth = max(swidth, need)
    esc_c = 5 + swidth * len(resid)
    # the escape's bit-width field is 5 bits (<= 31); wider residuals
    # (possible at 24/32-bit input with high fixed orders) must stay
    # on the Rice path, whose quotient has no width limit
    if esc_c < best_c and swidth <= 31:
        return (-swidth, esc_c)  # negative marks escape, |v| = bit width
    return (best_k, best_c)


def _write_residual(w: _Writer, resid: list) -> None:
    """Single-partition Rice (method 0, partition order 0)."""
    k, _ = _best_rice(resid)
    w.u(2, 0)  # method: 4-bit rice
    w.u(4, 0)  # partition order 0
    if k < 0:
        w.u(4, 15)        # escape
        w.u(5, -k)        # raw bit width
        for r in resid:
            w.s(-k, r)
        return
    w.u(4, k)
    for r in resid:
        u = _zigzag(r)
        w.unary(u >> k)
        if k:
            w.u(k, u & ((1 << k) - 1))


def _read_residual(r: _Reader, blocksize: int, order: int) -> list:
    method = r.u(2)
    if method > 1:
        raise AudioFormatError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.u(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise AudioFormatError("flac: partition order mismatch")
    out = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise AudioFormatError("flac: negative partition length")
        param = r.u(pbits)
        if param == escape:
            width = r.u(5)
            out.extend(r.s(width) if width else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | (r.u(param) if param else 0)
                out.append(_unzigzag(u))
    return out


# ---------------------------------------------------------------------------
# subframes (RFC 9639 §9.2)
# ---------------------------------------------------------------------------

def _fixed_residual(samples: list, order: int) -> list:
    taps = _FIXED_TAPS[order]
    return [
        s - sum(t * samples[i - 1 - j] for j, t in enumerate(taps))
        for i, s in enumerate(samples) if i >= order
    ] if order else list(samples)


def _write_subframe(w: _Writer, samples: list, bits: int) -> None:
    n = len(samples)
    if all(s == samples[0] for s in samples):
        w.u(1, 0)
        w.u(6, 0)  # CONSTANT
        w.u(1, 0)  # no wasted bits
        w.s(bits, samples[0])
        return
    best = None  # (cost, order, resid)
    for order in range(min(4, n - 1) + 1):
        resid = _fixed_residual(samples, order)
        _, rc = _best_rice(resid)
        cost = order * bits + 6 + rc
        if best is None or cost < best[0]:
            best = (cost, order, resid)
    verb_cost = n * bits
    if verb_cost <= best[0]:
        w.u(1, 0)
        w.u(6, 1)  # VERBATIM
        w.u(1, 0)
        for s in samples:
            w.s(bits, s)
        return
    _, order, resid = best
    w.u(1, 0)
    w.u(6, 0b001000 | order)  # FIXED
    w.u(1, 0)
    for s in samples[:order]:
        w.s(bits, s)
    _write_residual(w, resid)


def _read_subframe(r: _Reader, blocksize: int, bits: int) -> list:
    if r.u(1):
        raise AudioFormatError("flac: bad subframe padding bit")
    t = r.u(6)
    wasted = 0
    if r.u(1):
        wasted = r.unary() + 1
    eff = bits - wasted
    if eff <= 0:
        raise AudioFormatError("flac: wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        v = r.s(eff)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = [r.s(eff) for _ in range(blocksize)]
    elif 0b001000 <= t <= 0b001100:  # FIXED 0-4
        order = t & 7
        if order > blocksize:
            raise AudioFormatError("flac: fixed order exceeds blocksize")
        out = [r.s(eff) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        taps = _FIXED_TAPS[order]
        for res in resid:
            out.append(res + sum(t_ * out[len(out) - 1 - j]
                                 for j, t_ in enumerate(taps)))
    elif t & 0b100000:  # LPC
        order = (t & 0b011111) + 1
        if order > blocksize:
            raise AudioFormatError("flac: lpc order exceeds blocksize")
        out = [r.s(eff) for _ in range(order)]
        prec = r.u(4) + 1
        if prec == 16:
            raise AudioFormatError("flac: invalid lpc precision")
        shift = r.s(5)
        if shift < 0:
            raise AudioFormatError("flac: negative lpc shift")
        coefs = [r.s(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        for res in resid:
            pred = sum(c * out[len(out) - 1 - j]
                       for j, c in enumerate(coefs)) >> shift
            out.append(res + pred)
    else:
        raise AudioFormatError("flac: reserved subframe type")
    if wasted:
        out = [s << wasted for s in out]
    return out


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------

def _stereo_cost(samples: list, bits: int) -> int:
    """Exact subframe bit cost proxy: best of constant / fixed /
    verbatim, matching _write_subframe's decision rule."""
    n = len(samples)
    if all(s == samples[0] for s in samples):
        return 8 + bits
    best = None
    for order in range(min(4, n - 1) + 1):
        resid = _fixed_residual(samples, order)
        _, rc = _best_rice(resid)
        cost = order * bits + 6 + rc
        if best is None or cost < best:
            best = cost
    return 8 + min(best, n * bits)


def _encode_frame(frame_no: int, block: list, sample_rate: int, bits: int,
                  blocksize_nominal: int) -> bytes:
    nch = len(block)
    n = len(block[0])
    # stereo decorrelation decision (exact-cost, deterministic)
    if nch == 2:
        left, right = block
        side = [a - b for a, b in zip(left, right)]
        mid = [(a + b) >> 1 for a, b in zip(left, right)]
        cl = _stereo_cost(left, bits)
        cr = _stereo_cost(right, bits)
        cs = _stereo_cost(side, bits + 1)
        cm = _stereo_cost(mid, bits)
        costs = {
            1: cl + cr,       # independent
            8: cl + cs,       # left/side
            9: cs + cr,       # right/side
            10: cm + cs,      # mid/side
        }
        ch_assign = min(sorted(costs), key=costs.get)
        if ch_assign == 8:
            subframes = [(left, bits), (side, bits + 1)]
        elif ch_assign == 9:
            subframes = [(side, bits + 1), (right, bits)]
        elif ch_assign == 10:
            subframes = [(mid, bits), (side, bits + 1)]
        else:
            ch_assign = 1
            subframes = [(left, bits), (right, bits)]
    else:
        ch_assign = nch - 1
        subframes = [(c, bits) for c in block]

    w = _Writer()
    w.u(14, _SYNC)
    w.u(1, 0)  # reserved
    w.u(1, 0)  # fixed-blocksize strategy (frame number coded)
    if n == blocksize_nominal and blocksize_nominal in (
            256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
        bs_code = 8 + (blocksize_nominal.bit_length() - 9)
        bs_tail = None
    elif n == 192:
        bs_code, bs_tail = 1, None
    else:
        bs_code, bs_tail = 7, n - 1  # 16-bit at end of header
    w.u(4, bs_code)
    w.u(4, _RATE_CODES.get(sample_rate, 0))  # 0 = from STREAMINFO
    w.u(4, ch_assign)
    w.u(3, {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0))
    w.u(1, 0)  # reserved
    for b in _utf8_encode(frame_no):
        w.u(8, b)
    if bs_tail is not None:
        w.u(16, bs_tail)
    hdr = w.to_bytes()
    w.u(8, _crc8(hdr))
    for samples, sbits in subframes:
        _write_subframe(w, samples, sbits)
    w.align()
    body = w.to_bytes()
    return body + _crc16(body).to_bytes(2, "big")


def _decode_frame(r: _Reader, info: dict) -> tuple:
    start_byte = r.pos >> 3
    if r.u(14) != _SYNC:
        raise AudioFormatError("flac: lost frame sync")
    if r.u(1):
        raise AudioFormatError("flac: reserved frame bit set")
    r.u(1)  # blocking strategy
    bs_code = r.u(4)
    sr_code = r.u(4)
    ch_assign = r.u(4)
    ss_code = r.u(3)
    if r.u(1):
        raise AudioFormatError("flac: reserved frame bit set")
    _utf8_decode(r)  # frame/sample number (position checked via count)
    if bs_code == 0:
        raise AudioFormatError("flac: reserved blocksize code")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = r.u(8) + 1
    elif bs_code == 7:
        blocksize = r.u(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        sample_rate = info["sample_rate"]
    elif sr_code in _RATE_FROM_CODE:
        sample_rate = _RATE_FROM_CODE[sr_code]
    elif sr_code == 12:
        sample_rate = r.u(8) * 1000
    elif sr_code == 13:
        sample_rate = r.u(16)
    elif sr_code == 14:
        sample_rate = r.u(16) * 10
    else:
        raise AudioFormatError("flac: invalid sample rate code")
    if sample_rate != info["sample_rate"]:
        raise AudioFormatError("flac: frame/STREAMINFO sample rate mismatch")
    bits = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code,
                                                         info["bits"])
    if ss_code in (3,):
        raise AudioFormatError("flac: reserved sample size code")
    if bits != info["bits"]:
        raise AudioFormatError("flac: frame/STREAMINFO sample size mismatch")
    hdr_end = r.pos >> 3
    if _crc8(r._data[start_byte:hdr_end]) != r.u(8):
        raise AudioFormatError("flac: frame header CRC-8 mismatch")

    if ch_assign <= 7:
        nch = ch_assign + 1
        chans = [_read_subframe(r, blocksize, bits) for _ in range(nch)]
    elif ch_assign in (8, 9, 10):
        nch = 2
        if ch_assign == 8:    # left/side
            left = _read_subframe(r, blocksize, bits)
            side = _read_subframe(r, blocksize, bits + 1)
            chans = [left, [a - s for a, s in zip(left, side)]]
        elif ch_assign == 9:  # right/side
            side = _read_subframe(r, blocksize, bits + 1)
            right = _read_subframe(r, blocksize, bits)
            chans = [[b + s for b, s in zip(right, side)], right]
        else:                 # mid/side
            mid = _read_subframe(r, blocksize, bits)
            side = _read_subframe(r, blocksize, bits + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]
    else:
        raise AudioFormatError("flac: reserved channel assignment")
    if nch != info["channels"]:
        raise AudioFormatError("flac: frame/STREAMINFO channel mismatch")
    r.align()
    frame_end = r.pos >> 3
    if _crc16(r._data[start_byte:frame_end]) != r.u(16):
        raise AudioFormatError("flac: frame CRC-16 mismatch")
    return chans


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _md5_stream(chans: list, bits: int) -> bytes:
    nbytes = bits // 8
    h = hashlib.md5()
    buf = bytearray()
    n = len(chans[0])
    for i in range(n):
        for c in chans:
            buf += (c[i] & ((1 << bits) - 1)).to_bytes(nbytes, "little")
    h.update(bytes(buf))
    return h.digest()


def flac_encode(sample_rate: int, channels: list, bits: int = 16,
                blocksize: int = 256) -> bytes:
    """Encode per-channel sample lists into a FLAC stream (fLaC magic,
    STREAMINFO, fixed-blocksize frames)."""
    if not channels or not channels[0]:
        raise AudioFormatError("flac: no samples")
    nch = len(channels)
    if not 1 <= nch <= 8:
        raise AudioFormatError("flac: 1-8 channels supported")
    if bits % 8 or not 8 <= bits <= 32:
        raise AudioFormatError("flac: bits must be 8/16/24/32")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise AudioFormatError("flac: ragged channels")
    lim = 1 << (bits - 1)
    if any(not -lim <= s < lim for c in channels for s in c):
        raise AudioFormatError("flac: sample out of range")
    frames = []
    for fno, off in enumerate(range(0, n, blocksize)):
        block = [c[off:off + blocksize] for c in channels]
        frames.append(_encode_frame(fno, block, sample_rate, bits, blocksize))
    min_fs = min(len(f) for f in frames)
    max_fs = max(len(f) for f in frames)
    last = len(channels[0]) % blocksize or blocksize

    w = _Writer()
    w.u(1, 1)   # last metadata block
    w.u(7, 0)   # STREAMINFO
    w.u(24, 34)
    w.u(16, blocksize if n >= blocksize else last)
    w.u(16, blocksize if n >= blocksize else last)
    w.u(24, min_fs)
    w.u(24, max_fs)
    w.u(20, sample_rate)
    w.u(3, nch - 1)
    w.u(5, bits - 1)
    w.u(36, n)
    meta = w.to_bytes() + _md5_stream(channels, bits)
    return b"fLaC" + meta + b"".join(frames)


def flac_decode(data: bytes) -> tuple:
    """Decode a FLAC stream -> (sample_rate, n_channels, bits,
    [channel0, channel1, ...]). Verifies frame CRC-8/CRC-16, the
    STREAMINFO sample total, and the STREAMINFO MD5."""
    if data[:4] != b"fLaC":
        raise AudioFormatError("flac: bad magic")
    r = _Reader(data, 4)
    info = None
    while True:
        last = r.u(1)
        btype = r.u(7)
        blen = r.u(24)
        if btype == 0:
            if blen != 34:
                raise AudioFormatError("flac: bad STREAMINFO length")
            r.u(16)  # min blocksize
            r.u(16)  # max blocksize
            r.u(24)
            r.u(24)
            sr = r.u(20)
            nch = r.u(3) + 1
            bits = r.u(5) + 1
            total = r.u(36)
            md5 = bytes(r.u(8) for _ in range(16))
            info = {"sample_rate": sr, "channels": nch, "bits": bits,
                    "total": total, "md5": md5}
        elif btype == 127:
            raise AudioFormatError("flac: invalid metadata block type")
        else:
            for _ in range(blen):
                r.u(8)
        if last:
            break
    if info is None:
        raise AudioFormatError("flac: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise AudioFormatError("flac: zero sample rate")
    chans = [[] for _ in range(info["channels"])]
    got = 0
    while got < info["total"]:
        frame = _decode_frame(r, info)
        for c, f in zip(chans, frame):
            c.extend(f)
        got += len(frame[0])
    if got != info["total"]:
        raise AudioFormatError("flac: decoded sample total mismatch")
    if info["md5"] != b"\0" * 16 and _md5_stream(chans, info["bits"]) \
            != info["md5"]:
        raise AudioFormatError("flac: MD5 mismatch")
    return info["sample_rate"], info["channels"], info["bits"], chans
