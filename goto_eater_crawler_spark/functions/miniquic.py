"""QUIC frame-layer walk (RFC 9000) — own encoder/decoder.

The transport under HTTP/3: a crawler's h3 fetch arrives as QUIC
packets whose (decrypted) payloads are a sequence of frames. This
walk decodes one packet payload's frame stream and reassembles
per-stream bodies. Packet protection (TLS/AEAD, RFC 9001) is out of
scope by design — the walk starts where decryption ends, exactly as
the h2 walk starts after TLS.

Spec surface carried (each load-bearing):
* variable-length integers (§16): the length lives in the TOP two
  bits of the FIRST byte (00/01/10/11 -> 1/2/4/8 bytes), remaining
  bits big-endian — the third varint convention in the repo, and the
  opposite end to both protobuf's LEB128 (little-endian 7-bit
  groups) and source-map VLQ (little-endian 5-bit groups): a reader
  that borrows either of those decodes every multi-byte value wrong;
* non-canonical encodings are LEGAL on decode (§16: "a value is not
  required to use the shortest encoding") — 0x4025 and 0x25 both
  mean 37; the walk accepts them and reports canonical length
  separately so an encoder test can still pin shortest-form;
* PADDING (§19.1) runs, PING (§19.2);
* ACK (§19.3): largest-acked, delay, first range, then (gap,
  range-length) pairs each OFFSET BY ONE descending — a range
  arithmetic that underflows below packet number 0 is a protocol
  violation the walk rejects; type 0x03 appends 3 ECN counts;
* CRYPTO (§19.6): offset + length + data, reassembled by offset;
* STREAM (§19.8, types 0x08-0x0f): OFF/LEN/FIN bits in the type
  byte; a STREAM frame WITHOUT the LEN bit extends to the end of
  the packet BY DEFINITION and must therefore be encoded last —
  a frame placed after it is silently absorbed into stream data,
  which the tests pin as the (unrecoverable) consequence;
* MAX_DATA (§19.9) / MAX_STREAM_DATA (§19.10);
* CONNECTION_CLOSE (§19.19): error code, offending frame type,
  reason phrase.

Overlapping STREAM/CRYPTO retransmissions must carry IDENTICAL
bytes in the overlap (§2.2: "an endpoint MUST NOT alter stream
data"); the reassembler verifies instead of last-write-wins.

Reference parity: none — the reference fetches over h1; build-spec
surface for the frontier's fetch layer (h3 arm beside minih2).
"""

from __future__ import annotations

FT_PADDING = 0x00
FT_PING = 0x01
FT_ACK = 0x02
FT_ACK_ECN = 0x03
FT_CRYPTO = 0x06
FT_MAX_DATA = 0x10
FT_MAX_STREAM_DATA = 0x11
FT_CONNECTION_CLOSE = 0x1C
FT_STREAM_BASE = 0x08  # 0x08..0x0f: | OFF 0x04 | LEN 0x02 | FIN 0x01

_PREFIX_LEN = (1, 2, 4, 8)


def encode_varint(v: int, *, width: int | None = None) -> bytes:
    """Shortest-form unless an explicit legal ``width`` is forced
    (to exercise the non-canonical-decode rule)."""
    if v < 0 or v > (1 << 62) - 1:
        raise ValueError("varint out of range [0, 2^62)")
    for i, w in enumerate(_PREFIX_LEN):
        if width is not None and w != width:
            continue
        if v < (1 << (8 * w - 2)):
            out = v | (i << (8 * w - 2))
            return out.to_bytes(w, "big")
    raise ValueError(f"value {v} does not fit width {width}")


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """-> (value, new_pos). Truncation rejected."""
    if pos >= len(buf):
        raise ValueError("varint: empty")
    w = _PREFIX_LEN[buf[pos] >> 6]
    if pos + w > len(buf):
        raise ValueError("varint: truncated")
    v = int.from_bytes(buf[pos : pos + w], "big") & ((1 << (8 * w - 2)) - 1)
    return v, pos + w


def canonical_len(v: int) -> int:
    for i, w in enumerate(_PREFIX_LEN):
        if v < (1 << (8 * w - 2)):
            return w
    raise ValueError("out of range")


# ---------------------------------------------------------------------------
# frame encoders (synthesis side)
# ---------------------------------------------------------------------------


def stream_frame(
    stream_id: int,
    data: bytes,
    *,
    offset: int = 0,
    fin: bool = False,
    explicit_len: bool = True,
) -> bytes:
    t = FT_STREAM_BASE
    out = b""
    if offset:
        t |= 0x04
    if explicit_len:
        t |= 0x02
    if fin:
        t |= 0x01
    out += bytes([t]) + encode_varint(stream_id)
    if offset:
        out += encode_varint(offset)
    if explicit_len:
        out += encode_varint(len(data))
    return out + data


def crypto_frame(offset: int, data: bytes) -> bytes:
    return (
        bytes([FT_CRYPTO])
        + encode_varint(offset)
        + encode_varint(len(data))
        + data
    )


def ack_frame(
    largest: int,
    delay: int,
    ranges: list[tuple[int, int]],
    *,
    ecn: tuple[int, int, int] | None = None,
) -> bytes:
    """ranges: [(first_range_len, ...)] as (gap, length) pairs after
    the first — pass [(first_len,)] semantics via ranges[0][1]."""
    first_len = ranges[0][1]
    out = bytes([FT_ACK_ECN if ecn else FT_ACK])
    out += encode_varint(largest) + encode_varint(delay)
    out += encode_varint(len(ranges) - 1) + encode_varint(first_len)
    for gap, length in ranges[1:]:
        out += encode_varint(gap) + encode_varint(length)
    if ecn:
        for c in ecn:
            out += encode_varint(c)
    return out


def connection_close_frame(
    err: int, frame_type: int, reason: bytes
) -> bytes:
    return (
        bytes([FT_CONNECTION_CLOSE])
        + encode_varint(err)
        + encode_varint(frame_type)
        + encode_varint(len(reason))
        + reason
    )


# ---------------------------------------------------------------------------
# packet-payload walk
# ---------------------------------------------------------------------------


def _insert_segment(segs: list, off: int, data: bytes, what: str) -> None:
    """Offset-ordered insert with §2.2 overlap-equality verification."""
    for o, d in segs:
        lo = max(o, off)
        hi = min(o + len(d), off + len(data))
        if lo < hi and d[lo - o : hi - o] != data[lo - off : hi - off]:
            raise ValueError(f"{what}: overlapping retransmission differs")
    segs.append((off, data))


def _assemble(segs: list, what: str) -> tuple[bytes, bool]:
    """-> (contiguous prefix from 0, complete_flag_no_gap)."""
    out = bytearray()
    for o, d in sorted(segs, key=lambda t: (t[0], len(t[1]))):
        if o > len(out):
            return bytes(out), False  # gap
        tail = o + len(d)
        if tail > len(out):
            out += d[len(out) - o :]
    return bytes(out), True


def decode_payload(buf: bytes) -> dict:
    """Walk one decrypted packet payload's frame sequence."""
    pos = 0
    n_frames = 0
    padding = 0
    pings = 0
    acks: list[dict] = []
    streams: dict[int, dict] = {}
    crypto_segs: list = []
    max_data = None
    max_stream_data: dict[int, int] = {}
    close = None
    while pos < len(buf):
        t = buf[pos]
        if t == FT_PADDING:
            pos += 1
            padding += 1
            continue  # PADDING is not counted as a frame below
        n_frames += 1
        if t == FT_PING:
            pos += 1
            pings += 1
        elif t in (FT_ACK, FT_ACK_ECN):
            pos += 1
            largest, pos = decode_varint(buf, pos)
            delay, pos = decode_varint(buf, pos)
            nrange, pos = decode_varint(buf, pos)
            first_len, pos = decode_varint(buf, pos)
            # smallest in first range: largest - first_len (§19.3.1)
            smallest = largest - first_len
            if smallest < 0:
                raise ValueError("ACK: first range underflows pn 0")
            n_acked = first_len + 1
            for _ in range(nrange):
                gap, pos = decode_varint(buf, pos)
                rlen, pos = decode_varint(buf, pos)
                # next largest = smallest - gap - 2 (§19.3.1 ack-range)
                largest_r = smallest - gap - 2
                smallest = largest_r - rlen
                if smallest < 0:
                    raise ValueError("ACK: range underflows pn 0")
                n_acked += rlen + 1
            ecn = None
            if t == FT_ACK_ECN:
                e0, pos = decode_varint(buf, pos)
                e1, pos = decode_varint(buf, pos)
                ce, pos = decode_varint(buf, pos)
                ecn = (e0, e1, ce)
            acks.append(
                {"largest": largest, "delay": delay,
                 "n_acked": n_acked, "ecn": ecn}
            )
        elif t == FT_CRYPTO:
            pos += 1
            off, pos = decode_varint(buf, pos)
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("CRYPTO: data truncated")
            _insert_segment(crypto_segs, off, buf[pos : pos + ln], "CRYPTO")
            pos += ln
        elif t == FT_MAX_DATA:
            pos += 1
            limit, pos = decode_varint(buf, pos)
            # §4.1: limits that do not increase the flow-control
            # window MUST be ignored (frames can be reordered)
            if max_data is None or limit > max_data:
                max_data = limit
        elif t == FT_MAX_STREAM_DATA:
            # per-STREAM limit keyed by stream id (§19.10) — kept
            # apart from the connection-level max_data so a payload
            # carrying both frame types reports each correctly
            pos += 1
            sid, pos = decode_varint(buf, pos)
            limit, pos = decode_varint(buf, pos)
            if limit > max_stream_data.get(sid, -1):
                max_stream_data[sid] = limit
        elif t == FT_CONNECTION_CLOSE:
            pos += 1
            err, pos = decode_varint(buf, pos)
            ftype, pos = decode_varint(buf, pos)
            rlen, pos = decode_varint(buf, pos)
            if pos + rlen > len(buf):
                raise ValueError("CONNECTION_CLOSE: reason truncated")
            close = {"err": err, "frame_type": ftype,
                     "reason": buf[pos : pos + rlen].decode("utf-8")}
            pos += rlen
        elif FT_STREAM_BASE <= t <= FT_STREAM_BASE | 0x07:
            has_off = bool(t & 0x04)
            has_len = bool(t & 0x02)
            fin = bool(t & 0x01)
            pos += 1
            sid, pos = decode_varint(buf, pos)
            off = 0
            if has_off:
                off, pos = decode_varint(buf, pos)
            if has_len:
                ln, pos = decode_varint(buf, pos)
                if pos + ln > len(buf):
                    raise ValueError("STREAM: data truncated")
            else:
                ln = len(buf) - pos  # extends to end of packet
            st = streams.setdefault(sid, {"segs": [], "fin_at": None})
            _insert_segment(st["segs"], off, buf[pos : pos + ln], "STREAM")
            pos += ln
            if fin:
                end = off + ln
                if st["fin_at"] is not None and st["fin_at"] != end:
                    raise ValueError("STREAM: conflicting FIN offsets")
                st["fin_at"] = end
            # no position check is POSSIBLE for the LEN-less form: it
            # consumes to end-of-packet by definition (§19.8), which
            # is exactly WHY it must be encoded last — any frame
            # placed after it is silently absorbed into the stream
            # data (pinned by test_implicit_length_absorbs_successors)
        else:
            raise ValueError(f"unknown frame type 0x{t:02x}")
    out_streams = {}
    for sid, st in streams.items():
        body, contiguous = _assemble(st["segs"], "STREAM")
        complete = (
            contiguous
            and st["fin_at"] is not None
            and len(body) == st["fin_at"]
        )
        out_streams[sid] = {
            "body": body, "fin_at": st["fin_at"], "complete": complete,
        }
    crypto, _ = _assemble(crypto_segs, "CRYPTO")
    return {
        "n_frames": n_frames,
        "padding": padding,
        "pings": pings,
        "acks": acks,
        "streams": out_streams,
        "crypto": crypto,
        "max_data": max_data,
        "max_stream_data": max_stream_data,
        "close": close,
    }
