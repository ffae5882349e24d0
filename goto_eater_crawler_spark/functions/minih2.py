"""HTTP/2 framing walk (RFC 9113) — own encoder/decoder.

The session layer under functions/minihpack: a crawler speaking h2
multiplexes many fetches over one connection, so a captured session
is ONE binary blob carrying interleaved frames of several streams.
This walk reassembles per-stream bodies and accounts flow control.

Spec surface carried (each load-bearing):
* client connection preface (§3.4) — the 24-byte magic;
* 9-byte frame header (§4.1): 24-bit big-endian length, 8-bit type,
  8-bit flags, R bit + 31-bit stream id (R is masked and IGNORED,
  per spec — not rejected);
* DATA (§6.1) with the PADDED flag: a pad-length octet + trailing
  padding, STRIPPED from the reassembled body but COUNTED (incl.
  the length octet) against the flow-control window — getting this
  asymmetry wrong corrupts either the corpus or the accounting;
* HEADERS (§6.2) + CONTINUATION (§6.10): continuations must follow
  their HEADERS frame back-to-back on the SAME stream — ANY other
  frame interleaved is a connection error;
* SETTINGS (§6.5) as (uint16 id, uint32 value) pairs, ACK flag with
  mandatory empty payload;
* PING (§6.7, 8-byte payload), WINDOW_UPDATE (§6.9, 31-bit
  increment), RST_STREAM (§6.4), GOAWAY (§6.8, last-stream-id).

Reference parity: none — the reference crawls h1 via scrapy; this
is build-spec surface for the frontier's fetch layer.
"""

from __future__ import annotations

import struct

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

T_DATA = 0x0
T_HEADERS = 0x1
T_RST_STREAM = 0x3
T_SETTINGS = 0x4
T_PING = 0x6
T_GOAWAY = 0x7
T_WINDOW_UPDATE = 0x8
T_CONTINUATION = 0x9

F_END_STREAM = 0x1
F_ACK = 0x1
F_END_HEADERS = 0x4
F_PADDED = 0x8

SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5


def frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    if len(payload) > 0xFFFFFF:
        raise ValueError("frame too long")
    if stream_id >> 31:
        raise ValueError("stream id exceeds 31 bits")
    hdr = struct.pack(
        ">I", len(payload)
    )[1:] + bytes([ftype, flags]) + struct.pack(">I", stream_id)
    return hdr + payload


def data_frame(
    stream_id: int, body: bytes, *, end_stream: bool = False,
    pad_len: int = 0,
) -> bytes:
    flags = F_END_STREAM if end_stream else 0
    payload = body
    if pad_len:
        if pad_len > 255:
            raise ValueError("pad length exceeds one octet")
        flags |= F_PADDED
        payload = bytes([pad_len]) + body + b"\x00" * pad_len
    return frame(T_DATA, flags, stream_id, payload)


def settings_frame(pairs: list[tuple[int, int]], *, ack: bool = False) -> bytes:
    if ack:
        if pairs:
            raise ValueError("SETTINGS ACK must be empty")
        return frame(T_SETTINGS, F_ACK, 0, b"")
    body = b"".join(struct.pack(">HI", i, v) for i, v in pairs)
    return frame(T_SETTINGS, 0, 0, body)


def decode_session(buf: bytes) -> dict:
    """Walk a captured client-side session: preface + frames.
    Returns {n_frames, settings:{id:value}, bodies:{stream: bytes},
    flow_consumed, ended:[stream...], goaway_last, pings, resets}.
    Enforces CONTINUATION adjacency, padding bounds, ACK-emptiness;
    masks (ignores) the R bit of stream ids."""
    if buf[: len(PREFACE)] != PREFACE:
        raise ValueError("missing connection preface")
    pos = len(PREFACE)
    out = {
        "n_frames": 0,
        "settings": {},
        "bodies": {},
        "flow_consumed": 0,
        "ended": [],
        "goaway_last": None,
        "pings": 0,
        "resets": [],
    }
    expect_continuation: int | None = None
    while pos < len(buf):
        if pos + 9 > len(buf):
            raise ValueError("truncated frame header")
        length = int.from_bytes(buf[pos : pos + 3], "big")
        ftype = buf[pos + 3]
        flags = buf[pos + 4]
        stream_id = struct.unpack(">I", buf[pos + 5 : pos + 9])[0] & 0x7FFFFFFF
        pos += 9
        if pos + length > len(buf):
            raise ValueError("truncated frame payload")
        payload = buf[pos : pos + length]
        pos += length
        out["n_frames"] += 1
        if expect_continuation is not None and (
            ftype != T_CONTINUATION or stream_id != expect_continuation
        ):
            raise ValueError(
                "CONTINUATION for stream "
                f"{expect_continuation} interrupted by type {ftype}"
            )
        if ftype == T_DATA:
            if stream_id == 0:
                raise ValueError("DATA on stream 0")
            out["flow_consumed"] += length
            body = payload
            if flags & F_PADDED:
                if not payload:
                    raise ValueError("PADDED DATA with empty payload")
                pad = payload[0]
                if pad + 1 > length:
                    raise ValueError("pad length exceeds payload")
                body = payload[1 : length - pad]
            out["bodies"].setdefault(stream_id, b"")
            out["bodies"][stream_id] += body
            if flags & F_END_STREAM:
                out["ended"].append(stream_id)
        elif ftype == T_HEADERS:
            if not flags & F_END_HEADERS:
                expect_continuation = stream_id
        elif ftype == T_CONTINUATION:
            if expect_continuation is None:
                raise ValueError("CONTINUATION without open HEADERS")
            if flags & F_END_HEADERS:
                expect_continuation = None
        elif ftype == T_SETTINGS:
            if flags & F_ACK:
                if length:
                    raise ValueError("SETTINGS ACK with payload")
            else:
                if length % 6:
                    raise ValueError("SETTINGS length not multiple of 6")
                for i in range(0, length, 6):
                    sid, val = struct.unpack(">HI", payload[i : i + 6])
                    out["settings"][sid] = val
        elif ftype == T_PING:
            if length != 8:
                raise ValueError("PING payload must be 8 bytes")
            out["pings"] += 1
        elif ftype == T_WINDOW_UPDATE:
            if length != 4:
                raise ValueError("WINDOW_UPDATE payload must be 4 bytes")
        elif ftype == T_RST_STREAM:
            if length != 4:
                raise ValueError("RST_STREAM payload must be 4 bytes")
            out["resets"].append(stream_id)
        elif ftype == T_GOAWAY:
            if length < 8:
                raise ValueError("GOAWAY too short")
            out["goaway_last"] = (
                struct.unpack(">I", payload[:4])[0] & 0x7FFFFFFF
            )
        else:
            raise ValueError(f"unknown frame type {ftype}")
    if expect_continuation is not None:
        raise ValueError("unterminated header block")
    return out
