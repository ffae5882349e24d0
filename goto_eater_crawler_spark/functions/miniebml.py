"""EBML / Matroska (WebM) metadata walk — own encoder/decoder.

WebM is the web's native video container (RFC 9559 standardizes
Matroska; WebM is its VP8/VP9/Opus profile). A crawl corpus carries
it as opaque binary; this walk extracts the stream metadata a
training pipeline filters on (duration, codec, dimensions) without
decoding any media.

Spec surface deliberately carried:
* EBML variable-length integers: the FIRST byte's leading-zero
  count gives the total width (1..8); element IDs keep the marker
  bit (class IDs compare as written), SIZES strip it;
* the all-ones size value means UNKNOWN SIZE (§RFC 9559 4.2) — a
  streaming Segment extends to end-of-input and its children are
  parsed until EOF, not to a byte count;
* nested master elements (Segment > Info/Tracks > TrackEntry >
  Video/Audio) with unsigned ints in minimal big-endian width and
  floats in 4 OR 8 bytes (both widths are legal; both are read);
* unknown element IDs are SKIPPED by their declared size (forward
  compatibility) — except inside an unknown-size master, where an
  unknown ID terminates the master per the spec's resync rule
  (simplified here: unknown IDs inside known masters are skipped).

Reference parity: none (the reference crawls restaurant HTML); this
extends the engine's container family (MP4/MP3/Ogg/FLAC/WAV/...)
with the one major web container it lacked.
"""

from __future__ import annotations

import struct

EBML_HEADER = 0x1A45DFA3
E_DOCTYPE = 0x4282
E_EBML_VERSION = 0x4286
SEGMENT = 0x18538067
INFO = 0x1549A966
E_TS_SCALE = 0x2AD7B1
E_DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
E_TRACK_NUMBER = 0xD7
E_TRACK_TYPE = 0x83
E_CODEC_ID = 0x86
VIDEO = 0xE0
E_PIXEL_WIDTH = 0xB0
E_PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
E_SAMPLING_FREQ = 0xB5
E_CHANNELS = 0x9F

_MASTERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO, EBML_HEADER}


def _id_width(first: int) -> int:
    for w in range(1, 5):
        if first & (0x80 >> (w - 1)):
            return w
    raise ValueError(f"bad element ID first byte {first:#x}")


def read_id(buf: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(buf):
        raise ValueError("truncated element ID")
    w = _id_width(buf[pos])
    if pos + w > len(buf):
        raise ValueError("truncated element ID")
    return int.from_bytes(buf[pos : pos + w], "big"), pos + w


def read_size(buf: bytes, pos: int) -> tuple[int | None, int]:
    """Returns (size or None-for-unknown, new position)."""
    if pos >= len(buf):
        raise ValueError("truncated size")
    first = buf[pos]
    if first == 0:
        raise ValueError("size vint wider than 8 bytes")
    w = 1
    mask = 0x80
    while not first & mask:
        w += 1
        mask >>= 1
    if pos + w > len(buf):
        raise ValueError("truncated size")
    raw = int.from_bytes(buf[pos : pos + w], "big")
    val = raw & ~(mask << (8 * (w - 1)))
    all_ones = (1 << (7 * w)) - 1
    return (None if val == all_ones else val), pos + w


def write_id(eid: int) -> bytes:
    for w in range(1, 5):
        if eid < 1 << (8 * w):
            return eid.to_bytes(w, "big")
    raise ValueError("ID too wide")


def write_size(size: int | None, width: int | None = None) -> bytes:
    if size is None:
        return b"\xff"  # 1-byte all-ones: unknown
    for w in range(width or 1, 9):
        if size < (1 << (7 * w)) - 1:
            marker = 0x80 >> (w - 1)
            raw = size | (marker << (8 * (w - 1)))
            return raw.to_bytes(w, "big")
    raise ValueError("size too large")


def element(eid: int, body: bytes, *, unknown_size: bool = False) -> bytes:
    return write_id(eid) + (
        b"\xff" if unknown_size else write_size(len(body))
    ) + body


def uint_el(eid: int, v: int) -> bytes:
    w = max(1, (v.bit_length() + 7) // 8)
    return element(eid, v.to_bytes(w, "big"))


def float_el(eid: int, v: float, *, wide: bool = False) -> bytes:
    return element(
        eid, struct.pack(">d", v) if wide else struct.pack(">f", v)
    )


def str_el(eid: int, s: str) -> bytes:
    return element(eid, s.encode("utf-8"))


def _read_uint(body: bytes) -> int:
    if not 1 <= len(body) <= 8:
        raise ValueError("uint width out of range")
    return int.from_bytes(body, "big")


def _read_float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    raise ValueError("float element must be 4 or 8 bytes")


def parse(buf: bytes) -> dict:
    """Walk a WebM blob: returns {doctype, ebml_version,
    timestamp_scale, duration, tracks: [{number, type, codec,
    width, height, channels, sampling}]}.  Handles unknown-size
    Segments (parse children to EOF)."""
    out = {
        "doctype": None,
        "ebml_version": None,
        "timestamp_scale": 1000000,
        "duration": None,
        "tracks": [],
    }

    def walk(pos: int, end: int, ctx: int) -> int:
        while pos < end:
            eid, pos = read_id(buf, pos)
            size, pos = read_size(buf, pos)
            if size is None:
                if eid not in _MASTERS:
                    raise ValueError(
                        f"unknown-size non-master element {eid:#x}"
                    )
                body_end = end  # extends to the container's end
            else:
                body_end = pos + size
                if body_end > end:
                    raise ValueError("element overruns container")
            if eid in _MASTERS:
                if eid == TRACK_ENTRY:
                    out["tracks"].append(
                        {
                            "number": None, "type": None, "codec": None,
                            "width": None, "height": None,
                            "channels": None, "sampling": None,
                        }
                    )
                walk(pos, body_end, eid)
            else:
                body = buf[pos:body_end]
                if eid == E_DOCTYPE:
                    out["doctype"] = body.decode("utf-8")
                elif eid == E_EBML_VERSION:
                    out["ebml_version"] = _read_uint(body)
                elif eid == E_TS_SCALE:
                    out["timestamp_scale"] = _read_uint(body)
                elif eid == E_DURATION:
                    out["duration"] = _read_float(body)
                elif eid == E_TRACK_NUMBER and ctx == TRACK_ENTRY:
                    out["tracks"][-1]["number"] = _read_uint(body)
                elif eid == E_TRACK_TYPE and ctx == TRACK_ENTRY:
                    out["tracks"][-1]["type"] = _read_uint(body)
                elif eid == E_CODEC_ID and ctx == TRACK_ENTRY:
                    out["tracks"][-1]["codec"] = body.decode("utf-8")
                elif eid == E_PIXEL_WIDTH and ctx == VIDEO:
                    out["tracks"][-1]["width"] = _read_uint(body)
                elif eid == E_PIXEL_HEIGHT and ctx == VIDEO:
                    out["tracks"][-1]["height"] = _read_uint(body)
                elif eid == E_CHANNELS and ctx == AUDIO:
                    out["tracks"][-1]["channels"] = _read_uint(body)
                elif eid == E_SAMPLING_FREQ and ctx == AUDIO:
                    out["tracks"][-1]["sampling"] = _read_float(body)
                # unknown IDs: skipped by declared size
            pos = body_end
        if pos != end:
            raise ValueError("container overrun")
        return pos

    walk(0, len(buf), 0)
    if out["doctype"] is None:
        raise ValueError("missing EBML header / DocType")
    return out


def build_webm(
    *,
    duration_ms: float,
    video: tuple[str, int, int],
    audio: tuple[str, int, float] | None = None,
    unknown_size_segment: bool = False,
    wide_floats: bool = False,
) -> bytes:
    """Assemble a metadata-only WebM (no clusters/media)."""
    header = element(
        EBML_HEADER,
        uint_el(E_EBML_VERSION, 1) + str_el(E_DOCTYPE, "webm"),
    )
    info = element(
        INFO,
        uint_el(E_TS_SCALE, 1000000)
        + float_el(E_DURATION, duration_ms, wide=wide_floats),
    )
    codec, w, h = video
    entries = element(
        TRACK_ENTRY,
        uint_el(E_TRACK_NUMBER, 1)
        + uint_el(E_TRACK_TYPE, 1)
        + str_el(E_CODEC_ID, codec)
        + element(
            VIDEO, uint_el(E_PIXEL_WIDTH, w) + uint_el(E_PIXEL_HEIGHT, h)
        ),
    )
    if audio is not None:
        acodec, ch, freq = audio
        entries += element(
            TRACK_ENTRY,
            uint_el(E_TRACK_NUMBER, 2)
            + uint_el(E_TRACK_TYPE, 2)
            + str_el(E_CODEC_ID, acodec)
            + element(
                AUDIO,
                uint_el(E_CHANNELS, ch)
                + float_el(E_SAMPLING_FREQ, freq, wide=wide_floats),
            ),
        )
    tracks = element(TRACKS, entries)
    return header + element(
        SEGMENT, info + tracks, unknown_size=unknown_size_segment
    )
