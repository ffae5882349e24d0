"""Pure-python MP3 metadata walk — ID3v2 tag parse + MPEG audio
frame-header scan, the pre-decode pass for the audio modality of a
web corpus (title/artist for provenance, bitrate/samplerate/duration
for sampling budgets), reading headers only, never entropy-decoding
audio.

Implements two public specs:

* **ID3v2.3** (id3.org, public): ``ID3`` + version(2) + flags(1) +
  SYNCHSAFE u28 size (7 data bits per byte — the high bit of every
  size byte is zero so the tag never contains a frame-sync pattern);
  then frames ``[id 4][size u32][flags u16][body]``, text frames
  carrying an encoding byte + text.
* **MPEG-1 Audio Layer III frame headers** (ISO/IEC 11172-3, public
  tables): 4-byte header — 11-bit sync, version, layer, bitrate
  index (table lookup), samplerate index, padding bit; Layer III
  frame length = 144 * bitrate / samplerate + padding, 1152 samples
  per frame.

No audio library exists in this sandbox; the encoder is the
producer for tests/gates, the decoder is the engine path — both
pinned by the published tables and hostile structural tests.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (ISO 11172-3)
BITRATES = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
# MPEG-1 samplerate table, Hz, index 0..2
SAMPLERATES = [44100, 48000, 32000]
SAMPLES_PER_FRAME = 1152


class Mp3Error(ValueError):
    pass


def synchsafe(n: int) -> bytes:
    """u28 -> 4 bytes of 7 data bits each (ID3v2 §3.1)."""
    if n >= 1 << 28:
        raise Mp3Error("synchsafe overflow")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def unsynchsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise Mp3Error("synchsafe byte with high bit set")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_frame(fid: bytes, text: str) -> bytes:
    body = b"\x00" + text.encode("latin-1")
    return fid + struct.pack(">IH", len(body), 0) + body


def write_id3v2(frames: dict[str, str], pad: int = 0) -> bytes:
    body = b"".join(
        _id3_frame(k.encode("ascii"), v) for k, v in sorted(frames.items())
    ) + b"\x00" * pad
    return b"ID3\x03\x00\x00" + synchsafe(len(body)) + body


def read_id3v2(blob: bytes) -> tuple[dict[str, str], int]:
    """-> ({frame_id: text}, offset past the tag). No tag -> ({}, 0)."""
    if blob[:3] != b"ID3":
        return {}, 0
    if len(blob) < 10:
        raise Mp3Error("truncated ID3 header")
    size = unsynchsafe(blob[6:10])
    end = 10 + size
    if end > len(blob):
        raise Mp3Error("ID3 size overruns file")
    out: dict[str, str] = {}
    off = 10
    while off + 10 <= end:
        fid = blob[off : off + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        fsize = struct.unpack_from(">I", blob, off + 4)[0]
        body = blob[off + 10 : off + 10 + fsize]
        if off + 10 + fsize > end:
            raise Mp3Error(f"frame {fid!r} overruns tag")
        if fid.startswith(b"T") and body[:1] == b"\x00":
            out[fid.decode("ascii")] = body[1:].decode("latin-1")
        off += 10 + fsize
    return out, end


def frame_header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """MPEG-1 Layer III, no CRC, stereo."""
    b0 = 0xFF
    b1 = 0b11111011  # sync(3) + version 11 (MPEG1) + layer 01 (III) + prot 1
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0x00  # stereo
    return bytes([b0, b1, b2, b3])


def frame_len(bitrate_idx: int, sr_idx: int, padding: int) -> int:
    return (
        144 * BITRATES[bitrate_idx] * 1000 // SAMPLERATES[sr_idx] + padding
    )


def write_mp3(
    frames: dict[str, str],
    bitrate_idx: int,
    sr_idx: int,
    n_frames: int,
    id3_pad: int = 0,
) -> bytes:
    """CBR stream: ID3v2 tag + n_frames Layer III frames, padding bit
    alternating per frame so the length rule is load-bearing."""
    out = [write_id3v2(frames, pad=id3_pad)]
    for i in range(n_frames):
        pad = i % 2
        length = frame_len(bitrate_idx, sr_idx, pad)
        hdr = frame_header(bitrate_idx, sr_idx, pad)
        out.append(hdr + bytes((i + j) % 251 for j in range(length - 4)))
    return b"".join(out)


def parse_mp3(blob: bytes) -> dict:
    """Scan the whole stream: ID3 text frames + CBR frame walk.
    Returns title/artist/bitrate_kbps/sample_rate/n_frames/
    duration_ms. Raises on broken sync or truncated final frame."""
    tags, off = read_id3v2(blob)
    n = 0
    bitrate = samplerate = None
    while off < len(blob):
        if off + 4 > len(blob):
            raise Mp3Error("truncated frame header")
        b0, b1, b2, _ = blob[off : off + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3Error(f"lost sync at {off}")
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            raise Mp3Error("not MPEG-1 Layer III")
        bidx = (b2 >> 4) & 0xF
        sidx = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if bidx in (0, 15) or sidx == 3:
            raise Mp3Error("reserved bitrate/samplerate index")
        if bitrate is None:
            bitrate, samplerate = BITRATES[bidx], SAMPLERATES[sidx]
        length = frame_len(bidx, sidx, pad)
        if off + length > len(blob):
            raise Mp3Error("truncated final frame")
        off += length
        n += 1
    if n == 0:
        raise Mp3Error("no audio frames")
    return {
        "title": tags.get("TIT2"),
        "artist": tags.get("TPE1"),
        "bitrate_kbps": bitrate,
        "sample_rate": samplerate,
        "n_frames": n,
        "duration_ms": n * SAMPLES_PER_FRAME * 1000 // samplerate,
    }
