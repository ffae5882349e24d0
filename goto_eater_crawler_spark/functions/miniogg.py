"""Pure-python Ogg container walk (RFC 3533, public) + Vorbis
identification-header parse (Xiph Vorbis I spec §4.2.2, public) —
the audio-modality container pass beside minimp3/miniwav: serial/
channels/rate/duration metadata from page headers and the first
packet only, never entropy-decoding audio.

Page structure: ``OggS`` capture + version + header-type flags
(0x02 BOS / 0x04 EOS / 0x01 packet continuation) + granule u64 LE +
serial u32 + page-seq u32 + CRC u32 + segment count + LACING table
(packet lengths as 255-run segments: a segment value of 255 means
"continues"; a packet whose length is a multiple of 255 ends with a
0 lacing value). The page CRC is the spec's reflected-free CRC-32
(poly 0x04c11db7, init 0, xorout 0) computed with the CRC field
zeroed — the reader VERIFIES it, so bit rot anywhere in a page is
detected (pinned by tests).

No ogg/vorbis library exists in this sandbox; encoder = gate/test
producer, decoder = engine path, both pinned to the published spec.
"""

from __future__ import annotations

import struct


class OggError(ValueError):
    pass


def _crc_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_TBL = _crc_table()


def ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _TBL[((r >> 24) & 0xFF) ^ b]
    return r


def _lacing(lengths: list[int]) -> bytes:
    out = bytearray()
    for n in lengths:
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
    return bytes(out)


def write_page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    bos: bool = False,
    eos: bool = False,
) -> bytes:
    """One page holding whole packets (no cross-page continuation in
    the writer; the reader handles the lacing rules generally)."""
    lace = _lacing([len(p) for p in packets])
    if len(lace) > 255:
        raise OggError("too many segments for one page")
    flags = (0x02 if bos else 0) | (0x04 if eos else 0)
    body = b"".join(packets)
    hdr = (
        b"OggS\x00"
        + bytes([flags])
        + struct.pack("<QIII", granule, serial, seq, 0)
        + bytes([len(lace)])
        + lace
    )
    crc = ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def vorbis_id_packet(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<IB", 0, channels)
        + struct.pack("<IiiiB", rate, 0, 0, 0, (8 << 4) | 8)
        + b"\x01"
    )


def write_ogg_vorbis(
    serial: int,
    channels: int,
    rate: int,
    data_packets: list[bytes],
    granule_per_page: int,
) -> bytes:
    """BOS page with the id header, then data packets two-per-first-
    page / one-per-page after (so one page carries a multi-packet
    lacing table), EOS on the last."""
    pages = [
        write_page(serial, 0, 0, [vorbis_id_packet(channels, rate)], bos=True)
    ]
    groups: list[list[bytes]] = []
    if len(data_packets) >= 2:
        groups.append(data_packets[:2])
        groups.extend([p] for p in data_packets[2:])
    else:
        groups.extend([p] for p in data_packets)
    for gi, group in enumerate(groups):
        pages.append(
            write_page(
                serial,
                gi + 1,
                (gi + 1) * granule_per_page,
                group,
                eos=gi == len(groups) - 1,
            )
        )
    return b"".join(pages)


def parse_ogg(blob: bytes) -> dict:
    """Walk all pages: verify every CRC, reassemble packet count via
    the lacing rules (255 = continues, including cross-page
    continuation flags), parse the Vorbis id header from the first
    packet. Returns serial/channels/rate/n_pages/n_packets/
    last_granule."""
    off = 0
    n_pages = 0
    n_packets = 0
    serial = None
    last_granule = 0
    mid_packet = False
    first_packet = b""
    first_done = False
    while off < len(blob):
        if blob[off : off + 4] != b"OggS":
            raise OggError(f"lost capture at {off}")
        if off + 27 > len(blob):
            raise OggError("truncated page header")
        flags = blob[off + 5]
        granule, ser, seq, crc = struct.unpack_from("<QIII", blob, off + 6)
        nseg = blob[off + 26]
        lace = blob[off + 27 : off + 27 + nseg]
        if len(lace) < nseg:
            raise OggError("truncated lacing table")
        body_len = sum(lace)
        body_start = off + 27 + nseg
        page = blob[off : body_start + body_len]
        if len(page) < 27 + nseg + body_len:
            raise OggError("truncated page body")
        if ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) != crc:
            raise OggError(f"CRC mismatch on page {seq}")
        if serial is None:
            serial = ser
        if (flags & 0x01) and not mid_packet:
            raise OggError("continuation flag without open packet")
        pos = body_start
        for v in lace:
            if not first_done:
                first_packet += blob[pos : pos + v]
            pos += v
            if v < 255:
                n_packets += 1
                if not first_done:
                    first_done = True
                mid_packet = False
            else:
                mid_packet = True
        n_pages += 1
        last_granule = granule
        off = body_start + body_len
    if serial is None:
        raise OggError("no pages")
    if first_packet[:7] != b"\x01vorbis":
        raise OggError("first packet is not a Vorbis id header")
    version, channels = struct.unpack_from("<IB", first_packet, 7)
    rate = struct.unpack_from("<I", first_packet, 12)[0]
    if version != 0:
        raise OggError("unsupported vorbis version")
    return {
        "serial": serial,
        "channels": channels,
        "rate": rate,
        "n_pages": n_pages,
        "n_packets": n_packets,
        "last_granule": last_granule,
    }
