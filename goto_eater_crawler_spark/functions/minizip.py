"""minizip — the engine's OWN ZIP container walk (APPNOTE.TXT, the
PKWARE .ZIP File Format Specification; ISO/IEC 21320-1 profile).

Web archives and dataset drops ship as ZIP constantly (Common Crawl
index shards, Kaggle-style corpus dumps, the reference's own XLSX
sources are ZIP containers — `sources/families/xlsx_body.py` already
walks one implicitly via ``zipfile``). This module removes that last
stdlib dependency from the container layer: the reader below is the
engine's own end-of-central-directory scan + central-directory walk +
local-header seek, with DEFLATE payloads inflated by the engine's own
RFC 1951 decoder (``minideflate.inflate``) and integrity pinned by
the engine's own CRC-32 (``minideflate.crc32``).

Like every mini* codec here, bytes are PRODUCED by a real
implementation (stdlib ``zipfile`` writes the test/gate archives) and
DECODED by this walk — drift in either direction fails the oracle
hash.

Format facts the walk relies on (all public APPNOTE sections):
- EOCD record (PK\\x05\\x06) sits in the last 22..22+65535 bytes
  (trailing comment); scanned backward, §4.3.16.
- The CENTRAL DIRECTORY is authoritative for sizes/CRC — local
  headers may defer them to a data descriptor when general-purpose
  flag bit 3 is set (§4.4.4), so the reader takes csize/usize/crc
  from the CD entry and uses the local header only to locate the
  payload (§4.3.7-4.3.12).
- DOS timestamp packing per §4.4.6.
- Methods supported: 0 (stored) and 8 (deflate) — the ISO 21320-1
  interchange profile. ZIP64 (§4.5.3) is out of scope at gate scale
  and raises, never mis-parses: sentinel 0xFFFFFFFF values raise.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .minideflate import crc32, inflate

_EOCD_SIG = 0x06054B50
_CD_SIG = 0x02014B50
_LOCAL_SIG = 0x04034B50


class ZipError(ValueError):
    """Malformed or unsupported ZIP container."""


@dataclass
class ZipEntry:
    name: str
    method: int  # 0 stored, 8 deflate
    crc32: int  # from the central directory
    comp_size: int
    uncomp_size: int
    mtime: tuple[int, int, int, int, int, int]  # y m d H M S (DOS 2s)
    data: bytes  # decompressed, CRC-verified payload


def _dos_datetime(dtime: int, ddate: int) -> tuple[int, int, int, int, int, int]:
    """APPNOTE §4.4.6 MS-DOS packing: date bits 15-9 year-1980,
    8-5 month, 4-0 day; time bits 15-11 hour, 10-5 minute,
    4-0 seconds/2."""
    return (
        ((ddate >> 9) & 0x7F) + 1980,
        (ddate >> 5) & 0x0F,
        ddate & 0x1F,
        (dtime >> 11) & 0x1F,
        (dtime >> 5) & 0x3F,
        (dtime & 0x1F) * 2,
    )


def _find_eocd(data: bytes) -> tuple[int, int, int]:
    """Backward scan for the EOCD signature through the maximum
    65535-byte trailing comment; returns (n_entries, cd_size,
    cd_offset)."""
    if len(data) < 22:
        raise ZipError("too short for an EOCD record")
    lo = max(0, len(data) - 22 - 0xFFFF)
    pos = len(data) - 22
    while pos >= lo:
        if struct.unpack_from("<I", data, pos)[0] == _EOCD_SIG:
            (
                _sig, disk_no, cd_disk, n_disk, n_total, cd_size, cd_off,
                comment_len,
            ) = struct.unpack_from("<IHHHHIIH", data, pos)
            if pos + 22 + comment_len != len(data):
                # signature byte inside the comment — keep scanning
                pos -= 1
                continue
            if disk_no != 0 or cd_disk != 0 or n_disk != n_total:
                raise ZipError("multi-disk archives unsupported")
            if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
                raise ZipError("ZIP64 unsupported")
            return n_total, cd_size, cd_off
        pos -= 1
    raise ZipError("EOCD record not found")


def parse_zip(data: bytes) -> list[ZipEntry]:
    """Walk the central directory and return every file entry with
    its decompressed, CRC-verified payload, in CD order (the order
    the writer appended)."""
    n_total, cd_size, cd_off = _find_eocd(data)
    entries: list[ZipEntry] = []
    pos = cd_off
    for _ in range(n_total):
        if struct.unpack_from("<I", data, pos)[0] != _CD_SIG:
            raise ZipError(f"bad central-directory signature at {pos}")
        (
            _sig, _ver_made, _ver_need, flags, method, dtime, ddate,
            crc, csize, usize, name_len, extra_len, comment_len,
            _disk, _iattr, _eattr, local_off,
        ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", data, pos)
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            raise ZipError("ZIP64 unsupported")
        if flags & 0x0001:
            raise ZipError("encrypted entries unsupported")
        name = data[pos + 46 : pos + 46 + name_len].decode(
            "utf-8" if flags & 0x0800 else "cp437"
        )
        pos += 46 + name_len + extra_len + comment_len

        # local header locates the payload; CD sizes are authoritative
        # (flag bit 3 writers leave local csize/usize zero, §4.4.4)
        if struct.unpack_from("<I", data, local_off)[0] != _LOCAL_SIG:
            raise ZipError(f"bad local-header signature at {local_off}")
        l_name_len, l_extra_len = struct.unpack_from(
            "<HH", data, local_off + 26
        )
        payload_off = local_off + 30 + l_name_len + l_extra_len
        raw = data[payload_off : payload_off + csize]
        if len(raw) != csize:
            raise ZipError(f"truncated payload for {name!r}")

        if method == 0:
            if csize != usize:
                raise ZipError(f"stored entry {name!r} size mismatch")
            body = raw
        elif method == 8:
            body, _end = inflate(raw)
        else:
            raise ZipError(f"unsupported method {method} for {name!r}")
        if len(body) != usize:
            raise ZipError(
                f"{name!r}: inflated {len(body)} != declared {usize}"
            )
        if crc32(body) != crc:
            raise ZipError(f"{name!r}: CRC-32 mismatch")
        entries.append(
            ZipEntry(
                name=name,
                method=method,
                crc32=crc,
                comp_size=csize,
                uncomp_size=usize,
                mtime=_dos_datetime(dtime, ddate),
                data=body,
            )
        )
    return entries
