"""minitar — the engine's OWN tar archive walk (POSIX.1-1988 ustar +
POSIX.1-2001 pax extensions, the `tar(5)` format).

Corpus drops and web-archive sidecars ship as .tar / .tar.gz at least
as often as ZIP; this walk plus ``minideflate.gunzip`` gives the
engine a stdlib-free .tar.gz ingest path (bytes are still PRODUCED by
the real stdlib ``tarfile`` in tests/gates — own-decode, real-encode,
same contract as every mini* codec).

Format facts (all public):
- 512-byte header blocks: name[100] mode[8] uid[8] gid[8] size[12]
  mtime[12] chksum[8] typeflag[1] linkname[100] magic[6] version[2]
  uname[32] gname[32] devmajor[8] devminor[8] prefix[155].
- Numeric fields are NUL/space-terminated octal; GNU base-256
  (high bit of first byte set) handled for size/mtime.
- chksum = simple sum of the header bytes with the chksum field
  replaced by spaces — verified for every header.
- File data padded to 512; archive ends with two zero blocks.
- pax extended headers (typeflag 'x' per-file, 'g' global): payload
  is a sequence of "<len> <key>=<value>\\n" records (len counts the
  whole record) overriding path/size/mtime of the NEXT entry —
  stdlib tarfile writes PAX_FORMAT by default, so the walk must
  honor them. GNU longname ('L') / longlink ('K') also handled.
"""

from __future__ import annotations

from dataclasses import dataclass


class TarError(ValueError):
    """Malformed tar archive."""


@dataclass
class TarEntry:
    name: str
    size: int
    mtime: int
    typeflag: str  # '0' regular file, '5' directory, ...
    data: bytes


def _num(field: bytes) -> int:
    """NUL/space-terminated octal, or GNU base-256 when the first
    byte has the high bit set."""
    if field and field[0] & 0x80:
        n = field[0] & 0x7F
        for b in field[1:]:
            n = (n << 8) | b
        return n
    s = field.rstrip(b"\x00 ").lstrip(b" ")
    return int(s, 8) if s else 0


def _str(field: bytes) -> str:
    return field.split(b"\x00", 1)[0].decode("utf-8", errors="surrogateescape")


def _checksum_ok(block: bytes) -> bool:
    stored = _num(block[148:156])
    calc = sum(block[:148]) + 8 * 0x20 + sum(block[156:512])
    return calc == stored


def _parse_pax(payload: bytes) -> dict[str, str]:
    """pax(1) extended-header records: '<len> <key>=<value>\\n',
    len in decimal counting the entire record including itself."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(payload):
        sp = payload.index(b" ", pos)
        rec_len = int(payload[pos:sp])
        rec = payload[sp + 1 : pos + rec_len]
        if not rec.endswith(b"\n"):
            raise TarError("pax record missing trailing newline")
        key, _, val = rec[:-1].partition(b"=")
        out[key.decode("utf-8")] = val.decode("utf-8")
        pos += rec_len
    return out


def parse_tar(data: bytes) -> list[TarEntry]:
    """Walk header blocks and return regular-file entries in archive
    order, pax/GNU name+size overrides applied, checksums verified."""
    entries: list[TarEntry] = []
    pos = 0
    pax_global: dict[str, str] = {}
    pax_next: dict[str, str] = {}
    gnu_longname: str | None = None
    while pos + 512 <= len(data):
        block = data[pos : pos + 512]
        if block == b"\x00" * 512:
            break  # end-of-archive marker
        if not _checksum_ok(block):
            raise TarError(f"header checksum mismatch at offset {pos}")
        magic = block[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise TarError(f"unknown magic {magic!r} at offset {pos}")
        size = _num(block[124:136])
        typeflag = chr(block[156]) if block[156] else "0"
        padded = (size + 511) // 512 * 512
        payload = data[pos + 512 : pos + 512 + size]
        if len(payload) != size:
            raise TarError("truncated member payload")
        pos += 512 + padded

        if typeflag == "g":
            pax_global.update(_parse_pax(payload))
            continue
        if typeflag == "x":
            pax_next = _parse_pax(payload)
            continue
        if typeflag == "L":  # GNU longname: payload = next entry's name
            gnu_longname = payload.rstrip(b"\x00").decode(
                "utf-8", errors="surrogateescape"
            )
            continue
        if typeflag == "K":  # GNU longlink — irrelevant to ingest
            continue

        name = _str(block[:100])
        prefix = _str(block[345:500])
        if prefix:
            name = f"{prefix}/{name}"
        mtime = _num(block[136:148])
        overrides = {**pax_global, **pax_next}
        pax_next = {}
        if gnu_longname is not None:
            name = gnu_longname
            gnu_longname = None
        if "path" in overrides:
            name = overrides["path"]
        if "size" in overrides:
            size = int(overrides["size"])
            # size override implies the header octal was a stub; the
            # payload slice above already used the header value, which
            # tarfile keeps accurate for <8GiB members — reject drift
            if size != len(payload):
                raise TarError("pax size override disagrees with payload")
        if "mtime" in overrides:
            mtime = int(float(overrides["mtime"]))
        if typeflag in ("0", "7"):  # regular (7 = contiguous, treat same)
            entries.append(
                TarEntry(
                    name=name, size=size, mtime=mtime,
                    typeflag="0", data=payload,
                )
            )
        # directories / links / devices: skipped by the ingest walk
    else:
        raise TarError("archive ended without end-of-archive marker")
    return entries
