"""DNS wire-format walk (RFC 1035 §4) — own encoder/decoder.

Every crawl fetch begins with a resolver lookup; a distributed
crawler caches answers per host (the reference's scrapy stack
delegates to twisted's resolver — settings.py's DNS timeout knobs).
This module gives the engine the wire walk itself so cached resolver
responses can be decoded corpus-side as binary columns.

Spec surface deliberately carried (each is load-bearing — get it
wrong and the walk desyncs or the tests reject):

* header: ID / flags (QR, OPCODE, AA, TC, RD, RA, RCODE) /
  QD/AN/NS/AR counts, all big-endian (§4.1.1);
* names as label sequences (len<=63, total<=255) terminated by the
  zero octet (§3.1);
* **message compression** (§4.1.4): the two high bits 0b11 mark a
  14-bit POINTER to a prior occurrence — including a pointer into
  the MIDDLE of a previously-written name (suffix sharing), which
  the encoder emits for every repeated suffix and the decoder must
  chase.  Pointers must target a strictly EARLIER offset (forward
  pointers and loops are rejected);
* RR wire layout NAME/TYPE/CLASS/TTL/RDLENGTH/RDATA (§4.1.3) with
  typed RDATA walks: A (4 bytes), AAAA (16), CNAME/NS (compressed
  name), SOA (two compressed names + five uint32s), TXT
  (character-strings), MX (uint16 + compressed name).

No external DNS library exists in this sandbox; everything below is
from the public RFC.  Reference parity: the reference crawler never
parses DNS itself (twisted does) — this is build-spec surface for
the 10^10-URL frontier, where resolver-cache decode is a corpus op.
"""

from __future__ import annotations

import struct

TYPE_A = 1
TYPE_NS = 2
TYPE_CNAME = 5
TYPE_SOA = 6
TYPE_TXT = 16
TYPE_AAAA = 28
TYPE_MX = 15
CLASS_IN = 1

_TYPE_NAMES = {
    TYPE_A: "A",
    TYPE_NS: "NS",
    TYPE_CNAME: "CNAME",
    TYPE_SOA: "SOA",
    TYPE_TXT: "TXT",
    TYPE_AAAA: "AAAA",
    TYPE_MX: "MX",
}


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _Writer:
    """Message writer with §4.1.4 suffix compression: a dict of
    (label, label, ...) suffix tuples -> the offset where that suffix
    was first written.  Offsets beyond 0x3FFF are not registered
    (pointers are 14-bit)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._suffixes: dict[tuple[str, ...], int] = {}

    def u16(self, v: int) -> None:
        self.buf += struct.pack(">H", v)

    def u32(self, v: int) -> None:
        self.buf += struct.pack(">I", v)

    def name(self, dotted: str) -> None:
        labels = [lb for lb in dotted.rstrip(".").split(".") if lb]
        if sum(len(lb) + 1 for lb in labels) + 1 > 255:
            raise ValueError("name too long")
        i = 0
        while i < len(labels):
            suffix = tuple(labels[i:])
            at = self._suffixes.get(suffix)
            if at is not None:
                self.u16(0xC000 | at)
                return
            if len(self.buf) <= 0x3FFF:
                self._suffixes[suffix] = len(self.buf)
            raw = labels[i].encode("ascii")
            if len(raw) > 63:
                raise ValueError(f"label too long: {labels[i]!r}")
            self.buf.append(len(raw))
            self.buf += raw
            i += 1
        self.buf.append(0)


def encode_response(
    *,
    txn_id: int,
    qname: str,
    qtype: int = TYPE_A,
    rcode: int = 0,
    answers: list[tuple[str, int, int, object]] | None = None,
    authority: list[tuple[str, int, int, object]] | None = None,
    aa: bool = True,
) -> bytes:
    """Build a QR=1 response.  Each RR is (name, type, ttl, rdata)
    where rdata is: A -> dotted quad str; AAAA -> 16-byte bytes;
    CNAME/NS -> dotted name str (compressed); MX -> (pref, name);
    SOA -> (mname, rname, serial, refresh, retry, expire, minimum);
    TXT -> list[str]."""
    answers = answers or []
    authority = authority or []
    w = _Writer()
    flags = 0x8000 | (0x0400 if aa else 0) | 0x0100 | 0x0080 | (rcode & 0xF)
    w.u16(txn_id)
    w.u16(flags)
    w.u16(1)
    w.u16(len(answers))
    w.u16(len(authority))
    w.u16(0)
    w.name(qname)
    w.u16(qtype)
    w.u16(CLASS_IN)
    for name, rtype, ttl, rdata in answers + authority:
        w.name(name)
        w.u16(rtype)
        w.u16(CLASS_IN)
        w.u32(ttl)
        at = len(w.buf)
        w.u16(0)  # RDLENGTH backpatched
        if rtype == TYPE_A:
            parts = [int(p) for p in str(rdata).split(".")]
            if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
                raise ValueError(f"bad A rdata {rdata!r}")
            w.buf += bytes(parts)
        elif rtype == TYPE_AAAA:
            if len(rdata) != 16:
                raise ValueError("AAAA rdata must be 16 bytes")
            w.buf += bytes(rdata)
        elif rtype in (TYPE_CNAME, TYPE_NS):
            w.name(str(rdata))
        elif rtype == TYPE_MX:
            pref, mxname = rdata
            w.u16(int(pref))
            w.name(str(mxname))
        elif rtype == TYPE_SOA:
            mname, rname, serial, refresh, retry, expire, minimum = rdata
            w.name(str(mname))
            w.name(str(rname))
            for v in (serial, refresh, retry, expire, minimum):
                w.u32(int(v))
        elif rtype == TYPE_TXT:
            for s in rdata:
                raw = s.encode("utf-8")
                if len(raw) > 255:
                    raise ValueError("TXT string too long")
                w.buf.append(len(raw))
                w.buf += raw
        else:
            raise ValueError(f"unsupported rtype {rtype}")
        struct.pack_into(">H", w.buf, at, len(w.buf) - at - 2)
    return bytes(w.buf)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_name(buf: bytes, pos: int) -> tuple[str, int]:
    """Walk a (possibly compressed) name starting at pos.  Returns
    (dotted, position after the name in the ORIGINAL stream).
    Rejects forward pointers, pointer loops, and truncation."""
    labels: list[str] = []
    end: int | None = None
    seen: set[int] = set()
    total = 0
    while True:
        if pos in seen:
            raise ValueError("compression pointer loop")
        seen.add(pos)
        if pos >= len(buf):
            raise ValueError("truncated name")
        b = buf[pos]
        if b & 0xC0 == 0xC0:
            if pos + 2 > len(buf):
                raise ValueError("truncated pointer")
            target = ((b & 0x3F) << 8) | buf[pos + 1]
            if end is None:
                end = pos + 2
            if target >= pos:
                raise ValueError("forward compression pointer")
            pos = target
        elif b & 0xC0:
            raise ValueError(f"reserved label flag bits at {pos}")
        elif b == 0:
            if end is None:
                end = pos + 1
            return ".".join(labels), end
        else:
            if pos + 1 + b > len(buf):
                raise ValueError("truncated label")
            total += b + 1
            if total > 255:
                raise ValueError("name exceeds 255 octets")
            labels.append(buf[pos + 1 : pos + 1 + b].decode("ascii"))
            pos += 1 + b


def decode_message(buf: bytes) -> dict:
    """Full message walk.  Returns {id, flags:{...}, rcode,
    question:{qname,qtype}, answers:[...], authority:[...]} with
    each RR as {name, type, ttl, rdata} (rdata decoded per type)."""
    if len(buf) < 12:
        raise ValueError("truncated header")
    txn_id, flags, qd, an, ns, ar = struct.unpack(">6H", buf[:12])
    out = {
        "id": txn_id,
        "qr": bool(flags & 0x8000),
        "aa": bool(flags & 0x0400),
        "tc": bool(flags & 0x0200),
        "rcode": flags & 0xF,
        "answers": [],
        "authority": [],
    }
    pos = 12
    if qd != 1:
        raise ValueError(f"unsupported qdcount {qd}")
    qname, pos = _read_name(buf, pos)
    if pos + 4 > len(buf):
        raise ValueError("truncated question")
    qtype, qclass = struct.unpack(">2H", buf[pos : pos + 4])
    pos += 4
    out["qname"] = qname
    out["qtype"] = _TYPE_NAMES.get(qtype, str(qtype))
    for section, count in (("answers", an), ("authority", ns + ar)):
        for _ in range(count):
            name, pos = _read_name(buf, pos)
            if pos + 10 > len(buf):
                raise ValueError("truncated RR header")
            rtype, rclass, ttl, rdlen = struct.unpack(
                ">2HIH", buf[pos : pos + 10]
            )
            pos += 10
            if pos + rdlen > len(buf):
                raise ValueError("truncated RDATA")
            rend = pos + rdlen
            if rtype == TYPE_A:
                if rdlen != 4:
                    raise ValueError("bad A rdlength")
                rdata = ".".join(str(b) for b in buf[pos:rend])
            elif rtype == TYPE_AAAA:
                if rdlen != 16:
                    raise ValueError("bad AAAA rdlength")
                rdata = buf[pos:rend].hex()
            elif rtype in (TYPE_CNAME, TYPE_NS):
                rdata, after = _read_name(buf, pos)
                if after != rend:
                    raise ValueError("RDATA length mismatch")
            elif rtype == TYPE_MX:
                pref = struct.unpack(">H", buf[pos : pos + 2])[0]
                mxname, after = _read_name(buf, pos + 2)
                if after != rend:
                    raise ValueError("RDATA length mismatch")
                rdata = (pref, mxname)
            elif rtype == TYPE_SOA:
                mname, p2 = _read_name(buf, pos)
                rname, p2 = _read_name(buf, p2)
                if p2 + 20 != rend:
                    raise ValueError("RDATA length mismatch")
                nums = struct.unpack(">5I", buf[p2 : p2 + 20])
                rdata = (mname, rname) + nums
            elif rtype == TYPE_TXT:
                strs, p2 = [], pos
                while p2 < rend:
                    ln = buf[p2]
                    if p2 + 1 + ln > rend:
                        raise ValueError("truncated TXT string")
                    strs.append(buf[p2 + 1 : p2 + 1 + ln].decode("utf-8"))
                    p2 += 1 + ln
                rdata = strs
            else:
                rdata = buf[pos:rend].hex()
            pos = rend
            out[section].append(
                {
                    "name": name,
                    "type": _TYPE_NAMES.get(rtype, str(rtype)),
                    "ttl": ttl,
                    "rdata": rdata,
                }
            )
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes")
    return out
