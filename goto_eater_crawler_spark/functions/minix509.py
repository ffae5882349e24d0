"""Pure-python ASN.1 DER walk + minimal X.509 certificate parse —
the TLS-metadata pass of an https crawl (issuer/subject identity,
validity window, CA flag feeding per-host trust and recrawl
scheduling), structure only, no cryptographic verification.

Implements the public specs ITU-T X.690 (DER encoding rules) and
RFC 5280 (X.509 v3 profile):

* DER TLV: 1-byte tag; SHORT length < 0x80, LONG form ``0x80|n``
  followed by n big-endian length bytes (the writer emits long form
  for any length > 127 — load-bearing: the fake SPKI bit string is
  always > 127 bytes);
* INTEGER: two's complement, minimal, a leading 0x00 pad REQUIRED
  when the top bit of the magnitude is set (serials are chosen so
  both padded and unpadded encodings occur);
* Name: SEQUENCE OF RDN (SET OF AttributeTypeAndValue), CN matched
  by OID 2.5.4.3; Validity: two UTCTimes; basicConstraints
  extension (OID 2.5.29.19) carries the CA BOOLEAN inside a nested
  OCTET STRING — two levels of re-parse, as in real certs.

No crypto/asn1 library exists in this sandbox; encoder = gate/test
producer, decoder = engine path, both pinned to the published specs
and hostile structural tests.
"""

from __future__ import annotations

OID_CN = bytes([0x55, 0x04, 0x03])  # 2.5.4.3
OID_BASIC_CONSTRAINTS = bytes([0x55, 0x1D, 0x13])  # 2.5.29.19


class DerError(ValueError):
    pass


# ---------------------------------------------------------------------------
# DER primitives
# ---------------------------------------------------------------------------


def der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    while n:
        out.append(n & 0xFF)
        n >>= 8
    return bytes([0x80 | len(out)]) + bytes(reversed(out))


def tlv(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + der_len(len(payload)) + payload


def der_int(v: int) -> bytes:
    if v < 0:
        raise DerError("negative serials out of scope")
    out = []
    while True:
        out.append(v & 0xFF)
        v >>= 8
        if v == 0:
            break
    raw = bytes(reversed(out))
    if raw[0] & 0x80:
        raw = b"\x00" + raw  # X.690 §8.3.2 sign pad
    return tlv(0x02, raw)


def read_tlv(b: bytes, off: int) -> tuple[int, int, int]:
    """-> (tag, value_start, value_end); validates lengths."""
    if off + 2 > len(b):
        raise DerError("truncated TLV header")
    tag = b[off]
    l0 = b[off + 1]
    if l0 < 0x80:
        start = off + 2
        length = l0
    else:
        n = l0 & 0x7F
        if n == 0 or off + 2 + n > len(b):
            raise DerError("bad long-form length")
        length = int.from_bytes(b[off + 2 : off + 2 + n], "big")
        if length < 0x80:
            raise DerError("non-minimal long-form length")
        start = off + 2 + n
    if start + length > len(b):
        raise DerError("TLV overruns buffer")
    return tag, start, start + length


def read_int(b: bytes, off: int) -> tuple[int, int]:
    tag, s, e = read_tlv(b, off)
    if tag != 0x02:
        raise DerError(f"expected INTEGER, got tag {tag:#x}")
    raw = b[s:e]
    if len(raw) > 1 and raw[0] == 0 and not raw[1] & 0x80:
        raise DerError("non-minimal INTEGER")
    return int.from_bytes(raw, "big"), e


def _children(b: bytes, start: int, end: int):
    off = start
    while off < end:
        tag, s, e = read_tlv(b, off)
        yield tag, s, e
        off = e


# ---------------------------------------------------------------------------
# X.509 writer
# ---------------------------------------------------------------------------


def _name(cn: str) -> bytes:
    atv = tlv(0x30, tlv(0x06, OID_CN) + tlv(0x0C, cn.encode("utf-8")))
    return tlv(0x30, tlv(0x31, atv))


def _utctime(s: str) -> bytes:
    return tlv(0x17, s.encode("ascii"))


def write_cert(
    serial: int,
    issuer_cn: str,
    subject_cn: str,
    not_before: str,
    not_after: str,
    is_ca: bool,
    key_fill: int = 0,
) -> bytes:
    """Minimal RFC 5280 v3 certificate (structure-valid, fake
    signature bytes). ``key_fill`` varies the SPKI length so
    long-form lengths appear at several sizes."""
    version = tlv(0xA0, der_int(2))
    sig_alg = tlv(0x30, tlv(0x06, bytes([0x2A, 0x86, 0x48, 0x86, 0xF7,
                                         0x0D, 0x01, 0x01, 0x0B])))
    validity = tlv(0x30, _utctime(not_before) + _utctime(not_after))
    fake_key = bytes((i * 7 + 3) % 251 for i in range(140 + key_fill))
    spki = tlv(0x30, sig_alg + tlv(0x03, b"\x00" + fake_key))
    bc_inner = tlv(0x30, tlv(0x01, b"\xff" if is_ca else b"\x00"))
    ext = tlv(
        0x30,
        tlv(0x06, OID_BASIC_CONSTRAINTS) + tlv(0x04, bc_inner),
    )
    exts = tlv(0xA3, tlv(0x30, ext))
    tbs = tlv(
        0x30,
        version + der_int(serial) + sig_alg + _name(issuer_cn)
        + validity + _name(subject_cn) + spki + exts,
    )
    sig_val = tlv(0x03, b"\x00" + bytes(64))
    return tlv(0x30, tbs + sig_alg + sig_val)


# ---------------------------------------------------------------------------
# X.509 reader
# ---------------------------------------------------------------------------


def _read_cn(b: bytes, start: int, end: int) -> str:
    for _, rs, re_ in _children(b, start, end):  # RDNs (SET)
        for _, as_, ae in _children(b, rs, re_):  # ATVs (SEQUENCE)
            kids = list(_children(b, as_, ae))
            if len(kids) != 2 or kids[0][0] != 0x06:
                raise DerError("malformed ATV")
            oid = b[kids[0][1] : kids[0][2]]
            if oid == OID_CN:
                return b[kids[1][1] : kids[1][2]].decode("utf-8")
    raise DerError("no CN in Name")


def parse_cert(blob: bytes) -> dict:
    tag, s, e = read_tlv(blob, 0)
    if tag != 0x30:
        raise DerError("certificate is not a SEQUENCE")
    kids = list(_children(blob, s, e))
    if len(kids) != 3:
        raise DerError("certificate needs tbs/alg/sig")
    tbs_tag, ts, te = kids[0]
    if tbs_tag != 0x30:
        raise DerError("tbsCertificate is not a SEQUENCE")
    fields = list(_children(blob, ts, te))
    i = 0
    version = 1
    if fields[i][0] == 0xA0:
        v, _ = read_int(blob, fields[i][1])
        version = v + 1
        i += 1
    if fields[i][0] != 0x02:
        raise DerError("serial must be INTEGER")
    serial, _ = read_int(blob, _tlv_off(blob, fields[i]))
    i += 1
    i += 1  # signature algorithm
    issuer_cn = _read_cn(blob, fields[i][1], fields[i][2]); i += 1
    val_kids = list(_children(blob, fields[i][1], fields[i][2])); i += 1
    if len(val_kids) != 2 or any(k[0] != 0x17 for k in val_kids):
        raise DerError("validity needs two UTCTimes")
    not_before = blob[val_kids[0][1] : val_kids[0][2]].decode("ascii")
    not_after = blob[val_kids[1][1] : val_kids[1][2]].decode("ascii")
    subject_cn = _read_cn(blob, fields[i][1], fields[i][2]); i += 1
    i += 1  # spki
    is_ca = False
    if i < len(fields) and fields[i][0] == 0xA3:
        ex_seq = list(_children(blob, fields[i][1], fields[i][2]))[0]
        for _, xs, xe in _children(blob, ex_seq[1], ex_seq[2]):
            ek = list(_children(blob, xs, xe))
            oid = blob[ek[0][1] : ek[0][2]]
            if oid == OID_BASIC_CONSTRAINTS:
                inner = list(_children(blob, ek[-1][1], ek[-1][2]))[0]
                bools = list(_children(blob, inner[1], inner[2]))
                if bools and bools[0][0] == 0x01:
                    is_ca = blob[bools[0][1]] != 0
    return {
        "version": version,
        "serial": serial,
        "issuer_cn": issuer_cn,
        "subject_cn": subject_cn,
        "not_before": not_before,
        "not_after": not_after,
        "is_ca": is_ca,
    }


def _tlv_off(blob: bytes, kid: tuple[int, int, int]) -> int:
    """Recover the TLV start offset from a (tag, vstart, vend) kid —
    lengths re-derive the header size."""
    tag, s, e = kid
    length = e - s
    if length < 0x80:
        return s - 2
    n = (length.bit_length() + 7) // 8
    return s - 2 - n
