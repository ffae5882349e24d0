"""rsync block-delta walk (Tridgell & Mackerras, "The rsync
algorithm", ANU TR-CS-96-05) — own signature/delta/apply.

The recrawl bandwidth saver: when a page is refetched, ship only the
delta against the archived copy. Fixed-size blocks of the OLD
version are signed with a two-level check — a WEAK rolling checksum
(the Adler-style (a, b) pair, both mod 2^16, O(1) to slide one
byte) that the NEW version's scan consults at every offset, and a
STRONG md5 confirm so weak collisions cannot corrupt — then the new
version becomes COPY(block)/LITERAL ops. The rolling property is
the whole algorithm: a scan that recomputes the window sum from
scratch is O(n*B) and a scan that trusts the weak sum alone is
wrong; tests pin both.

Complements the content-defined-chunking arm (cdchunk): CDC
resynchronizes by CONTENT boundaries across inserts, rsync by
scanning every offset against fixed OLD-side boundaries.
"""

from __future__ import annotations

import hashlib

M16 = 1 << 16


def weak_checksum(data: bytes) -> tuple[int, int]:
    """(a, b): a = sum of bytes, b = position-weighted sum, both
    mod 2^16 (rsync's s(k,l) with the classic weighting)."""
    a = b = 0
    n = len(data)
    for i, x in enumerate(data):
        a = (a + x) % M16
        b = (b + (n - i) * x) % M16
    return a, b


def weak_roll(a: int, b: int, out: int, inc: int, blen: int) -> tuple[int, int]:
    """Slide the window one byte: drop ``out``, append ``inc``."""
    a2 = (a - out + inc) % M16
    b2 = (b - blen * out + a2) % M16
    return a2, b2


def signatures(old: bytes, block: int) -> dict:
    """{(a, b) -> [(block_idx, md5)]} over FULL aligned blocks only
    (the trailing partial block is not signed, as in rsync's
    generator)."""
    sigs: dict = {}
    for idx in range(len(old) // block):
        chunk = old[idx * block : (idx + 1) * block]
        w = weak_checksum(chunk)
        sigs.setdefault(w, []).append(
            (idx, hashlib.md5(chunk).digest())
        )
    return sigs


def delta(new: bytes, sigs: dict, block: int) -> list:
    """Greedy scan -> [('copy', block_idx) | ('lit', bytes)] with
    adjacent literals coalesced. The weak sum is maintained by
    ROLLING between consecutive offsets."""
    ops: list = []
    lit = bytearray()
    pos = 0
    a = b = None
    while pos + block <= len(new):
        if a is None:
            a, b = weak_checksum(new[pos : pos + block])
        hit = None
        for idx, strong in sigs.get((a, b), ()):
            if hashlib.md5(new[pos : pos + block]).digest() == strong:
                hit = idx
                break
        if hit is not None:
            if lit:
                ops.append(("lit", bytes(lit)))
                lit = bytearray()
            ops.append(("copy", hit))
            pos += block
            a = None  # window no longer contiguous: recompute
        else:
            lit.append(new[pos])
            if pos + block < len(new):
                a, b = weak_roll(
                    a, b, new[pos], new[pos + block], block
                )
            pos += 1
    lit += new[pos:]
    if lit:
        ops.append(("lit", bytes(lit)))
    return ops


def apply_delta(old: bytes, ops: list, block: int) -> bytes:
    out = bytearray()
    for kind, v in ops:
        if kind == "copy":
            out += old[v * block : (v + 1) * block]
        else:
            out += v
    return bytes(out)
