"""Punycode (RFC 3492) — own encoder/decoder.

The IDN gate (operators/charset.py) folds unicode hosts through the
stdlib codec; this module carries the algorithm itself so the engine
owns the walk: the bootstring parameters, the ADAPTIVE BIAS function
(§6.1) and the generalized-variable-length integers whose digit
thresholds depend on that bias — the part a naive base-36 reader
gets wrong immediately.

All constants are the RFC's published bootstring parameters for
Punycode; test vectors are RFC 3492 §7.1 (public).
"""

from __future__ import annotations

BASE = 36
TMIN = 1
TMAX = 26
SKEW = 38
DAMP = 700
INITIAL_BIAS = 72
INITIAL_N = 128
DELIMITER = "-"


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_to_char(d: int) -> str:
    if d < 26:
        return chr(ord("a") + d)
    if d < 36:
        return chr(ord("0") + d - 26)
    raise ValueError("digit out of range")


def _char_to_digit(c: str) -> int:
    if "a" <= c <= "z":
        return ord(c) - ord("a")
    if "A" <= c <= "Z":
        return ord(c) - ord("A")
    if "0" <= c <= "9":
        return ord(c) - ord("0") + 26
    raise ValueError(f"invalid punycode digit {c!r}")


def encode(s: str) -> str:
    basic = [c for c in s if ord(c) < 128]
    out = list(basic)
    if basic:
        out.append(DELIMITER)
    n = INITIAL_N
    delta = 0
    bias = INITIAL_BIAS
    h = b = len(basic)
    total = len(s)
    while h < total:
        m = min(ord(c) for c in s if ord(c) >= n)
        delta += (m - n) * (h + 1)
        if delta > 2**31 - 1:
            raise OverflowError("punycode delta overflow")
        n = m
        for c in s:
            cp = ord(c)
            if cp < n:
                delta += 1
                if delta > 2**31 - 1:
                    raise OverflowError("punycode delta overflow")
            elif cp == n:
                q = delta
                k = BASE
                while True:
                    t = (
                        TMIN
                        if k <= bias + TMIN
                        else (TMAX if k >= bias + TMAX else k - bias)
                    )
                    if q < t:
                        break
                    out.append(_digit_to_char(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append(_digit_to_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def decode(s: str) -> str:
    pos = s.rfind(DELIMITER)
    if pos > 0:
        output = list(s[:pos])
        if any(ord(c) >= 128 for c in output):
            raise ValueError("non-basic code point in basic section")
        rest = s[pos + 1 :]
    else:
        output = []
        rest = s[1:] if pos == 0 else s
    n = INITIAL_N
    i = 0
    bias = INITIAL_BIAS
    p = 0
    while p < len(rest):
        oldi = i
        w = 1
        k = BASE
        while True:
            if p >= len(rest):
                raise ValueError("truncated variable-length integer")
            digit = _char_to_digit(rest[p])
            p += 1
            i += digit * w
            if i > 2**31 - 1:
                raise ValueError("punycode overflow")
            t = (
                TMIN
                if k <= bias + TMIN
                else (TMAX if k >= bias + TMAX else k - bias)
            )
            if digit < t:
                break
            w *= BASE - t
            if w > 2**31 - 1:
                raise ValueError("punycode overflow")
            k += BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise ValueError("code point out of unicode range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)
