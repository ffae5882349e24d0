"""Source-map base64-VLQ walk (the Source Map v3 format,
sourcemaps.info spec; now ECMA-426) — own encoder/decoder.

Crawl relevance: .map files ride alongside a large share of shipped
JavaScript; a corpus op that decodes the `mappings` field recovers
the generated->original position graph (minified-code provenance,
third-party-script attribution) without executing anything.

Format rules carried (all load-bearing):
* base64 alphabet digits, 5 payload bits per digit, bit 0x20 is the
  CONTINUATION flag (little-endian groups — the opposite of SQLite's
  big-endian varints two modules over);
* the SIGN lives in the LSB of the *decoded* value (not two's
  complement);
* segments are ','-separated inside a generated line, ';' advances
  the generated line; all fields are DELTAS against the previous
  segment — generated-column resets at every ';', the source
  line/column/index accumulators do NOT.
"""

from __future__ import annotations

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_INV = {c: i for i, c in enumerate(_B64)}


def vlq_encode(value: int) -> str:
    v = (abs(value) << 1) | (1 if value < 0 else 0)
    out = []
    while True:
        digit = v & 0x1F
        v >>= 5
        if v:
            digit |= 0x20
        out.append(_B64[digit])
        if not v:
            return "".join(out)


def vlq_decode(s: str, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(s):
            raise ValueError("truncated VLQ")
        digit = _B64_INV.get(s[pos])
        if digit is None:
            raise ValueError(f"invalid VLQ digit {s[pos]!r}")
        pos += 1
        v |= (digit & 0x1F) << shift
        shift += 5
        if not digit & 0x20:
            break
    sign = v & 1
    v >>= 1
    return (-v if sign else v), pos


def encode_mappings(lines: list[list[list[int]]]) -> str:
    """lines: per generated line, a list of segments, each a list of
    DELTA fields (1, 4, or 5 ints)."""
    return ";".join(
        ",".join("".join(vlq_encode(f) for f in seg) for seg in segs)
        for segs in lines
    )


def decode_mappings(s: str) -> dict:
    """Walk a mappings string, resolving deltas to ABSOLUTE
    positions.  Returns {n_lines, n_segments, segments: [(gen_line,
    gen_col, src_idx, src_line, src_col), ...]} (4-field form; the
    optional 5th name index is accepted and dropped)."""
    segments = []
    src_idx = src_line = src_col = 0
    n_lines = 0
    for gen_line, line in enumerate(s.split(";")):
        n_lines += 1
        gen_col = 0  # resets every generated line
        if not line:
            continue
        for seg in line.split(","):
            fields = []
            pos = 0
            while pos < len(seg):
                v, pos = vlq_decode(seg, pos)
                fields.append(v)
            if len(fields) not in (1, 4, 5):
                raise ValueError(
                    f"segment has {len(fields)} fields"
                )
            gen_col += fields[0]
            if len(fields) >= 4:
                src_idx += fields[1]
                src_line += fields[2]
                src_col += fields[3]
                segments.append(
                    (gen_line, gen_col, src_idx, src_line, src_col)
                )
            else:
                segments.append((gen_line, gen_col, None, None, None))
    return {
        "n_lines": n_lines,
        "n_segments": len(segments),
        "segments": segments,
    }
