"""Pure-python WebSocket frame walk (RFC 6455, public) — the
streaming-endpoint transport a crawler meets on live-data APIs
(ws:// feeds), decoded at rest from captured byte streams.

Framing (§5.2): FIN bit + opcode (0x0 continuation, 0x1 text, 0x2
binary, 0x8 close, 0x9 ping, 0xA pong), MASK bit, 7-bit payload
length with the two EXTENDED forms (126 -> 16-bit, 127 -> 64-bit
big-endian), 4-byte masking key, payload XOR-unmasked with
``key[i % 4]``. Message semantics (§5.4): data messages fragment
into (first, continuation*, FIN) sequences; CONTROL frames may be
interleaved BETWEEN fragments of a data message (they must not
fragment) — the reassembly walk honors both rules and they are
load-bearing in the gate.

No websocket library exists in this sandbox; encoder = gate/test
producer, decoder = engine path, pinned to the published framing
rules and hostile structural tests.
"""

from __future__ import annotations

import struct


class WsError(ValueError):
    pass


def _mask(payload: bytes, key: bytes) -> bytes:
    return bytes(b ^ key[i % 4] for i, b in enumerate(payload))


def write_frame(
    opcode: int,
    payload: bytes,
    fin: bool = True,
    mask_key: bytes | None = None,
) -> bytes:
    b0 = (0x80 if fin else 0) | opcode
    mbit = 0x80 if mask_key else 0
    n = len(payload)
    if n < 126:
        hdr = bytes([b0, mbit | n])
    elif n < 1 << 16:
        hdr = bytes([b0, mbit | 126]) + struct.pack(">H", n)
    else:
        hdr = bytes([b0, mbit | 127]) + struct.pack(">Q", n)
    if mask_key:
        return hdr + mask_key + _mask(payload, mask_key)
    return hdr + payload


def write_fragmented(
    opcode: int,
    payload: bytes,
    n_frags: int,
    mask_key: bytes,
    interleave: list[bytes] | None = None,
) -> bytes:
    """Split a data message into n_frags frames; frames from
    ``interleave`` (already-encoded CONTROL frames) are inserted
    between the first and second fragment, per §5.4's allowance."""
    size = max(1, len(payload) // n_frags)
    chunks = [payload[i : i + size] for i in range(0, len(payload), size)]
    while len(chunks) > n_frags:
        chunks[-2] += chunks[-1]
        del chunks[-1]
    out = []
    for i, c in enumerate(chunks):
        out.append(
            write_frame(
                opcode if i == 0 else 0x0,
                c,
                fin=i == len(chunks) - 1,
                mask_key=mask_key,
            )
        )
        if i == 0 and interleave:
            out.extend(interleave)
    return b"".join(out)


def parse_stream(blob: bytes) -> dict:
    """Walk all frames, reassemble data messages, collect control
    frames. Returns messages [(opcode, bytes)], pings [bytes],
    frame/masked counts."""
    off = 0
    messages: list[tuple[int, bytes]] = []
    pings: list[bytes] = []
    open_op: int | None = None
    open_buf = b""
    n_frames = 0
    n_masked = 0
    while off < len(blob):
        if off + 2 > len(blob):
            raise WsError("truncated frame header")
        b0, b1 = blob[off], blob[off + 1]
        off += 2
        fin = bool(b0 & 0x80)
        if b0 & 0x70:
            raise WsError("RSV bits set without extension")
        opcode = b0 & 0x0F
        masked = bool(b1 & 0x80)
        n = b1 & 0x7F
        if n == 126:
            n = struct.unpack_from(">H", blob, off)[0]
            off += 2
            if n < 126:
                raise WsError("non-minimal 16-bit length")
        elif n == 127:
            n = struct.unpack_from(">Q", blob, off)[0]
            off += 8
            if n < 1 << 16:
                raise WsError("non-minimal 64-bit length")
        key = b""
        if masked:
            key = blob[off : off + 4]
            off += 4
            n_masked += 1
        if off + n > len(blob):
            raise WsError("payload overruns stream")
        payload = blob[off : off + n]
        off += n
        if masked:
            payload = _mask(payload, key)
        n_frames += 1
        if opcode in (0x8, 0x9, 0xA):
            if not fin:
                raise WsError("fragmented control frame")
            if n > 125:
                raise WsError("control payload > 125")
            if opcode == 0x9:
                pings.append(payload)
            continue
        if opcode == 0x0:
            if open_op is None:
                raise WsError("continuation without open message")
            open_buf += payload
            if fin:
                messages.append((open_op, open_buf))
                open_op, open_buf = None, b""
        else:
            if open_op is not None:
                raise WsError("new data frame inside open message")
            if fin:
                messages.append((opcode, payload))
            else:
                open_op, open_buf = opcode, payload
    if open_op is not None:
        raise WsError("stream ended mid-message")
    return {
        "messages": messages,
        "pings": pings,
        "n_frames": n_frames,
        "n_masked": n_masked,
    }
