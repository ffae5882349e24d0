"""Pure-python WAV (RIFF PCM) codec — the audio leg of the multimodal
column, same philosophy as :mod:`minipdf` / :mod:`miniimg`: no native
audio library exists in the sandbox, so the container + PCM layer is
implemented for real (stdlib ``struct`` only) and entropy-coded
formats (MP3/AAC/Opus) stay honestly out of scope.

The decoder walks the RIFF chunk list properly (word-aligned chunk
sizes, unknown chunks skipped) rather than assuming the canonical
44-byte layout, so payloads carrying LIST/INFO or fact chunks decode
the same way a real reader would.

Reference analogue: the reference stores fetched bodies as opaque
bytes and parses them per format (PDF via tabula `tokyo.py:42-62`,
XLSX `nara.py:24-31`); audio is the same opaque-binary pattern applied
to a media type the 100 TB training pipeline actually carries.
"""

from __future__ import annotations

import struct


class AudioFormatError(ValueError):
    """Payload is not decodable PCM WAV."""


def wav_encode(
    sample_rate: int,
    samples: list[int],
    channels: int = 1,
    bits: int = 16,
    extra_list_chunk: bytes | None = None,
) -> bytes:
    """Encode interleaved signed PCM ``samples`` as a real RIFF/WAVE
    byte string. ``extra_list_chunk`` (raw payload of a LIST chunk)
    is inserted BEFORE the data chunk to exercise chunk walking in
    the decoder."""
    if bits != 16:
        raise AudioFormatError(f"encoder supports 16-bit PCM only, got {bits}")
    if channels < 1:
        raise AudioFormatError("channels must be >= 1")
    if len(samples) % channels:
        raise AudioFormatError("sample count not a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if extra_list_chunk is not None:
        payload = extra_list_chunk
        chunks.append(
            b"LIST"
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) % 2 else b"")
        )
    chunks.append(
        b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    )
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(b: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE byte string -> (sample_rate, channels, bits,
    samples). Walks the chunk list; raises :class:`AudioFormatError`
    on anything that is not PCM WAV."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE container")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    pos = 12
    fmt_info: tuple[int, int, int] | None = None
    data: bytes | None = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", b, pos + 4)
        cstart = pos + 8
        if cstart + csize > end:
            raise AudioFormatError(f"chunk {cid!r} overruns container")
        if cid == b"fmt ":
            if csize < 16:
                raise AudioFormatError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", b, cstart
            )
            if audio_format != 1:
                raise AudioFormatError(f"not PCM (format {audio_format})")
            fmt_info = (sample_rate, channels, bits)
        elif cid == b"data":
            data = b[cstart : cstart + csize]
        pos = cstart + csize + (csize % 2)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise AudioFormatError("missing fmt or data chunk")
    sample_rate, channels, bits = fmt_info
    if bits != 16:
        raise AudioFormatError(f"only 16-bit PCM supported, got {bits}")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return sample_rate, channels, bits, samples
