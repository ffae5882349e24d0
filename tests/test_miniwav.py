"""miniwav: RIFF/WAV codec units + the audio decode operator gate.

The multimodal audio leg (SURVEY.md round-3 additions): payloads are
REAL RIFF containers, decode walks chunks, properties verified in
closed form by the DuckDB oracle (multimodal_audio_decode)."""

import struct

import pytest

from goto_eater_crawler_spark.functions import miniwav


def test_roundtrip_canonical():
    samples = [0, 100, -100, 32767, -32768, 7]
    b = miniwav.wav_encode(44100, samples)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert len(b) == 44 + 2 * len(samples)
    sr, ch, bits, got = miniwav.wav_decode(b)
    assert (sr, ch, bits) == (44100, 1, 16)
    assert got == samples


def test_roundtrip_with_list_chunk():
    samples = [5, -5] * 10
    b = miniwav.wav_encode(8000, samples, extra_list_chunk=b"INFOx!")
    # decoder must skip the LIST chunk, not mistake it for data
    sr, ch, bits, got = miniwav.wav_decode(b)
    assert got == samples
    assert b"LIST" in b


def test_odd_list_chunk_padded():
    # odd-size chunk gets a pad byte; the walk must stay aligned
    b = miniwav.wav_encode(8000, [1, 2], extra_list_chunk=b"INFOabc")
    _, _, _, got = miniwav.wav_decode(b)
    assert got == [1, 2]


def test_stereo_roundtrip():
    samples = [1, -1, 2, -2]  # L R L R
    b = miniwav.wav_encode(16000, samples, channels=2)
    sr, ch, bits, got = miniwav.wav_decode(b)
    assert ch == 2 and got == samples


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFFxxxx",  # too short
        b"RIFX" + b"\x00" * 40,  # wrong magic
        b"RIFF" + struct.pack("<I", 4) + b"AVI ",  # not WAVE
    ],
)
def test_rejects_non_wav(payload):
    with pytest.raises(miniwav.AudioFormatError):
        miniwav.wav_decode(payload)


def test_rejects_non_pcm():
    b = bytearray(miniwav.wav_encode(8000, [1, 2]))
    # patch audio_format (offset 20) to 3 = IEEE float
    struct.pack_into("<H", b, 20, 3)
    with pytest.raises(miniwav.AudioFormatError):
        miniwav.wav_decode(bytes(b))


def test_truncated_data_chunk_rejected():
    b = miniwav.wav_encode(8000, [1, 2, 3, 4])
    with pytest.raises(miniwav.AudioFormatError):
        miniwav.wav_decode(b[:-3])


def test_synth_audio_decodes_in_spark(spark):
    from goto_eater_crawler_spark.operators import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mm.audio_decode_metadata(mm.synth_audio(docs, 5)).collect()
    assert out, "gate must be non-vacuous"
    for r in out:
        d = r["doc_id"]
        assert r["sample_rate"] == 8000 + 1000 * (d % 4)
        assert r["n_samples"] == 400 + (d % 7) * 100
        assert r["rms"] == float(1000 + (d % 50) * 100)
        assert r["peak"] == 1000 + (d % 50) * 100
        assert r["channels"] == 1 and r["bits"] == 16
