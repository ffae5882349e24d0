"""Multimodal column plumbing — opaque binary payloads + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal pipeline needs: image/audio/video as
``binary`` columns flowing through Spark untouched, with decode /
feature-extraction stages as pandas-batch UDFs.

Round 3: image decode is REAL for PNG and BMP via the pure-python
codec in :mod:`..functions.miniimg` (PNG needs only stdlib zlib) —
:func:`image_decode_metadata` decodes actual PNG bytes, converts to
luminance, resamples, and fingerprints (8x8 aHash), and the DuckDB
oracle verifies every decoded property in closed form because the test
payloads are deterministic encodings per doc_id.

Round 4: baseline grayscale JPEG decodes for real too
(:mod:`..functions.minijpeg`: Annex-K Huffman entropy decode,
dequant, inverse zigzag, IDCT), with :func:`synth_jpegs` emitting
block-constant JFIFs whose lossy pipeline is exact, so the
``multimodal_jpeg_decode`` gate has a closed-form oracle over real
decodes; interleaved COLOR (JFIF YCbCr) decodes for real at any
sampling factors — 4:4:4, 4:2:0 (the camera layout: block-quad luma
MCUs + box-downsampled chroma, gated by
``multimodal_color_420_decode``), 4:2:2/4:4:0 — plus restart
intervals; PROGRESSIVE (SOF2) streams decode for real as well
(spectral selection + successive approximation, gated by
``multimodal_progressive_decode``). GIF (minigif: LZW, interlace,
animation — ``multimodal_gif_decode``) and LOSSLESS WebP (miniwebp:
VP8L prefix codes, LZ77, color cache — ``multimodal_webp_decode``)
decode for real too. Round-4 session 7 closed both remaining stubs'
intra surfaces: LOSSY WebP (minivp8: bool-coded VP8 keyframes — Y2
WHT layer, token trees, iDCT, DC/TM prediction, gated by
``multimodal_webp_lossy_decode``) and H.264 (minih264: baseline
Annex-B I_PCM IDR streams — NAL framing, emulation prevention,
Exp-Golomb SPS/PPS/slice syntax, gated by
``multimodal_h264_decode``). Session 9 closed the CAVLC +
inter-prediction stub: minih264 now carries entropy-coded residuals
(§9.2 coeff_token/levels/total_zeros/run_before with nC contexts),
I_16x16 intra, and P slices with P_Skip + P_L0_16x16 motion at
full/half/quarter-pel (6-tap + averaging luma, eighth-pel bilinear
chroma) plus the §8.7 in-loop deblocking filter, gated end-to-end by
``multimodal_h264_cavlc_decode`` (2-frame I+P streams with a
closed-form QP-0 oracle; the synth pins the search full-pel and the
filter off to keep the flat class exact). The remaining documented
stub surface is CABAC entropy coding and B slices, which a
production cluster hands to native codecs;
:func:`binary_metadata` classifies what it can't decode as
``'unknown'`` instead of faking dimensions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import miniimg


def binary_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, header_hex, format) over a binary ``payload``
    column — one Arrow pass. ``format`` is sniffed from magic bytes
    ('png' | 'bmp' | 'jpeg' | 'gif' | 'unknown'); byte length + header
    hex + sniff are pure functions of the bytes so DuckDB verifies the
    plumbing end to end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(b) for b in pdf["payload"]]
            fmts = [
                "png"
                if b[:8] == miniimg.PNG_SIG
                else (
                    "bmp"
                    if b[:2] == b"BM"
                    else (
                        "jpeg"
                        if b[:2] == b"\xff\xd8"
                        else ("gif" if b[:4] == b"GIF8" else "unknown")
                    )
                )
                for b in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in payloads],
                    "header_hex": [b[:4].hex().upper() for b in payloads],
                    "format": fmts,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches,
        schema="doc_id long, n_bytes long, header_hex string, format string",
    )


# ---------------------------------------------------------------------------
# real decode path (PNG/BMP via miniimg)
# ---------------------------------------------------------------------------


def synth_images(docs: DataFrame, mod: int = 7) -> DataFrame:
    """(doc_id, payload) — one REAL greyscale PNG per selected doc
    (doc_id % mod == 0), deterministically derived from doc_id:

    - width  = 8 + 2*(doc_id % 5)   (even, 8..16)
    - height = 8 + (3*doc_id) % 7   (8..14)
    - two-tone pattern: a = doc_id % 100, b = 155 + doc_id % 100
      (a < b always); even doc_id -> vertical split (left a, right b),
      odd -> horizontal split (top a, bottom b)

    Encoded through miniimg.png_encode (real zlib IDAT), so the decode
    gate exercises the full codec; every decoded property has a closed
    form in doc_id that the SQL oracle computes independently."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 + 2 * (d % 5)
                h = 8 + (3 * d) % 7
                a, b = d % 100, 155 + d % 100
                rows = []
                for y in range(h):
                    if d % 2 == 0:  # vertical split
                        row = bytes([a] * (w // 2) + [b] * (w - w // 2))
                    else:  # horizontal split
                        row = bytes([a if y < h // 2 else b] * w)
                    rows.append(row)
                ids.append(d)
                payloads.append(miniimg.png_encode(w, h, "L", rows))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def synth_jpegs(docs: DataFrame, mod: int = 13) -> DataFrame:
    """(doc_id, payload) — one REAL baseline JFIF (minijpeg: Annex-K
    Huffman tables, forward DCT, byte stuffing) per selected doc
    (doc_id % mod == 0), deterministically derived from doc_id:

    - width  = 16 * (1 + doc_id % 2)   (16 or 32 — w/2 block-aligned)
    - height = 8 * (2 + doc_id % 3)    (16/24/32)
    - vertical two-tone split: left half a = doc_id % 100, right half
      b = 155 + doc_id % 100
    - odd doc_ids encode with a RESTART interval of 2 (DRI + RSTn
      markers, DC-predictor resets), so the gate drives the resync
      path through real decodes too — flat blocks stay exact with or
      without restarts, so the closed-form oracle is unchanged.

    Every 8x8 block is CONSTANT and the quant table is all ones, so
    the lossy pipeline is exact here (a flat block has only the
    integral DC coefficient 8*(v-128)): each decoded property has a
    closed form in doc_id that :func:`jpeg_decode_sql` computes
    independently. The AC/run-length paths are pinned by
    tests/test_minijpeg.py on non-flat images instead."""
    from ..functions import minijpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 16 * (1 + d % 2)
                h = 8 * (2 + d % 3)
                a, b = d % 100, 155 + d % 100
                row = bytes([a] * (w // 2) + [b] * (w // 2))
                ids.append(d)
                payloads.append(
                    minijpeg.jpeg_encode_grey(
                        w, h, [row] * h, restart_interval=2 * (d % 2)
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def jpeg_decode_sql(mod: int = 13) -> str:
    """Closed-form oracle for image_decode_metadata(synth_jpegs(docs)):
    flat-block JFIFs decode exactly (see synth_jpegs), so width/
    height/mean/ahash are pure functions of doc_id — a Huffman,
    zigzag, dequant or IDCT bug cannot hash-match."""
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 2) AS width,
           8 * (2 + doc_id % 3) AS height,
           'L' AS mode,
           ((doc_id % 100) + (155 + doc_id % 100)) / 2.0 AS mean_grey,
           1085102592571150095 AS ahash  -- 0x0F0F0F0F0F0F0F0F (vertical split)
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_color_jpegs(
    docs: DataFrame,
    mod: int = 17,
    subsampling: str = "444",
    progressive: bool = False,
) -> DataFrame:
    """(doc_id, payload) — one REAL baseline COLOR JFIF per
    selected doc (doc_id % mod == 0): a vertical two-tone split with
    both halves MCU-aligned, so every Y/Cb/Cr block is flat and the
    DCT pipeline is exact per component. ``subsampling`` '444' emits
    the 16x16 1x1-sampled layout (8-px halves); '420' emits a 32x16
    image with 16-px halves — each half exactly one 2x2-luma MCU, so
    the box chroma downsample averages a constant region and the
    4:2:0 path (MCU block-quad interleave, chroma decimation at
    encode, replication upsample at decode) stays closed-form exact.
    ``progressive`` encodes the 4:4:4 layout as a PROGRESSIVE (SOF2)
    stream instead — spectral-selection scan script with one
    successive-approximation level (minijpeg.jpeg_encode_progressive);
    flat blocks keep the same closed form (DC scans carry everything,
    AC scans are pure EOB runs the decoder must still walk).
    Tones derived from doc_id:

    - left  (r1,g1,b1) = (doc_id%100, (doc_id*7)%256, (155+doc_id%100)%256)
    - right (r2,g2,b2) = ((20+doc_id)%256, (180+3*doc_id)%256, (240+7*doc_id)%256)

    The only lossy steps are the two JFIF color transforms
    (RGB->YCbCr at encode, YCbCr->RGB at decode), both defined by
    IEEE-double expressions that :func:`color_decode_sql` replicates
    literally — so the decoded channel means have closed forms in
    doc_id (round() parity python vs DuckDB verified over the tone
    space; the .5 boundary never lands exactly on these doubles)."""
    from ..functions import minijpeg

    half = 8 if subsampling == "444" else 16

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c1 = (d % 100, (d * 7) % 256, (155 + d % 100) % 256)
                c2 = ((20 + d) % 256, (180 + 3 * d) % 256, (240 + 7 * d) % 256)
                row = bytes(list(c1) * half + list(c2) * half)
                ids.append(d)
                if progressive:
                    payloads.append(
                        minijpeg.jpeg_encode_progressive(
                            2 * half, 16, [row] * 16
                        )
                    )
                else:
                    payloads.append(
                        minijpeg.jpeg_encode_color(
                            2 * half, 16, [row] * 16, subsampling=subsampling
                        )
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def color_decode_metadata(images: DataFrame) -> DataFrame:
    """REAL decode of color payloads: (doc_id, width, height, mode,
    mean_r, mean_g, mean_b) — channel means over the decoded RGB
    pixels (the color-statistics stage of an image pipeline);
    undecodable payloads yield a null row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mode": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, mode, rows = miniimg.decode_image(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "mode",
                              "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    continue
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(mode)
                if mode == "RGB":
                    n = w * h
                    for ki, k in enumerate(("mean_r", "mean_g", "mean_b")):
                        out[k].append(
                            sum(r[3 * x + ki] for r in rows for x in range(w))
                            / n
                        )
                else:
                    for k in ("mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, mode string, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def color_decode_sql(mod: int = 17, width: int = 16) -> str:
    """Closed-form oracle for color_decode_metadata(synth_color_jpegs):
    replicates the JFIF transform pair (the only lossy steps — the
    flat-block DCT pipeline is exact, including 4:2:0's chroma
    box-average/replication over constant MCU tiles) as literal
    IEEE-double SQL, so a Huffman/MCU-interleave/chroma-resample/
    color-transform bug cannot hash-match. ``width`` 16 matches the
    4:4:4 layout, 32 the 4:2:0 one; the two equal-area halves make
    the channel means (c1+c2)/2 in either case."""

    def clamp(e: str) -> str:
        return f"LEAST(255, GREATEST(0, CAST(round({e}) AS BIGINT)))"

    # coefficients CAST to DOUBLE: DuckDB parses bare 0.299 as
    # DECIMAL, whose exact arithmetic lands on true .5 boundaries the
    # engine's IEEE doubles sit just below (doc 2945: decimal 115.500
    # vs double 115.4999...). Forcing DOUBLE makes both sides evaluate
    # the bit-identical expression, removing the boundary class
    # entirely (same literal order as rgb_to_ycbcr / ycbcr_to_rgb).
    C = {
        k: f"CAST({v} AS DOUBLE)"
        for k, v in {
            "kr": "0.299", "kg": "0.587", "kb": "0.114",
            "cbr": "0.168736", "cbg": "0.331264", "half": "0.5",
            "crg": "0.418688", "crb": "0.081312",
            "rcr": "1.402", "gcb": "0.344136", "gcr": "0.714136",
            "bcb": "1.772",
        }.items()
    }
    tones = {
        "r1": "(doc_id % 100)", "g1": "((doc_id * 7) % 256)",
        "b1": "((155 + doc_id % 100) % 256)",
        "r2": "((20 + doc_id) % 256)", "g2": "((180 + 3 * doc_id) % 256)",
        "b2": "((240 + 7 * doc_id) % 256)",
    }
    ycc = []
    for s in ("1", "2"):
        r, g, b = tones[f"r{s}"], tones[f"g{s}"], tones[f"b{s}"]
        ycc += [
            clamp(f"{C['kr']}*{r} + {C['kg']}*{g} + {C['kb']}*{b}")
            + f" AS y{s}",
            clamp(f"128 - {C['cbr']}*{r} - {C['cbg']}*{g} + {C['half']}*{b}")
            + f" AS cb{s}",
            clamp(f"128 + {C['half']}*{r} - {C['crg']}*{g} - {C['crb']}*{b}")
            + f" AS cr{s}",
        ]
    back = []
    for s in ("1", "2"):
        back += [
            clamp(f"y{s} + {C['rcr']}*(cr{s} - 128)") + f" AS rr{s}",
            clamp(
                f"y{s} - {C['gcb']}*(cb{s} - 128) - {C['gcr']}*(cr{s} - 128)"
            )
            + f" AS gg{s}",
            clamp(f"y{s} + {C['bcb']}*(cb{s} - 128)") + f" AS bb{s}",
        ]
    return f"""
    WITH y AS (
      SELECT doc_id, {', '.join(ycc)}
      FROM documents WHERE doc_id % {mod} = 0),
    o AS (SELECT doc_id, {', '.join(back)} FROM y)
    SELECT doc_id, {width} AS width, 16 AS height, 'RGB' AS mode,
           (rr1 + rr2) / 2.0 AS mean_r,
           (gg1 + gg2) / 2.0 AS mean_g,
           (bb1 + bb2) / 2.0 AS mean_b
    FROM o
    """


def synth_gifs(docs: DataFrame, mod: int = 29) -> DataFrame:
    """(doc_id, payload) — one REAL GIF89a (minigif: variable-width
    LSB-first LZW, global palette) per selected doc, deterministically
    derived from doc_id:

    - 16x8 canvas, four 4-px vertical stripes indexing a 4-color
      palette: pal[i] = ((d + 13*i) % 256, (3*d + 29*i) % 256,
      (5*d + 57*i) % 256)
    - odd doc_ids store the image INTERLACED (the 4-pass row order —
      decode output is identical, so the closed-form oracle also
      drives the deinterlace path, like the jpeg gate's restarts)
    - doc_id % 3 == 0 adds a second frame with the stripe order
      reversed (same color multiset), so the gate also walks the
      multi-frame compositing path with an unchanged closed form

    Stripes have equal area, so every decoded channel mean over all
    frames is the palette-channel average — a pure function of doc_id
    that :func:`gif_decode_sql` computes independently."""
    from ..functions import minigif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pal = [
                    ((d + 13 * i) % 256, (3 * d + 29 * i) % 256,
                     (5 * d + 57 * i) % 256)
                    for i in range(4)
                ]
                f1 = bytes((x // 4) % 4 for _ in range(8) for x in range(16))
                frames = [f1]
                if d % 3 == 0:
                    frames.append(
                        bytes(3 - (x // 4) % 4 for _ in range(8)
                              for x in range(16))
                    )
                ids.append(d)
                payloads.append(
                    minigif.gif_encode(
                        16, 8, pal, frames,
                        delays_cs=[4] * len(frames),
                        interlace=bool(d % 2),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def gif_decode_metadata(images: DataFrame) -> DataFrame:
    """REAL decode of GIF payloads: (doc_id, width, height, n_frames,
    mean_r, mean_g, mean_b) — channel means over ALL composited
    frames' pixels; undecodable payloads yield a null row."""
    from ..functions import minigif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, frames = minigif.gif_decode(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "n_frames",
                              "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    continue
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                n = w * h * len(frames)
                for ki, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[k].append(
                        sum(rgb[3 * p + ki] for _, rgb in frames
                            for p in range(w * h)) / n
                    )
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, n_frames long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def gif_decode_sql(mod: int = 29) -> str:
    """Closed-form oracle for gif_decode_metadata(synth_gifs): equal-
    area stripes make each channel mean the 4-color palette average —
    an LZW, palette, interlace, or compositing bug cannot hash-match
    (frame 2 reverses stripe ORDER only, so the means are invariant
    while n_frames still pins the animation walk)."""
    chans = {"mean_r": (1, 13), "mean_g": (3, 29), "mean_b": (5, 57)}
    means = ", ".join(
        f"({' + '.join(f'(({a} * doc_id + {b * i}) % 256)' for i in range(4))})"
        f" / 4.0 AS {name}"
        for name, (a, b) in chans.items()
    )
    return f"""
    SELECT doc_id, 16 AS width, 8 AS height,
           1 + CAST(doc_id % 3 = 0 AS BIGINT) AS n_frames,
           {means}
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_webps(docs: DataFrame, mod: int = 31) -> DataFrame:
    """(doc_id, payload) — one REAL lossless WebP (miniwebp: RIFF/
    VP8L, canonical prefix codes, LZ77, color cache) per selected doc:
    a 24x10 image of three 8-px vertical stripes with closed-form
    colors c_i = ((7d + 31i) % 256, (11d + 63i) % 256,
    (13d + 5i) % 256), i in 0..2. Encoder knobs vary by doc_id so the
    gate walks every arm: odd doc_ids use a 6-bit color cache, every
    third doc adds the subtract-green transform. The format is
    LOSSLESS, so each decoded channel mean is exactly the stripe
    average — pure functions of doc_id for :func:`webp_decode_sql`."""
    from ..functions import miniwebp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cols = [
                    ((7 * d + 31 * i) % 256, (11 * d + 63 * i) % 256,
                     (13 * d + 5 * i) % 256)
                    for i in range(3)
                ]
                row = b"".join(bytes(cols[i]) * 8 for i in range(3))
                ids.append(d)
                payloads.append(
                    miniwebp.webp_encode(
                        24, 10, [row] * 10,
                        use_cache_bits=6 if d % 2 else 0,
                        subtract_green=d % 3 == 0,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def webp_decode_sql(mod: int = 31) -> str:
    """Closed-form oracle for color_decode_metadata(synth_webps):
    lossless format, equal-area stripes — a prefix-code, LZ77,
    color-cache, or subtract-green bug cannot hash-match."""
    chans = {"mean_r": (7, 31), "mean_g": (11, 63), "mean_b": (13, 5)}
    means = ", ".join(
        f"({' + '.join(f'(({a} * doc_id + {b * i}) % 256)' for i in range(3))})"
        f" / 3.0 AS {name}"
        for name, (a, b) in chans.items()
    )
    return f"""
    SELECT doc_id, 24 AS width, 10 AS height, 'RGB' AS mode, {means}
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_lossy_webps(docs: DataFrame, mod: int = 37) -> DataFrame:
    """(doc_id, payload) — one REAL lossy WebP (minivp8: RIFF 'VP8 '
    keyframe — boolean arithmetic coding, keyframe mode trees, token
    entropy coding, Y2 WHT layer, integer iDCT, DC/TM prediction) per
    selected doc, deterministically derived from doc_id:

    - width  = 16 * (1 + d % 3)   (16/32/48)
    - height = 16 * (1 + d % 2)   (16/32)
    - flat planes: y = (3d) % 256, u = 2*((5d) % 128), v = 2*((7d) % 128)
    - even doc_ids predict Y with DC_PRED, odd with TM_PRED (both
      keyframe mode-tree paths run through the real bool decoder)

    Flat frames at qindex 0 survive the LOSSY pipeline EXACTLY: the
    first MB's flat residual r rides the Y2 path as coefficient
    Qy2 = 8r (iWHT (64r+3)>>3 = 8r, iDCT (8r*8+4)>>3 = r), chroma DCs
    quantize exactly because the tones are even, and every later MB
    predicts its own tone edge-aware (DC_PRED averages only REAL
    edges) and skips. So each decoded plane mean is a pure function
    of doc_id — :func:`lossy_webp_decode_sql` computes it
    independently, and a bool-coder, token-tree, context, WHT, iDCT,
    dequant, or prediction-border bug cannot hash-match."""
    from ..functions import minivp8

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 * (1 + d % 3), 16 * (1 + d % 2)
                yv = (3 * d) % 256
                uv_, vv = 2 * ((5 * d) % 128), 2 * ((7 * d) % 128)
                ids.append(d)
                payloads.append(
                    minivp8.webp_encode_lossy(
                        w, h,
                        [[yv] * w] * h,
                        [[uv_] * (w // 2)] * (h // 2),
                        [[vv] * (w // 2)] * (h // 2),
                        qindex=0,
                        y_mode=minivp8.TM_PRED if d % 2 else minivp8.DC_PRED,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def lossy_decode_metadata(images: DataFrame) -> DataFrame:
    """REAL lossy-WebP decode: (doc_id, width, height, mode, mean_y,
    mean_u, mean_v) — plane means over the decoded YUV420 pixels (the
    color-statistics stage, chroma kept at coded resolution so the
    oracle needs no upsampling convention); undecodable payloads
    yield a null row."""
    from ..functions import minivp8

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mode": [],
                "mean_y": [], "mean_u": [], "mean_v": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, y, u, v = minivp8.webp_decode_lossy(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "mode",
                              "mean_y", "mean_u", "mean_v"):
                        out[k].append(None)
                    continue
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append("YUV420")
                out["mean_y"].append(sum(map(sum, y)) / (w * h))
                cw, ch = (w + 1) // 2, (h + 1) // 2
                out["mean_u"].append(sum(map(sum, u)) / (cw * ch))
                out["mean_v"].append(sum(map(sum, v)) / (cw * ch))
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, mode string, "
            "mean_y double, mean_u double, mean_v double"
        ),
    )


def lossy_webp_decode_sql(mod: int = 37) -> str:
    """Closed-form oracle for lossy_decode_metadata(synth_lossy_webps):
    flat frames at qindex 0 decode exactly (see synth_lossy_webps), so
    every decoded property is a pure function of doc_id."""
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 3) AS width,
           16 * (1 + doc_id % 2) AS height,
           'YUV420' AS mode,
           CAST((3 * doc_id) % 256 AS DOUBLE) AS mean_y,
           CAST(2 * ((5 * doc_id) % 128) AS DOUBLE) AS mean_u,
           CAST(2 * ((7 * doc_id) % 128) AS DOUBLE) AS mean_v
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_h264s(docs: DataFrame, mod: int = 41) -> DataFrame:
    """(doc_id, payload) — one REAL H.264 Annex-B elementary stream
    (minih264: SPS + PPS + one IDR slice of I_PCM macroblocks) per
    selected doc, deterministically derived from doc_id:

    - width  = 16 * (1 + d % 3), height = 16 * (1 + d % 2)
    - Y: vertical two-tone split, left ya = d % 256,
      right yb = (7d + 13) % 256 (halves are w/2 px each)
    - flat chroma u = (5d) % 256, v = (11d) % 256

    I_PCM is LOSSLESS (raw byte-aligned samples by construction of
    the standard), so the decoded plane means are exact closed forms
    in doc_id with no quantization algebra — but a NAL-framing,
    emulation-prevention, Exp-Golomb, SPS/PPS, slice-header, or
    PCM-sample-order bug cannot hash-match
    (:func:`h264_decode_sql`)."""
    from ..functions import minih264

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 * (1 + d % 3), 16 * (1 + d % 2)
                ya, yb = d % 256, (7 * d + 13) % 256
                uv_, vv = (5 * d) % 256, (11 * d) % 256
                yrow = [ya] * (w // 2) + [yb] * (w // 2)
                ids.append(d)
                payloads.append(
                    minih264.h264_encode_ipcm(
                        w, h, [yrow] * h,
                        [[uv_] * (w // 2)] * (h // 2),
                        [[vv] * (w // 2)] * (h // 2),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def h264_decode_metadata(images: DataFrame) -> DataFrame:
    """REAL H.264 decode: (doc_id, width, height, mode, mean_y,
    mean_u, mean_v) over the decoded YUV420 planes; undecodable
    payloads yield a null row."""
    from ..functions import minih264

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mode": [],
                "mean_y": [], "mean_u": [], "mean_v": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, y, u, v = minih264.h264_decode(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "mode",
                              "mean_y", "mean_u", "mean_v"):
                        out[k].append(None)
                    continue
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append("YUV420")
                out["mean_y"].append(sum(map(sum, y)) / (w * h))
                out["mean_u"].append(sum(map(sum, u)) / (w * h / 4))
                out["mean_v"].append(sum(map(sum, v)) / (w * h / 4))
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, mode string, "
            "mean_y double, mean_u double, mean_v double"
        ),
    )


def h264_decode_sql(mod: int = 41) -> str:
    """Closed-form oracle for h264_decode_metadata(synth_h264s):
    I_PCM is lossless, so the two-tone Y mean and flat chroma means
    are pure functions of doc_id."""
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 3) AS width,
           16 * (1 + doc_id % 2) AS height,
           'YUV420' AS mode,
           ((doc_id % 256) + ((7 * doc_id + 13) % 256)) / 2.0 AS mean_y,
           CAST((5 * doc_id) % 256 AS DOUBLE) AS mean_u,
           CAST((11 * doc_id) % 256 AS DOUBLE) AS mean_v
    FROM documents WHERE doc_id % {mod} = 0
    """


def transcode_png_webp_stats(images: DataFrame) -> DataFrame:
    """REAL transcode stage — the 'normalize every image to one
    format' step of a multimodal ingest pipeline: decode the PNG
    payload, expand grey to RGB, RE-ENCODE as lossless WebP
    (miniwebp), decode THAT stream, and report channel means over the
    webp-decoded pixels. Both codecs are lossless, so the means equal
    the PNG closed form — but only if the full PNG-decode ->
    WebP-encode -> WebP-decode chain is bit-faithful; a defect in any
    of the three stages breaks the hash match."""
    from ..functions import miniwebp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mode": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, mode, rows = miniimg.decode_image(bytes(payload))
                    if mode == "L":
                        rows = [
                            bytes(b for v in r for b in (v, v, v))
                            for r in rows
                        ]
                    wp = miniwebp.webp_encode(w, h, rows)
                    w2, h2, mode2, rows2 = miniwebp.webp_decode(wp)
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "mode",
                              "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    continue
                out["width"].append(w2)
                out["height"].append(h2)
                out["mode"].append(mode2)
                n = w2 * h2
                for ki, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[k].append(
                        sum(r[3 * x + ki] for r in rows2 for x in range(w2))
                        / n
                    )
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, mode string, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def transcode_sql(mod: int = 7) -> str:
    """Closed-form oracle for transcode_png_webp_stats(synth_images):
    lossless PNG -> lossless WebP, so every channel mean equals the
    PNG two-tone closed form (grey expanded to equal R=G=B)."""
    mean = """
           CASE WHEN doc_id % 2 = 0
                THEN ((doc_id % 100) + (155 + doc_id % 100)) / 2.0
                ELSE ((doc_id % 100) * ((8 + (3*doc_id) % 7) // 2)
                      + (155 + doc_id % 100)
                        * ((8 + (3*doc_id) % 7) - (8 + (3*doc_id) % 7) // 2))
                     / CAST(8 + (3*doc_id) % 7 AS DOUBLE)
           END"""
    return f"""
    SELECT doc_id,
           8 + 2*(doc_id % 5) AS width,
           8 + (3*doc_id) % 7 AS height,
           'RGB' AS mode,
           {mean} AS mean_r, {mean} AS mean_g, {mean} AS mean_b
    FROM documents WHERE doc_id % {mod} = 0
    """


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def image_decode_metadata(images: DataFrame) -> DataFrame:
    """REAL decode of a binary image column: (doc_id, width, height,
    mode, mean_grey, ahash). PNG/BMP decoded by miniimg; undecodable
    payloads yield a null row (the pipeline-safe failure mode).
    mean_grey is the exact luminance mean; ahash the 8x8 average hash
    as signed 64-bit (the near-dup image fingerprint)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mode": [],
                "mean_grey": [], "ahash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, mode, rows = miniimg.decode_image(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "mode", "mean_grey", "ahash"):
                        out[k].append(None)
                    continue
                grid = miniimg.to_grey(w, h, mode, rows)
                flat = [v for r in grid for v in r]
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(mode)
                out["mean_grey"].append(sum(flat) / len(flat))
                out["ahash"].append(_signed64(miniimg.ahash(grid)))
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, mode string, "
            "mean_grey double, ahash long"
        ),
    )


def image_decode_sql(mod: int = 7) -> str:
    """Closed-form oracle for image_decode_metadata(synth_images(docs)):
    every decoded property is a pure function of doc_id (see
    synth_images) — if the PNG codec misreads the zlib stream, a
    filter, or the scanline layout, these values cannot match."""
    return f"""
    SELECT doc_id,
           8 + 2*(doc_id % 5) AS width,
           8 + (3*doc_id) % 7 AS height,
           'L' AS mode,
           CASE WHEN doc_id % 2 = 0
                THEN ((doc_id % 100) + (155 + doc_id % 100)) / 2.0
                ELSE ((doc_id % 100) * ((8 + (3*doc_id) % 7) // 2)
                      + (155 + doc_id % 100)
                        * ((8 + (3*doc_id) % 7) - (8 + (3*doc_id) % 7) // 2))
                     / CAST(8 + (3*doc_id) % 7 AS DOUBLE)
           END AS mean_grey,
           CASE WHEN doc_id % 2 = 0
                THEN 1085102592571150095   -- 0x0F0F0F0F0F0F0F0F
                ELSE 4294967295            -- 0x00000000FFFFFFFF
           END AS ahash
    FROM documents WHERE doc_id % {mod} = 0
    """


# ---------------------------------------------------------------------------
# real audio decode path (RIFF/WAV PCM via miniwav)
# ---------------------------------------------------------------------------

_LIST_PAYLOAD = b"INFOsynthetic!"  # 14 bytes (even: no pad byte)


def synth_audio(docs: DataFrame, mod: int = 5) -> DataFrame:
    """(doc_id, payload) — one REAL 16-bit PCM WAV per selected doc
    (doc_id % mod == 0), deterministically derived from doc_id:

    - sample_rate = 8000 + 1000*(doc_id % 4)
    - n_samples   = 400 + (doc_id % 7) * 100
    - amplitude A = 1000 + (doc_id % 50) * 100
    - square wave, period p = 2 + (doc_id % 3): sample i = +A when
      (i % p) < ceil(p/2) else -A  (|x| = A always, so RMS == A)
    - odd doc_id additionally carries a LIST chunk before data, so the
      decode gate exercises real chunk walking, not a fixed 44-byte
      header assumption.

    Encoded through miniwav.wav_encode (real RIFF container); every
    decoded property has a closed form in doc_id that the SQL oracle
    computes independently."""
    from ..functions import miniwav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sr = 8000 + 1000 * (d % 4)
                n = 400 + (d % 7) * 100
                amp = 1000 + (d % 50) * 100
                p = 2 + (d % 3)
                half = (p + 1) // 2
                samples = [amp if (i % p) < half else -amp for i in range(n)]
                ids.append(d)
                payloads.append(
                    miniwav.wav_encode(
                        sr,
                        samples,
                        extra_list_chunk=_LIST_PAYLOAD if d % 2 else None,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def audio_decode_metadata(audio: DataFrame) -> DataFrame:
    """REAL decode of a binary WAV column: (doc_id, n_bytes,
    sample_rate, channels, bits, n_samples, duration_ms, rms, peak).
    RIFF chunk walk + PCM unpack by miniwav; undecodable payloads
    yield a null row (pipeline-safe failure mode, same contract as
    :func:`image_decode_metadata`)."""
    from ..functions import miniwav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "n_bytes": [], "sample_rate": [],
                "channels": [], "bits": [], "n_samples": [],
                "duration_ms": [], "rms": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(b))
                try:
                    sr, ch, bits, samples = miniwav.wav_decode(b)
                except miniwav.AudioFormatError:
                    for k in (
                        "sample_rate", "channels", "bits", "n_samples",
                        "duration_ms", "rms", "peak",
                    ):
                        out[k].append(None)
                    continue
                n = len(samples) // ch
                out["sample_rate"].append(sr)
                out["channels"].append(ch)
                out["bits"].append(bits)
                out["n_samples"].append(n)
                out["duration_ms"].append(round(n * 1000.0 / sr, 4))
                sumsq = sum(x * x for x in samples)
                out["rms"].append(
                    round((sumsq / len(samples)) ** 0.5, 4) if samples else None
                )
                out["peak"].append(max(samples) if samples else None)
            yield pd.DataFrame(out)

    return audio.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, n_bytes long, sample_rate long, channels long, "
            "bits long, n_samples long, duration_ms double, rms double, "
            "peak long"
        ),
    )


def audio_decode_sql(mod: int = 5) -> str:
    """Closed-form oracle for audio_decode_metadata(synth_audio(docs)):
    container size (44-byte canonical layout + 8+14 LIST insertion on
    odd ids), rate/length params, duration, and the square wave's
    exact RMS (= amplitude) are all pure functions of doc_id — a
    chunk-walk or PCM-unpack bug cannot hash-match."""
    n = "(400 + (doc_id % 7) * 100)"
    sr = "(8000 + 1000 * (doc_id % 4))"
    amp = "(1000 + (doc_id % 50) * 100)"
    return f"""
    SELECT doc_id,
           44 + 2 * {n} + CASE WHEN doc_id % 2 = 1 THEN {8 + len(_LIST_PAYLOAD)} ELSE 0 END
             AS n_bytes,
           {sr} AS sample_rate,
           CAST(1 AS BIGINT) AS channels,
           CAST(16 AS BIGINT) AS bits,
           {n} AS n_samples,
           round({n} * 1000.0 / {sr}, 4) AS duration_ms,
           round(CAST({amp} AS DOUBLE), 4) AS rms,
           {amp} AS peak
    FROM documents WHERE doc_id % {mod} = 0
    """


def docs_as_binary(docs: DataFrame) -> DataFrame:
    """Model the multimodal table: text bytes stand in for an image
    payload (binary column + id)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


FRAME_BYTES = 64  # stand-in frame size for the chunked-payload model


def frame_sample(
    docs_with_payload: DataFrame, every_k: int = 4
) -> DataFrame:
    """Frame sampling over a chunked binary payload — the video-
    pipeline batch shape: payload = concatenated fixed-size frames;
    emit every k-th frame's (doc_id, frame_idx, frame_hex_prefix).
    One Arrow pass, one->many rows per input (the explode shape a real
    ffmpeg frame sampler produces); video frame DECODE remains out of
    scope (entropy-coded, needs a native codec) — still images decode
    for real via :func:`image_decode_metadata`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hexs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, every_k):
                    frame = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(fi)
                    hexs.append(frame[:4].hex().upper())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hex": hexs}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id long, frame_idx long, frame_hex string"
    )


def frame_sample_sql(every_k: int = 4) -> str:
    return f"""
    SELECT doc_id, frame_idx,
           upper(substr(hex(encode(text)),
                        CAST(frame_idx AS INT) * {FRAME_BYTES} * 2 + 1, 8)) AS frame_hex
    FROM (
      SELECT doc_id, text, unnest(range(0,
               CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT),
               {every_k})) AS frame_idx
      FROM documents)
    """


BINARY_METADATA_SQL = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(hex(encode(text)), 1, 8) AS header_hex,
           CASE WHEN substr(hex(encode(text)), 1, 16) = '89504E470D0A1A0A'
                THEN 'png'
                WHEN substr(hex(encode(text)), 1, 4) = '424D' THEN 'bmp'
                WHEN substr(hex(encode(text)), 1, 4) = 'FFD8' THEN 'jpeg'
                ELSE 'unknown' END AS format
    FROM documents
"""


def image_resize_stats(images: DataFrame, out_w: int = 6, out_h: int = 4) -> DataFrame:
    """REAL resize stage: decode -> luminance -> nearest-neighbor
    resample to (out_w, out_h) -> (doc_id, out_w, out_h, px_sum,
    mean_px). The thumbnail/feature-extract step of an image
    pipeline; the floor mapping src = (dst*src)//dst is exact integer
    math, so the SQL oracle reproduces every sampled pixel from the
    synth pattern's closed form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "out_w": [], "out_h": [], "px_sum": [],
                   "mean_px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, mode, rows = miniimg.decode_image(bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("out_w", "out_h", "px_sum", "mean_px"):
                        out[k].append(None)
                    continue
                small = miniimg.resize_nearest(
                    miniimg.to_grey(w, h, mode, rows), out_w, out_h
                )
                flat = [v for r in small for v in r]
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["px_sum"].append(sum(flat))
                out["mean_px"].append(round(sum(flat) / len(flat), 4))
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        batches,
        schema="doc_id long, out_w long, out_h long, px_sum long, mean_px double",
    )


def image_resize_sql(mod: int = 7, out_w: int = 6, out_h: int = 4) -> str:
    """Closed-form oracle for image_resize_stats(synth_images(docs)):
    the nearest-neighbor floor mapping samples pixel columns (even
    doc_id, vertical split) or rows (odd, horizontal split) whose
    two-tone value is a pure function of doc_id."""
    w = "(8 + 2*(doc_id % 5))"
    h = "(8 + (3*doc_id) % 7)"
    a = "(doc_id % 100)"
    b = "(155 + doc_id % 100)"
    # even: sum over sampled columns x'=0..out_w-1, each counted out_h times
    col_terms = " + ".join(
        f"(CASE WHEN (({x} * {w}) // {out_w}) < ({w} // 2) THEN {a} ELSE {b} END)"
        for x in range(out_w)
    )
    # odd: sum over sampled rows y'=0..out_h-1, each counted out_w times
    row_terms = " + ".join(
        f"(CASE WHEN (({y} * {h}) // {out_h}) < ({h} // 2) THEN {a} ELSE {b} END)"
        for y in range(out_h)
    )
    n = out_w * out_h
    return f"""
    SELECT doc_id, {out_w} AS out_w, {out_h} AS out_h,
           CAST(CASE WHEN doc_id % 2 = 0 THEN {out_h} * ({col_terms})
                     ELSE {out_w} * ({row_terms}) END AS BIGINT) AS px_sum,
           round(CASE WHEN doc_id % 2 = 0 THEN {out_h} * ({col_terms})
                      ELSE {out_w} * ({row_terms}) END / {float(n)}, 4)
             AS mean_px
    FROM documents WHERE doc_id % {mod} = 0
    """


# ---------------------------------------------------------------------------
# real video path: APNG container (animated PNG) via miniimg
# ---------------------------------------------------------------------------


def synth_videos(docs: DataFrame, mod: int = 13) -> DataFrame:
    """(doc_id, payload) — one REAL APNG per selected doc: n_frames =
    2 + doc_id % 3 full-canvas frames, frame f a solid greyscale
    value (doc_id*7 + f*31) % 256, canvas 8+(doc_id%4)*2 x
    6+(doc_id%3)*2. Every per-frame property has a closed form in
    (doc_id, f) for the SQL oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 + (d % 4) * 2
                h = 6 + (d % 3) * 2
                frames = [
                    [bytes([(d * 7 + f * 31) % 256] * w) for _ in range(h)]
                    for f in range(2 + d % 3)
                ]
                ids.append(d)
                payloads.append(miniimg.apng_encode(w, h, "L", frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def video_frame_stats(videos: DataFrame) -> DataFrame:
    """REAL video-frame extraction: walk the APNG container, decode
    every frame (fdAT zlib + scanline defilter), emit one row per
    frame with exact stats — the 1->many frame-sampling stage of a
    multimodal pipeline, with an actual codec under it instead of
    opaque byte chunks. Undecodable payloads yield a single null row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [],
                   "width": [], "height": [], "mean_px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, mode, frames = miniimg.apng_decode(bytes(payload))
                except miniimg.ImageFormatError:
                    out["doc_id"].append(int(doc_id))
                    for k in ("frame_idx", "n_frames", "width", "height",
                              "mean_px"):
                        out[k].append(None)
                    continue
                for fi, rows in enumerate(frames):
                    grid = miniimg.to_grey(w, h, mode, rows)
                    flat = [v for r in grid for v in r]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(fi)
                    out["n_frames"].append(len(frames))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_px"].append(sum(flat) / len(flat))
            yield pd.DataFrame(out)

    return videos.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, frame_idx long, n_frames long, width long, "
            "height long, mean_px double"
        ),
    )


def video_frames_sql(mod: int = 13) -> str:
    """Closed-form oracle for video_frame_stats(synth_videos(docs))."""
    return f"""
    SELECT doc_id, f AS frame_idx,
           2 + doc_id % 3 AS n_frames,
           8 + (doc_id % 4) * 2 AS width,
           6 + (doc_id % 3) * 2 AS height,
           CAST((doc_id * 7 + f * 31) % 256 AS DOUBLE) AS mean_px
    FROM documents, range(4) t(f)
    WHERE doc_id % {mod} = 0 AND f < 2 + doc_id % 3
    """


def synth_h264_videos(docs: DataFrame, mod: int = 43) -> DataFrame:
    """(doc_id, payload) — one REAL 2-frame CAVLC H.264 Annex-B
    stream (minih264: IDR I_16x16 slice + P slice) per selected doc,
    deterministically derived from doc_id:

    - width = 16 * (1 + d % 3), height = 16 * (1 + d % 2)
    - frame 1: per-macroblock-COLUMN flat values (column i):
      y = 98 + (7d + 13i) % 61, u = 98 + (5d + 11i) % 61,
      v = 98 + (3d + 17i) % 61 — inside the QP-0 exact
      reconstruction band (|luma residual| <= 81, minih264 module
      doc), with MB-to-MB spread that drives the DC-prediction and
      CAVLC nC context chains
    - frame 2: luma shifted per column by delta_i = 3*((d+i) % 3)
      (chroma unchanged), so some MBs P_Skip (delta 0) and the rest
      take the P_L0 residual path; delta <= 6 < half the minimum
      inter-column luma step (13) keeps the deterministic SAD search
      at MV (0,0) (the search runs with subpel=False so the
      half-pel refinement ring cannot outbid the flat match), so
      every residual stays flat and the whole stream reconstructs
      EXACTLY (closed form, :func:`h264_video_decode_sql`).

    A defect anywhere in the CAVLC chain — coeff_token context,
    level suffix adaptation, total_zeros/run_before placement, the
    Hadamard DC paths, median MV prediction, skip inference — breaks
    the hash match."""
    from ..functions import minih264

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mb_w, mb_h = 1 + d % 3, 1 + d % 2
                w, h = 16 * mb_w, 16 * mb_h
                vy = [98 + (7 * d + 13 * i) % 61 for i in range(mb_w)]
                vu = [98 + (5 * d + 11 * i) % 61 for i in range(mb_w)]
                vv = [98 + (3 * d + 17 * i) % 61 for i in range(mb_w)]
                dl = [3 * ((d + i) % 3) for i in range(mb_w)]
                f1 = ([[vy[x // 16] for x in range(w)] for _ in range(h)],
                      [[vu[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)],
                      [[vv[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)])
                f2 = ([[vy[x // 16] + dl[x // 16] for x in range(w)]
                       for _ in range(h)], f1[1], f1[2])
                ids.append(d)
                payloads.append(
                    minih264.h264_encode(
                        w, h, [f1, f2], qp=0, subpel=False
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def h264_video_decode_metadata(videos: DataFrame) -> DataFrame:
    """REAL CAVLC H.264 decode: (doc_id, width, height, n_frames,
    mean_y1, mean_y2, mean_u, mean_v) over the decoded frame
    sequence (luma means per frame; chroma means of frame 1);
    undecodable payloads yield a null row."""
    from ..functions import minih264

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "n_frames": [],
                "mean_y1": [], "mean_y2": [], "mean_u": [], "mean_v": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    w, h, frames = minih264.h264_decode_frames(
                        bytes(payload))
                except miniimg.ImageFormatError:
                    for k in ("width", "height", "n_frames",
                              "mean_y1", "mean_y2", "mean_u", "mean_v"):
                        out[k].append(None)
                    continue
                y1, u1, v1 = frames[0]
                y2 = frames[-1][0]
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["mean_y1"].append(sum(map(sum, y1)) / (w * h))
                out["mean_y2"].append(sum(map(sum, y2)) / (w * h))
                out["mean_u"].append(sum(map(sum, u1)) / (w * h / 4))
                out["mean_v"].append(sum(map(sum, v1)) / (w * h / 4))
            yield pd.DataFrame(out)

    return videos.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, width long, height long, n_frames long, "
            "mean_y1 double, mean_y2 double, mean_u double, mean_v double"
        ),
    )


def h264_video_decode_sql(mod: int = 43) -> str:
    """Closed-form oracle for
    h264_video_decode_metadata(synth_h264_videos): the flat-per-MB
    frames reconstruct exactly at QP 0, so each plane mean is the
    average of its 1..3 macroblock-column values — a pure function
    of doc_id (correctly-rounded IEEE division matches the engine's
    sum/count to the last bit)."""

    def colavg(term) -> str:
        ts = [term(k) for k in range(3)]
        return (
            f"CASE doc_id % 3 WHEN 0 THEN CAST({ts[0]} AS DOUBLE) "
            f"WHEN 1 THEN ({ts[0]} + {ts[1]}) / 2.0 "
            f"ELSE ({ts[0]} + {ts[1]} + {ts[2]}) / 3.0 END"
        )

    y1 = colavg(lambda k: f"(98 + (7 * doc_id + {13 * k}) % 61)")
    y2 = colavg(lambda k: f"(98 + (7 * doc_id + {13 * k}) % 61"
                          f" + 3 * ((doc_id + {k}) % 3))")
    mu = colavg(lambda k: f"(98 + (5 * doc_id + {11 * k}) % 61)")
    mv = colavg(lambda k: f"(98 + (3 * doc_id + {17 * k}) % 61)")
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 3) AS width,
           16 * (1 + doc_id % 2) AS height,
           CAST(2 AS BIGINT) AS n_frames,
           {y1} AS mean_y1,
           {y2} AS mean_y2,
           {mu} AS mean_u,
           {mv} AS mean_v
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_h264_cabacs(docs: DataFrame, mod: int = 47) -> DataFrame:
    """(doc_id, payload) — one REAL 2-frame CABAC H.264 Annex-B
    stream (minih264_cabac: PPS entropy_coding_mode_flag=1, two IDR
    I_16x16 slices) per selected doc, deterministically derived from
    doc_id:

    - width = 16 * (1 + d % 3), height = 16 * (1 + d % 2)
    - frame 1: per-macroblock-COLUMN flat values (column i):
      y = 97 + (9d + 13i) % 61, u = 97 + (7d + 11i) % 61,
      v = 97 + (5d + 17i) % 61 — inside the QP-0 exact
      reconstruction band, with MB-to-MB spread that drives the
      significance-map / last-flag contexts and the Gt1/Eq1 level
      schedule through distinct coefficient patterns per MB
    - frame 2: luma shifted per column by 2*((d+i) % 4), chroma
      unchanged — a second IDR slice whose CABAC engine and context
      pool restart from scratch, pinning the per-slice init contract.

    CABAC is lossless entropy coding over the same QP-0 transform
    path as the CAVLC arm, so the whole stream reconstructs EXACTLY
    (closed form, :func:`h264_cabac_decode_sql`). A defect anywhere
    in the arithmetic engine — range subdivision, renormalization,
    bypass, terminate, context adaptation, binarization — breaks the
    hash match."""
    from ..functions.minih264_cabac import h264_encode_cabac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mb_w, mb_h = 1 + d % 3, 1 + d % 2
                w, h = 16 * mb_w, 16 * mb_h
                vy = [97 + (9 * d + 13 * i) % 61 for i in range(mb_w)]
                vu = [97 + (7 * d + 11 * i) % 61 for i in range(mb_w)]
                vv = [97 + (5 * d + 17 * i) % 61 for i in range(mb_w)]
                dl = [2 * ((d + i) % 4) for i in range(mb_w)]
                f1 = ([[vy[x // 16] for x in range(w)] for _ in range(h)],
                      [[vu[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)],
                      [[vv[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)])
                f2 = ([[vy[x // 16] + dl[x // 16] for x in range(w)]
                       for _ in range(h)], f1[1], f1[2])
                ids.append(d)
                payloads.append(h264_encode_cabac(w, h, [f1, f2], qp=0))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def h264_cabac_decode_sql(mod: int = 47) -> str:
    """Closed-form oracle for
    h264_video_decode_metadata(synth_h264_cabacs): CABAC entropy
    coding is lossless and the flat-per-MB QP-0 frames reconstruct
    exactly, so each plane mean is the average of its 1..3
    macroblock-column values — a pure function of doc_id."""

    def colavg(term) -> str:
        ts = [term(k) for k in range(3)]
        return (
            f"CASE doc_id % 3 WHEN 0 THEN CAST({ts[0]} AS DOUBLE) "
            f"WHEN 1 THEN ({ts[0]} + {ts[1]}) / 2.0 "
            f"ELSE ({ts[0]} + {ts[1]} + {ts[2]}) / 3.0 END"
        )

    y1 = colavg(lambda k: f"(97 + (9 * doc_id + {13 * k}) % 61)")
    y2 = colavg(lambda k: f"(97 + (9 * doc_id + {13 * k}) % 61"
                          f" + 2 * ((doc_id + {k}) % 4))")
    mu = colavg(lambda k: f"(97 + (7 * doc_id + {11 * k}) % 61)")
    mv = colavg(lambda k: f"(97 + (5 * doc_id + {17 * k}) % 61)")
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 3) AS width,
           16 * (1 + doc_id % 2) AS height,
           CAST(2 AS BIGINT) AS n_frames,
           {y1} AS mean_y1,
           {y2} AS mean_y2,
           {mu} AS mean_u,
           {mv} AS mean_v
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_flacs(docs: DataFrame, mod: int = 53) -> DataFrame:
    """(doc_id, payload) — one REAL FLAC stream (miniflac: fLaC magic,
    STREAMINFO with MD5, fixed-blocksize frames, Rice-coded fixed
    predictors, stereo decorrelation) per selected doc,
    deterministically derived from doc_id:

    - sample_rate = 8000 + 4000*(d % 3) (12000 exercises the
      rate-from-STREAMINFO frame-header path, 8000/16000 the coded one)
    - channels = 1 + (d % 2); n = 512 + 128*(d % 5) per channel
      (multiple 256-sample frames incl. a partial 128 tail)
    - ch0(i) = B + S*i + (+C if i even else -C) with B = 100 + d%50,
      S = 1 + d%3, C = 1 + d%5 — a ramp (zero order-2 residual) plus
      an alternation (order-2 residual ±4C) driving real Rice coding
    - stereo: ch1 = ch0 + O, O = 10 + d%7 — constant side channel, so
      the exact-cost chooser takes a side assignment with a CONSTANT
      side subframe.

    FLAC is lossless (MD5-verified), so peak/min/sum/sum-of-squares
    are integer closed forms in doc_id (:func:`flac_decode_sql`)."""
    from ..functions import miniflac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sr = 8000 + 4000 * (d % 3)
                nch = 1 + (d % 2)
                n = 512 + 128 * (d % 5)
                B, S, C = 100 + d % 50, 1 + d % 3, 1 + d % 5
                O = 10 + d % 7
                ch0 = [B + S * i + (C if i % 2 == 0 else -C)
                       for i in range(n)]
                chans = [ch0] if nch == 1 else [ch0,
                                                [x + O for x in ch0]]
                ids.append(d)
                payloads.append(miniflac.flac_encode(sr, chans))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def flac_decode_metadata(audio: DataFrame) -> DataFrame:
    """REAL FLAC decode of a binary column: (doc_id, sample_rate,
    channels, bits, n_samples, peak, min_sample, sum_samples,
    sum_squares) over the fully decoded (CRC- and MD5-verified)
    sample stream; undecodable payloads yield a null row."""
    from ..functions import miniflac, miniwav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "sample_rate": [], "channels": [],
                "bits": [], "n_samples": [], "peak": [],
                "min_sample": [], "sum_samples": [], "sum_squares": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    sr, nch, bits, chans = miniflac.flac_decode(
                        bytes(payload))
                except miniwav.AudioFormatError:
                    for k in ("sample_rate", "channels", "bits",
                              "n_samples", "peak", "min_sample",
                              "sum_samples", "sum_squares"):
                        out[k].append(None)
                    continue
                flat = [s for c in chans for s in c]
                out["sample_rate"].append(sr)
                out["channels"].append(nch)
                out["bits"].append(bits)
                out["n_samples"].append(len(chans[0]))
                out["peak"].append(max(flat))
                out["min_sample"].append(min(flat))
                out["sum_samples"].append(sum(flat))
                out["sum_squares"].append(sum(s * s for s in flat))
            yield pd.DataFrame(out)

    return audio.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, sample_rate long, channels long, bits long, "
            "n_samples long, peak long, min_sample long, "
            "sum_samples long, sum_squares long"
        ),
    )


def flac_decode_sql(mod: int = 53) -> str:
    """Closed-form oracle for flac_decode_metadata(synth_flacs):
    losslessness makes every output an exact integer function of
    doc_id — ramp+alternation sums via Gauss / square-pyramidal
    formulas, the alternation's even-n cancellation, and the
    cross-term -C*S*n from the parity-weighted ramp sum."""
    n = "(512 + 128 * (doc_id % 5))"
    b = "(100 + doc_id % 50)"
    s = "(1 + doc_id % 3)"
    c = "(1 + doc_id % 5)"
    o = "(10 + doc_id % 7)"
    st = "(doc_id % 2)"  # 1 when stereo
    # per-channel-0 sums (n even: alternation cancels in the plain sum)
    sum0 = f"({n}*{b} + {s}*{n}*({n}-1)/2)"
    sumsq0 = (f"({n}*{b}*{b} + {b}*{s}*{n}*({n}-1)"
              f" + {s}*{s}*({n}-1)*{n}*(2*{n}-1)/6"
              f" - {c}*{s}*{n} + {n}*{c}*{c})")
    peak0 = (f"GREATEST({b} + {s}*({n}-1) - {c},"
             f" {b} + {s}*({n}-2) + {c})")
    min0 = f"LEAST({b} + {c}, {b} + {s} - {c})"
    return f"""
    SELECT doc_id,
           CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(16 AS BIGINT) AS bits,
           CAST({n} AS BIGINT) AS n_samples,
           CAST({peak0} + {st} * {o} AS BIGINT) AS peak,
           CAST({min0} AS BIGINT) AS min_sample,
           CAST((1 + {st}) * {sum0} + {st} * {n} * {o} AS BIGINT)
               AS sum_samples,
           CAST((1 + {st}) * {sumsq0} + {st} * (2 * {o} * {sum0}
               + {n} * {o} * {o}) AS BIGINT) AS sum_squares
    FROM documents WHERE doc_id % {mod} = 0
    """


def mime_sniff_col(payload) -> "F.Column":
    """Magic-byte content-type detection over a binary column — the
    ingest ROUTER a mixed-media crawl runs on every fetched body
    before dispatching to a decoder. Pure JVM expressions (substring
    on binary + literal compares inside one CASE chain, WholeStage-
    Codegen): no Python touches the payload, so at 100 TB the sniff
    pipelines with the scan and the router's exchange is a cheap
    hash-partition on the tiny mime key. RIFF containers are resolved
    by form type (bytes 9-12: WEBP vs WAVE), per the WHATWG MIME
    sniffing algorithm's pattern table."""
    def eq(off, hexs):
        b = bytes.fromhex(hexs)
        return F.substring(payload, off, len(b)) == F.lit(b)

    return (
        F.when(eq(1, "89504E470D0A1A0A"), "image/png")
        .when(eq(1, "FFD8FF"), "image/jpeg")
        .when(eq(1, "474946383761") | eq(1, "474946383961"), "image/gif")
        .when(eq(1, "52494646") & eq(9, "57454250"), "image/webp")
        .when(eq(1, "52494646") & eq(9, "57415645"), "audio/wav")
        .when(eq(1, "664C6143"), "audio/flac")
        .when(eq(1, "00000001"), "video/h264-annexb")
        .otherwise("application/octet-stream")
    )


def synth_h264_cabac_videos(docs: DataFrame, mod: int = 59) -> DataFrame:
    """(doc_id, payload) — one REAL 3-frame CABAC H.264 Annex-B
    stream (minih264_cabac: IDR I_16x16 slice, P slice with
    P_Skip/P_L0 candidates, non-reference B slice over both-past
    reference lists) per selected doc, deterministically derived from
    doc_id:

    - width = 16 * (1 + d % 3), height = 16 * (1 + d % 2)
    - frame 1 (I): per-macroblock-COLUMN flat values (column i):
      y = 96 + (11d + 13i) % 61, u = 96 + (7d + 11i) % 61,
      v = 96 + (5d + 17i) % 61
    - frame 2 (P): luma shifted per column by 3*((d+i) % 3) (chroma
      unchanged) — some MBs P_Skip, the rest P_L0 residual with real
      mb_skip_flag / mvd / coded_block_pattern CABAC coding
    - frame 3 (B): luma shifted per column by 2*((d+2i) % 4) — the
      B mb_type tree, per-list mvd contexts, and bi-prediction
      averaging all under the arithmetic coder.

    Deltas <= 6 < half the minimum inter-column luma step (13) pin
    the full-pel SAD search at MV (0,0) (subpel=False), so every
    residual stays flat and the whole stream reconstructs EXACTLY at
    QP 0 (closed form, :func:`h264_cabac_video_decode_sql`)."""
    from ..functions.minih264_cabac import h264_encode_cabac_video

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mb_w, mb_h = 1 + d % 3, 1 + d % 2
                w, h = 16 * mb_w, 16 * mb_h
                vy = [96 + (11 * d + 13 * i) % 61 for i in range(mb_w)]
                vu = [96 + (7 * d + 11 * i) % 61 for i in range(mb_w)]
                vv = [96 + (5 * d + 17 * i) % 61 for i in range(mb_w)]
                d1 = [3 * ((d + i) % 3) for i in range(mb_w)]
                d2 = [2 * ((d + 2 * i) % 4) for i in range(mb_w)]
                f1 = ([[vy[x // 16] for x in range(w)] for _ in range(h)],
                      [[vu[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)],
                      [[vv[x // 8] for x in range(w // 2)]
                       for _ in range(h // 2)])
                f2 = ([[vy[x // 16] + d1[x // 16] for x in range(w)]
                       for _ in range(h)], f1[1], f1[2])
                f3 = ([[vy[x // 16] + d2[x // 16] for x in range(w)]
                       for _ in range(h)], f1[1], f1[2])
                ids.append(d)
                payloads.append(
                    h264_encode_cabac_video(
                        w, h, [f1, f2, f3], qp=0, subpel=False
                    )[0]
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def h264_cabac_video_decode_sql(mod: int = 59) -> str:
    """Closed-form oracle for
    h264_video_decode_metadata(synth_h264_cabac_videos): CABAC is
    lossless entropy coding and the flat-per-MB QP-0 frames
    reconstruct exactly through the I, P, AND B paths, so each plane
    mean is the average of its 1..3 macroblock-column values — a pure
    function of doc_id."""

    def colavg(term) -> str:
        ts = [term(k) for k in range(3)]
        return (
            f"CASE doc_id % 3 WHEN 0 THEN CAST({ts[0]} AS DOUBLE) "
            f"WHEN 1 THEN ({ts[0]} + {ts[1]}) / 2.0 "
            f"ELSE ({ts[0]} + {ts[1]} + {ts[2]}) / 3.0 END"
        )

    y1 = colavg(lambda k: f"(96 + (11 * doc_id + {13 * k}) % 61)")
    y3 = colavg(lambda k: f"(96 + (11 * doc_id + {13 * k}) % 61"
                          f" + 2 * ((doc_id + {2 * k}) % 4))")
    mu = colavg(lambda k: f"(96 + (7 * doc_id + {11 * k}) % 61)")
    mv = colavg(lambda k: f"(96 + (5 * doc_id + {17 * k}) % 61)")
    return f"""
    SELECT doc_id,
           16 * (1 + doc_id % 3) AS width,
           16 * (1 + doc_id % 2) AS height,
           CAST(3 AS BIGINT) AS n_frames,
           {y1} AS mean_y1,
           {y3} AS mean_y2,
           {mu} AS mean_u,
           {mv} AS mean_v
    FROM documents WHERE doc_id % {mod} = 0
    """


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup (the LAION-style image dedup pass)
# ---------------------------------------------------------------------------


def synth_neardup_images(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — one REAL 8x8 greyscale PNG per selected doc
    (doc_id % mod == 0) with a PLANTED near-duplicate structure:

    - v    = (doc_id // mod) % 2          (0 = base image, 1 = variant)
    - base = doc_id - mod*v, dl = base & 0xFFFFF  (20-bit id window)
    - H    = ((1<<62) | (dl<<40) | (dl<<20) | dl) ^ v

    Pixel i (row-major) is 200 where bit (63-i) of H is set, else 40,
    so :func:`miniimg.ahash` of the decoded image reconstructs H
    EXACTLY: popcount(H) is in [1, 61] (bit 62 is always set, at most
    3*20+1 bits ever set), hence mean lies strictly between the two
    tones and the ``>= mean`` threshold maps 200->1 / 40->0 bit for
    bit.  Hamming structure (the three dl copies occupy disjoint bit
    ranges 0-19 / 20-39 / 40-59): base-vs-base = 3*popcount(dl^dl'),
    variant-vs-foreign-base = 3*popcount + 1 >= 4, variant-vs-variant
    = 3*popcount >= 3 — so at hamming <= 2 the ONLY surviving pairs
    are the planted (base, base+mod) pairs at hamming exactly 1.  The
    variant's flipped low bit is a genuinely different pixel, so the
    pair survives a REAL encode->decode->fingerprint round trip, not
    an arithmetic shortcut."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                v = (d // mod) % 2
                dl = (d - mod * v) & 0xFFFFF
                h = ((1 << 62) | (dl << 40) | (dl << 20) | dl) ^ v
                rows = []
                for y in range(8):
                    rows.append(bytes(
                        200 if (h >> (63 - (8 * y + x))) & 1 else 40
                        for x in range(8)
                    ))
                ids.append(d)
                payloads.append(miniimg.png_encode(8, 8, "L", rows))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def image_neardup_pairs(
    fingerprints: DataFrame, max_hamming: int = 2, bands: int = 4
) -> DataFrame:
    """Near-duplicate image pairs from 64-bit perceptual hashes
    (doc_id, ahash) via pigeonhole banding — the image sibling of
    simhash_dup_pairs (textdedup.py): split the hash into ``bands``
    16-bit chunks; any pair within hamming <= bands-1 shares at least
    one identical chunk, so the banded equi-join has EXACT recall for
    ``max_hamming <= bands - 1`` while never going all-pairs.  The
    slim (doc_id, ahash) relation is persisted so the self-join does
    not re-run the image decode; exact hamming verification touches
    candidates only.  At 100 TB this is the LAION-scale image dedup
    shape: decode+fingerprint is one shuffle-free Arrow pass, the
    join keys are 16-bit buckets."""
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole recall needs max_hamming <= bands-1")
    width = 64 // bands
    mask = (1 << width) - 1
    fps = fingerprints.select("doc_id", "ahash").persist()
    chunks = F.array(*[
        F.shiftrightunsigned(F.col("ahash"), width * k).bitwiseAND(
            F.lit(mask)
        )
        for k in range(bands)
    ])
    sig = fps.select(
        "doc_id", "ahash", F.posexplode(chunks).alias("band", "chunk")
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_neardup_sql(mod: int = 3, max_hamming: int = 2) -> str:
    """Closed-form oracle for image_neardup_pairs over
    synth_neardup_images: reconstructs each selected doc's aHash H
    from doc_id (see synth_neardup_images — the decode is exact by
    construction) and brute-forces all pairs with
    bit_count(xor) <= max_hamming; at gate scale the O(n^2) oracle is
    cheap, while the engine side must go through the REAL
    encode -> PNG decode -> fingerprint -> banded join path."""
    dl = f"((doc_id - {mod} * ((doc_id // {mod}) % 2)) & 1048575)"
    return f"""
    WITH imgs AS (
      SELECT doc_id,
             xor(((CAST(1 AS BIGINT) << 62)
                  | ({dl} << 40) | ({dl} << 20) | {dl}),
                 (doc_id // {mod}) % 2) AS h
      FROM documents WHERE doc_id % {mod} = 0)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM imgs a JOIN imgs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


def synth_exif_blobs(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — one TIFF/EXIF blob per selected doc
    (doc_id % mod == 0), fields deterministic in doc_id (closed forms
    the SQL oracle recomputes); byte order alternates II/MM by doc_id
    parity so BOTH endian paths carry corpus. Encoded through
    functions/miniexif.write_tiff (entries in spec-required ascending
    tag order, ASCII out-of-line when > 4 bytes, RATIONAL always
    out-of-line)."""
    from ..functions import miniexif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                fields = {
                    270: f"doc{d}",
                    271: f"cam{d % 5}",
                    272: f"m{d % 3}",
                    274: d % 8 + 1,
                    282: (72 + d % 4, 1),
                    306: "2021:%02d:%02d 12:00:00" % (d % 12 + 1, d % 28 + 1),
                }
                ids.append(d)
                payloads.append(
                    miniexif.write_tiff(fields, big_endian=d % 2 == 1)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def exif_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) TIFF blobs -> extracted metadata through the
    OWN IFD walk (functions/miniexif.read_tiff): the pre-decode pass
    that reads KBs per blob (orientation for resize, capture time for
    provenance, make/model for stratified sampling). One Arrow-batched
    map stage, no shuffle."""
    from ..functions import miniexif

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniexif.read_tiff(bytes(blob))
                rows.append(
                    (
                        int(d),
                        "MM" if bytes(blob)[:2] == b"MM" else "II",
                        m["make"],
                        m["model"],
                        int(m["orientation"]),
                        m["datetime"],
                        int(m["x_resolution"][0]),
                        int(m["x_resolution"][1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "endian", "make", "model",
                    "orientation", "datetime", "xres_num", "xres_den",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, endian string, make string, model string, "
            "orientation int, datetime string, xres_num long, xres_den long"
        ),
    )


def synth_mp4_blobs(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — one ISO-BMFF container per selected doc
    (doc_id % mod == 0), fields deterministic in doc_id (closed forms
    the SQL oracle recomputes). Version (mvhd/tkhd 32- vs 64-bit
    fields) alternates by doc_id parity and every third selected doc
    uses the size==1 largesize mdat, so all spec branches carry
    corpus. Encoded through functions/minimp4.write_mp4."""
    from ..functions import minimp4

    handlers = ["vide", "soun", "text"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_tracks = 1 + (d % 9) // 3
                ts = 600 * (1 + d % 4)
                w = 320 + (d % 4) * 160
                h = 240 + (d % 4) * 120
                ids.append(d)
                payloads.append(
                    minimp4.write_mp4(
                        timescale=ts,
                        duration=ts * (d % 30 + 1),
                        tracks=[(handlers[i], w, h) for i in range(n_tracks)],
                        version=d % 2,
                        largesize_mdat=d % 9 == 0,
                        payload=b"x" * (d % 7),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def mp4_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) MP4 blobs -> container metadata through the
    OWN box walk (functions/minimp4.parse_mp4): brand, movie
    timescale/duration, track handler list, first video track
    dimensions. One Arrow-batched map stage, no shuffle, mdat payload
    bytes never touched."""
    from ..functions import minimp4

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minimp4.parse_mp4(bytes(blob))
                rows.append(
                    (
                        int(d),
                        m["brand"],
                        int(m["mvhd_version"]),
                        int(m["timescale"]),
                        int(m["duration"]),
                        len(m["handlers"]),
                        ",".join(m["handlers"]),
                        int(m["width"]),
                        int(m["height"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "brand", "mvhd_version", "timescale",
                    "duration", "n_tracks", "handlers", "width", "height",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, brand string, mvhd_version int, timescale long, "
            "duration long, n_tracks int, handlers string, "
            "width int, height int"
        ),
    )


def synth_mp3_blobs(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — one ID3v2.3-tagged CBR MPEG-1 Layer III
    stream per selected doc (doc_id % mod == 1), fields deterministic
    in doc_id. The ID3 pad pushes tag size past 127 so the SYNCHSAFE
    multi-byte rule is load-bearing; the padding bit alternates per
    audio frame so the 144*br/sr+pad length rule is too."""
    from ..functions import minimp3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                payloads.append(
                    minimp3.write_mp3(
                        frames={
                            "TIT2": f"t{d % 7}",
                            "TPE1": f"a{d % 5}",
                        },
                        bitrate_idx=1 + d % 14,
                        sr_idx=(d // 3) % 3,
                        n_frames=3 + d % 5,
                        id3_pad=120 + d % 9,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 1")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def mp3_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) MP3 blobs -> stream metadata through the OWN
    ID3v2 + frame-header walk (functions/minimp3.parse_mp3). One
    Arrow-batched map stage, no shuffle, no entropy decode."""
    from ..functions import minimp3

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minimp3.parse_mp3(bytes(blob))
                rows.append(
                    (
                        int(d), m["title"], m["artist"],
                        int(m["bitrate_kbps"]), int(m["sample_rate"]),
                        int(m["n_frames"]), int(m["duration_ms"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "title", "artist", "bitrate_kbps",
                    "sample_rate", "n_frames", "duration_ms",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, title string, artist string, bitrate_kbps int, "
            "sample_rate int, n_frames int, duration_ms long"
        ),
    )


def synth_ogg_blobs(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — one Ogg Vorbis container per selected doc
    (doc_id % mod == 2), fields deterministic in doc_id. Data packets
    are always >= 255 bytes so every page exercises multi-segment
    lacing (255-run rule), and the first data page carries TWO
    packets so multi-packet pages are load-bearing too."""
    from ..functions import miniogg

    rates = [8000, 22050, 44100]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_data = 2 + d % 3
                packets = [
                    bytes(
                        (d + j * 7 + k) % 251
                        for k in range(255 + (d * 31 + j * 17) % 200)
                    )
                    for j in range(n_data)
                ]
                ids.append(d)
                payloads.append(
                    miniogg.write_ogg_vorbis(
                        serial=d * 97 + 1,
                        channels=1 + d % 2,
                        rate=rates[d % 3],
                        data_packets=packets,
                        granule_per_page=1024 * (1 + d % 4),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 2")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def ogg_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) Ogg blobs -> container metadata through the
    OWN page walk (functions/miniogg.parse_ogg) with per-page CRC
    VERIFY. One Arrow-batched map stage, no shuffle."""
    from ..functions import miniogg

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniogg.parse_ogg(bytes(blob))
                rows.append(
                    (
                        int(d), int(m["serial"]), int(m["channels"]),
                        int(m["rate"]), int(m["n_pages"]),
                        int(m["n_packets"]), int(m["last_granule"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "serial", "channels", "rate",
                    "n_pages", "n_packets", "last_granule",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, serial long, channels int, rate int, "
            "n_pages int, n_packets int, last_granule long"
        ),
    )


def synth_cert_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — one DER X.509 certificate per doc, fields
    deterministic in doc_id. Serials rotate through values whose
    leading magnitude byte has the top bit both set and clear (the
    X.690 §8.3.2 0x00 sign-pad rule is load-bearing), and key_fill
    varies the SPKI size so long-form lengths appear at many sizes."""
    from ..functions import minix509

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                month = "%02d" % (d % 12 + 1)
                ids.append(d)
                payloads.append(
                    minix509.write_cert(
                        serial=d * 1009 + 100,
                        issuer_cn=f"ca{d % 4}",
                        subject_cn=f"host{d}",
                        not_before=f"21{month}01000000Z",
                        not_after=f"22{month}01000000Z",
                        is_ca=d % 5 == 0,
                        key_fill=d % 60,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def cert_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) DER blobs -> certificate identity/validity
    through the OWN ASN.1 walk (functions/minix509.parse_cert). One
    Arrow-batched map stage, no shuffle, no crypto."""
    from ..functions import minix509

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minix509.parse_cert(bytes(blob))
                rows.append(
                    (
                        int(d), int(m["version"]), int(m["serial"]),
                        m["issuer_cn"], m["subject_cn"],
                        m["not_before"], m["not_after"], bool(m["is_ca"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "version", "serial", "issuer_cn",
                    "subject_cn", "not_before", "not_after", "is_ca",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, version int, serial long, issuer_cn string, "
            "subject_cn string, not_before string, not_after string, "
            "is_ca boolean"
        ),
    )


def synth_ico_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — one favicon.ico per doc with 1 + doc%3
    entries; payload kind alternates PNG/BMP by (doc+entry) parity
    and sizes rotate through 16/32/48/256 so the 0-means-256
    directory rule carries corpus."""
    from ..functions import minico

    sizes = [16, 32, 48, 256]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                entries = [
                    (
                        sizes[(d + j) % 4],
                        sizes[(d + j) % 4],
                        "png" if (d + j) % 2 == 0 else "bmp",
                    )
                    for j in range(1 + d % 3)
                ]
                ids.append(d)
                payloads.append(minico.write_ico(entries))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def ico_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) ICO blobs -> one row per directory entry
    through the OWN container walk (functions/minico.parse_ico),
    which also CROSS-CHECKS declared vs embedded dimensions. 1->many
    Arrow-batched map stage, no shuffle."""
    from ..functions import minico

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                for j, e in enumerate(minico.parse_ico(bytes(blob))):
                    rows.append(
                        (
                            int(d), j, e["width"], e["height"],
                            e["kind"], e["bytes"], e["bitcount"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "entry", "width", "height",
                    "kind", "nbytes", "bitcount",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, entry int, width int, height int, "
            "kind string, nbytes int, bitcount int"
        ),
    )


# ---------------------------------------------------------------------------
# WebM / Matroska (EBML) metadata — RFC 9559; the one major web
# container the family (MP4/MP3/Ogg/FLAC/WAV/ICO/...) lacked.
# ---------------------------------------------------------------------------


def synth_webm_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — metadata-only WebM per doc via the OWN
    EBML encoder (functions/miniebml).  Odd docs use an UNKNOWN-SIZE
    Segment (the streaming form — children parse to EOF); d%4==0
    docs store floats wide (8-byte) so both float widths carry
    corpus; d%3==0 docs add an Opus audio track."""

    from ..functions import miniebml

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                audio = None
                if d % 3 == 0:
                    audio = ("A_OPUS", 1 + d % 2, 48000.0)
                payloads.append(
                    miniebml.build_webm(
                        duration_ms=(10 + d % 50) * 1000.0,
                        video=(
                            "V_VP9" if d % 2 == 0 else "V_VP8",
                            320 + (d % 8) * 80,
                            240 + (d % 8) * 60,
                        ),
                        audio=audio,
                        unknown_size_segment=d % 2 == 1,
                        wide_floats=d % 4 == 0,
                    )
                )
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def webm_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) -> stream metadata through the OWN EBML
    walk: doctype, timestamp scale, duration (ms), per-kind track
    fields ('-'/0 sentinels when absent). One Arrow map stage."""

    from ..functions import miniebml

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniebml.parse(bytes(blob))
                video = next(
                    (t for t in m["tracks"] if t["type"] == 1), None
                )
                audio = next(
                    (t for t in m["tracks"] if t["type"] == 2), None
                )
                rows.append(
                    (
                        int(d),
                        m["doctype"],
                        int(m["timestamp_scale"]),
                        float(m["duration"]),
                        len(m["tracks"]),
                        video["codec"] if video else "-",
                        int(video["width"]) if video else 0,
                        int(video["height"]) if video else 0,
                        audio["codec"] if audio else "-",
                        int(audio["channels"]) if audio else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "doctype", "ts_scale", "duration_ms",
                    "n_tracks", "v_codec", "width", "height",
                    "a_codec", "channels",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, doctype string, ts_scale bigint, "
            "duration_ms double, n_tracks int, v_codec string, "
            "width int, height int, a_codec string, channels int"
        ),
    )


# ---------------------------------------------------------------------------
# WOFF 1.0 web-font container (W3C) — fonts are a top non-image
# byte class in a crawl; inventory without a font engine.
# ---------------------------------------------------------------------------


def synth_woff_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — a 3-table WOFF per doc via the OWN
    builder: a compressible cmap + name (zlib really applied) and a
    high-entropy glyf stored RAW (the never-expand rule is live on
    every doc)."""

    from ..functions import miniwoff

    def _xs_bytes(seed: int, n: int) -> bytes:
        x = (seed * 2654435761 + 1) % (1 << 32) or 1
        out = bytearray()
        for _ in range(n):
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            out.append(x & 0xFF)
        return bytes(out)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                tables = [
                    (b"cmap", (f"map{d % 9}-" * 20).encode()),
                    (b"glyf", _xs_bytes(d, 40 + d % 20)),
                    (b"name", (f"Font Family {d % 50} " * 6).encode()),
                ]
                flavor = (
                    miniwoff.FLAVOR_TTF if d % 2 == 0
                    else miniwoff.FLAVOR_CFF
                )
                ids.append(d)
                payloads.append(miniwoff.build_woff(tables, flavor))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def woff_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload) -> verified font inventory (checksums and
    totalSfntSize recomputed during the walk). One Arrow map
    stage."""

    from ..functions import miniwoff

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniwoff.read_woff(bytes(blob))
                rows.append(
                    (
                        int(d),
                        m["flavor"],
                        int(m["n_tables"]),
                        sum(1 for t in m["tables"] if t["compressed"]),
                        ";".join(t["tag"] for t in m["tables"]),
                        sum(t["orig_len"] for t in m["tables"]),
                        int(m["sfnt_size"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "flavor", "n_tables", "n_compressed",
                    "tags", "orig_total", "sfnt_size",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, flavor string, n_tables int, "
            "n_compressed int, tags string, orig_total bigint, "
            "sfnt_size bigint"
        ),
    )
