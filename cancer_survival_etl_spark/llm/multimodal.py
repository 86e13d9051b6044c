"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` — each Python batch
sees a pandas DataFrame of payloads, so the Spark-side contract
(schema, batching, partitioning) is identical whether the inner function
is a real codec or the deterministic fake used here.

The COMPRESSED codecs (PIL/ffmpeg/librosa) are NOT in this environment,
so the image decode kernel is stubbed: ``decode_features(...,
real_decode=True)`` raises NotImplementedError and the default fake
derives deterministic features from the bytes so tests pin the
plumbing end-to-end. What needs no codec is REAL here: container-header
parsing (PNG/JPEG/GIF/BMP, WAV, MP4) full PCM waveform decode
(``audio_pcm_features`` — samples, not just headers — oracle-checked
against the generating formula and the stdlib ``wave`` writer), and
full 24-bit BMP pixel decode (``image_pixel_features`` — padded
bottom-up BGR rows to exact channel sums, formula-oracle-checked).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "item_id long, media_type string, n_bytes long, checksum long, "
    "width int, height int, feature array<double>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a multimodal table: (item_id, media_type, payload binary,
    meta struct). Payload here is utf-8 bytes of the text — stand-in for
    image/audio bytes with identical plumbing."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decode: checksum + fake
    dimensions + an 8-dim 'feature vector' from rolling crc windows."""
    checksum = zlib.crc32(payload)
    width = 16 + checksum % 64
    height = 16 + (checksum >> 8) % 64
    step = max(len(payload) // 8, 1)
    feature = [
        float(zlib.crc32(payload[i * step : (i + 1) * step + 1]) % 1000) / 1000.0
        for i in range(8)
    ]
    return checksum, width, height, feature


def decode_features(
    df: DataFrame, real_decode: bool = False, batch_note: str = "decode"
) -> DataFrame:
    """Arrow-batched decode/feature-extraction over binary payloads.

    ``mapInPandas``: executors stream column batches through Python — no
    row-at-a-time pickling, no driver collection. Decode parallelism is
    the partition count, so narrow inputs are fanned out first (the
    Python kernel, not the scan, is the cost at scale).
    """
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    df = fan_out(df)
    if real_decode:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this environment (PIL/ffmpeg); use real_decode=False for "
            "the deterministic fake"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "feature": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling' shape for video-like payloads: explode each binary
    into per-frame rows (here: byte-window digests). Demonstrates the
    1→N expansion pattern (explode after a batched UDF) that a real
    frame extractor uses."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                for f, off in enumerate(range(0, len(payload), every_n_bytes)):
                    window = payload[off : off + every_n_bytes]
                    rows.append(
                        (int(item_id), f, int(zlib.crc32(window)), len(window))
                    )
            yield pd.DataFrame(
                rows, columns=["item_id", "frame_no", "frame_crc", "frame_bytes"]
            )

    return df.mapInPandas(
        sample, schema="item_id long, frame_no int, frame_crc long, frame_bytes int"
    )


def resize_payload(
    df: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    real_resize: bool = False,
) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads — same contract shape
    as ``decode_features``: the Spark-side plumbing (schema, batching,
    fan-out) is real; the pixel kernel is the deterministic fake
    (payload scaled to a byte budget proportional to the target area,
    re-digested), since no codec library exists in this environment.
    ``real_resize=True`` marks where a PIL/ffmpeg kernel drops in.
    """
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    df = fan_out(df)
    if real_resize:
        raise NotImplementedError(
            "real resize requires codec libraries not present in this "
            "environment (PIL/ffmpeg); use real_resize=False for the "
            "deterministic fake"
        )
    budget = max(target_width * target_height // 8, 1)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                scaled = payload[:budget]
                out.append(
                    (
                        int(item_id),
                        target_width,
                        target_height,
                        len(scaled),
                        int(zlib.crc32(scaled)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "width", "height", "n_bytes", "checksum",
                ],
            )

    return df.mapInPandas(
        resize_batches,
        schema="item_id long, width int, height int, n_bytes long, checksum long",
    )


def media_near_dups(
    decoded: DataFrame,
    id_col: str = "item_id",
    feature_col: str = "feature",
    threshold: float = 0.9,
) -> DataFrame:
    """Perceptual near-duplicate detection over decoded media features
    (the image/audio analog of text near-dup): cosine similarity of the
    feature vectors, reusing the embedding dedup machinery — same
    normalize-once, same blocked-join shape, same round-before-filter
    determinism. With a real decoder the feature is CLIP/pHash-style;
    here it is the deterministic fake, so the PIPELINE is real and
    tested while the kernel stays stubbed.
    """
    from cancer_survival_etl_spark.llm.dedup import embedding_cosine_pairs

    vecs = decoded.select(
        F.col(id_col).alias("vec_id"),
        F.col(feature_col).alias("embedding"),
    )
    return embedding_cosine_pairs(vecs, "embedding", "vec_id", threshold=threshold)


def _parse_image_header(payload) -> tuple:
    """REAL (stdlib-only) container-header parse for PNG / GIF / JPEG:
    format + pixel dimensions from the raw bytes — no codec library
    involved, so unlike the pixel-decode path this is not stubbed.
    Returns (format, width, height) or (None, None, None)."""
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return "gif", w, h
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOF
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seglen
    return None, None, None


HEADER_SCHEMA = (
    "item_id long, format string, width int, height int, n_bytes long"
)


def image_header_info(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-header metadata extraction over binary payloads —
    the REAL half of the multimodal story (header fields need no codec
    library): Arrow-batched ``mapInPandas``, executors stream binary
    column batches through the stdlib parser; parallelism = partition
    count (fan_out first for narrow inputs).

    Scale note: header parsing touches the first KB of each payload —
    with a columnar lake format the payload column's pages stream
    through, but a production variant should store header fields as
    separate columns at ingest so this query never reads the blobs at
    all; this operator IS that ingest step.
    """
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    df = fan_out(df)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ns = [], [], [], []
            for payload in pdf[payload_col]:
                f, w, h = _parse_image_header(payload)
                fmts.append(f)
                ws.append(w)
                hs.append(h)
                ns.append(len(payload))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": ns,
                }
            )

    return df.mapInPandas(parse, schema=HEADER_SCHEMA)


AUDIO_SCHEMA = (
    "item_id long, format string, channels int, sample_rate int, "
    "bits_per_sample int, n_frames long, duration_ms double, n_bytes long"
)


def _parse_wav_header(payload) -> tuple:
    """REAL (stdlib-only) WAV/RIFF header parse: channels, sample rate,
    bit depth, frame count from the fmt/data chunks. Returns the
    AUDIO_SCHEMA value tuple minus item_id/n_bytes, or Nones."""
    b = bytes(payload)
    none = (None, None, None, None, None, None)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return none
    i, channels, rate, bits, data_len = 12, None, None, None, None
    while i + 8 <= len(b):
        ck, ln = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
        if ck == b"fmt " and i + 8 + 16 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif ck == b"data":
            data_len = ln
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
    if channels is None or rate is None or not rate:
        return none
    frames = (
        data_len // (channels * max(bits // 8, 1))
        if data_len is not None and channels
        else None
    )
    dur = round(frames / rate * 1000.0, 6) if frames is not None else None
    return "wav", channels, rate, bits, frames, dur


def audio_header_info(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAV container-header metadata over binary payloads — the audio
    sibling of :func:`image_header_info` and, like it, REAL stdlib
    code (RIFF chunk walk), not a stubbed decode. Same mapInPandas
    batch shape; same at-scale note: persist these fields at ingest so
    metadata queries never touch the blobs."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    df = fan_out(df)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_wav_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": [r[0] for r in rows],
                    "channels": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [r[2] for r in rows], dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        [r[3] for r in rows], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [r[4] for r in rows], dtype="Int64"
                    ),
                    "duration_ms": [r[5] for r in rows],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                }
            )

    return df.mapInPandas(parse, schema=AUDIO_SCHEMA)


VIDEO_SCHEMA = (
    "item_id long, format string, timescale int, duration_units long, "
    "duration_ms double, n_bytes long"
)


def _parse_mp4_header(payload) -> tuple:
    """REAL (stdlib-only) ISO-BMFF/MP4 box walk: movie timescale and
    duration from moov/mvhd (version 0 and 1). Returns
    (format, timescale, duration_units, duration_ms) or Nones."""
    b = bytes(payload)
    none = (None, None, None, None)

    def boxes(lo, hi):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i : i + 4], "big")
            btype = b[i + 4 : i + 8]
            body = i + 8
            if size == 1 and i + 16 <= hi:  # 64-bit largesize
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                body = i + 16
            if size < 8 or i + size > hi:
                return
            yield btype, body, i + size
            i += size

    if len(b) < 12 or b[4:8] != b"ftyp":
        return none
    for btype, body, end in boxes(0, len(b)):
        if btype != b"moov":
            continue
        for ityp, ibody, _iend in boxes(body, end):
            if ityp != b"mvhd":
                continue
            version = b[ibody]
            if version == 1 and ibody + 32 <= end:
                ts = int.from_bytes(b[ibody + 20 : ibody + 24], "big")
                dur = int.from_bytes(b[ibody + 24 : ibody + 32], "big")
            elif version == 0 and ibody + 20 <= end:
                ts = int.from_bytes(b[ibody + 12 : ibody + 16], "big")
                dur = int.from_bytes(b[ibody + 16 : ibody + 20], "big")
            else:
                return none
            if not ts:
                return none
            return "mp4", ts, dur, round(dur / ts * 1000.0, 6)
    return none


def video_header_info(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """MP4 container-header metadata over binary payloads — the video
    sibling of :func:`image_header_info` / :func:`audio_header_info`,
    also REAL stdlib code (ISO-BMFF box walk, public spec ISO 14496-12)
    rather than a stubbed decode. Frame-level work (sampling, pixel
    decode) stays behind the stubbed kernels; container metadata does
    not need a codec."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    df = fan_out(df)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_mp4_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": [r[0] for r in rows],
                    "timescale": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "duration_units": pd.array(
                        [r[2] for r in rows], dtype="Int64"
                    ),
                    "duration_ms": [r[3] for r in rows],
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                }
            )

    return df.mapInPandas(parse, schema=VIDEO_SCHEMA)


def _decode_pcm(payload) -> tuple:
    """REAL PCM sample decode, stdlib+numpy only (uncompressed PCM is
    codec-free — this is an actual decode, not the deterministic
    fake): RIFF-walk to fmt/data, then int16-LE or uint8 samples.
    Returns (fmt, n_samples, peak, sum_sq, zero_crossings) with EXACT
    integer features: peak = max |signed sample|, sum_sq = Σ s², and
    zero crossings counted between the (≥0) and (<0) classes —
    integer arithmetic end-to-end so an oracle can state the numbers
    from the generating formula. Unsigned 8-bit samples center at
    128 per the WAV spec. Malformed payloads yield NULL fields."""
    import numpy as np

    b = bytes(payload) if payload is not None else b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (None, None, None, None, None)
    pos, bits, data, ftag = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        clen = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            ftag = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    # wFormatTag must be 1 (integer PCM): IEEE-float (3) / ADPCM etc.
    # payloads share the 8/16 bits-per-sample values but are NOT
    # integer samples — misdecoding them silently would violate the
    # malformed/non-PCM NULL contract (ADVICE r3)
    if ftag != 1 or bits not in (8, 16) or data is None:
        return (None, None, None, None, None)
    if bits == 16:
        s = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            "int64"
        )
        fmt = "pcm_s16le"
    else:
        s = np.frombuffer(data, dtype=np.uint8).astype("int64") - 128
        fmt = "pcm_u8"
    neg = s < 0
    zc = int((neg[1:] != neg[:-1]).sum()) if len(s) > 1 else 0
    return (
        fmt,
        int(len(s)),
        int(np.abs(s).max()) if len(s) else 0,
        int((s * s).sum()),
        zc,
    )


def audio_pcm_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Exact PCM waveform features over binary WAV payloads — the
    audio analog of ``image_header_info`` but one level deeper: the
    SAMPLES are decoded, not just the container. Arrow-batched
    ``mapInPandas``, one narrow pass, no shuffle; features are exact
    integers (see ``_decode_pcm``) so the whole decode path is
    hash-adjudicable. Returns (id, sample_fmt, n_samples, peak,
    sum_sq, zero_crossings)."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    schema = (
        f"{id_col} long, sample_fmt string, n_samples long, peak long, "
        "sum_sq long, zero_crossings long"
    )
    narrowed = fan_out(df).select(id_col, payload_col)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_pcm(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sample_fmt": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "peak": [r[2] for r in rows],
                    "sum_sq": [r[3] for r in rows],
                    "zero_crossings": [r[4] for r in rows],
                }
            )

    return narrowed.mapInPandas(parse, schema)


def _decode_bmp(payload) -> tuple:
    """REAL image pixel decode for uncompressed 24-bit BMP (stdlib +
    numpy — the one mainstream image container that needs no codec):
    parse BITMAPFILEHEADER/BITMAPINFOHEADER, read the bottom-up,
    4-byte-padded BGR rows, and report EXACT integer channel sums so
    an oracle can state them from the generating formula. Returns
    (width, height, sum_r, sum_g, sum_b); anything that is not a
    plain 24-bit uncompressed BMP yields NULLs."""
    import numpy as np

    b = bytes(payload) if payload is not None else b""
    if len(b) < 54 or b[:2] != b"BM":
        return (None, None, None, None, None)
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return (None, None, None, None, None)
    rows = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    need = off + stride * rows
    if len(b) < need:
        return (None, None, None, None, None)
    raw = np.frombuffer(b[off:need], dtype=np.uint8).reshape(
        rows, stride
    )[:, : w * 3].reshape(rows, w, 3)
    # rows are stored bottom-up when h > 0 — sums are row-order
    # invariant, so no flip is needed for these features
    sums = raw.astype("int64").sum(axis=(0, 1))  # B, G, R order
    return (w, rows, int(sums[2]), int(sums[1]), int(sums[0]))


def image_pixel_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Exact pixel-level features over 24-bit BMP payloads — the image
    analog of ``audio_pcm_features``: real bytes-to-pixels decode, not
    header metadata and not the deterministic fake. Arrow-batched
    ``mapInPandas``, one narrow pass, no shuffle. Returns (id, width,
    height, sum_r, sum_g, sum_b) as exact integers."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    schema = (
        f"{id_col} long, width long, height long, sum_r long, "
        "sum_g long, sum_b long"
    )
    narrowed = fan_out(df).select(id_col, payload_col)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_bmp(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "sum_r": [r[2] for r in rows],
                    "sum_g": [r[3] for r in rows],
                    "sum_b": [r[4] for r in rows],
                }
            )

    return narrowed.mapInPandas(parse, schema)


def _decode_ppm(payload) -> tuple:
    """REAL image pixel decode for binary PPM (P6) — the simplest
    mainstream raster container: an ASCII header (magic, width,
    height, maxval, '#' comments allowed) followed by top-down,
    unpadded RGB triples. Returns (width, height, maxval, sum_r,
    sum_g, sum_b) as exact integers; anything that is not a plain
    8-bit P6 yields NULLs."""
    import numpy as np

    b = bytes(payload) if payload is not None else b""
    if len(b) < 2 or b[:2] != b"P6":
        return (None, None, None, None, None, None)
    # header tokenizer: whitespace-separated ints, '#..\n' comments
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(b):
        c = b[pos:pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                return (None, None, None, None, None, None)
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(b) and b[end:end + 1].isdigit():
                end += 1
            vals.append(int(b[pos:end]))
            pos = end
        else:
            return (None, None, None, None, None, None)
    if len(vals) < 3 or pos >= len(b) or b[pos:pos + 1] not in b" \t\r\n":
        return (None, None, None, None, None, None)
    pos += 1  # exactly one whitespace byte after maxval per the spec
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        return (None, None, None, None, None, None)
    need = w * h * 3
    if len(b) - pos < need:
        return (None, None, None, None, None, None)
    raw = np.frombuffer(b[pos:pos + need], dtype=np.uint8).reshape(
        h, w, 3
    )
    sums = raw.astype("int64").sum(axis=(0, 1))  # R, G, B order
    return (w, h, maxval, int(sums[0]), int(sums[1]), int(sums[2]))


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    code width grows at table-size powers of two, 12-bit cap). Returns
    the pixel index list, or None on any malformed stream. A real
    decompressor — ~the one algorithm every GIF reader ships."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > n_pixels:
            return None
    return list(out) if len(out) == n_pixels else None


def _decode_gif(payload) -> tuple:
    """REAL GIF decode — LZW decompression of the first image's index
    stream plus the global color table, no codec library: parse the
    GIF87a/89a header, skip extensions, inflate the image block with
    ``_gif_lzw_decode``, and sum palette channels over the pixels.
    Returns (width, height, n_colors, sum_r, sum_g, sum_b) as exact
    integers; local color tables / interlace / truncated streams
    yield NULLs."""
    b = bytes(payload) if payload is not None else b""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return (None, None, None, None, None, None)
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    flags = b[10]
    if not flags & 0x80:
        return (None, None, None, None, None, None)
    n_colors = 2 << (flags & 7)
    pos = 13
    if len(b) < pos + 3 * n_colors:
        return (None, None, None, None, None, None)
    palette = b[pos:pos + 3 * n_colors]
    pos += 3 * n_colors
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if len(b) < pos + 10:
                return (None, None, None, None, None, None)
            iw = int.from_bytes(b[pos + 5:pos + 7], "little")
            ih = int.from_bytes(b[pos + 7:pos + 9], "little")
            iflags = b[pos + 9]
            if iflags & 0xC0:  # local table / interlace unsupported
                return (None, None, None, None, None, None)
            pos += 10
            if pos >= len(b):
                return (None, None, None, None, None, None)
            mcs = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            if not (2 <= mcs <= 8):
                return (None, None, None, None, None, None)
            idx = _gif_lzw_decode(bytes(data), mcs, iw * ih)
            if idx is None or any(i >= n_colors for i in idx):
                return (None, None, None, None, None, None)
            sr = sum(palette[3 * i] for i in idx)
            sg = sum(palette[3 * i + 1] for i in idx)
            sb = sum(palette[3 * i + 2] for i in idx)
            return (w, h, n_colors, sr, sg, sb)
        elif block == 0x3B:
            break
        else:
            return (None, None, None, None, None, None)
    return (None, None, None, None, None, None)


def image_ppm_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Exact pixel features over binary-PPM (P6) payloads — same
    Arrow-batched one-pass shape as ``image_pixel_features``. Returns
    (id, width, height, maxval, sum_r, sum_g, sum_b)."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    schema = (
        f"{id_col} long, width long, height long, maxval long, "
        "sum_r long, sum_g long, sum_b long"
    )
    narrowed = fan_out(df).select(id_col, payload_col)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_ppm(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "maxval": [r[2] for r in rows],
                    "sum_r": [r[3] for r in rows],
                    "sum_g": [r[4] for r in rows],
                    "sum_b": [r[5] for r in rows],
                }
            )

    return narrowed.mapInPandas(parse, schema)


def image_gif_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Exact palette-resolved pixel features over GIF payloads (real
    LZW decompression, stdlib-only). Same Arrow-batched one-pass
    shape. Returns (id, width, height, n_colors, sum_r, sum_g,
    sum_b)."""
    from cancer_survival_etl_spark.operators.partitioning import fan_out

    schema = (
        f"{id_col} long, width long, height long, n_colors long, "
        "sum_r long, sum_g long, sum_b long"
    )
    narrowed = fan_out(df).select(id_col, payload_col)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_gif(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_colors": [r[2] for r in rows],
                    "sum_r": [r[3] for r in rows],
                    "sum_g": [r[4] for r in rows],
                    "sum_b": [r[5] for r in rows],
                }
            )

    return narrowed.mapInPandas(parse, schema)
