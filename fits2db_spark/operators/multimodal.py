"""Multimodal columns (SURVEY.md §2.N): opaque binary payloads + typed
metadata, with decode / feature-extraction as Arrow-batched Python.

The decode step is REAL for the uncompressed public formats a pure-numpy
implementation can cover — PPM/PGM (netpbm P5/P6) and BMP (Windows DIB,
uncompressed 8/24/32 bpp) — including pixel access for feature extraction
and nearest-neighbor resize. Compressed formats (JPEG/PNG/...) need codec
libraries this container does not ship; those payloads fall back to a
clearly-marked deterministic fake so the distributed plumbing still
exercises end-to-end. ``mm_decode_features`` synthesizes REAL P6 payloads
JVM-side from the documents fixture, so the query path runs the real
decoder. Audio gets the same treatment: a from-scratch RIFF/WAVE codec
(chunk-walking parser, PCM16) with ``mm_wav_features`` decoding real
self-synthesized waveforms to duration/RMS/peak/ZCR.
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

#: formats decoded for real by the pure-numpy decoders below
REAL_DECODE_FORMATS = ("ppm", "pgm", "bmp")


class ImageFormatError(ValueError):
    pass


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary netpbm -> (h, w, c) uint8/uint16 array. P6 (RGB) and P5
    (grayscale); header is ASCII tokens (width height maxval) with
    ``#`` comments, then one whitespace byte, then big-endian samples."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageFormatError(f"not a binary PNM payload: {magic!r}")
    channels = 3 if magic == b"P6" else 1
    # tokenize the header: strip comments, collect 3 ints, remember where
    # the single post-maxval whitespace ends
    tokens, pos = [], 2
    while len(tokens) < 3:
        m = _re.compile(rb"\s*(#[^\n]*\n\s*)*(\d+)").match(payload, pos)
        if not m:
            raise ImageFormatError("truncated PNM header")
        tokens.append(int(m.group(2)))
        pos = m.end()
    pos += 1  # exactly one whitespace byte separates maxval from samples
    w, h, maxval = tokens
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    n = w * h * channels
    data = np.frombuffer(payload, dtype=dt, count=n, offset=pos)
    return data.reshape(h, w, channels).astype(dt.newbyteorder("="))


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER, 8/24/32 bpp) -> (h, w, c) uint8.
    Rows are 4-byte aligned and stored bottom-up (positive height)."""
    if payload[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    px_off = int(np.frombuffer(payload, "<u4", 1, 10)[0])
    dib_size = int(np.frombuffer(payload, "<u4", 1, 14)[0])
    w = int(np.frombuffer(payload, "<i4", 1, 18)[0])
    h_raw = int(np.frombuffer(payload, "<i4", 1, 22)[0])
    bpp = int(np.frombuffer(payload, "<u2", 1, 28)[0])
    compression = int(np.frombuffer(payload, "<u4", 1, 30)[0])
    if compression != 0:
        raise ImageFormatError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ImageFormatError(f"{bpp} bpp BMP not supported")
    h, bottom_up = abs(h_raw), h_raw > 0
    c = bpp // 8
    stride = (w * c + 3) // 4 * 4
    rows = np.frombuffer(payload, "u1", h * stride, px_off).reshape(h, stride)
    img = rows[:, : w * c].reshape(h, w, c)
    if bottom_up:
        img = img[::-1]
    if c == 1:
        # 8bpp pixels index the mandatory BGRA color table (right after the
        # DIB header) — resolve through the palette; a pure-gray palette
        # yields one channel, anything else expands to RGB
        n_colors = int(np.frombuffer(payload, "<u4", 1, 46)[0]) or 256
        pal = np.frombuffer(payload, "u1", n_colors * 4, 14 + dib_size).reshape(-1, 4)
        rgb = pal[img[:, :, 0]][:, :, [2, 1, 0]]  # BGRA rows -> RGB lookup
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (rgb[:, :, 1] == rgb[:, :, 2]).all():
            img = rgb[:, :, :1]
        else:
            img = rgb
    elif c >= 3:  # BGR(A) -> RGB(A)
        img = img[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
    return np.ascontiguousarray(img)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index arrays — no loops, no libs."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def image_features(img: np.ndarray) -> dict:
    """Per-channel mean/std + luminance mean — the cheap embedding-less
    features a curation pipeline filters on before expensive encoders."""
    f = img.reshape(-1, img.shape[2]).astype("f8")
    mean = f.mean(axis=0)
    lum = float(mean[:3].mean()) if img.shape[2] >= 3 else float(mean[0])
    return {
        "mean_r": float(mean[0]),
        "mean_g": float(mean[1]) if img.shape[2] > 1 else float(mean[0]),
        "mean_b": float(mean[2]) if img.shape[2] > 2 else float(mean[0]),
        "std_lum": float(f[:, :3].mean(axis=1).std() if img.shape[2] >= 3 else f[:, 0].std()),
        "mean_lum": lum,
    }


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Image payload -> (width, height, channels).

    REAL decode for PPM/PGM/BMP (pure numpy, above); other formats — and
    MALFORMED payloads of a known format — fall back to a deterministic
    fake (documented: JPEG/PNG need codec libs not present here) so no
    payload ever kills a whole Arrow batch."""
    try:
        if payload[:2] in (b"P5", b"P6"):
            img = decode_pnm(payload)
            return img.shape[1], img.shape[0], img.shape[2]
        if payload[:2] == b"BM":
            img = decode_bmp(payload)
            return img.shape[1], img.shape[0], img.shape[2]
    except (ImageFormatError, ValueError, IndexError):
        pass  # corrupt header/body: take the deterministic fallback below
    w = 64 + (payload[0] if payload else 0) % 192 if payload else 64
    h = 64 + (payload[-1] if payload else 0) % 192 if payload else 64
    return int(w), int(h), 3


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END
             AS size_class
    FROM documents WHERE doc_id < 300
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: payload size, content hash, size class —
    computed on a real BinaryType column (text encoded to bytes), all
    JVM-side."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        F.when(F.length(payload) > 300, "large").otherwise("small").alias("size_class"),
    )


def ppm_fixture_payload(text: str, doc_id: int, n_chars: int) -> bytes:
    """Python mirror of the JVM payload expression in mm_decode_features —
    used by tests to verify the query decoded the REAL bytes."""
    import hashlib

    w = n_chars % 16 + 4
    h = doc_id % 12 + 4
    need = 3 * w * h
    md5hex = hashlib.md5(text.encode("utf-8")).hexdigest()
    body = (md5hex * (need // 32 + 1))[:need]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + body.encode("ascii")


@register(
    "mm_decode_features",
    # The decode is REAL but the payload is deterministic (P6 header +
    # md5-hex pixel bytes), so DuckDB can re-derive every output column —
    # including the pixel statistics — from the same fixture rows: the
    # oracle rebuilds the payload string, re-extracts the ASCII pixel
    # values with list lambdas, and mirrors numpy's two-pass population
    # std. round_even(4) matches Python's banker's rounding — the byte means
    # are rationals like 21/32 that land EXACTLY on .00005 ties, where
    # DuckDB's ROUND (half-up) and Python round (half-even) disagree.
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(n_chars % 16 + 4 AS INT) AS w,
             CAST(doc_id % 12 + 4 AS INT) AS h,
             md5(text) AS mh
      FROM documents WHERE doc_id < 200
    ),
    pay AS (
      SELECT doc_id, w, h, 3*w*h AS need,
             substr(repeat(mh, (3*w*h) // 32 + 1), 1, 3*w*h) AS body
      FROM base
    ),
    feats AS (
      SELECT doc_id, w, h, need,
             list_transform(generate_series(1, need),
                            i -> CAST(ascii(substr(body, i, 1)) AS DOUBLE)) AS bytes,
             list_transform(generate_series(0, w*h - 1),
                            i -> (ascii(substr(body, 3*i+1, 1))
                                  + ascii(substr(body, 3*i+2, 1))
                                  + ascii(substr(body, 3*i+3, 1))) / 3.0) AS lums
      FROM pay
    ),
    mus AS (SELECT *, list_avg(lums) AS mu FROM feats)
    SELECT doc_id, w AS width, h AS height, 3 AS channels,
           CAST(3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR))
                + 5 + need AS BIGINT) AS n_bytes,
           round_even(list_avg(bytes), 4) AS mean_lum,
           round_even(sqrt(list_avg(list_transform(lums, x -> (x - mu) * (x - mu)))), 4)
             AS std_lum
    FROM mus
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column -> decoded metadata + pixel features via
    mapInPandas: Arrow batches of binary payloads into Python, fixed scalar
    schema out. The payloads are REAL P6 PPM images synthesized JVM-side
    from the documents fixture (dims from n_chars/doc_id, pixel bytes from
    md5(text) repeated), so the query path runs the real pure-numpy decoder
    — not the unknown-format fallback. At 100 TB the payload column comes
    off parquet/object storage instead; everything downstream is identical."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = (F.col("n_chars") % 16 + 4).cast("int")
    h = (F.col("doc_id") % 12 + 4).cast("int")
    need = (F.lit(3) * w * h).cast("int")
    body = F.substring(F.repeat(F.md5("text"), (need / 32 + 1).cast("int")), F.lit(1), need)
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    src = d.select(
        "doc_id", F.encode(F.concat(header, body), "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "width": [], "height": [], "channels": [],
                "n_bytes": pdf["payload"].map(len),
                "mean_lum": [], "std_lum": [],
            }
            for payload in pdf["payload"]:
                img = decode_pnm(bytes(payload))
                feats = image_features(img)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["channels"].append(img.shape[2])
                out["mean_lum"].append(round(feats["mean_lum"], 4))
                out["std_lum"].append(round(feats["std_lum"], 4))
            yield pd.DataFrame(out)

    return src.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, channels int, "
        "n_bytes long, mean_lum double, std_lum double",
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, n_frames,
           array_to_string(
             list_transform(generate_series(0, CAST((n_frames - 1) // 10 AS INTEGER)),
                            i -> i * 10), ',') AS sampled_frames
    FROM (SELECT doc_id, CAST(n_chars % 120 + 1 AS INTEGER) AS n_frames
          FROM documents WHERE doc_id < 200)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video-like payloads: every 10th frame index
    from a per-item frame count (derived deterministically here; supplied by
    the probe step in a real pipeline). Pure expression — the sampling plan
    is computed without touching payload bytes, so scheduling/pruning can
    happen before any expensive decode."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_frames = (F.col("n_chars") % 120 + 1).cast("int")
    base = d.select("doc_id", n_frames.alias("n_frames"))
    # ','-joined scalar rendering (driver canonicalizer cannot hash arrays);
    # positional order makes the join deterministic.
    return base.select(
        "doc_id",
        "n_frames",
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(F.lit(0), ((F.col("n_frames") - 1) / 10).cast("int")),
                lambda i: (i * 10).cast("string"),
            ),
        ).alias("sampled_frames"),
    )


def dhash_bits(img: "np.ndarray", nbits: int = 60) -> int:
    """Difference hash (dHash) of an image: sample luminance on a 9x8
    nearest-neighbor grid, emit 1 where a cell is brighter than its right
    neighbor. 60 bits so the value stays positive in an int64 on every
    engine. Public algorithm (Krawetz); resize indices match
    ``resize_nearest``'s ``out*in//n`` convention."""
    h, w = img.shape[:2]
    lum = img.reshape(h, w, -1)[:, :, :3].astype("f8").mean(axis=2)
    acc = 0
    for k in range(nbits):
        r, c = k // 8, k % 8
        yi = r * h // 8
        a = lum[yi, c * w // 9]
        b = lum[yi, (c + 1) * w // 9]
        if a > b:
            acc |= 1 << k
    return acc


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash): synthesize the deterministic P6 payloads (content
    and dims keyed on (lang, source)), decode them with the real PNM
    decoder, and dHash each image — shared by mm_phash_dedup and
    mm_phash_near."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    mh = F.md5(F.concat_ws("|", "lang", "source"))
    w = (F.ascii(F.substring(mh, 1, 1)) % 16 + 4).cast("int")
    h = (F.ascii(F.substring(mh, 2, 1)) % 12 + 4).cast("int")
    need = (F.lit(3) * w * h).cast("int")
    body = F.substring(F.repeat(mh, (need / 32 + 1).cast("int")), F.lit(1), need)
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    src = d.select("doc_id", F.encode(F.concat(header, body), "utf-8").alias("payload"))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [dhash_bits(decode_pnm(bytes(p))) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    return src.mapInPandas(hash_batches, schema="doc_id long, phash long")


#: shared CTE prefix for the phash oracles: rebuild payloads + hashes in SQL
_PHASH_SQL = """
    base AS (
      SELECT doc_id,
             md5(lang || '|' || source) AS mh
      FROM documents WHERE doc_id < 200
    ),
    dims AS (
      SELECT doc_id, mh,
             CAST(ascii(substr(mh, 1, 1)) % 16 + 4 AS INT) AS w,
             CAST(ascii(substr(mh, 2, 1)) % 12 + 4 AS INT) AS h
      FROM base
    ),
    pay AS (
      SELECT doc_id, w, h,
             substr(repeat(mh, (3*w*h) // 32 + 1), 1, 3*w*h) AS body
      FROM dims
    ),
    lum AS (
      SELECT doc_id, w, h,
             list_transform(generate_series(0, w*h - 1),
                            i -> (ascii(substr(body, 3*i+1, 1))
                                  + ascii(substr(body, 3*i+2, 1))
                                  + ascii(substr(body, 3*i+3, 1))) / 3.0) AS lums
      FROM pay
    ),
    ph AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 59), k ->
               CASE WHEN
                 lums[((k // 8) * h // 8) * w + ((k % 8) * w // 9) + 1]
                 >
                 lums[((k // 8) * h // 8) * w + (((k % 8) + 1) * w // 9) + 1]
               THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END))
               AS BIGINT) AS phash
      FROM lum
    )
"""


@register(
    "mm_phash_dedup",
    # The oracle mirrors the whole pipeline in SQL: rebuild the
    # deterministic P6 payload from the fixture, re-derive the luminance
    # plane from the ASCII pixel bytes, sample the same 9x8 grid
    # (out*in//n indices), reassemble the 60-bit integer with BIGINT
    # shifts (doubles would lose exactness past 2^53), and group. Float
    # luminances are identical on both engines (sum of 3 uint8s / 3.0),
    # so the > comparisons agree bit-for-bit.
    oracle=f"""
    WITH {_PHASH_SQL},
    grp AS (
      SELECT phash, CAST(COUNT(*) AS BIGINT) AS group_size,
             MIN(doc_id) AS canonical_doc
      FROM ph GROUP BY phash
    )
    SELECT p.doc_id, p.phash, g.group_size,
           g.canonical_doc, g.group_size > 1 AS is_dup
    FROM ph p JOIN grp g USING (phash)
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: decode the binary image column (REAL P6
    payloads synthesized JVM-side, same decoder path as
    mm_decode_features; content and dims keyed on (lang, source) so the
    same image genuinely recurs under many doc_ids — the "one asset,
    re-uploaded everywhere" shape; 171 of the 200 docs land in multi-doc
    groups at sf0.01), compute a 60-bit dHash per image in the Arrow
    batch, then group by hash — the visual-dedup step of a multimodal
    curation pipeline.

    Scale: the decode+hash is mapInPandas (Arrow-batched, no JVM<->Python
    row ping-pong); the dedup is one groupBy on the 8-byte hash — exactly
    dedup_exact_text's shuffle profile. Near-dup (hamming<=k) extends this
    by banding the 60 bits into 4x15-bit keys and OR-ing bucket joins —
    the dedup_near_minhash machinery unchanged."""
    ph = _phash_frame(spark, sf_dir)
    grp = ph.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("doc_id").alias("canonical_doc"),
    )
    return ph.join(grp, "phash").select(
        "doc_id", "phash", "group_size", "canonical_doc",
        (F.col("group_size") > 1).alias("is_dup"),
    )


@register(
    "mm_phash_near",
    oracle=f"""
    WITH {_PHASH_SQL},
    bands AS (
      SELECT doc_id, phash, k, (phash >> (15 * k)) & 32767 AS bk
      FROM ph, unnest([0, 1, 2, 3]) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.phash AS pa, b.phash AS pb
      FROM bands a JOIN bands b
        ON a.k = b.k AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pa, pb)) AS INT) AS hamming,
           pa = pb AS is_exact
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= 3
    """,
)
def mm_phash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs by perceptual hash: band the 60-bit
    dHash into 4 x 15-bit keys, equi-join on (band, key), then verify
    candidates with the exact hamming distance (bit_count of xor —
    JVM-native on both engines). By pigeonhole, any pair within hamming 3
    shares at least one identical band, so recall at the <=3 threshold is
    exactly 1 — the same band-then-verify contract as dedup_near_minhash,
    in hamming space instead of Jaccard space.

    Scale: candidates ∝ images per (band, key) bucket, never all-pairs;
    a degenerate bucket (e.g. flat-black thumbnails hashing to 0) gets
    the same bucket-cap guard as the LSH dedup (_LSH_BUCKET_CAP pattern).
    The verify is O(1) per candidate (one xor + popcount)."""
    ph = _phash_frame(spark, sf_dir)
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.shiftright(F.col("phash"), 15 * k)
                        .bitwiseAND(F.lit(32767))
                        .alias("bk"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "phash", F.col("band.k").alias("k"), F.col("band.bk").alias("bk"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.filter(ham <= 3)
        .select(
            "doc_a",
            "doc_b",
            ham.cast("int").alias("hamming"),
            (F.col("pa") == F.col("pb")).alias("is_exact"),
        )
    )


# ---------------------------------------------------------------------------
# Audio: RIFF/WAV decode + features
# ---------------------------------------------------------------------------


class AudioFormatError(ValueError):
    pass


def write_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM 16-bit mono, the canonical 44-byte
    header layout (RIFF size, fmt chunk, data chunk)."""
    pcm = samples.astype("<i2").tobytes()
    hdr = b"".join(
        [
            b"RIFF",
            np.uint32(36 + len(pcm)).tobytes(),
            b"WAVE",
            b"fmt ",
            np.uint32(16).tobytes(),
            np.uint16(1).tobytes(),  # PCM
            np.uint16(1).tobytes(),  # mono
            np.uint32(sample_rate).tobytes(),
            np.uint32(sample_rate * 2).tobytes(),  # byte rate
            np.uint16(2).tobytes(),  # block align
            np.uint16(16).tobytes(),  # bits/sample
            b"data",
            np.uint32(len(pcm)).tobytes(),
        ]
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE -> (sample_rate, int16 samples). Walks the chunk list
    (not fixed offsets), so files with extra chunks (LIST/INFO, fact)
    parse correctly; PCM 16-bit, mono or interleaved stereo."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int(np.frombuffer(payload, "<u4", 1, pos + 4)[0])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # malformed structure is a format error, not a numpy crash —
            # same contract as the FITS parser's typed FitsFormatError
            if len(body) < 16:
                raise AudioFormatError(f"fmt chunk truncated ({len(body)} bytes)")
            fmt = int(np.frombuffer(body, "<u2", 1, 0)[0])
            if fmt != 1:
                raise AudioFormatError(f"non-PCM WAV (format {fmt}) not supported")
            channels = int(np.frombuffer(body, "<u2", 1, 2)[0])
            rate = int(np.frombuffer(body, "<u4", 1, 4)[0])
            bits = int(np.frombuffer(body, "<u2", 1, 14)[0])
        elif cid == b"data":
            if len(body) < size:
                raise AudioFormatError("data chunk truncated")
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise AudioFormatError("missing fmt or data chunk")
    if bits != 16:
        raise AudioFormatError(f"{bits}-bit WAV not supported")
    if len(data) % 2:
        raise AudioFormatError("PCM16 data chunk has an odd byte count")
    samples = np.frombuffer(data, "<i2")
    if channels and channels > 1:
        if len(samples) % channels:
            raise AudioFormatError(
                f"{len(samples)} samples not divisible by {channels} channels"
            )
        samples = samples.reshape(-1, channels)
    return rate, samples


def audio_features(rate: int, samples: np.ndarray) -> dict:
    """Duration, RMS energy, peak, zero-crossing rate — the cheap gates an
    audio curation pass filters on before expensive transcription."""
    x = samples.astype("f8").ravel()
    crossings = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": int(len(x)),
        "duration_s": len(x) / rate,
        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
        # peak from the float copy: np.abs on int16 overflows at -32768
        "peak": int(np.abs(x).max()) if len(x) else 0,
        "zcr": crossings / (len(x) - 1) if len(x) > 1 else 0.0,
    }


@register(
    "mm_wav_features",
    # The payloads are REAL RIFF/WAVE bytes (square waves whose amplitude/
    # period/length derive deterministically from fixture columns), so the
    # oracle re-derives every feature in closed form: a ±A square wave has
    # RMS exactly A and peak A; N samples of period P starting positive
    # contain 2N/P − 1 sign changes.
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST((doc_id % 8 + 1) * 1000 AS DOUBLE) AS amp,
             2 * (n_chars % 10 + 2) AS p,
             CAST(2 * (n_chars % 10 + 2) * (doc_id % 5 + 20) AS BIGINT) AS n
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           n AS n_samples,
           8000 AS sample_rate,
           ROUND(n / 8000.0, 6) AS duration_s,
           ROUND(amp, 4) AS rms,
           CAST(amp AS BIGINT) AS peak,
           ROUND((2.0 * n / p - 1) / (n - 1), 6) AS zcr
    FROM base
    """,
)
def mm_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio column end to end: synthesize REAL RIFF/WAVE payloads (PCM
    16-bit square waves, amplitude/period/length deterministic from the
    documents fixture), ship them through Arrow as a binary column, and
    decode with the chunk-walking RIFF parser to duration / RMS / peak /
    zero-crossing-rate features.

    Two mapInPandas stages — synthesize, then decode — with the binary
    column crossing the Arrow boundary between them, exactly the shape of
    a real pipeline where stage 1 is an object-store fetch. No shuffle
    anywhere: both stages are narrow maps, so the operator scales with
    scan bandwidth. The decode is real (chunk list walk, fmt/data parse);
    the features have closed-form oracle values because the waveform is a
    perfect square wave."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    src = d.select("doc_id", "n_chars")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                amp = (doc_id % 8 + 1) * 1000
                half = n_chars % 10 + 2
                n = 2 * half * (doc_id % 5 + 20)
                one = np.concatenate(
                    [np.full(half, amp, "<i2"), np.full(half, -amp, "<i2")]
                )
                payloads.append(write_wav(np.tile(one, n // (2 * half))))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wav = src.mapInPandas(synth, schema="doc_id long, payload binary")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                f = audio_features(rate, samples)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": f["n_samples"],
                        "sample_rate": rate,
                        "duration_s": round(f["duration_s"], 6),
                        "rms": round(f["rms"], 4),
                        "peak": f["peak"],
                        "zcr": round(f["zcr"], 6),
                    }
                )
            yield pd.DataFrame(rows)

    return wav.mapInPandas(
        decode_batches,
        schema="doc_id long, n_samples long, sample_rate int, "
        "duration_s double, rms double, peak long, zcr double",
    )


# ---------------------------------------------------------------------------
# VAD-style audio segmentation (round 7)
# ---------------------------------------------------------------------------
_VAD_RATE = 8000
_VAD_FRAME = 80          # 10ms frames at 8kHz — the standard VAD hop
_VAD_THRESHOLD = 500.0   # frame-RMS gate; tones are >=1000, silence is 0


@register(
    "mm_audio_segments",
    # The synthesized layout is deterministic: 5 silence frames, then k
    # bursts (k = doc_id%4 + 2) of 80*(j + doc_id%3 + 1) samples each,
    # separated by 5 silence frames — every boundary lands on a frame
    # edge, so the segmentation the DECODER recovers has a closed form.
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id % 4 + 2 AS k, doc_id % 3 + 1 AS m
      FROM documents WHERE doc_id < 150
    ),
    bursts AS (
      SELECT doc_id, k, {_VAD_FRAME} * (j + m) AS t_samples
      FROM base, (SELECT unnest(generate_series(1, 8)) AS j) g
      WHERE j <= k
    )
    SELECT doc_id,
           CAST(ANY_VALUE(k) AS INT) AS n_segments,
           ROUND(CAST(SUM(t_samples) AS DOUBLE) / {_VAD_RATE}, 6) AS active_s,
           ROUND(CAST(MAX(t_samples) AS DOUBLE) / {_VAD_RATE}, 6) AS longest_s
    FROM bursts GROUP BY doc_id
    """,
)
def mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style audio segmentation — the speech-curation gate that runs
    before transcription: decode the WAV, compute per-frame RMS energy
    (10ms frames), threshold into voiced/silent, and collapse voiced runs
    into segments (count, total active seconds, longest segment). The
    payloads are REAL RIFF/WAVE bytes (silence/tone-burst layouts derived
    deterministically from fixture columns) decoded by the same
    chunk-walking parser as `mm_wav_features`; because every burst edge
    lands on a frame boundary, the recovered segmentation has a
    closed-form oracle.

    Plan: two narrow mapInPandas stages (synthesize -> decode+segment),
    binary column across the Arrow boundary, zero shuffles — scales with
    scan bandwidth like every decode operator here. The segmentation
    itself is vectorized numpy (frame RMS -> boolean runs via diff), the
    exact shape a real VAD (webrtcvad/silero) slots into."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    src = d.select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = doc_id % 4 + 2
                m = doc_id % 3 + 1
                amp = (doc_id % 8 + 1) * 1000
                gap = np.zeros(5 * _VAD_FRAME, "<i2")
                one_period = np.concatenate(
                    [np.full(4, amp, "<i2"), np.full(4, -amp, "<i2")]
                )
                parts = [gap]
                for j in range(1, k + 1):
                    t = _VAD_FRAME * (j + m)
                    parts.append(np.tile(one_period, t // 8))
                    parts.append(gap)
                payloads.append(write_wav(np.concatenate(parts), sample_rate=_VAD_RATE))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wav = src.mapInPandas(synth, schema="doc_id long, payload binary")

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                x = samples.astype("f8").ravel()
                n_frames = len(x) // _VAD_FRAME
                frames = x[: n_frames * _VAD_FRAME].reshape(n_frames, _VAD_FRAME)
                rms = np.sqrt((frames * frames).mean(axis=1))
                active = rms > _VAD_THRESHOLD
                # run-length encode voiced runs
                edges = np.diff(np.concatenate([[0], active.view("i1"), [0]]))
                starts = np.flatnonzero(edges == 1)
                ends = np.flatnonzero(edges == -1)
                seg_frames = ends - starts
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_segments": int(len(seg_frames)),
                        "active_s": round(
                            float(seg_frames.sum()) * _VAD_FRAME / rate, 6
                        ),
                        "longest_s": round(
                            (float(seg_frames.max()) if len(seg_frames) else 0.0)
                            * _VAD_FRAME
                            / rate,
                            6,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return wav.mapInPandas(
        segment,
        schema="doc_id long, n_segments int, active_s double, longest_s double",
    )


# ---------------------------------------------------------------------------
# ViT-style patch grid (round 7)
# ---------------------------------------------------------------------------
_PATCH = 4  # patch side in pixels; fixture dims are multiples of it


@register(
    "mm_patch_grid",
    # Same deterministic P6 recipe as mm_decode_features, with dims forced
    # to multiples of the patch size so the grid is exact; the oracle
    # recomputes each patch's luminance mean from the payload string with the
    # SAME accumulation order the decoder uses (sequential over the 16
    # in-patch pixels, each lum = (r+g+b)/3).
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST((n_chars % 4 + 2) * {_PATCH} AS INT) AS w,
             CAST((doc_id % 3 + 2) * {_PATCH} AS INT) AS h,
             md5(text) AS mh
      FROM documents WHERE doc_id < 100
    ),
    pay AS (
      SELECT doc_id, w, h,
             substr(repeat(mh, (3*w*h) // 32 + 1), 1, 3*w*h) AS body
      FROM base
    ),
    grid AS (
      SELECT doc_id, w, h, body, pr.pr, pc.pc
      FROM pay,
           (SELECT unnest(generate_series(0, 5)) AS pr) pr,
           (SELECT unnest(generate_series(0, 7)) AS pc) pc
      WHERE pr.pr < h // {_PATCH} AND pc.pc < w // {_PATCH}
    )
    SELECT doc_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
           round_even(list_avg(list_transform(generate_series(0, {_PATCH * _PATCH - 1}),
             k -> (ascii(substr(body, 3*((pr*{_PATCH} + k // {_PATCH})*w
                                          + pc*{_PATCH} + k % {_PATCH}) + 1, 1))
                   + ascii(substr(body, 3*((pr*{_PATCH} + k // {_PATCH})*w
                                           + pc*{_PATCH} + k % {_PATCH}) + 2, 1))
                   + ascii(substr(body, 3*((pr*{_PATCH} + k // {_PATCH})*w
                                           + pc*{_PATCH} + k % {_PATCH}) + 3, 1)))
                  / 3.0)), 4) AS mean_lum
    FROM grid
    """,
)
def mm_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patchify: decode the image column and emit one row per
    {_PATCH}x{_PATCH} patch with its grid position and mean luminance —
    the tokenization step of every vision transformer pipeline (patch
    embeddings start from exactly this (doc, patch_row, patch_col,
    values) layout), and the granularity image-quality filters act at.

    Payloads are REAL P6 bytes (the mm_decode_features recipe, dims
    forced to patch multiples); the decoder is the same pure-numpy PNM
    parser. One narrow mapInPandas stage that EXPANDS rows (one in, many
    out) — still no shuffle; at 100 TB the patch table is written
    partition-aligned with its source, so downstream patch-level ops
    stay co-located. Patch means accumulate in the oracle's exact
    sequential order, so the doubles agree bit-for-bit before
    round-even."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = (F.col("n_chars") % 4 + 2) * _PATCH
    h = (F.col("doc_id") % 3 + 2) * _PATCH
    wc, hc = w.cast("int"), h.cast("int")
    need = (F.lit(3) * wc * hc).cast("int")
    body = F.substring(
        F.repeat(F.md5("text"), (need / 32 + 1).cast("int")), F.lit(1), need
    )
    header = F.concat(
        F.lit("P6\n"), wc.cast("string"), F.lit(" "), hc.cast("string"), F.lit("\n255\n")
    )
    src = d.select(
        "doc_id", F.encode(F.concat(header, body), "utf-8").alias("payload")
    )

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = _PATCH
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_pnm(bytes(payload))
                hh, ww = img.shape[0], img.shape[1]
                px = img.astype("f8")
                for pr in range(hh // P):
                    for pc in range(ww // P):
                        s = 0.0
                        for k in range(P * P):
                            y = pr * P + k // P
                            x = pc * P + k % P
                            s += (px[y, x, 0] + px[y, x, 1] + px[y, x, 2]) / 3.0
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "patch_row": pr,
                                "patch_col": pc,
                                "mean_lum": round(s / (P * P), 4),
                            }
                        )
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        patchify,
        schema="doc_id long, patch_row int, patch_col int, mean_lum double",
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection (round 7)
# ---------------------------------------------------------------------------
_SC_BLOCK = 5  # frames per planted scene block


@register(
    "mm_scene_cuts",
    # Payload = F concatenated 2x2 P6 frames whose luminance is constant
    # within _SC_BLOCK-frame blocks (the byte is the md5 hex char of the
    # block), so a cut exists exactly where adjacent md5 chars differ —
    # closed-form for the oracle, REAL multi-frame container walk for the
    # decoder.
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id % 17 + 8 AS f, md5(text) AS mh
      FROM documents WHERE doc_id < 200
    ),
    cutc AS (
      SELECT b.doc_id,
             CAST(SUM(CASE WHEN substr(b.mh, bk, 1) <> substr(b.mh, bk + 1, 1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS cuts
      FROM base b, (SELECT unnest(generate_series(1, 8)) AS bk) g
      WHERE bk <= (b.f + {_SC_BLOCK} - 1) // {_SC_BLOCK} - 1
      GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(b.f AS INT) AS n_frames,
           CAST(c.cuts + 1 AS INT) AS n_scenes,
           ROUND(b.f / (c.cuts + 1.0), 4) AS avg_scene_len
    FROM base b JOIN cutc c USING (doc_id)
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection — the shot-boundary pass every video
    curation pipeline runs before sampling training frames: walk the
    frame container, compute per-frame mean luminance, and cut where
    consecutive frames jump more than a threshold; report scene count and
    average scene length. The payload is a REAL multi-frame stream (F
    concatenated P6 images, F = doc_id%17+8) that the decoder walks
    header by header — the same shape as walking a real container's
    frame table, with the codec swapped for the in-repo PNM decoder.

    Plan: payload synthesis is a pure Catalyst string expression; decode
    + diff is one narrow mapInPandas; zero shuffles. Per-item state is
    one float (previous frame's luminance) regardless of frame count."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    fcnt = (F.col("doc_id") % 17 + 8).cast("int")
    payload = F.encode(
        F.expr(
            f"concat_ws('', transform(sequence(0, CAST(doc_id % 17 + 8 AS INT) - 1),"
            f" j -> concat('P6\\n2 2\\n255\\n',"
            f" repeat(substr(md5(text), CAST(j DIV {_SC_BLOCK} AS INT) + 1, 1), 12))))"
        ),
        "utf-8",
    )
    src = d.select("doc_id", fcnt.alias("n_frames"), payload.alias("payload"))

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re2

        head = _re2.compile(rb"P6\n(\d+) (\d+)\n255\n")
        for pdf in batches:
            rows = []
            for doc_id, n_frames, payload in zip(
                pdf["doc_id"], pdf["n_frames"], pdf["payload"]
            ):
                buf, pos = bytes(payload), 0
                prev, n_cuts, seen = None, 0, 0
                while pos < len(buf):
                    m = head.match(buf, pos)
                    if not m:
                        raise ImageFormatError(
                            f"frame header expected at byte {pos}"
                        )
                    w, h = int(m.group(1)), int(m.group(2))
                    body_start = m.end()
                    img = decode_pnm(buf[pos : body_start + 3 * w * h])
                    lum = float(
                        img.reshape(-1, img.shape[2])[:, :3].astype("f8").mean()
                    )
                    if prev is not None and abs(lum - prev) > 0.5:
                        n_cuts += 1
                    prev = lum
                    seen += 1
                    pos = body_start + 3 * w * h
                assert seen == n_frames
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": int(n_frames),
                        "n_scenes": n_cuts + 1,
                        "avg_scene_len": round(n_frames / (n_cuts + 1.0), 4),
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        cuts,
        schema="doc_id long, n_frames int, n_scenes int, avg_scene_len double",
    )
