"""Multimodal (image/audio/video) column plumbing.

North-star capability (BASELINE.json): treat media as opaque ``binary``
columns plus typed metadata, with decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages.

The decode step itself is **stubbed** in this container (no
PIL/ffmpeg/torchaudio available — see :data:`HAVE_PIL`): by default a
clearly-marked deterministic fake decoder runs, or pass
``strict=True`` to get ``NotImplementedError`` at the decode site.
Everything around the stub — schemas, Arrow batch shapes, partition
behavior, UDF signatures — is real and tested, so swapping in a real
decoder is a one-function change.

Scale notes: media bytes dominate row size, so the iterator-of-batches
``mapInPandas`` contract matters — batches stream through the Python
worker without materializing a partition; metadata-only operations
(:func:`media_stats`) never touch the payload column thanks to column
pruning (select before the UDF).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # gate real decoders behind import-try (container has none)
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary payload column from text — stands
    in for real media bytes so the binary-column plumbing is exercised
    end-to-end.  Payload = UTF-8 bytes; mime rotates by id."""
    mime = (
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.split(mime, "/")[0].alias("media_type"),
        payload.alias("payload"),
        mime.alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake.  Replace with PIL/ffmpeg in a
    real deployment.  Produces (width, height, 8-dim feature vector)
    from a SHA-256 of the bytes so results are stable across runs,
    partitionings, and engines."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feats


def _pil_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL image decoder (used when PIL is importable and the caller
    asks for it): true (width, height) plus an 8-dim feature vector —
    mean grayscale intensity of 8 vertical bands of a 16×16 thumbnail.
    Deterministic for a given PIL build (resize uses a fixed filter)."""
    import io

    import numpy as np
    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    width, height = img.size
    thumb = np.asarray(
        img.resize((16, 16), PIL.Image.BILINEAR), dtype=np.float64
    ) / 255.0
    feats = [
        round(float(thumb[:, 2 * i : 2 * i + 2].mean()), 6) for i in range(8)
    ]
    return width, height, feats


def decode_and_featurize(
    media: DataFrame,
    batch_hint: int | None = None,
    strict: bool = False,
    decoder: str = "stub",
) -> DataFrame:
    """Decode payloads and extract features via Arrow-batched
    ``mapInPandas``.

    ``decoder`` selects the decode implementation:

    * ``"stub"`` (default) — the deterministic SHA-256 fake, the
      engine-portable contract the m02 oracle pins (payloads here are
      UTF-8 text stand-ins, not decodable images).
    * ``"pil"`` — the REAL :func:`_pil_decode` (raises
      ``NotImplementedError`` if PIL is absent).  The swap-in is a
      per-batch function choice; schema, batching, and plan shape are
      identical — pinned by the skip-gated real-decoder test.
    * ``"auto"`` — ``"pil"`` when PIL is importable, else the stub.

    ``strict=True`` additionally refuses to fake: it raises at the
    decode site whenever the effective decoder is the stub (the honest
    production behavior).
    """
    if decoder not in ("stub", "pil", "auto"):
        raise ValueError(f"decoder must be stub|pil|auto, got {decoder!r}")
    effective = decoder if decoder != "auto" else ("pil" if HAVE_PIL else "stub")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if effective == "pil" and not HAVE_PIL:
                raise NotImplementedError(
                    "decoder='pil' requires PIL, which is not installed"
                )
            if strict and effective == "stub":
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; install PIL/ffmpeg or use the stub"
                )
            decode = _pil_decode if effective == "pil" else _fake_decode
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sample video payloads (stub): emits ≤ ``max_frames`` rows
    per video at ``every_ms`` spacing.  Real implementation would call
    ffmpeg per batch; the row-explosion shape (1 → N rows inside
    mapInPandas) is the part that matters for the Spark plan."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame_bytes": []}
            for _, row in pdf.iterrows():
                n = min(max_frames, 1 + (row["n_bytes"] % max_frames))
                for i in range(int(n)):
                    out["doc_id"].append(row["doc_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    # stub: slice of payload stands in for the frame
                    out["frame_bytes"].append(bytes(row["payload"][:16]))
            yield pd.DataFrame(out)

    videos = media.filter(F.col("media_type") == "video")
    return videos.mapInPandas(frames, schema=FRAME_SCHEMA)


def media_dedup(
    media: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Content-hash dedup for media corpora: one row per distinct
    payload with the surviving (min) id and the copy count.

    The media bytes never shuffle — the map side reduces each row to
    its 64-char SHA-256 before the groupBy, so the exchange carries
    (hash, id) regardless of payload size.  This is the multimodal
    twin of exact text dedup (d01): at 100 TB of images the hash
    groupBy is the only viable exact-dedup shape.
    """
    h = F.sha2(F.col(payload_col), 256)
    return (
        media.select(h.alias("payload_sha256"), F.col(id_col))
        .groupBy("payload_sha256")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column (column
    pruning keeps media bytes out of the scan entirely)."""
    return (
        media.select("media_type", "n_bytes")
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


# Magic-byte signatures as HEX-PREFIX rules over the payload head.
# (format, byte offset, hex prefix) — matched in order, first hit wins;
# longer/more-specific rules precede generic ones (RIFF needs its
# subtype bytes, ftyp sits at offset 4).  Public file-format magic
# numbers; comparisons run on hex strings so the same rules drive the
# DuckDB mirror verbatim.
MEDIA_MAGIC: "list[tuple[str, int, str]]" = [
    ("png",  0, "89504E470D0A1A0A"),
    ("jpeg", 0, "FFD8FF"),
    ("gif",  0, "474946383761"),           # GIF87a
    ("gif",  0, "474946383961"),           # GIF89a
    ("webp", 8, "57454250"),               # RIFF....WEBP
    ("wav",  8, "57415645"),               # RIFF....WAVE
    ("avi",  8, "41564920"),               # RIFF....AVI
    ("mp4",  4, "66747970"),               # ....ftyp
    ("mp3",  0, "494433"),                 # ID3 tag
    ("flac", 0, "664C6143"),               # fLaC
    ("ogg",  0, "4F676753"),               # OggS
    ("pdf",  0, "25504446"),               # %PDF
]

_MAGIC_HEAD_BYTES = 16  # longest (offset + prefix) the rules inspect


def sniff_media_format(
    df: DataFrame,
    bytes_col: str = "payload",
    out_col: str = "sniffed_format",
) -> DataFrame:
    """Detect the REAL container format of a binary media column from
    its magic bytes — the crawl-media triage step that runs BEFORE any
    decoder: served content routinely lies (a ``.jpg`` URL returning
    an HTML error page, PNGs renamed ``.jpeg``), and dispatching a
    decoder on the claimed type wastes the batch or crashes the
    worker.  Joined against a claimed-type column it yields the
    mismatch report; grouped, the corpus format census.

    Pure codegen expressions: ONE hex encoding of the first 16 payload
    bytes (column pruning keeps the full payload out of the projection
    — substring on binary reads the prefix), then a first-match
    ``CASE`` over :data:`MEDIA_MAGIC`'s public signatures.  Zero
    shuffle, zero Python — at 100 TB this rides the scan like every
    other signal.  Unknown / NULL / too-short payloads sniff as NULL
    (flag, don't guess).
    """
    head = F.hex(F.substring(F.col(bytes_col), 1, _MAGIC_HEAD_BYTES))
    expr = None
    for fmt, off, prefix in MEDIA_MAGIC:
        cond = F.substring(head, 2 * off + 1, len(prefix)) == F.lit(prefix)
        expr = F.when(cond, fmt) if expr is None else expr.when(cond, fmt)
    return df.withColumn(out_col, expr.otherwise(F.lit(None)))


def media_format_report(
    df: DataFrame,
    bytes_col: str = "payload",
    claimed_col: "str | None" = None,
) -> DataFrame:
    """Corpus media-format census from :func:`sniff_media_format`:
    one map-side-combined groupBy over ``(sniffed [, claimed,
    mismatch])`` — at most #formats² fixed-size states through the
    shuffle.  With ``claimed_col``, ``mismatch`` marks rows whose
    claimed type disagrees with the sniffed container (NULL sniff =
    unknown, counted as its own row, not a mismatch guess).

    Output: ``(sniffed_format [, claimed, mismatch], n)``.
    """
    sniffed = sniff_media_format(df, bytes_col)
    keys = [F.col("sniffed_format")]
    if claimed_col is not None:
        keys += [
            F.col(claimed_col).alias("claimed"),
            # coalesce: a NULL claimed type is UNKNOWN, not a mismatch
            # (and must match the DuckDB mirror bit-for-bit)
            F.coalesce(
                F.col("sniffed_format").isNotNull()
                & (F.col("sniffed_format") != F.col(claimed_col)),
                F.lit(False),
            ).alias("mismatch"),
        ]
    return sniffed.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
