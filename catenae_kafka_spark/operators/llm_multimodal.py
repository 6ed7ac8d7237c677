"""Multimodal column plumbing (north-star addition).

Media (image/audio/video) is carried as an opaque ``binary`` column plus
a typed metadata struct — the layout a 100 TB multimodal pipeline uses:
bytes stay unparsed until a vectorized decode stage needs them, metadata
supports pruning/partitioning without touching payloads.

The actual codec decode (PIL/ffmpeg et al.) is NOT available in this
container, so ``decode_media`` is an explicit NotImplementedError stub —
but everything Spark-side is real and tested: the binary schema, the
Arrow batch shape through ``mapInPandas``, the deterministic
featurization path, and partition-count preservation.

This container has no real media files either; ``with_media_column``
deterministically synthesizes payload bytes from the documents table so
the plumbing runs on the standard fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY

MEDIA_SCHEMA = (
    "doc_id long, media binary, "
    "meta struct<kind: string, n_bytes: long, fake_width: int, fake_height: int>"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, byte_sum_mod long, fake_width int"
)


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Payload = UTF-8 bytes of the text (a deterministic stand-in for
    image bytes); metadata derives from the payload only.
    """
    media = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(media).cast("long")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            n_bytes.alias("n_bytes"),
            (n_bytes % 640).cast("int").alias("fake_width"),
            (n_bytes % 480).cast("int").alias("fake_height"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, codec: Literal["pil", "ffmpeg"] = "pil") -> DataFrame:
    """Real media decode — requires codec libraries absent from this
    container. The Spark plumbing around it (Arrow binary batches via
    mapInPandas) is exactly what ``featurize_media`` exercises."""
    raise NotImplementedError(
        f"media decode via {codec!r} needs codec libs not present in this "
        "environment; use featurize_media() for the deterministic-fake path"
    )


def featurize_media(media_df: DataFrame) -> DataFrame:
    """Vectorized 'feature extraction' over binary payloads via
    mapInPandas: whole Arrow batches of bytes into pandas, per-batch
    numpy work, columnar out. The deterministic fake stands in for a
    real image-embedding model; batch shape and schema are the real
    contract."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: int(sum(b)) % 65536
                    ).astype("int64"),
                    "fake_width": pdf["meta"].map(
                        lambda m: m["fake_width"]
                    ).astype("int32"),
                }
            )

    return media_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_media(media_df: DataFrame, width: int = 32, height: int = 8) -> DataFrame:
    """'Resize' to a fixed width*height byte budget: truncate or
    zero-pad each payload to exactly width*height bytes, updating the
    metadata struct. A real image resize (PIL) would slot into the same
    mapInPandas body — the fixed-output-size contract, Arrow binary
    batch shape, and metadata rewrite are the real plumbing; the
    truncate/pad is the deterministic stand-in for pixel resampling."""
    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["media"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": resized,
                    "meta": [
                        {
                            "kind": "image/fake",
                            "n_bytes": target,
                            "fake_width": width,
                            "fake_height": height,
                        }
                        for _ in range(len(pdf))
                    ],
                }
            )

    return media_df.mapInPandas(do_resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_sum long"


def sample_frames(
    media_df: DataFrame, frame_bytes: int = 64, every: int = 2
) -> DataFrame:
    """Video frame sampling: treat the payload as a sequence of
    fixed-size frames (frame_bytes each, trailing partial frame
    dropped) and emit every ``every``-th frame as its own row — the 1→N
    expansion a video pipeline runs before per-frame inference. Real
    ffmpeg frame extraction would replace the byte slicing; the row
    explosion, per-frame binary column, and checksum are real."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, bytes, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                for idx in range(0, len(b) // frame_bytes, every):
                    frame = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out.append((doc_id, idx, frame, sum(frame)))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame", "frame_sum"]
            )

    return media_df.mapInPandas(do_sample, schema=FRAME_SCHEMA)


@REGISTRY.register(
    "q_multimodal_resize",
    tags=("llm", "multimodal"),
    oracle="""
SELECT doc_id,
       CAST(256 AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(list_sum(list_transform(string_split(substr(text, 1, 256), ''),
                                    ch -> ascii(ch))) % 65536 AS BIGINT)
         AS byte_sum_mod,
       CAST(32 AS INTEGER) AS fake_width
FROM documents
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: attach payload, resize to a 32x8 byte budget,
    then featurize the resized payloads. Every output is exactly 256
    bytes (zero-padded), so the oracle states the features over the
    first 256 chars of the text the payload was synthesized from
    (padding bytes are zero and do not move the checksum)."""
    c = catalog(spark, sf_dir)
    return featurize_media(resize_media(with_media_column(c.documents)))


@REGISTRY.register(
    "q_multimodal_frames",
    tags=("llm", "multimodal"),
    oracle="""
SELECT d.doc_id,
       CAST(t.idx AS INTEGER) AS frame_idx,
       CAST(list_sum(list_transform(
              string_split(substr(d.text, CAST(t.idx AS INTEGER) * 64 + 1, 64), ''),
              ch -> ascii(ch))) AS BIGINT) AS frame_sum
FROM documents d,
     LATERAL unnest(generate_series(
       0, CAST(length(d.text) // 64 AS BIGINT) - 1, 2)) AS t(idx)
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling pipeline: attach payload, slice into 64-byte
    frames, keep every 2nd frame (trailing partial dropped), checksum
    each — one row per sampled frame."""
    c = catalog(spark, sf_dir)
    return sample_frames(with_media_column(c.documents)).select(
        "doc_id", "frame_idx", "frame_sum"
    )


@REGISTRY.register(
    "q_multimodal_audio_energy",
    tags=("llm", "multimodal"),
    oracle="""
WITH chunks AS (
  SELECT d.doc_id,
         list_sum(list_transform(
           string_split(substr(d.text, CAST(t.idx AS INTEGER) * 32 + 1, 32), ''),
           ch -> ascii(ch))) AS s
  FROM documents d,
       LATERAL unnest(generate_series(
         0, CAST(length(d.text) // 32 AS BIGINT) - 1, 1)) AS t(idx)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       ROUND(AVG(s), 4) AS avg_energy,
       CAST(MAX(s) AS BIGINT) AS peak_energy
FROM chunks GROUP BY doc_id
""",
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style analysis over opaque payloads: slice each payload
    into 32-byte chunks (every=1 — no sampling), treat per-chunk byte
    sums as window energy, aggregate per doc (chunk count, mean, peak).
    Composes sample_frames + a built-in agg — the same two-stage shape
    a real loudness/VAD pass has (vectorized chunk DSP, then relational
    rollup). Payloads shorter than one chunk drop out on both sides."""
    c = catalog(spark, sf_dir)
    chunks = sample_frames(with_media_column(c.documents), frame_bytes=32, every=1)
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.round(F.avg("frame_sum"), 4).alias("avg_energy"),
        F.max("frame_sum").alias("peak_energy"),
    )


@REGISTRY.register(
    "q_multimodal_features",
    tags=("llm", "multimodal"),
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(list_sum(list_transform(string_split(text, ''),
                                    ch -> ascii(ch))) % 65536 AS BIGINT)
         AS byte_sum_mod,
       CAST(length(text) % 640 AS INTEGER) AS fake_width
FROM documents
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: attach payload+metadata, run
    the Arrow-batched featurizer. Payload bytes are ASCII text, so the
    oracle states the expected features with plain string functions."""
    c = catalog(spark, sf_dir)
    return featurize_media(with_media_column(c.documents))


@REGISTRY.register(
    "q_cas_dedup",
    tags=("multimodal", "dedup", "storage"),
    oracle="""
WITH blobs AS (
  SELECT doc_id, sha256(text) AS cas_key, strlen(text) AS n_bytes
  FROM documents
), per_key AS (
  SELECT cas_key, CAST(COUNT(*) AS BIGINT) AS n_refs,
         CAST(MAX(n_bytes) AS BIGINT) AS n_bytes
  FROM blobs GROUP BY cas_key
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_blobs,
       CAST(SUM(n_refs) AS BIGINT) AS n_refs_total,
       CAST(SUM(n_refs * n_bytes) AS BIGINT) AS logical_bytes,
       CAST(SUM(n_bytes) AS BIGINT) AS physical_bytes,
       CAST(SUM((n_refs - 1) * n_bytes) AS BIGINT) AS bytes_saved
FROM per_key
""",
)
def q_cas_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable-storage (CAS) accounting over binary
    payloads: blobs are keyed by sha-256 of their bytes, stored once,
    referenced many times — the dedup layer every multimodal data lake
    puts under its image/audio blobs. Reports logical vs physical
    bytes and the dedup saving (here the payload is the documents
    table's UTF-8 bytes, the same synthesis as attach_media; the
    accounting is payload-agnostic).

    Exact: sha-256 of identical bytes is identical hex on both
    engines (Spark hashes the binary column, DuckDB the VARCHAR's
    UTF-8 bytes — same bytes); all byte math is BIGINT.

    Scale shape: map-side hashing, one digest-keyed partial agg — the
    blobs themselves never shuffle (only 32-byte digests and counts
    do), which is the entire point of CAS at 100 TB."""
    c = catalog(spark, sf_dir)
    blobs = c.documents.select(
        F.sha2(F.encode(F.col("text"), "UTF-8"), 256).alias("cas_key"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
    )
    per_key = blobs.groupBy("cas_key").agg(
        F.count("*").cast("bigint").alias("n_refs"),
        F.max("n_bytes").cast("bigint").alias("n_bytes"),
    )
    return per_key.agg(
        F.count("*").cast("bigint").alias("n_unique_blobs"),
        F.sum("n_refs").cast("bigint").alias("n_refs_total"),
        F.sum(F.col("n_refs") * F.col("n_bytes"))
        .cast("bigint")
        .alias("logical_bytes"),
        F.sum("n_bytes").cast("bigint").alias("physical_bytes"),
        F.sum((F.col("n_refs") - 1) * F.col("n_bytes"))
        .cast("bigint")
        .alias("bytes_saved"),
    )
