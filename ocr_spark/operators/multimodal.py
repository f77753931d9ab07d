"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data corpus carries media as opaque ``binary``
columns with typed metadata alongside (never decoded at the relational
layer). This module provides:

- ``media_catalog``: the metadata table for every media span —
  entirely expression-level (nibble arithmetic over md5(media_ref)),
  so Catalyst keeps the whole derivation in whole-stage codegen and
  the oracle can replay it. In production these fields come from the
  ingest service; deriving them from the ref hash keeps the sandbox
  deterministic with zero payload bytes stored.
- ``with_payload`` / ``decode_media_batch``: the binary-column path.
  Payload synthesis and "decoding" are Arrow-batched ``mapInPandas``
  kernels (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) — the
  exact plumbing a real decoder uses. The codec itself is STUBBED:
  ``codec='synthetic'`` produces deterministic fake pixels;
  ``codec='real'`` raises NotImplementedError (no image/audio libs in
  this container). Schema, partitioning, UDF signature and batch
  shapes are real and tested.
- ``resize_stats`` / ``frame_sample``: feature-extraction ops over the
  decoded arrays (resize-to-thumbnail mean stats; every-k-th frame
  sampling for video), same kernel pattern.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FORMATS = ["jpeg", "png", "webp", "gif"]
MEDIA_TYPES = ["image", "audio", "video"]


def _nib(col: str, i: int):
    """Value of the i-th (1-based) hex nibble of an md5 column — via
    instr so the Spark expression and the DuckDB oracle are literally
    parallel (DuckDB has no conv())."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(col, i, 1)) - 1


def _hexpair(col: str, i: int):
    return _nib(col, i) * 16 + _nib(col, i + 1)


def media_refs(docs: DataFrame) -> DataFrame:
    """Distinct media refs from the interleaved corpus (doc_id, spans)."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )


def refs_from_doc_table(doc_table: DataFrame) -> DataFrame:
    """Deterministic media refs for the flat ``documents`` test table
    (one media asset per document, keyed off doc_id) — the
    SQL-expressible stand-in for an ingest-produced asset registry."""
    return doc_table.select(
        F.concat(
            F.lit("m-"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12)
        ).alias("media_ref")
    )


def corpus_style_refs(doc_table: DataFrame) -> DataFrame:
    """Media refs in the EXACT format the interleaved corpus generator
    emits (sources/corpus.py doc_spans: ``m-`` + zero-padded
    sha256-seed mod 10^12 for span offset 0) — but derived entirely at
    the expression level, so the DuckDB oracle replays the same chain.
    Where document offset 0 happens to hold a media span, these
    strings are IDENTICAL to ``media_refs(corpus_df(...))`` output
    (tested), which is what lets the oracle-checked decode/frame
    queries exercise the real corpus ref derivation."""
    h = F.sha2(
        F.concat(
            F.lit("ref\x1fdoc-"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
            F.lit("\x1f0"),
        ),
        256,
    )
    d = doc_table.select(h.alias("h"))
    # seed = little-endian uint64 of the first 8 digest bytes; the
    # 256^i multipliers exceed int64 range at i=7, so the sum runs in
    # decimal(38,0) (DuckDB mirrors with HUGEINT)
    seed = None
    for i in range(8):
        term = _hexpair("h", 2 * i + 1).cast("decimal(38,0)") * F.lit(
            str(256**i)
        ).cast("decimal(38,0)")
        seed = term if seed is None else seed + term
    ref = F.concat(
        F.lit("m-"),
        F.lpad((seed % F.lit(10**12).cast("decimal(38,0)")).cast("string"), 12, "0"),
    )
    return d.select(ref.alias("media_ref"))


def media_catalog(refs: DataFrame) -> DataFrame:
    """(media_ref) -> (media_ref, media_type, format, width, height,
    n_frames, n_bytes) — expression-only typed metadata; no UDF, no
    payload."""
    d = refs.withColumn("h", F.md5("media_ref"))
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (_hexpair("h", 1) % 3) + 1
    )
    fmt = F.element_at(
        F.array(*[F.lit(t) for t in FORMATS]), (_hexpair("h", 3) % 4) + 1
    )
    width = F.lit(320) + (_hexpair("h", 5) % 8) * F.lit(160)
    height = F.lit(240) + (_hexpair("h", 7) % 8) * F.lit(120)
    n_frames = F.when(media_type == "video", 1 + (_hexpair("h", 9) % 30)).otherwise(
        F.lit(1)
    )
    return d.select(
        "media_ref",
        media_type.alias("media_type"),
        fmt.alias("format"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        n_frames.cast("int").alias("n_frames"),
        (width * height * 3 * n_frames).cast("bigint").alias("n_bytes"),
    )


# -- binary payload path (kernels) -----------------------------------------

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
    ]
)

_THUMB = 8  # synthetic decode resolution (HxW), payload-seeded


def _payload_bytes(ref: str, n: int = 4096) -> bytes:
    """Deterministic opaque payload: a counter-mode md5 stream
    (16-byte block b = md5(ref ':' b)). The sandbox stand-in for
    reading the blob from object storage — md5-based (not an RNG) so
    the DuckDB oracle can replay any byte of it from SQL."""
    return b"".join(
        hashlib.md5(f"{ref}:{b}".encode()).digest() for b in range(n // 16)
    )


def synth_payload_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_ref) -> (media_ref, payload, n_bytes)."""
    for pdf in batches:
        refs = pdf["media_ref"]
        payloads = [_payload_bytes(r) for r in refs]
        yield pd.DataFrame(
            {
                "media_ref": refs,
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
            }
        )


def decode_media_batch(
    batches: Iterator[pd.DataFrame], codec: str = "synthetic"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_ref, payload) -> decoded stats.

    codec='synthetic': interpret the first _THUMB*_THUMB bytes of the
    payload as an 8x8 grayscale thumbnail (deterministic fake decode).
    codec='real': would call the image library — STUBBED, see module
    docstring."""
    if codec != "synthetic":
        raise NotImplementedError(
            "real codecs unavailable in this container; plug cv2/PIL here"
        )
    n = _THUMB * _THUMB
    for pdf in batches:
        px = np.frombuffer(
            b"".join(bytes(p[:n]) for p in pdf["payload"]), dtype=np.uint8
        ).reshape(len(pdf), n).astype(np.float64)
        # explicit formula (sum/n, sumsq/n - mean^2): /64 is a power of
        # two so the divisions are exact, the remaining double ops are
        # IEEE-identical in any engine -> round(6) is oracle-stable
        mean = px.sum(axis=1) / n
        std = np.sqrt(np.square(px).sum(axis=1) / n - mean * mean)
        yield pd.DataFrame(
            {
                "media_ref": pdf["media_ref"],
                "height": _THUMB,
                "width": _THUMB,
                "mean_px": np.round(mean, 6),
                "std_px": np.round(std, 6),
            }
        )


def with_payload(refs: DataFrame) -> DataFrame:
    return refs.mapInPandas(synth_payload_batch, schema=PAYLOAD_SCHEMA)


def decode_stats(refs: DataFrame) -> DataFrame:
    """media refs -> payload -> decoded thumbnail stats (2 kernels,
    chained without an intermediate shuffle: both are narrow maps, so
    Spark fuses them into one python-worker stage)."""
    return with_payload(refs).mapInPandas(decode_media_batch, schema=DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def frame_sample_batch(
    batches: Iterator[pd.DataFrame], every: int = 5
) -> Iterator[pd.DataFrame]:
    """Kernel: (media_ref, payload, n_frames) -> every k-th frame's
    mean pixel (1 row per sampled frame — a flat-map, so the kernel
    emits MORE rows than it receives; mapInPandas handles that shape
    natively)."""
    n = _THUMB * _THUMB
    for pdf in batches:
        out_ref, out_idx, out_mean = [], [], []
        for ref, payload, n_frames in zip(
            pdf["media_ref"], pdf["payload"], pdf["n_frames"]
        ):
            buf = np.frombuffer(bytes(payload), dtype=np.uint8)
            for fi in range(0, int(n_frames), every):
                frame = buf[(fi * n) % (len(buf) - n) : (fi * n) % (len(buf) - n) + n]
                out_ref.append(ref)
                out_idx.append(fi)
                # int-sum / 64: exact in double AND at 6 decimals, so
                # the oracle's round(sum/64.0, 6) is bit-identical
                out_mean.append(round(float(int(frame.sum()) / n), 6))
        yield pd.DataFrame(
            {"media_ref": out_ref, "frame_idx": out_idx, "frame_mean": out_mean}
        )


def sampled_frames(refs: DataFrame, every: int = 5) -> DataFrame:
    """Video frame sampling: catalog join (broadcast — the catalog is
    derived, tiny per batch) restricts to videos, then the flat-map
    kernel emits one row per sampled frame."""
    videos = (
        media_catalog(refs)
        .where(F.col("media_type") == "video")
        .select("media_ref", "n_frames")
    )
    payloads = with_payload(refs).select("media_ref", "payload")
    return payloads.join(F.broadcast(videos), "media_ref").mapInPandas(
        frame_sample_batch, schema=FRAME_SCHEMA
    )
