"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
`binary` columns with typed metadata, decoded by Arrow-batched Python.
This module implements the Spark-side plumbing for that pattern — schema,
partition-preserving `mapInPandas`, batch shape — with the decode step
STUBBED: the sandbox has no image/audio libraries, so `_decode_real`
raises NotImplementedError and the pipeline falls back to a deterministic
fake decode that exercises the identical dataflow (bytes in → features
out). Swapping in PIL/librosa/pyav is a one-function change.

The fake payload is derived from the document text (md5 → raw bytes,
tiled), so every derived feature is reproducible in the DuckDB oracle —
the binary round-trip (bytes → hex → portable hash) is checked end-to-end
even though the "decode" itself is synthetic.

Reference analog: none (the reference is text-only); the Spark pattern is
the `BaselinePipeline` map-only job shape
(`/root/reference/src/baseline/BaselinePipeline.java:276-353`) — broadcast
state + embarrassingly-parallel per-record Python, here Arrow-batched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, portable_hash_sql

PAYLOAD_TILE = 8  # payload = md5 digest (16 bytes) tiled this many times
MODALITIES = ["image", "audio", "video"]

DECODE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, width long, height long, "
    "n_frames long, checksum long"
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """(doc_id, modality, payload binary, meta struct): deterministic fake
    media payloads. `payload` is a real BinaryType column (md5(text) raw
    bytes tiled PAYLOAD_TILE times); modality cycles by doc_id."""
    digest_hex = F.md5(F.col("text"))
    tiled_hex = F.repeat(digest_hex, PAYLOAD_TILE)
    return documents.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.pmod(F.col("doc_id"), F.lit(len(MODALITIES))) + 1).cast("int"),
        ).alias("modality"),
        F.unhex(tiled_hex).alias("payload"),
        F.struct(
            (F.lit(16) + F.pmod(F.col("doc_id"), F.lit(16)) * 4).alias("width"),
            (F.lit(16) + F.pmod(F.col("doc_id"), F.lit(8)) * 4).alias("height"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, modality: str) -> dict:
    """The real decoder slot. Requires PIL/librosa/pyav — not present in
    this environment."""
    raise NotImplementedError(
        "media decoding libraries are not available in this environment; "
        "the pipeline uses the deterministic fake decode instead"
    )


def _decode_fake(doc_id: int, payload: bytes, modality: str) -> dict:
    """Deterministic stand-in with the same signature as `_decode_real`:
    features are pure functions of (doc_id, payload) so the DuckDB oracle
    can recompute them. checksum = portable_hash(hex(payload)) proves the
    binary column round-tripped bit-exactly through Arrow."""
    hex_payload = payload.hex()
    h60 = int(hashlib.md5(hex_payload.encode()).hexdigest()[:15], 16)
    return {
        "n_bytes": len(payload),
        "width": 16 + (doc_id % 16) * 4,
        "height": 16 + (doc_id % 8) * 4,
        "n_frames": 1 + (doc_id % 16) if modality == "video" else 1,
        "checksum": h60 % MERSENNE_P,
    }


def _probe_real_decoder() -> bool:
    """Check once (per worker import) whether the real decoder is usable,
    so the per-record loop branches on a flag instead of raising/catching
    NotImplementedError inside the Arrow hot path."""
    try:
        _decode_real(b"", "image")
        return True
    except NotImplementedError:
        return False
    except Exception:
        return True  # decoder present but unhappy with the empty probe


_HAVE_REAL_DECODER = _probe_real_decoder()


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature batches out. The real
    decoder is probed once at import; the deterministic fake is the
    fallback path."""
    decode = _decode_real if _HAVE_REAL_DECODER else None
    for pdf in batches:
        rows = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            if decode is not None:
                feats = decode(bytes(payload), modality)
            else:
                feats = _decode_fake(int(doc_id), bytes(payload), modality)
            rows.append({"doc_id": int(doc_id), "modality": modality, **feats})
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "modality", "n_bytes", "width", "height",
                "n_frames", "checksum",
            ],
        )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over the binary column. Narrow (no shuffle):
    each input partition maps independently — the right shape for a decode
    stage that is CPU-bound per record."""
    return media.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def decode_features_sql(documents_rel: str = "documents") -> str:
    """Oracle: recompute every decode output relationally. The payload is
    md5(text) tiled, so n_bytes = 16·PAYLOAD_TILE and checksum =
    portable_hash(repeat(md5_hex, PAYLOAD_TILE))."""
    tiled_hex = f"repeat(md5(text), {PAYLOAD_TILE})"
    modality = (
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' "
        "WHEN 1 THEN 'audio' ELSE 'video' END"
    )
    return f"""
    SELECT doc_id,
           {modality} AS modality,
           CAST(16 * {PAYLOAD_TILE} AS BIGINT) AS n_bytes,
           CAST(16 + (doc_id % 16) * 4 AS BIGINT) AS width,
           CAST(16 + (doc_id % 8) * 4 AS BIGINT) AS height,
           CAST(CASE WHEN {modality} = 'video' THEN 1 + doc_id % 16 ELSE 1 END AS BIGINT) AS n_frames,
           CAST({portable_hash_sql(tiled_hex)} AS BIGINT) AS checksum
    FROM ({documents_rel})
    """


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """(doc_id, frame_idx): frame-sampling plumbing for video rows —
    explode a frame-index sequence (every `every_n`-th frame of the
    decoded n_frames). Pure relational; a real pipeline would join these
    indices back to a frame-extraction mapInPandas."""
    frames = decode_features(media).filter(F.col("modality") == "video")
    return frames.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def frame_sample_sql(documents_rel: str = "documents", every_n: int = 4) -> str:
    return f"""
    SELECT doc_id, CAST(unnest(range(0, n_frames, {every_n})) AS BIGINT) AS frame_idx
    FROM ({decode_features_sql(documents_rel)})
    WHERE modality = 'video'
    """
