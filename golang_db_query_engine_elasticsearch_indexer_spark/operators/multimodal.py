"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): at 100 TB, image/audio/video
live as ``binary`` columns (or object-store pointers via
``spark.read.format("binaryFile")``) with decode / feature-extraction
as Arrow-batched Pandas UDFs over ``mapInPandas``. The image/audio
codecs aren't in this container, so the decode step is a clearly
marked stub (NotImplementedError / deterministic fake) — the
*Spark-side plumbing* (schema, batch iteration, partitioning, UDF
signature) is real and oracle-tested via byte-level features.

The fixture has no binary table; we derive payloads as
``encode(text, 'utf-8')`` so features (byte length, md5) have an exact
DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, md5_hex string, head_hex string"


def _feature_batches(batches):
    """mapInPandas worker: per-Arrow-batch byte features. Runs on
    executors; pure function of the payload bytes."""
    for pdf in batches:
        out = pdf[["doc_id"]].copy()
        payload = pdf["payload"]
        out["n_bytes"] = payload.map(len).astype("int64")
        out["md5_hex"] = payload.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        out["head_hex"] = payload.map(lambda b: bytes(b)[:4].hex())
        yield out


def binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real multimodal
    path: binary payload -> mapInPandas (Arrow batches) -> typed rows."""
    payloads = spark.table("documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA).orderBy("doc_id")


# head_hex = first 4 utf-8 bytes in hex. DuckDB: hex(blob) is uppercase,
# so lower() it; fixture text is ASCII so 4 bytes = 4 chars.
BINARY_FEATURES_ORACLE = """
SELECT doc_id,
       octet_length(encode(text))                       AS n_bytes,
       md5(text)                                        AS md5_hex,
       lower(hex(encode(substring(text, 1, 4))))        AS head_hex
FROM documents
ORDER BY doc_id
"""


def decode_stub(modality: str):
    """Decode entry point for real codecs (image/audio/video).

    STUB: codec libraries (PIL, torchaudio, ffmpeg) are not in this
    container. The function validates the plumbing contract and fails
    loudly rather than faking media decode silently.
    """

    def _decode(batches):
        for pdf in batches:
            raise NotImplementedError(
                f"{modality} decode requires codec libraries not present in "
                "this environment; payload plumbing (schema/batching) is "
                "exercised by binary_features instead"
            )

    return _decode


def registry() -> dict[str, dict]:
    return {
        "multimodal_binary_features": {
            "fn": binary_features,
            "oracle": BINARY_FEATURES_ORACLE,
        },
    }
