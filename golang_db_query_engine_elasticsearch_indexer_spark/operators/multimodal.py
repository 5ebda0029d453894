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


N_RESIZE_BINS = 8
FRAME_BYTES = 256
FRAME_STRIDE = 4

RESIZE_SCHEMA = "doc_id long, " + ", ".join(
    f"bin{k} double" for k in range(N_RESIZE_BINS)
)


def _resize_batches(batches):
    """mapInPandas worker: DETERMINISTIC FAKE of an image resize.

    A real implementation decodes the payload with a codec and
    average-pools pixels; the codec isn't in this container, so the
    'image' is the raw byte sequence and 'resize to 8 wide' is
    average-pooling byte values into 8 equal-width bins — the same
    batch shape, numpy arithmetic, and output schema a real thumbnailer
    would have.
    """
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415 — executor-side

    def round_half_up(x):
        # SQL round() is half-away-from-zero; python round() is
        # half-to-even, which differs at exact .5 ulps (means of uint8
        # sums hit them often). Values are non-negative here.
        return math.floor(x * 10_000 + 0.5) / 10_000

    def bins(b):
        px = np.frombuffer(bytes(b), dtype=np.uint8)
        n = len(px)
        return [
            round_half_up(float(px[n * k // N_RESIZE_BINS : n * (k + 1) // N_RESIZE_BINS].mean()))
            if n * (k + 1) // N_RESIZE_BINS > n * k // N_RESIZE_BINS
            else 0.0
            for k in range(N_RESIZE_BINS)
        ]

    for pdf in batches:
        out = pdf[["doc_id"]].copy()
        vals = pdf["payload"].map(bins)
        for k in range(N_RESIZE_BINS):
            out[f"bin{k}"] = vals.map(lambda v, _k=k: v[_k])
        yield out


def resize_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' through the multimodal path: binary payload ->
    mapInPandas average-pool into N_RESIZE_BINS bins."""
    payloads = spark.table("documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA).orderBy("doc_id")


def _resize_oracle() -> str:
    cols = ",\n       ".join(
        f"round(list_avg(list_transform("
        f"range(length(text) * {k} // {N_RESIZE_BINS} + 1, "
        f"length(text) * {k + 1} // {N_RESIZE_BINS} + 1), "
        f"i -> ascii(substring(text, i, 1)))), 4) AS bin{k}"
        for k in range(N_RESIZE_BINS)
    )
    return f"""
SELECT doc_id,
       {cols}
FROM documents
ORDER BY doc_id
"""


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_md5 string, n_frames long"


def _frame_sample_batches(batches):
    """mapInPandas worker: DETERMINISTIC FAKE of video frame sampling.

    A real implementation demuxes the container and decodes every
    FRAME_STRIDE-th frame; here a 'frame' is a FRAME_BYTES-byte chunk
    of the payload. One input row fans out to many output rows — the
    row-multiplying UDF shape frame extraction needs.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side

    for pdf in batches:
        rows = []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(b)
            n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                chunk = data[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                rows.append(
                    (int(doc_id), idx, hashlib.md5(chunk).hexdigest(), n_frames)
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5", "n_frames"])


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the multimodal path: every FRAME_STRIDE-th
    FRAME_BYTES chunk of the payload, with per-chunk digests."""
    payloads = spark.table("documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


FRAME_SAMPLE_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         unnest(range(0, (length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES}, {FRAME_STRIDE})) AS frame_idx,
         (length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS n_frames,
         text
  FROM documents
)
SELECT doc_id, frame_idx,
       md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5,
       n_frames
FROM f
ORDER BY doc_id, frame_idx
"""


def registry() -> dict[str, dict]:
    return {
        "multimodal_binary_features": {
            "fn": binary_features,
            "oracle": BINARY_FEATURES_ORACLE,
        },
        "multimodal_resize_pooled": {"fn": resize_pooled, "oracle": _resize_oracle()},
        "multimodal_frame_sample": {"fn": frame_sample, "oracle": FRAME_SAMPLE_ORACLE},
    }
