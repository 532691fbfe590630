"""Multimodal column operators (SURVEY.md §2.10 X5).

Model: media payloads are opaque ``binary`` columns + a typed metadata
struct — the direct generalization of the reference's schema-on-read blob
payload (``Record.data``, decoded consumer-side:
``ShardProducerSpec.scala:41``). The engine moves/filters/joins bytes
without interpreting them; decode/feature-extraction happens in
Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so ``_decode_batch`` is an
unconditional deterministic STUB — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and tested; a real deployment swaps only
that one function body for PIL/ffmpeg calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    "width int, height int, checksum string"
)

def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Project the documents table into a multimodal shape: the text bytes
    stand in for an encoded media payload; metadata is a typed struct.
    In production this is what a media-bearing parquet/Lance table looks
    like to the engine: ``payload binary, meta struct<...>``."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
            F.col("lang").alias("origin"),
        ).alias("meta"),
    )


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic STUB decoder (this container ships no media codecs):
    derives 'dimensions' from payload bytes. A real deployment replaces
    only this body with PIL/torchvision/ffmpeg calls — the mapInPandas
    plumbing around it is unchanged."""
    import hashlib

    payloads = batch["payload"]
    n_bytes = payloads.str.len().astype("int32")
    checksums = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": n_bytes,
            "width": (n_bytes % 640).astype("int32"),
            "height": (n_bytes % 480).astype("int32"),
            "checksum": checksums,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas``: Arrow
    batches stream through Python once, per partition — the only sane shape
    for Python-side media work at 100 TB (row-at-a-time UDFs serialize per
    record; this amortizes across the batch). Partitioning is preserved —
    no shuffle is introduced by the UDF itself. Arrow batch sizing belongs
    to the session (``spark.sql.execution.arrow.maxRecordsPerBatch``) —
    deliberately NOT set here: a query constructor must not mutate shared
    session state as a side effect."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            flat = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": batch["payload"],
                    "media_type": [m["media_type"] for m in batch["meta"]],
                }
            )
            yield _decode_batch(flat)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
