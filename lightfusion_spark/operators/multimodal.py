"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``BinaryType`` columns
with structured metadata alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the bytes never round-trip through
Python row objects one at a time.

The actual media codecs are NOT available in this environment, so the
decode step is stubbed (SURVEY mandate): ``decode_media`` ships a
deterministic fake decoder by default and raises ``NotImplementedError``
if a real decode is requested.  Everything Spark-side — schema, Arrow
batching, partition parallelism, UDF signature — is real and tested.

100 TB notes: payload columns dominate I/O, so (a) keep them in their
own parquet column (column pruning skips them unless decoded), (b)
decode with ``mapInPandas`` per input split — no shuffle, memory bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — and (c) emit only
extracted features, never re-emit payload bytes, so downstream stages
shuffle kilobytes not megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, fake_frames int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media payload: UTF-8 bytes of the text column.

    In a real pipeline this column would come from the source parquet
    (image/audio bytes); the plumbing downstream is identical.
    """
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic 'decode': metadata derived from the byte length only,
    so a SQL oracle can verify the distributed plumbing end-to-end."""
    n = len(payload)
    return n, 16 + n % 32, 16 + n % 24, 1 + n % 7


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """Arrow-batched decode of a binary payload column.

    ``real=True`` is the seam where PIL/ffmpeg/soundfile would plug in;
    unavailable in this environment by design.
    """
    if real:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; use the deterministic fake decoder (real=False)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "fake_width", "fake_height", "fake_frames"]
            )
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)
