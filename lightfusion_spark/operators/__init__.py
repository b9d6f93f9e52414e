"""Engine extension operators for large-scale training-data pipelines
(SURVEY §2.4): deduplication, similarity search, text analysis, subword
tokenization, corpus curation, multimodal codecs (image/audio/video),
as-of joins, skew-safe aggregation, and raw-corpus ingestion (WARC/HTML)."""

from . import (
    asof,
    curation,
    dedup,
    ingest,
    jpegcodec,
    multimodal,
    similarity,
    skew,
    text,
    tokenize,
)

__all__ = [
    "asof",
    "curation",
    "dedup",
    "ingest",
    "jpegcodec",
    "multimodal",
    "similarity",
    "skew",
    "text",
    "tokenize",
]
