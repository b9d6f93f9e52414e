"""Engine extension operators for large-scale training-data pipelines
(SURVEY §2.4): deduplication, similarity search, text analysis, subword
tokenization, corpus curation, multimodal codecs (image/audio/video),
as-of joins, and skew-safe aggregation."""

from . import (
    asof,
    curation,
    dedup,
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
    "jpegcodec",
    "multimodal",
    "similarity",
    "skew",
    "text",
    "tokenize",
]
