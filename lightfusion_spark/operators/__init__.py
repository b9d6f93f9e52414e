"""Engine extension operators for large-scale training-data pipelines
(SURVEY §2.4): deduplication, similarity search, text analysis,
multimodal plumbing, as-of joins, and skew-safe aggregation."""

from . import asof, dedup, multimodal, similarity, skew, text

__all__ = ["asof", "dedup", "multimodal", "similarity", "skew", "text"]
