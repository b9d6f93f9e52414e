"""lightfusion_spark — a PySpark-native engine with the capabilities of
milenkovicm/lightfusion (reference read-only at /root/reference).

Layer A (reference-authored, rebuilt Spark-first): ``CREATE FUNCTION ...
LANGUAGE LIGHTGBM`` DDL, Arrow-vectorized LightGBM inference, ``argmax``,
the validated ``lightfusion.*`` config namespace, settings introspection.

Layer B (reference-inherited): the full relational SQL surface — provided by
Spark's own Catalyst/SQL engine and verified query-by-query against a DuckDB
oracle (see ``__spark_entry__.py``).

Extensions: large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal column plumbing) under ``operators/``.
"""

from .session import LightFusionSession, configure_session

__version__ = "0.1.0"
__all__ = ["configure_session", "LightFusionSession", "__version__"]
