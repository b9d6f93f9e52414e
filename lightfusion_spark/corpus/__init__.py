"""The verification corpus: every operator the engine claims, as a named
(query, oracle) pair the driver can check against DuckDB at sf0.01.

Submodules register :class:`QuerySpec` entries into ``REGISTRY``:

* :mod:`.relational` — Layer B, the relational surface the reference
  inherits from DataFusion's ``with_default_features()``
  (reference ``src/lib.rs:106``), re-expressed as idiomatic DataFrame ops;
* :mod:`.mlqueries` — Layer A, the reference-authored ML-UDF surface
  (LIGHTGBM DDL, inference, argmax, settings);
* :mod:`.pipeline` — the LLM-training-data extensions (dedup, similarity
  search, text analysis, multimodal plumbing) built on ``..operators``.
"""

from .registry import REGISTRY, QuerySpec, query_functions, oracle_strings

# Importing the submodules populates REGISTRY.
from . import relational  # noqa: E402,F401
from . import mlqueries  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import tokenization  # noqa: E402,F401
from . import graphqueries  # noqa: E402,F401
from . import evalqueries  # noqa: E402,F401
from . import conversationqueries  # noqa: E402,F401
from . import udfs  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query_functions", "oracle_strings"]
