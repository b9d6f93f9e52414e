"""Packaged runtime fixtures (committed, byte-deterministic, regenerable).

``data/`` — BPE merges + expected-output parquet fixtures + the WARC
sample archive + the reference-shaped LightGBM eval TSV; ``models/`` —
the three committed LightGBM text models.  Living INSIDE the package
(resolved through ``importlib.resources``) means a plain non-editable
``pip install`` ships them and every default path works from outside a
checkout — previously they sat at the repo root and only ``pip install
-e .`` could find them (round-7 advice).

Regeneration: ``python -m lightfusion_spark.ml.fixture`` (models + eval
TSV), ``python tools/gen_{bpe,warc,jpeg,video}_fixture.py`` (expected
outputs).
"""

from __future__ import annotations

from importlib import resources


def fixture_path(*parts: str) -> str:
    """Absolute filesystem path of a packaged fixture, e.g.
    ``fixture_path("models", "multiclass.lgbm")``.

    Uses ``importlib.resources.files`` — correct for any directory
    install (editable or wheel).  Zip/egg installs are not supported
    (Spark itself needs real file paths for its readers); the resulting
    ``Path`` is returned as ``str`` for direct use in Spark/DuckDB APIs.
    """
    return str(resources.files(__package__).joinpath(*parts))
