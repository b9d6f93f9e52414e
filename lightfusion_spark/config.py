"""The ``lightfusion.*`` config extension.

Mirrors the reference's DataFusion config extension (``src/config.rs:6-63``):
a validated, documented key namespace, settable via SQL ``SET`` and visible
through a settings view (``information_schema.df_settings`` in the reference,
``README.md:36-56``).

Spark's ``spark.conf`` accepts free-form keys, so the Spark-native part is
trivial; what we reproduce is the *validation* surface: unknown
``lightfusion.*`` keys error (``src/config.rs:37-39``) and ``batch_size``
must parse as a positive integer (``src/config.rs:30-44``, enforced non-zero
at function-create time ``src/lib.rs:57-66``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from .errors import LightFusionConfigError

BATCH_SIZE_KEY = "lightfusion.batch_size"


@dataclass(frozen=True)
class ConfigEntry:
    key: str
    default: str
    description: str


# Parity with the reference's config_entries() (src/config.rs:45-52)
ENTRIES: dict[str, ConfigEntry] = {
    BATCH_SIZE_KEY: ConfigEntry(
        key=BATCH_SIZE_KEY,
        default="1",
        description="Batch size used when predicting model",
    ),
}


def validate_set(key: str, value: str) -> str:
    """Validate a ``SET lightfusion.<k> = <v>`` assignment; returns the
    normalized value.  Unknown key / unparsable value -> error, matching
    ``src/config.rs:30-44``."""
    entry = ENTRIES.get(key)
    if entry is None:
        raise LightFusionConfigError(f"unknown configuration key: {key}")
    if key == BATCH_SIZE_KEY:
        try:
            parsed = int(str(value).strip())
        except ValueError as exc:
            raise LightFusionConfigError(
                f"invalid value for {key}: {value!r} (expected a positive integer)"
            ) from exc
        if parsed <= 0:
            raise LightFusionConfigError(
                f"invalid value for {key}: {value!r} (batch size must be > 0)"
            )
        return str(parsed)
    return str(value).strip()


def apply_defaults(spark: SparkSession) -> None:
    for entry in ENTRIES.values():
        if spark.conf.get(entry.key, None) is None:
            spark.conf.set(entry.key, entry.default)


def get_batch_size(spark: SparkSession) -> int:
    """Read batch size at function-creation time (``src/lib.rs:57-66``)."""
    raw = spark.conf.get(BATCH_SIZE_KEY, ENTRIES[BATCH_SIZE_KEY].default)
    value = int(validate_set(BATCH_SIZE_KEY, raw))
    return value


def refresh_settings_view(spark: SparkSession, view_name: str = "df_settings") -> None:
    """(Re)build the settings introspection view.

    The reference exposes ``information_schema.df_settings`` with columns
    ``name, value, description`` (``src/lib.rs:101``, golden table
    ``README.md:38-46``); Spark has no pluggable information_schema, so we
    publish a temp view and the SQL front-door rewrites the qualified name.
    """
    rows = [
        (e.key, spark.conf.get(e.key, e.default), e.description) for e in ENTRIES.values()
    ]
    spark.createDataFrame(rows, "name string, value string, description string") \
        .createOrReplaceTempView(view_name)
